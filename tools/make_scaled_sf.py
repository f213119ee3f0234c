"""Scale up the driver's sf0.1 test data to sf1 (or beyond) for
LOCAL benchmark validation of the plan-asserted scale claims.

The driver's parquet under /root/testdata is read-only and tops out
at sf0.1, so the sf1 empirical run (SCALE.md "sf1 validation") builds
its input here: REPLICAS shifted copies of every sf0.1 table, written
under .scratch/ (gitignored), one file per replica so the scan
parallelizes without relying on row-group splitting.

Replication rules (keys stay dense and FK-consistent):

- region/nation: fixed-size dims, copied once — exactly how real
  TPC-H scales (nation is 25 rows at every sf), so nation-grouped
  results keep their cardinality and broadcast-ability.
- keyed tables: replica i shifts every PK/FK by i * stride where
  stride = the table's sf0.1 row count (keys are 0-based dense), so
  joins land on the shifted counterpart and per-key fan-out matches
  sf0.1.
- documents.text: replica 0 verbatim; replica i>0 interleaves a
  deterministic tag token every 4 tokens. This keeps the WITHIN-
  replica dup/near-dup structure identical to sf0.1 while breaking
  shingle overlap ACROSS replicas (a plain copy would make every doc
  a 10-way exact dup and quadratically inflate LSH candidate pairs —
  a different workload, not a bigger one).
- embeddings.embedding: replica i rotates the vector by i positions,
  decorrelating copies so cosine top-k doesn't degenerate into
  10 identical neighbors per query.
- events: ids shift; timestamps stay, so time-window densities scale
  10x (the intended stress for the windowed/sessionize queries).

Run: python tools/make_scaled_sf.py [REPLICAS] [OUT_DIR]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# table -> columns shifted by (stride_table * i); stride = row count
STRIDES = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem": 600_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}
USER_STRIDE = 1_500  # events.user_id

SHIFT_COLS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}


def _perturb_text(text: str, i: int) -> str:
    toks = text.split()
    out = []
    for j, t in enumerate(toks):
        out.append(t)
        if j % 4 == 3:
            out.append(f"r{i}t{(j // 4) % 5}")
    return " ".join(out)


def _replica(
    tbl: pa.Table, name: str, i: int, distinct_names: bool = False
) -> pa.Table:
    cols = {}
    for c in tbl.schema.names:
        arr = tbl[c]
        shift_of = SHIFT_COLS.get(name, {}).get(c)
        if (
            distinct_names
            and name == "customer"
            and c == "c_name"
            and i > 0
        ):
            # --distinct-names: regenerate the name from the SHIFTED
            # key (Customer#%09d, the same rule the base data uses),
            # so replica names stay unique and keep the digit-edit
            # near-dup structure the ER queries match on. The default
            # (verbatim copy, 1000 exact copies per name at sf100) is
            # the duplicate-identity regime; this flag is the
            # distinct-identity regime — both are real ER workloads
            # and SCALE.md records them separately.
            shifted = tbl["c_custkey"].to_numpy() + STRIDES["customer"] * i
            cols[c] = pa.chunked_array(
                [pa.array([f"Customer#{int(k):09d}" for k in shifted])]
            )
        elif shift_of is not None and i > 0:
            cols[c] = pa.chunked_array(
                [pa.array(arr.to_numpy() + STRIDES[shift_of] * i, type=arr.type)]
            )
        elif name == "events" and c == "user_id" and i > 0:
            cols[c] = pa.chunked_array(
                [pa.array(arr.to_numpy() + USER_STRIDE * i, type=arr.type)]
            )
        elif name == "documents" and c == "text" and i > 0:
            cols[c] = pa.chunked_array(
                [pa.array([_perturb_text(t, i) for t in arr.to_pylist()])]
            )
        elif name == "embeddings" and c == "embedding" and i > 0:
            mat = np.array(arr.to_pylist(), dtype=np.float32)
            rolled = np.roll(mat, i, axis=1)
            cols[c] = pa.chunked_array(
                [pa.array(list(rolled), type=arr.type)]
            )
        else:
            cols[c] = arr
    out = pa.table(cols, schema=tbl.schema)
    if name == "documents" and i > 0:
        # keep n_chars consistent with the perturbed text
        n_chars = pa.array(
            [len(t) for t in out["text"].to_pylist()],
            type=out.schema.field("n_chars").type,
        )
        out = out.set_column(
            out.schema.get_field_index("n_chars"), "n_chars", n_chars
        )
    return out


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    distinct_names = "--distinct-names" in flags
    only: set[str] | None = None
    for f in flags:
        if f.startswith("--tables="):
            only = set(f.split("=", 1)[1].split(","))
    replicas = int(argv[0]) if argv else 10
    out_dir = (
        argv[1]
        if len(argv) > 1
        else os.path.join(os.path.dirname(__file__), "..", ".scratch", "sf1")
    )
    out_dir = os.path.abspath(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    for name in ["region", "nation"]:
        if only is not None and name not in only:
            continue
        tbl = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(tbl, f"{out_dir}/{name}.parquet")
        print(name, tbl.num_rows)
    for name in STRIDES:
        if only is not None and name not in only:
            continue
        tbl = pq.read_table(f"{SRC}/{name}.parquet")
        tdir = f"{out_dir}/{name}.parquet"
        os.makedirs(tdir, exist_ok=True)
        total = 0
        for i in range(replicas):
            rep = _replica(tbl, name, i, distinct_names=distinct_names)
            pq.write_table(rep, f"{tdir}/part-{i:03d}.parquet")
            total += rep.num_rows
        print(name, total)


if __name__ == "__main__":
    main()
