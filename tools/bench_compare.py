"""Compare two BENCH_r*.json records with host-drift context.

Raw round-over-round ratios on this host are dominated by machine
noise (SCALE.md "Bench variance": ±35% swings; round 9 proved the
drift environmental by rerunning frozen round-7 code). This tool
makes the comparison honest:

- per-query ratios use each record's MEDIANS when present (min
  otherwise), sorted worst-first;
- the summary reports the median-of-ratios (robust to a few noisy
  lanes) next to the sum ratio (which a single slow lane can drag);
- an optional anchor factor (e.g. from BENCH_sf100_r10.json's
  frozen-code anchor lanes) rescales the newer record before
  comparing.

Usage:
  python tools/bench_compare.py BENCH_r09.json BENCH_r10.json
  python tools/bench_compare.py OLD NEW --anchor 1.6   # NEW ran on a
                                                       # 1.6x-slow host
"""

from __future__ import annotations

import argparse
import json
import statistics


def _queries(rec: dict) -> dict[str, float]:
    q = rec.get("queries_median") or rec.get("queries") or {}
    if not q and "tail" in rec:
        # driver-written BENCH_r{N}.json: the bench's one-line JSON is
        # embedded (possibly head-truncated) in the captured stdout
        # tail — recover the queries_median block by regex
        import re

        m = re.search(r'"queries_median": \{([^}]*)\}', rec["tail"])
        if m is None:
            # the captured tail can start MID-KEY (head truncation
            # lands anywhere): accept any suffix of the key name
            m = re.search(r'eries_median"?: \{([^}]*)\}', rec["tail"])
        if m is None:
            m = re.search(r'"queries": \{([^}]*)\}', rec["tail"])
        if m is not None:
            q = {
                k: float(v)
                for k, v in re.findall(r'"(\w+)": ([0-9.]+)', m.group(1))
            }
    return {k: float(v) for k, v in q.items() if isinstance(v, (int, float))}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument(
        "--anchor",
        type=float,
        default=1.0,
        help="host factor of the NEW record's session (frozen-code "
        "anchor time / its record); NEW times are divided by this",
    )
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    old = _queries(json.load(open(args.old)))
    new = _queries(json.load(open(args.new)))
    shared = sorted(set(old) & set(new))
    if not shared:
        print("no shared queries")
        return

    rows = []
    for n in shared:
        adj = new[n] / args.anchor
        rows.append((adj / old[n] if old[n] else float("inf"), n, old[n], adj))
    rows.sort(reverse=True)

    ratios = [r[0] for r in rows]
    sum_old = sum(r[2] for r in rows)
    sum_new = sum(r[3] for r in rows)
    print(
        f"shared: {len(shared)}  anchor: {args.anchor}  "
        f"median-of-ratios: {statistics.median(ratios):.3f}  "
        f"sum ratio: {sum_new / sum_old:.3f}"
    )
    print(f"{'ratio':>7}  {'old_s':>8}  {'new_s(adj)':>10}  query")
    for ratio, name, o, a in rows[: args.top]:
        print(f"{ratio:7.2f}  {o:8.3f}  {a:10.3f}  {name}")
    gained = [r for r in rows if r[0] < 0.9]
    if gained:
        print(f"...and {len(gained)} queries at <0.9x (improved)")


if __name__ == "__main__":
    main()
