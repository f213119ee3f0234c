"""Persisted IVF index lifecycle: build → probe (partition-pruned) →
append with the frozen quantizer.

The load-bearing assertions:
- probing EVERY cell reproduces brute-force cosine top-k exactly
  (the index is a partition of the corpus, so full-probe == exact);
- a probe's ``inputFiles()`` stay inside its n_probe ``cell=``
  directories — the partition-pruning claim, pinned on real files;
- appended vectors are assigned by the PERSISTED centroids (argmin
  re-derived independently in the test) and become findable without
  touching pre-existing cell files.
"""

import os

from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.catalog import load_table
from aws_csp_datapipeline_spark.functions import ann_index as AI
from aws_csp_datapipeline_spark.functions.similarity import cosine_topk


def _build(spark, sf_oracle, tmp_path, n_cells=8):
    idx = str(tmp_path / "ivf_index")
    emb = load_table(spark, sf_oracle, "embeddings")
    meta = AI.build_ivf_index(emb, "embedding", "vec_id", idx, n_cells=n_cells)
    return idx, emb, meta


def test_full_probe_equals_bruteforce(spark, sf_oracle, tmp_path):
    idx, emb, meta = _build(spark, sf_oracle, tmp_path)
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    got = {
        (r["neighbor_id"], r["cos_sim"])
        for r in AI.probe_ivf_index(
            spark, idx, qv, k=10, n_probe=meta["n_cells"], exclude_id=0
        ).collect()
    }
    exact = {
        (r["vec_id"], r["cos_sim"])
        for r in cosine_topk(
            emb.filter(F.col("vec_id") != 0), "embedding", "vec_id", qv, k=10
        ).collect()
    }
    assert got == exact


def test_probe_recall_floor_and_partition_pruning(spark, sf_oracle, tmp_path):
    idx, emb, meta = _build(spark, sf_oracle, tmp_path)
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    probe = AI.probe_ivf_index(spark, idx, qv, k=10, n_probe=3, exclude_id=0)
    exact = {
        r["vec_id"]
        for r in cosine_topk(
            emb.filter(F.col("vec_id") != 0), "embedding", "vec_id", qv, k=10
        ).collect()
    }
    got = {r["neighbor_id"] for r in probe.collect()}
    assert len(got & exact) / len(exact) >= 0.6

    # partition pruning: every scanned file sits inside one of the
    # n_probe probed cell directories, and other cells' files exist
    # but are NOT read
    files = probe.inputFiles()
    assert files, "probe read no files"
    cells_touched = {
        part
        for f in files
        for part in f.split(os.sep)
        if part.startswith("cell=")
    }
    assert len(cells_touched) <= 3, cells_touched
    all_cells = {
        d
        for d in os.listdir(os.path.join(idx, "cells"))
        if d.startswith("cell=")
    }
    assert len(all_cells) == meta["n_cells"]
    assert cells_touched < all_cells  # strict subset: pruning happened


def test_batch_probe_matches_single_probes(spark, sf_oracle, tmp_path):
    idx, emb, meta = _build(spark, sf_oracle, tmp_path)
    probes = emb.filter(F.col("vec_id") < 3)
    batch = AI.batch_probe_ivf_index(
        spark, idx, probes, "embedding", "vec_id", k=5, n_probe=meta["n_cells"]
    )
    got = {
        (r["probe_id"], r["neighbor_id"], r["cos_sim"]) for r in batch.collect()
    }
    want = set()
    for pid in range(3):
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == pid)
            .select("embedding")
            .first()[0]
        ]
        for r in AI.probe_ivf_index(
            spark, idx, qv, k=5, n_probe=meta["n_cells"], exclude_id=pid
        ).collect():
            want.add((pid, r["neighbor_id"], r["cos_sim"]))
    assert got == want


def test_append_uses_frozen_quantizer(spark, sf_oracle, tmp_path):
    idx, emb, meta = _build(spark, sf_oracle, tmp_path)
    cells_dir = os.path.join(idx, "cells")
    before = {
        f: os.path.getmtime(f) for f in _data_files(cells_dir)
    }

    # delta: one copy of vector 0 under a fresh id — its nearest
    # centroid must equal vector 0's persisted cell
    delta = emb.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    n = AI.append_to_index(delta, "embedding", "vec_id", idx)
    assert n == 1
    assert AI.read_meta(idx)["n_rows"] == meta["n_rows"] + 1

    stored = spark.read.parquet(cells_dir)
    home = stored.filter(F.col("id") == 0).select("cell").first()[0]
    got = stored.filter(F.col("id") == 1_000_000).select("cell").first()[0]
    assert got == home

    # existing files untouched (append only adds files)
    after = {f: os.path.getmtime(f) for f in _data_files(cells_dir)}
    assert set(before) <= set(after)
    assert all(after[f] == before[f] for f in before)

    # the appended vector is findable by a probe of its home cell
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    hits = {
        r["neighbor_id"]
        for r in AI.probe_ivf_index(
            spark, idx, qv, k=3, n_probe=1, exclude_id=0
        ).collect()
    }
    assert 1_000_000 in hits  # exact duplicate => cos_sim 1.0, rank 1


def _data_files(path):
    out = []
    for root, _dirs, files in os.walk(path):
        out.extend(
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
    return out


def test_ivf_pq_full_probe_rerank_equals_bruteforce(spark, sf_oracle, tmp_path):
    """With every cell probed and a corpus-sized shortlist, the
    IVF-PQ read path's exact rerank must reproduce brute force."""
    from aws_csp_datapipeline_spark.functions import ann_index as AI

    idx = str(tmp_path / "ivfpq")
    emb = load_table(spark, sf_oracle, "embeddings")
    meta = AI.build_ivf_pq_index(
        emb, "embedding", "vec_id", idx, n_cells=8, pq_m=8, pq_k=16
    )
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    got = {
        (r["vec_id"], r["cos_sim"])
        for r in AI.probe_ivf_pq_index(
            spark,
            idx,
            qv,
            k=10,
            n_probe=meta["n_cells"],
            shortlist=meta["n_rows"],
            rerank_against=emb,
            exclude_id=0,
        ).collect()
    }
    from aws_csp_datapipeline_spark.functions.similarity import cosine_topk

    exact = {
        (r["vec_id"], r["cos_sim"])
        for r in cosine_topk(
            emb.filter(F.col("vec_id") != 0), "embedding", "vec_id", qv, k=10
        ).collect()
    }
    assert got == exact


def test_ivf_pq_pruned_probe_recall(spark, sf_oracle, tmp_path):
    from aws_csp_datapipeline_spark.functions import ann_index as AI
    from aws_csp_datapipeline_spark.functions.similarity import cosine_topk

    idx = str(tmp_path / "ivfpq")
    emb = load_table(spark, sf_oracle, "embeddings")
    AI.build_ivf_pq_index(
        emb, "embedding", "vec_id", idx, n_cells=8, pq_m=8, pq_k=16
    )
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    probe = AI.probe_ivf_pq_index(
        spark, idx, qv, k=10, n_probe=4, shortlist=50,
        rerank_against=emb, exclude_id=0,
    )
    exact = {
        r["vec_id"]
        for r in cosine_topk(
            emb.filter(F.col("vec_id") != 0), "embedding", "vec_id", qv, k=10
        ).collect()
    }
    got = {r["vec_id"] for r in probe.collect()}
    assert len(got & exact) / len(exact) >= 0.4  # double-approximate path
    # pruning held: only codes inside probed cells were read
    cells_touched = {
        part
        for f in probe.inputFiles()
        for part in f.split(os.sep)
        if part.startswith("cell=")
    }
    assert 0 < len(cells_touched) <= 4


def test_ivf_pq_batch_probe_full_equals_bruteforce(spark, sf_oracle, tmp_path):
    """Batch IVF-PQ with every cell probed + corpus-wide shortlist +
    exact rerank reproduces brute force for each probe."""
    from aws_csp_datapipeline_spark.functions import ann_index as AI
    from aws_csp_datapipeline_spark.functions.similarity import cosine_topk

    idx = str(tmp_path / "ivfpq_batch")
    emb = load_table(spark, sf_oracle, "embeddings")
    meta = AI.build_ivf_pq_index(
        emb, "embedding", "vec_id", idx, n_cells=8, pq_m=8, pq_k=16
    )
    probes = emb.filter(F.col("vec_id") < 3)
    got = {
        (r["probe_id"], r["neighbor_id"], r["cos_sim"])
        for r in AI.batch_probe_ivf_pq_index(
            spark,
            idx,
            probes,
            "embedding",
            "vec_id",
            k=5,
            n_probe=meta["n_cells"],
            shortlist=meta["n_rows"],
            rerank_against=emb,
        ).collect()
    }
    want = set()
    for pid in range(3):
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == pid)
            .select("embedding")
            .first()[0]
        ]
        for r in cosine_topk(
            emb.filter(F.col("vec_id") != pid), "embedding", "vec_id", qv, k=5
        ).collect():
            want.add((pid, r["vec_id"], r["cos_sim"]))
    assert got == want


def test_append_to_pq_index_encodes_with_stored_codebooks(spark, sf_oracle, tmp_path):
    """ADVICE r9 fix: appending to an IVF-PQ index must PQ-encode the
    delta with the STORED codebooks — raw (id, vec) rows in a PQ cell
    directory would silently mix schemas and corrupt later probes.
    Pin: post-append cell files hold only (id, codes, vnorm, cell),
    and the appended vector is findable via the PQ probe path."""
    idx = str(tmp_path / "ivfpq_index")
    emb = load_table(spark, sf_oracle, "embeddings")
    meta = AI.build_ivf_pq_index(
        emb, "embedding", "vec_id", idx, n_cells=8, pq_m=8, pq_k=16
    )

    delta = emb.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    n = AI.append_to_index(delta, "embedding", "vec_id", idx)
    assert n == 1
    assert AI.read_meta(idx)["n_rows"] == meta["n_rows"] + 1

    stored = spark.read.parquet(os.path.join(idx, "cells"))
    assert set(stored.columns) == {"id", "codes", "vnorm", "cell"}
    # appended row went to vector 0's home cell with a PQ encoding
    home = stored.filter(F.col("id") == 0).select("cell").first()[0]
    row = stored.filter(F.col("id") == 1_000_000).first()
    assert row["cell"] == home
    assert len(row["codes"]) == 8 and row["vnorm"] > 0

    # identical vector => ADC scores identically; the appended id is
    # findable through the PQ probe of its home cell
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    hits = {
        r["vec_id"]
        for r in AI.probe_ivf_pq_index(
            spark, idx, qv, k=3, n_probe=1, exclude_id=0
        ).collect()
    }
    assert 1_000_000 in hits


def test_probe_with_all_empty_cells_returns_empty(spark, tmp_path):
    """ADVICE r9 fix: when every probed cell directory is missing
    (empty KMeans cells write no directory), the probe returns an
    EMPTY frame instead of raising on parquet(*[])."""
    import json as _json

    idx = str(tmp_path / "hollow_index")
    os.makedirs(os.path.join(idx, "cells"))
    centers = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    spark.createDataFrame(centers, "cell int, ctr array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(idx, "centroids"))
    meta = {
        "n_cells": 2, "dim": 2, "n_rows": 0, "seed": 42,
        "vec_col": "embedding", "id_col": "vec_id",
    }
    with open(os.path.join(idx, "meta.json"), "w") as fh:
        _json.dump(meta, fh)

    out = AI.probe_ivf_index(spark, idx, [1.0, 0.0], k=3, n_probe=2)
    assert out.count() == 0
    assert out.columns == ["neighbor_id", "cell", "cos_sim"]

    meta["pq_codebooks"] = [[[0.0, 0.0]]]
    with open(os.path.join(idx, "meta.json"), "w") as fh:
        _json.dump(meta, fh)
    out2 = AI.probe_ivf_pq_index(spark, idx, [1.0, 0.0], k=3, n_probe=2)
    assert out2.count() == 0
    assert out2.columns == ["vec_id", "cos_sim"]
