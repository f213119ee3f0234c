"""Corpus-keyed artifact cache + the persisted co-supply edge list.

Load-bearing assertions:
- get_or_build invokes the builder ONCE per (corpus, config): call #2
  reads the published artifact (the registry lanes' amortization —
  r10 verdict items 2 and 4);
- the cache key tracks corpus IDENTITY (file size/mtime), so a
  regenerated corpus rebuilds instead of serving a stale artifact;
- the edge artifact is exactly co_occurrence_edges, src-CLUSTERED
  (each node's edges in one file — the layout the node-keyed graph
  joins rely on);
- the artifact-backed graph lanes return what the inline form did.
"""

import os
import time

import pyspark.sql.functions as F

from aws_csp_datapipeline_spark.catalog import load_table
from aws_csp_datapipeline_spark.functions import artifact_cache as AC
from aws_csp_datapipeline_spark.operators import graph as G


def test_get_or_build_builds_once(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "cache"))
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "t.parquet").write_bytes(b"not-read-by-fingerprint")
    calls = []

    def build(staging):
        calls.append(staging)
        with open(os.path.join(staging, "payload"), "w") as fh:
            fh.write("x")

    d1 = AC.get_or_build("k", str(corpus), ["t"], {"a": 1}, build)
    d2 = AC.get_or_build("k", str(corpus), ["t"], {"a": 1}, build)
    assert d1 == d2 and len(calls) == 1
    assert os.path.exists(os.path.join(d1, "payload"))
    # different config -> different artifact
    d3 = AC.get_or_build("k", str(corpus), ["t"], {"a": 2}, build)
    assert d3 != d1 and len(calls) == 2


def test_fingerprint_tracks_corpus_identity(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "cache"))
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    f = corpus / "t.parquet"
    f.write_bytes(b"v1")
    fp1 = AC.corpus_fingerprint(str(corpus), ["t"])
    # same stats -> same key
    assert AC.corpus_fingerprint(str(corpus), ["t"]) == fp1
    # regenerated corpus (new size or mtime) -> new key -> rebuild
    time.sleep(0.01)
    f.write_bytes(b"v2-longer")
    fp2 = AC.corpus_fingerprint(str(corpus), ["t"])
    assert fp2 != fp1
    calls = []

    def build(staging):
        calls.append(staging)

    AC.get_or_build("k", str(corpus), ["t"], {}, build)
    time.sleep(0.01)
    f.write_bytes(b"v3-even-longer")
    AC.get_or_build("k", str(corpus), ["t"], {}, build)
    assert len(calls) == 2


def test_failed_build_publishes_nothing(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "cache"))
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "t.parquet").write_bytes(b"x")

    def bad(staging):
        raise RuntimeError("boom")

    import pytest

    with pytest.raises(RuntimeError):
        AC.get_or_build("k", str(corpus), ["t"], {}, bad)
    # nothing published, and a later good build still runs
    done = []
    AC.get_or_build("k", str(corpus), ["t"], {}, lambda s: done.append(s))
    assert len(done) == 1


def test_edge_artifact_layout_and_equality(spark, sf_oracle, tmp_path):
    li = load_table(spark, sf_oracle, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    adir = str(tmp_path / "edges_artifact")
    meta = G.build_edge_artifact(li, "l_orderkey", "l_suppkey", adir)
    persisted = G.load_edges(spark, adir)
    inline = G.co_occurrence_edges(li, "l_orderkey", "l_suppkey")
    p = {tuple(r) for r in persisted.collect()}
    assert p == {tuple(r) for r in inline.collect()}
    assert meta["n_edges"] == len(p)
    # src-clustering: every src's edges live in exactly ONE file (the
    # co-location the node-keyed graph joins rely on)
    spread = (
        persisted.withColumn("__f", F.input_file_name())
        .groupBy("src")
        .agg(F.countDistinct("__f").alias("nf"))
        .agg(F.max("nf").alias("m"))
        .first()["m"]
    )
    assert spread == 1


def test_graph_lanes_read_artifact_and_match(spark, sf_oracle, tmp_path,
                                             monkeypatch):
    """gr lanes through the cache: call #1 builds, call #2 reuses the
    published artifact (no second build dir), results identical to the
    inline edge derivation."""
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "cache"))
    from aws_csp_datapipeline_spark.plans.q_graph import (
        _edges,
        gr2_degree_hist,
    )

    li = load_table(spark, sf_oracle, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    inline = {
        tuple(r)
        for r in G.co_occurrence_edges(li, "l_orderkey", "l_suppkey").collect()
    }
    got = {tuple(r) for r in _edges(spark, sf_oracle).collect()}
    assert got == inline
    published = os.listdir(str(tmp_path / "cache"))
    assert len(published) == 1
    # second lane call: same single published artifact, same answer
    hist = {tuple(r) for r in gr2_degree_hist(spark, sf_oracle).collect()}
    assert os.listdir(str(tmp_path / "cache")) == published
    deg = {}
    for s, d in inline:
        deg[s] = deg.get(s, 0) + 1
        deg[d] = deg.get(d, 0) + 1
    expect = {}
    for v in deg.values():
        expect[v] = expect.get(v, 0) + 1
    assert hist == {(k, v) for k, v in expect.items()}


def test_s18_second_call_skips_build(spark, sf_oracle, tmp_path, monkeypatch):
    """Verdict item 4: the persisted-IVF registry lane must pay the
    KMeans + index write once per corpus — call #2 goes straight to
    the pruned probe."""
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "cache"))
    from aws_csp_datapipeline_spark.functions import ann_index as AI
    from aws_csp_datapipeline_spark.plans.q_similarity import (
        s18_persisted_ivf_probe,
    )

    builds = []
    real = AI.build_ivf_index

    def counting(*a, **kw):
        builds.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(AI, "build_ivf_index", counting)
    r1 = {tuple(r) for r in s18_persisted_ivf_probe(spark, sf_oracle).collect()}
    r2 = {tuple(r) for r in s18_persisted_ivf_probe(spark, sf_oracle).collect()}
    assert len(builds) == 1
    assert r1 == r2 and len(r1) == 10


def test_bm25_probe_matches_inline_and_builds_once(
    spark, sf_oracle, tmp_path, monkeypatch
):
    """The persisted BM25 index's probe must EQUAL the inline t12
    scoring (same formula, same corpus scalars) and must tokenize the
    corpus exactly once across repeated probes."""
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "cache"))
    from aws_csp_datapipeline_spark.functions import bm25_index as BI
    from aws_csp_datapipeline_spark.plans.q_quality import (
        t12_bm25_topdocs,
        t27_bm25_index_probe,
    )

    builds = []
    real = BI.build_bm25_index

    def counting(*a, **kw):
        builds.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(BI, "build_bm25_index", counting)
    inline = [tuple(r) for r in t12_bm25_topdocs(spark, sf_oracle).collect()]
    p1 = [tuple(r) for r in t27_bm25_index_probe(spark, sf_oracle).collect()]
    p2 = [tuple(r) for r in t27_bm25_index_probe(spark, sf_oracle).collect()]
    assert len(builds) == 1
    assert p1 == p2 == inline and len(inline) == 10


def test_bm25_dl_empty_doc_alignment(spark, tmp_path, monkeypatch):
    """dl for empty/whitespace-only documents is 0 in the persisted
    index, matching text.token_count and the inline lane (r11 ADVICE:
    size(split('')) reads 1, silently shifting avgdl between t12 and
    t27 on any corpus holding a degenerate document)."""
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "cache"))
    from aws_csp_datapipeline_spark.functions import bm25_index as BI
    from aws_csp_datapipeline_spark.functions.text import bm25_scores

    docs = spark.createDataFrame(
        [
            (0, "table merge window table"),
            (1, ""),
            (2, "   "),
            (3, "window scan filter"),
        ],
        "doc_id long, text string",
    )
    adir = str(tmp_path / "idx")
    adir_obj = tmp_path / "idx"
    adir_obj.mkdir()
    meta = BI.build_bm25_index(docs, "text", "doc_id", adir)
    dls = {
        r["doc_id"]: r["dl"]
        for r in spark.read.parquet(os.path.join(adir, "doclens")).collect()
    }
    assert dls[1] == 0 and dls[2] == 0
    assert abs(meta["avgdl"] - (4 + 0 + 0 + 3) / 4) < 1e-12
    terms = ["table", "merge", "window"]
    inline = sorted(
        (r["doc_id"], round(r["score"], 6))
        for r in bm25_scores(docs, terms).collect()
    )
    probe = sorted(
        (r["doc_id"], round(r["score"], 6))
        for r in BI.probe_bm25_index(spark, adir, terms).collect()
    )
    assert probe == inline


def test_two_writer_race_leaves_one_winner(tmp_path, monkeypatch):
    """Two concurrent builders for the same (corpus, config) key: the
    atomic-rename publish protocol (artifact_cache.get_or_build) must
    leave exactly ONE complete published artifact, both callers must
    return the same directory, and the loser's staging dir must be
    cleaned up — the concurrent-builder claim of the module docstring,
    pinned under an actual race (r11 verdict item 7)."""
    import threading

    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "cache"))
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "t.parquet").write_bytes(b"fingerprint-input")

    barrier = threading.Barrier(2)
    results: dict[int, str] = {}
    errors: list[Exception] = []
    builds: list[str] = []

    def build(staging):
        builds.append(staging)
        barrier.wait(timeout=10)  # both builders inside build_fn at once
        with open(os.path.join(staging, "payload"), "w") as fh:
            fh.write(f"built-by-{threading.get_ident()}")

    def worker(i):
        try:
            results[i] = AC.get_or_build(
                "race", str(corpus), ["t"], {"a": 1}, build
            )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=30)
    assert not errors, errors
    assert len(builds) == 2  # both raced past the isdir check
    assert results[0] == results[1]
    # exactly one published artifact, complete payload inside
    cache = tmp_path / "cache"
    published = [p for p in os.listdir(cache) if not p.startswith(".")]
    staging_left = [p for p in os.listdir(cache) if p.startswith(".")]
    assert published == [os.path.basename(results[0])]
    assert staging_left == []  # loser's staging removed
    with open(os.path.join(results[0], "payload")) as fh:
        assert fh.read().startswith("built-by-")
