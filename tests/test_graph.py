"""Graph operators: PageRank pinned against numpy power iteration on a
known small graph; triangle count and degree histogram on hand-checked
fixtures (the registry oracle covers them at sf0.01)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.operators import graph as G


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangle_count_known(spark):
    # K4 has 4 triangles; appending a pendant edge adds none.
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    out = G.triangle_count(_edges_df(spark, k4 + [(3, 9)])).collect()
    assert out[0]["n_triangles"] == 4


def test_degree_histogram_known(spark):
    # Star S3: center degree 3, three leaves degree 1.
    out = G.degree_histogram(
        _edges_df(spark, [(0, 1), (0, 2), (0, 3)])
    ).collect()
    hist = {r["degree"]: r["n_nodes"] for r in out}
    assert hist == {3: 1, 1: 3}


def test_pagerank_matches_power_iteration(spark):
    # Undirected path 0-1-2-3 plus chord 1-3: asymmetric enough that
    # ranks differ per node.
    pairs = [(0, 1), (1, 2), (2, 3), (1, 3)]
    d, iters = 0.85, 12

    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for s, t in pairs:
        A[idx[t], idx[s]] = 1.0
        A[idx[s], idx[t]] = 1.0
    M = A / A.sum(axis=0)  # column-stochastic walk matrix
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r = (1 - d) / n + d * (M @ r)

    got = {
        row["node"]: row["pr"]
        for row in G.pagerank(
            _edges_df(spark, pairs), damping=d, iterations=iters
        ).collect()
    }
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-9, (v, got[v], r[idx[v]])


def test_pagerank_sums_to_one(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (1, 3), (4, 0)]
    total = (
        G.pagerank(_edges_df(spark, pairs), iterations=8)
        .agg(F.sum("pr").alias("s"))
        .collect()[0]["s"]
    )
    assert abs(total - 1.0) < 1e-9


def test_kcore_matches_python_peeling(spark, sf_oracle):
    """Exact check of the distributed peeling against a sequential
    reference on the same edge list."""
    from collections import defaultdict

    from aws_csp_datapipeline_spark.operators import graph as G
    from aws_csp_datapipeline_spark.plans.q_graph import _edges

    edges = [(r.src, r.dst) for r in _edges(spark, sf_oracle).collect()]
    k = 3
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
        adj[d].add(s)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    expected = {(n, len(nbrs)) for n, nbrs in adj.items()}

    got = {
        (r["node"], r["degree"])
        for r in G.kcore(_edges(spark, sf_oracle), k=k).collect()
    }
    assert got == expected


def test_pagerank_oracle_at_nontrivial_scale(spark):
    """The sf0.01 co-supply graph is complete (uniform ranks), so the
    registry oracle run only checks mass conservation there. This
    pins the non-trivial case: at sf0.1 degrees range 864-945 and the
    rank distribution is non-uniform — compare Spark vs the unrolled
    12-iteration DuckDB oracle end to end."""
    from aws_csp_datapipeline_spark.plans.q_graph import gr3_pagerank_top
    from aws_csp_datapipeline_spark.plans.registry import specs
    from tests.oracle import compare

    sf01 = "/root/testdata/sf0.1"
    spec = {s.name: s for s in specs()}["gr3_pagerank_top"]
    compare(spec.fn(spark, sf01), spec.oracle, sf01)


def test_label_propagation_two_cliques(spark):
    """LPA contract on a planted graph: two disconnected triangles
    each converge to their min node's label within 3 synchronous
    rounds (round 1: min-tie adoption; round 2-3: majority settles),
    and labels never cross components."""
    from aws_csp_datapipeline_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12)],
        "src long, dst long",
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(edges, iterations=3).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_triangle_count_degree_ordered_matches_bruteforce(spark):
    """The degree-ordered rewrite must count exactly what brute force
    counts on an irregular graph with hubs, ties, and pendant edges
    (ties exercise the (degree, id) rank's id tie-break)."""
    import itertools
    import random

    rng = random.Random(7)
    nodes = list(range(24))
    pairs = sorted(
        {(a, b) for a in nodes for b in nodes if a < b and rng.random() < 0.3}
    )
    adj = set(pairs)
    want = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in adj and (b, c) in adj and (a, c) in adj
    )
    got = G.triangle_count(_edges_df(spark, pairs)).collect()[0]["n_triangles"]
    assert got == want


def test_triangle_estimate_exact_at_p1_and_unbiased_shape(spark):
    """p_mille=1000 keeps every edge: the estimate must EQUAL the
    exact count (scale 1). At p=0.5 on a triangle-rich graph the
    estimate must land within sampling error and scale by exactly
    1/p^3 = 8 in integer arithmetic."""
    k12 = [(a, b) for a in range(12) for b in range(12) if a < b]
    exact = G.triangle_count(_edges_df(spark, k12)).collect()[0][
        "n_triangles"
    ]
    assert exact == 220  # C(12,3)
    full = G.triangle_count_estimate(
        _edges_df(spark, k12), p_mille=1000
    ).collect()[0]
    assert full["est_triangles"] == exact == full["n_sampled_triangles"]
    half = G.triangle_count_estimate(
        _edges_df(spark, k12), p_mille=500
    ).collect()[0]
    assert half["est_triangles"] == half["n_sampled_triangles"] * 8
    # E[sampled] = 220/8 = 27.5; allow a generous deterministic window
    assert 5 <= half["n_sampled_triangles"] <= 80


def test_triangle_estimate_rejects_bad_p_mille(spark):
    """p_mille outside [1, 1000] is an error, not a silent
    underestimate (r11 ADVICE: 0 raised ZeroDivisionError from the
    integer-scale branch; 1001 kept every edge yet scaled down)."""
    df = _edges_df(spark, [(0, 1), (1, 2), (0, 2)])
    for bad in (0, -1, 1001):
        with pytest.raises(ValueError, match="p_mille"):
            G.triangle_count_estimate(df, p_mille=bad)


def test_neighbor_jaccard_estimate_tracks_exact(spark):
    """gr9's sketch vs gr6's exact arithmetic on a known graph: two
    hubs with 90%-overlapping neighbor sets must surface as the top
    candidate pair with an estimate within the k=24 sampling band of
    the true Jaccard; and a high-k signature (k=96) must tighten
    toward it (consistency, the gr8-style estimator contract)."""
    # hubs 1000 and 1001 share neighbors 0..17, each has 2 private ones
    shared = list(range(18))
    na = shared + [100, 101]
    nb = shared + [200, 201]
    pairs = [(min(1000, x), max(1000, x)) for x in na]
    pairs += [(min(1001, x), max(1001, x)) for x in nb]
    df = _edges_df(spark, pairs)
    true_j = 18 / 22  # |∩| / |∪| ≈ 0.818
    for k, bands, r, tol in ((24, 8, 3, 0.25), (96, 8, 3, 0.15)):
        est = G.neighbor_jaccard_estimate(
            df, k=k, bands=bands, rows_per_band=r, hash="portable"
        )
        rows = {
            (r_["node_a"], r_["node_b"]): r_["est_jaccard"]
            for r_ in est.collect()
        }
        assert (1000, 1001) in rows, (k, sorted(rows))
        assert abs(rows[(1000, 1001)] - true_j) <= tol, (k, rows)


def test_neighbor_jaccard_estimate_families_agree_on_candidates(spark):
    """The xxhash64 (in-engine) and portable (oracle) families are
    different hash functions but the SAME architecture: on a graph
    with one overwhelming near-duplicate pair both must surface it."""
    shared = list(range(12))
    pairs = [(min(50, x), max(50, x)) for x in shared]
    pairs += [(min(51, x), max(51, x)) for x in shared]  # identical sets
    df = _edges_df(spark, pairs)
    for fam in ("xxhash64", "portable"):
        est = G.neighbor_jaccard_estimate(df, hash=fam)
        top = {
            (r_["node_a"], r_["node_b"]): r_["est_jaccard"]
            for r_ in est.collect()
        }
        # identical neighbor sets -> identical signatures -> est 1.0
        assert top.get((50, 51)) == 1.0, (fam, top)


def test_neighbor_jaccard_estimate_rejects_short_signature(spark):
    df = _edges_df(spark, [(0, 1)])
    with pytest.raises(ValueError, match="slots"):
        G.neighbor_jaccard_estimate(df, k=8, bands=8, rows_per_band=3)


def test_pin_edges_disk_only_storage(spark):
    """The iterative lanes' edge-scale snapshots must be DISK_ONLY:
    the default deserialized on-heap localCheckpoint OOMed a 48 g
    heap at sf100 when 32 tasks unrolled multi-GiB partitions
    concurrently (SCALE.md "gr3/gr5 at sf100"). Pin the storage level
    so a refactor can't silently reintroduce the heap path."""
    df = _edges_df(spark, [(0, 1), (1, 2)])
    pinned = G._pin_edges(df)
    assert pinned.count() == 2
    # Dataset.storageLevel only reports CacheManager registrations,
    # not checkpoint blocks — read the block manager's view instead.
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    levels = {
        str(i.storageLevel().description())
        for i in infos
        if i.diskSize() > 0 or i.memSize() > 0
    }
    assert any(
        "Disk" in d and "Memory" not in d for d in levels
    ), levels


def test_pin_edges_reliable_checkpoint_mode(spark, tmp_path, monkeypatch):
    """SPARK_GRAFT_CHECKPOINT_DIR flips the iterative snapshots to
    RELIABLE checkpoints (replayable after executor loss — the
    multi-node regime). Assert the checkpoint files actually land in
    the directory and the data survives the round trip."""
    ckdir = str(tmp_path / "ck")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckdir)
    df = _edges_df(spark, [(0, 1), (1, 2), (2, 3)])
    pinned = G._pin_edges(df)
    assert pinned.count() == 3
    import glob

    files = glob.glob(ckdir + "/**", recursive=True)
    assert any("rdd-" in f for f in files), files
    # pagerank still converges through the reliable path
    pr = G.pagerank(df, iterations=2)
    total = sum(r["pr"] for r in pr.collect())
    assert abs(total - 1.0) < 1e-6
    # Leaving the session's checkpoint dir set is benign: every other
    # caller goes through the env gate, which monkeypatch restores.
