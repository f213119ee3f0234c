"""The half-cost LSH banding lane (k=30, b=10, r=3) and its
governance gate, ``dedup.banding_recommendation``.

The knob trades banding-join cost for a weaker boundary bound:
P(candidate | J=0.8) drops from 1-8e-8 (r=2) to 1-7.7e-4 (r=3), so
whether the downgrade is safe depends on how much true-pair mass a
corpus has NEAR the threshold. These tests plant both corpus shapes:

* boundary-DENSE — hundreds of pairs at exactly J=0.8, where the
  per-pair miss probability (1-J^r)^b ≈ 7.6e-4 accumulates past the
  miss budget → the recommendation must refuse the downgrade;
* boundary-SPARSE — duplicates are all J=1 exact replicas, the miss
  mass is exactly 0 → 'half-cost' is recommended, and the half-cost
  path's output must equal the exact n-gram Jaccard pair set
  (the oracle that defines correctness for the whole d3 family).
"""

from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.functions import dedup as D


def _boundary_dense_corpus(spark, n_pairs=800):
    """n_pairs document pairs at exactly J = 0.8: doc A has 12 unique
    words -> 10 word-3-gram shingles; doc B is A's first 10 words ->
    8 shingles, every one shared -> J = 8/10 = 0.8 exactly. Words are
    unique per pair so pairs never cross-match."""
    rows = []
    for i in range(n_pairs):
        words = [f"p{i}w{j}" for j in range(12)]
        rows.append(Row(doc_id=2 * i, text=" ".join(words)))
        rows.append(Row(doc_id=2 * i + 1, text=" ".join(words[:10])))
    return spark.createDataFrame(rows)


def _boundary_sparse_corpus(spark, n_pairs=30, n_singletons=40):
    """Exact-replica pairs (J = 1, zero miss mass) plus unrelated
    singletons."""
    rows = []
    for i in range(n_pairs):
        text = " ".join(f"s{i}w{j}" for j in range(12))
        rows.append(Row(doc_id=2 * i, text=text))
        rows.append(Row(doc_id=2 * i + 1, text=text))
    base = 2 * n_pairs
    for i in range(n_singletons):
        rows.append(
            Row(doc_id=base + i, text=" ".join(f"u{i}w{j}" for j in range(12)))
        )
    return spark.createDataFrame(rows)


def test_dense_corpus_j_is_exactly_boundary(spark):
    d = _boundary_dense_corpus(spark, n_pairs=5)
    pairs = D.minhash_lsh_pairs(d, "text", "doc_id", threshold=0.8).collect()
    assert len(pairs) == 5
    assert all(abs(r["jaccard"] - 0.8) < 1e-9 for r in pairs)


def test_recommendation_refuses_downgrade_on_boundary_dense_corpus(spark):
    """800 pairs x (1 - 0.8^3)^10 ≈ 0.604 expected lost pairs > the
    0.5 budget -> the default banding must be kept."""
    d = _boundary_dense_corpus(spark, n_pairs=800)
    pairs = D.minhash_lsh_pairs(d, "text", "doc_id", threshold=0.8)
    rec = D.banding_recommendation(pairs).collect()[0]
    assert rec["recommended_banding"] == "default"
    assert rec["n_pairs"] == 800
    assert rec["n_boundary"] == 800
    assert 0.55 < rec["expected_misses"] < 0.65  # 800 * 7.55e-4


def test_recommendation_allows_downgrade_on_boundary_sparse_corpus(spark):
    d = _boundary_sparse_corpus(spark)
    pairs = D.minhash_lsh_pairs(d, "text", "doc_id", threshold=0.8)
    rec = D.banding_recommendation(pairs).collect()[0]
    assert rec["recommended_banding"] == "half-cost"
    assert rec["n_pairs"] == 30
    assert rec["expected_misses"] == 0.0  # J = 1 pairs cannot be missed


def test_half_cost_path_matches_exact_oracle_on_sparse_corpus(spark):
    """On the corpus shape the recommendation approves, the half-cost
    lane must reproduce the exact n-gram Jaccard pair set."""
    d = _boundary_sparse_corpus(spark)
    exact = sorted(
        map(
            tuple,
            D.ngram_jaccard_pairs(d, "text", "doc_id", threshold=0.8).collect(),
        )
    )
    half = sorted(
        map(
            tuple,
            D.minhash_lsh_pairs(
                d, "text", "doc_id", threshold=0.8, banding="half-cost"
            ).collect(),
        )
    )
    assert len(exact) == 30
    assert half == exact


def test_half_cost_threads_through_plan_entries(spark, sf_smoke):
    """The d3 plan entry's banding= opt-in produces the same pair set
    as the default on the (boundary-sparse) test corpus — the attested
    d3 ≡ d2 equivalence survives the knob."""
    from aws_csp_datapipeline_spark.plans.q_dedup import d3_minhash_lsh_pairs

    default = sorted(map(tuple, d3_minhash_lsh_pairs(spark, sf_smoke).collect()))
    half = sorted(
        map(
            tuple,
            d3_minhash_lsh_pairs(spark, sf_smoke, banding="half-cost").collect(),
        )
    )
    assert half == default and len(default) > 0


def test_unknown_banding_rejected(spark):
    import pytest

    d = _boundary_sparse_corpus(spark, n_pairs=1, n_singletons=0)
    with pytest.raises(ValueError, match="banding"):
        D.minhash_lsh_pairs(d, "text", "doc_id", banding="cheap")


def test_min_band_hits_math():
    """The hit-count prefilter keeps the documented miss budget: the
    returned m is the largest with P(Binom(bands, thr^r) < m) <= 5e-5,
    the same risk class as the signature est_prefilter bound."""
    from math import comb

    from aws_csp_datapipeline_spark.functions.dedup import _min_band_hits

    assert _min_band_hits(0.8, 2, 16) == 3
    # half-cost banding (r=3) is already recall-tight: no extra filter
    assert _min_band_hits(0.8, 3, 10) == 1
    # higher thresholds admit a sharper cut
    assert _min_band_hits(0.9, 2, 16) == 6
    for thr, r, b in [(0.8, 2, 16), (0.9, 2, 16), (0.7, 2, 16), (0.8, 3, 10)]:
        m, p = _min_band_hits(thr, r, b), thr**r
        # m == 1 is "collided at all" — the filter adds nothing beyond
        # banding's own bound, so the budget only constrains m > 1
        if m > 1:
            miss = sum(comb(b, i) * p**i * (1 - p) ** (b - i) for i in range(m))
            assert miss <= 5e-5, (thr, r, b, m, miss)
            over = sum(
                comb(b, i) * p**i * (1 - p) ** (b - i) for i in range(m + 1)
            )
            assert over > 5e-5, f"m not maximal: {(thr, r, b, m)}"


def test_true_pairs_survive_mid_j_boilerplate_mass(spark):
    """The sf100 lesson as a planted corpus: a boilerplate mass whose
    pairwise J (~0.09) sits far below threshold but collides in >= 1
    band often enough to flood the candidate set. The hit-count
    prefilter prunes that mass BEFORE the wide joins; the true J=1
    pairs embedded in it must all survive, and nothing below
    threshold may appear."""
    from pyspark.sql import Row

    from aws_csp_datapipeline_spark.functions import dedup as D

    boiler = "b1 b2 b3 b4 b5"
    rows = [
        Row(doc_id=i, text=f"{boiler} " + " ".join(f"m{i}w{j}" for j in range(15)))
        for i in range(200)
    ]
    # 10 exact-dup pairs planted inside the mass
    for i in range(10):
        text = f"{boiler} " + " ".join(f"d{i}w{j}" for j in range(15))
        rows.append(Row(doc_id=1000 + 2 * i, text=text))
        rows.append(Row(doc_id=1000 + 2 * i + 1, text=text))
    df = spark.createDataFrame(rows)
    got = D.minhash_lsh_pairs(df, "text", "doc_id", threshold=0.8).collect()
    assert sorted((r["doc_a"], r["doc_b"]) for r in got) == [
        (1000 + 2 * i, 1000 + 2 * i + 1) for i in range(10)
    ]
    assert all(r["jaccard"] == 1.0 for r in got)


def test_bucket_cap_preserves_exact_dup_pairs(spark):
    """An exact-dup pile deeper than the cap: 40 identical docs form a
    40-deep bucket in EVERY band, far over a cap of 8 — without the
    signature-identical collapse the cap would erase all C(40,2)
    pairs. The collapse bands one rep and re-expands, so every pair
    must emit."""
    from pyspark.sql import Row

    text = " ".join(f"e w{j}" for j in range(12))
    rows = [Row(doc_id=i, text=text) for i in range(40)]
    rows += [Row(doc_id=100 + i,
                 text=" ".join(f"u{i}w{j}" for j in range(12)))
             for i in range(20)]
    df = spark.createDataFrame(rows)
    got = D.minhash_lsh_pairs(df, "text", "doc_id", threshold=0.8,
                              bucket_cap=8).collect()
    assert len(got) == 40 * 39 // 2
    assert all(r["jaccard"] == 1.0 for r in got)


def test_bucket_cap_output_matches_uncapped_on_test_corpus(spark, sf_smoke):
    """At attested scales the cap is gated OFF by auto; forcing it on
    must still produce the identical pair set (the cap only skips
    boilerplate-degenerate buckets, none of which exist here)."""
    d = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    base = sorted(map(tuple,
        D.minhash_lsh_pairs(d, "text", "doc_id", bucket_cap=None).collect()))
    capped = sorted(map(tuple,
        D.minhash_lsh_pairs(d, "text", "doc_id", bucket_cap=64).collect()))
    assert capped == base and len(base) > 0


def test_bucket_cap_skips_megabuckets_but_keeps_private_pairs(spark):
    """The sf100 shape in miniature: a high-overlap mass (J ~ 0.45,
    sub-threshold) whose shared-min buckets exceed the cap, with true
    exact pairs planted in it. Capping may only remove candidates
    from over-cap buckets; the true pairs collide in private buckets
    too and must survive."""
    from pyspark.sql import Row

    shared = " ".join(f"s{j}" for j in range(10))
    rows = [Row(doc_id=i, text=f"{shared} m{i}a m{i}b m{i}c m{i}d m{i}e")
            for i in range(120)]
    for i in range(5):
        text = " ".join(f"p{i}w{j}" for j in range(14))
        rows.append(Row(doc_id=1000 + 2 * i, text=text))
        rows.append(Row(doc_id=1000 + 2 * i + 1, text=text))
    df = spark.createDataFrame(rows)
    got = D.minhash_lsh_pairs(df, "text", "doc_id", threshold=0.8,
                              bucket_cap=16).collect()
    assert sorted((r["doc_a"], r["doc_b"]) for r in got) == [
        (1000 + 2 * i, 1000 + 2 * i + 1) for i in range(5)
    ]
