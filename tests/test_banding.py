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
