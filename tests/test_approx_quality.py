"""Quality checks for the approximate/iterative operators that have
no SQL oracle: recall floors against the exact path, and union-find
verification of the connected components."""

from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.plans.registry import queries


def _pairs(df):
    return {(r[0], r[1]) for r in df.collect()}


def test_lsh_ann_recall_floor(spark, sf_oracle):
    qs = queries()
    exact = _pairs(qs["s2_knn_join"](spark, sf_oracle))
    approx = _pairs(qs["s3_lsh_ann_topk"](spark, sf_oracle))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"hyperplane-LSH recall degraded: {recall:.2f}"


def test_ivf_ann_recall_floor(spark, sf_oracle):
    qs = queries()
    exact = _pairs(qs["s2_knn_join"](spark, sf_oracle))
    approx = _pairs(qs["s5_ivf_ann_topk"](spark, sf_oracle))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall degraded: {recall:.2f}"


def test_simhash_finds_jaccard_dups(spark, sf_oracle):
    """SimHash candidates must cover a reasonable share of the true
    J>=0.8 pairs (weaker signature, so a floor, not equality)."""
    qs = queries()
    true_pairs = _pairs(qs["d2_ngram_jaccard_pairs"](spark, sf_oracle))
    sim_pairs = _pairs(qs["d4_simhash_candidates"](spark, sf_oracle))
    assert len(true_pairs & sim_pairs) >= len(true_pairs) * 0.5


def test_neardup_groups_match_union_find(spark, sf_oracle):
    """Distributed min-label propagation == driver-side union-find on
    the same pair set."""
    qs = queries()
    pairs = [(r[0], r[1]) for r in qs["d2_ngram_jaccard_pairs"](spark, sf_oracle).collect()]
    got = {(r["doc"], r["group_id"]) for r in qs["d6_neardup_groups"](spark, sf_oracle).collect()}

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    exp = {(x, find(x)) for x in parent}
    assert got == exp
