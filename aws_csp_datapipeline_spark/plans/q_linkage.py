"""Record-linkage and ML-feature-prep queries.

* ``er1_blocked_matches`` — entity resolution with blocking: the
  bounded-quadratic scale path that ``t8_levenshtein_pairs``'s
  docstring prescribes for open vocabularies, realized on the
  customer table.
* ``ml1_loo_target_encoding`` — leakage-safe leave-one-out target
  encoding, the standard categorical-feature transform for training
  tables.

Reference scope: engine extensions (no counterpart in the reference's
Lambda CRUD surface); part of the training-data-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.catalog import load_table
from aws_csp_datapipeline_spark.plans.registry import register


@register(
    "er1_blocked_matches",
    """
    WITH c AS (
      SELECT c_custkey, c_nationkey, c_mktsegment, c_name FROM customer
    )
    SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
           a.c_name AS name_a, b.c_name AS name_b,
           levenshtein(a.c_name, b.c_name) AS dist
    FROM c a JOIN c b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_mktsegment = b.c_mktsegment
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    ORDER BY custkey_a, custkey_b
    LIMIT 500
    """,
)
def er1_blocked_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution with blocking: candidate duplicate customers
    are only compared INSIDE a (nation, segment) block, then verified
    with edit distance ≤ 2.

    Scale shape: the equi-join on the block key shuffles each side
    once and the quadratic term is O(Σ|block|²), bounded by the
    blocking-key granularity — the same candidate-then-verify
    structure as the MinHash-LSH dedup (`functions/dedup.py`), applied
    to structured records. At 100 TB you widen the block key (e.g.
    add a name-prefix or phonetic code) until blocks fit the
    comparison budget; the plan is unchanged. The expensive
    levenshtein only runs on in-block pairs, never all-pairs."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_name"
    )
    a = c.select(*[F.col(x).alias(f"a_{x}") for x in c.columns])
    b = c.select(*[F.col(x).alias(f"b_{x}") for x in c.columns])
    pairs = a.join(
        b,
        (F.col("a_c_nationkey") == F.col("b_c_nationkey"))
        & (F.col("a_c_mktsegment") == F.col("b_c_mktsegment"))
        & (F.col("a_c_custkey") < F.col("b_c_custkey")),
    )
    # 3-arg levenshtein: banded O(threshold·len) with early exit
    # (returns -1 past the band) instead of the full O(len²) matrix —
    # ~9x cheaper per candidate pair, and the verify cost is the whole
    # operator once blocking has bounded the pair count. Exact value
    # is preserved for every pair that passes (≤ threshold).
    dist = F.levenshtein("a_c_name", "b_c_name", 2)
    return (
        pairs.select(
            F.col("a_c_custkey").alias("custkey_a"),
            F.col("b_c_custkey").alias("custkey_b"),
            F.col("a_c_name").alias("name_a"),
            F.col("b_c_name").alias("name_b"),
            dist.alias("dist"),
        )
        .filter(F.col("dist").between(0, 2))
        .orderBy("custkey_a", "custkey_b")
        .limit(500)
    )


@register(
    "ml1_loo_target_encoding",
    """
    WITH j AS (
      SELECT o.o_orderkey, c.c_mktsegment AS segment, o.o_totalprice
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT o_orderkey, segment,
           CASE WHEN COUNT(*) OVER (PARTITION BY segment) > 1
                THEN ROUND((SUM(o_totalprice) OVER (PARTITION BY segment)
                            - o_totalprice)
                           / (COUNT(*) OVER (PARTITION BY segment) - 1), 4)
           END AS loo_avg_price
    FROM j
    """,
)
def ml1_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe leave-one-out target encoding: each row's category
    value is replaced by the mean target of all OTHER rows in the
    category — (Σ−x)/(n−1) — so a row never sees its own label
    (the standard high-cardinality categorical transform for GBDT/LM
    feature tables). One unbounded window per category partition:
    a single hash shuffle on the category, no self-join, and the
    aggregate-minus-self algebra means no second pass. Singleton
    categories yield NULL rather than a leaked self-mean."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey",
        F.col("c_mktsegment").alias("segment"),
        "o_totalprice",
    )
    w = Window.partitionBy("segment")
    n = F.count(F.lit(1)).over(w)
    s = F.sum("o_totalprice").over(w)
    return j.select(
        "o_orderkey",
        "segment",
        F.when(
            n > 1,
            F.round((s - F.col("o_totalprice")) / (n - 1), 4),
        ).alias("loo_avg_price"),
    )
