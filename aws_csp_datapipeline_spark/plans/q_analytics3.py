"""Third analytics batch: selective-scan aggregates (TPC-H Q6/Q19
shapes) and SCD2 dimension versioning."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.catalog import load_table
from aws_csp_datapipeline_spark.operators.scd import scd2_apply
from aws_csp_datapipeline_spark.plans.registry import register


@register(
    "q6_forecast_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective multi-predicate scan + scalar
    aggregate. Every predicate pushes to parquet (range + between);
    zero joins, zero wide shuffles — the pure scan-throughput probe."""
    li = load_table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q19_disjunctive_filter",
    """
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
    """,
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions across both join sides.
    Catalyst extracts the common per-side filters from the
    disjunction and pushes them below the join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#11")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#22")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "m8_scd2_versioning",
    """
    WITH dim AS (
      SELECT n_nationkey, n_name,
             TIMESTAMP '2020-01-01 00:00:00' AS effective_from,
             CAST(NULL AS TIMESTAMP) AS effective_to
      FROM nation
    ),
    upd AS (
      SELECT n_nationkey,
             CASE WHEN n_nationkey % 3 = 0 THEN n_name || '_V2'
                  ELSE n_name END AS n_name
      FROM nation WHERE n_nationkey < 15
    )
    SELECT d.n_nationkey, d.n_name, d.effective_from,
           CASE WHEN u.n_nationkey IS NOT NULL AND u.n_name <> d.n_name
                THEN TIMESTAMP '2024-06-01 00:00:00'
                ELSE d.effective_to END AS effective_to
    FROM dim d LEFT JOIN upd u ON d.n_nationkey = u.n_nationkey
    UNION ALL
    SELECT u.n_nationkey, u.n_name,
           TIMESTAMP '2024-06-01 00:00:00' AS effective_from,
           CAST(NULL AS TIMESTAMP) AS effective_to
    FROM upd u JOIN dim d ON d.n_nationkey = u.n_nationkey
    WHERE u.n_name <> d.n_name AND d.effective_to IS NULL
    """,
)
def m8_scd2_versioning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 versioned upsert over a nation-derived dimension:
    keys 0,3,6,9,12 change name → current rows close at the change
    timestamp and new open versions append; unchanged keys produce no
    spurious versions."""
    n = load_table(spark, sf_dir, "nation")
    dim = n.select(
        "n_nationkey",
        "n_name",
        F.lit("2020-01-01").cast("timestamp").alias("effective_from"),
        F.lit(None).cast("timestamp").alias("effective_to"),
    )
    updates = n.filter(F.col("n_nationkey") < 15).select(
        "n_nationkey",
        F.when(
            F.col("n_nationkey") % 3 == 0, F.concat("n_name", F.lit("_V2"))
        )
        .otherwise(F.col("n_name"))
        .alias("n_name"),
    )
    return scd2_apply(
        dim, updates, key="n_nationkey", attrs=["n_name"],
        change_ts="2024-06-01",
    )
