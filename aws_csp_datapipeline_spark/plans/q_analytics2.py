"""Second analytics batch: outer joins, decorrelated subqueries,
HAVING, and a scalar-function battery."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.catalog import load_table
from aws_csp_datapipeline_spark.plans.registry import register


@register(
    "j4_left_outer_join",
    """
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    LEFT JOIN nation n
      ON s.s_nationkey = n.n_nationkey AND n.n_regionkey = 0
    """,
)
def j4_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER with a join-side predicate (kept in the ON clause,
    not WHERE — the classic outer-join semantics trap): unmatched
    suppliers keep NULL nation columns."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    return s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey, "left"
    ).select("s_suppkey", "s_name", "n_name")


@register(
    "j5_full_outer_agg",
    """
    WITH a AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders
               WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey),
         b AS (SELECT o_custkey, COUNT(*) AS n_low FROM orders
               WHERE o_orderpriority = '5-LOW' GROUP BY o_custkey)
    SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey,
           COALESCE(n_orders, 0) AS n_urgent, COALESCE(n_low, 0) AS n_low
    FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
    """,
)
def j5_full_outer_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates with COALESCE key merge —
    the compare-two-cohorts shape."""
    o = load_table(spark, sf_dir, "orders")
    a = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_custkey").alias("custkey_a"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    b = (
        o.filter(F.col("o_orderpriority") == "5-LOW")
        .groupBy(F.col("o_custkey").alias("custkey_b"))
        .agg(F.count(F.lit(1)).alias("n_low"))
    )
    j = a.join(b, a.custkey_a == b.custkey_b, "full")
    return j.select(
        F.coalesce("custkey_a", "custkey_b").alias("custkey"),
        F.coalesce("n_orders", F.lit(0)).alias("n_urgent"),
        F.coalesce("n_low", F.lit(0)).alias("n_low"),
    )


@register(
    "q17_below_avg_quantity",
    """
    WITH pa AS (
      SELECT l_partkey, AVG(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(SUM(l.l_extendedprice), 2) AS total_price, COUNT(*) AS n_items
    FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE l.l_quantity < 0.5 * pa.avg_qty
    """,
)
def q17_below_avg_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average)
    decorrelated into an aggregate + self-join — the form Catalyst
    itself rewrites correlated subqueries into."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    j = li.join(pa, "l_partkey").filter(
        F.col("l_quantity") < 0.5 * F.col("avg_qty")
    )
    return j.agg(
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q18_large_orders",
    """
    SELECT o_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderkey
    HAVING SUM(l_quantity) > 250
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: grouped join + HAVING (post-aggregation
    filter)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    return (
        j.groupBy("o_orderkey")
        .agg(
            F.sum("l_quantity").alias("raw_qty"),
        )
        .filter(F.col("raw_qty") > 250)
        .select("o_orderkey", F.round("raw_qty", 2).alias("total_qty"))
    )


@register(
    "f9_scalar_battery",
    """
    SELECT p_partkey,
           upper(p_name)                                   AS u,
           lower(p_brand)                                  AS l,
           substring(p_name, 1, 3)                         AS sub3,
           length(p_name)                                  AS len,
           concat(p_brand, ':', p_type)                    AS joined,
           replace(p_type, ' ', '_')                       AS underscored,
           trim('  ' || p_name || ' ')                     AS trimmed,
           COALESCE(NULLIF(p_type, 'hot'), 'HOT!')         AS coalesced,
           CASE WHEN p_size >= 25 THEN 'big'
                WHEN p_size >= 10 THEN 'mid'
                ELSE 'small' END                           AS size_class,
           CAST(FLOOR(p_retailprice) AS INT)               AS price_int,
           ROUND(p_retailprice / 10.0, 2)                  AS price_tenth,
           ABS(p_size - 25)                                AS dist25,
           CAST(GREATEST(p_size, 10) AS INTEGER)           AS floor10,
           CAST(LEAST(p_size, 40) AS INTEGER)              AS cap40
    FROM part
    """,
)
def f9_scalar_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function battery: string/case/cast/arithmetic functions
    in one pass (the long tail of §2.7), all inside codegen."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("u"),
        F.lower("p_brand").alias("l"),
        F.substring("p_name", 1, 3).alias("sub3"),
        F.length("p_name").cast("long").alias("len"),
        F.concat_ws(":", "p_brand", "p_type").alias("joined"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("underscored"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.coalesce(F.nullif("p_type", F.lit("hot")), F.lit("HOT!")).alias("coalesced"),
        F.when(F.col("p_size") >= 25, "big")
        .when(F.col("p_size") >= 10, "mid")
        .otherwise("small")
        .alias("size_class"),
        # NB: double→int CAST truncates in Spark but rounds in DuckDB;
        # FLOOR first makes the semantics explicit and portable
        F.floor("p_retailprice").cast("int").alias("price_int"),
        F.round(F.col("p_retailprice") / 10.0, 2).alias("price_tenth"),
        F.abs(F.col("p_size") - 25).alias("dist25"),
        F.greatest("p_size", F.lit(10)).alias("floor10"),
        F.least("p_size", F.lit(40)).alias("cap40"),
    )
