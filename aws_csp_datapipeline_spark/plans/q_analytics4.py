"""Fourth analytics batch: ratio aggregates, date-part extraction,
HAVING against scalar subqueries, NOT IN, conditional-sum shapes —
the remaining TPC-H query silhouettes expressible on this schema."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.catalog import load_table
from aws_csp_datapipeline_spark.plans.registry import register


@register(
    "q4_priority_with_exists",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o_orderpriority
    """,
)
def q4_priority_with_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: date-range filter + EXISTS against the fact
    table, grouped — semi-join where the EXISTS side is the big one."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    hit = o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
    return hit.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "q7_volume_by_year",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS o_year, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS volume
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE year(o_orderdate) BETWEEN 1996 AND 1998
    GROUP BY 1, 2
    """,
)
def q7_volume_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume by (year, nation) — date-part
    extraction as a grouping key. Only nation (25 rows) carries a
    broadcast hint; customer/orders sides are sf-scaled so AQE picks
    their join strategy from runtime sizes."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").between(1996, 1998)
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cn = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    oc = o.join(cn, o.o_custkey == cn.c_custkey)
    j = li.join(oc, li.l_orderkey == oc.o_orderkey)
    return (
        j.groupBy(
            F.year("o_orderdate").cast("int").alias("o_year"), F.col("n_name")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("volume")
        )
    )


@register(
    "q8_market_share",
    """
    WITH vol AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             SUM(l_extendedprice * (1 - l_discount)) AS total,
             SUM(CASE WHEN n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END) AS nat
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1
    )
    SELECT o_year, ROUND(nat / total, 4) AS mkt_share FROM vol
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: market share = conditional-sum ratio per year
    (single pass; the CASE folds the filter into the aggregate).
    Broadcast hint on nation only; sf-scaled sides are AQE's call."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cn = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    oc = o.join(cn, o.o_custkey == cn.c_custkey)
    j = li.join(oc, li.l_orderkey == oc.o_orderkey)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    vol = j.groupBy(F.year("o_orderdate").cast("int").alias("o_year")).agg(
        F.sum(rev).alias("total"),
        F.sum(F.when(F.col("n_name") == "NATION_3", rev).otherwise(0.0)).alias("nat"),
    )
    return vol.select(
        "o_year", F.round(F.col("nat") / F.col("total"), 4).alias("mkt_share")
    )


@register(
    "q11_important_stock",
    """
    WITH scored AS (
      SELECT s_nationkey, SUM(s_acctbal) AS bal
      FROM supplier GROUP BY s_nationkey
    )
    SELECT s_nationkey, ROUND(bal, 2) AS bal FROM scored
    WHERE bal > (SELECT SUM(s_acctbal) * 0.05 FROM supplier)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups whose share exceeds a fraction of the
    global total — HAVING against a scalar subquery, done as a
    broadcast 1-row cross join."""
    s = load_table(spark, sf_dir, "supplier")
    grouped = s.groupBy("s_nationkey").agg(F.sum("s_acctbal").alias("bal"))
    total = s.agg((F.sum("s_acctbal") * 0.05).alias("__thresh"))
    return (
        grouped.crossJoin(F.broadcast(total))
        .filter(F.col("bal") > F.col("__thresh"))
        .select("s_nationkey", F.round("bal", 2).alias("bal"))
    )


@register(
    "q12_two_case_sums",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_linestatus
    """,
)
def q12_two_case_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: two conditional counts in one pass (the
    CASE-pivot idiom). lineitem⋈orders is a fact-to-fact join on
    the order key — both sides sf-scaled, so no broadcast hint:
    AQE picks shuffle hash join at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_linestatus").agg(
        F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_count"),
        F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_count"),
    )


@register(
    "q14_promo_ratio",
    """
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO' OR p_name LIKE 'red%'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage-of-total scalar (conditional sum /
    total sum in one aggregate). part grows with sf (sf×200k rows) —
    no broadcast hint; AQE decides from runtime size."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = (F.col("p_type") == "PROMO") | F.col("p_name").like("red%")
    return j.agg(
        F.round(
            100.0 * F.sum(F.when(promo, rev).otherwise(0.0)) / F.sum(rev), 4
        ).alias("promo_pct")
    )


@register(
    "a12_regression_stats",
    """
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 4) + 0        AS r,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) + 0  AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) + 0 AS icept,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) + 0  AS cov,
           ROUND(stddev_samp(l_quantity), 4)                  AS sd_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a12_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: correlation, least-squares slope and
    intercept, sample covariance and stddev per group — all native
    single-pass aggregates (Welford-style merge), no second scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("r"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("icept"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cov"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
    )


@register(
    "q16_not_in_subquery",
    """
    SELECT p_brand, COUNT(DISTINCT p_type) AS n_types
    FROM part
    WHERE p_size NOT IN (SELECT DISTINCT p_size FROM part WHERE p_size < 5)
    GROUP BY p_brand
    """,
)
def q16_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN against a subquery (anti-join on the
    distinct value set) + grouped distinct count."""
    p = load_table(spark, sf_dir, "part")
    small_sizes = p.filter(F.col("p_size") < 5).select("p_size").distinct()
    kept = p.join(small_sizes, "p_size", "left_anti")
    return kept.groupBy("p_brand").agg(F.countDistinct("p_type").alias("n_types"))
