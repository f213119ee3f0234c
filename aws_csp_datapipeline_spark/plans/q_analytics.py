"""Multi-join analytical queries (TPC-H-shaped), set operations, and
grouping extensions — the star-schema analytics the reference points
at with "Add more tables for dimensional modelling" (README.md:116).

Physical-shape policy: explicit ``F.broadcast()`` hints are applied
ONLY to true dimensions whose size is independent of the scale factor
(nation: 25 rows, region: 5 rows) and to 1-row scalar intermediates.
Every sf-scaled side (orders, part, customer, supplier, and any join
derived from them) carries NO hint: AQE (enabled in session.py) reads
the runtime size and converts to broadcast when the side is under the
threshold — which it is at test scale — and falls back to a shuffle
hash join at 100× where a forced broadcast would OOM the executors.
This is the canonical TPC-H shape: dims broadcast, fact⋈orders as a
shuffle join chosen at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.catalog import load_table
from aws_csp_datapipeline_spark.operators import relational as R
from aws_csp_datapipeline_spark.plans.registry import register


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective filters pushed to all three scans,
    then customer⋈orders⋈lineitem with no broadcast hints — customer,
    orders, and the orders-derived intermediate all grow with the
    data, so the join strategy is left to AQE: at test scale it
    broadcasts the small sides at runtime; at cluster scale the same
    plan degrades gracefully to shuffle hash joins on the join keys
    instead of OOMing on a forced broadcast."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    co = o.join(c, o.o_custkey == c.c_custkey)
    j = li.join(co, li.l_orderkey == co.o_orderkey)
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.to_date("o_orderdate").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_revenue_by_nation",
    """
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND s_nationkey = c_nationkey
    GROUP BY n_name
    """,
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: five-way star join with the local-supplier
    constraint, revenue per nation. Only the fixed-size dims carry
    broadcast hints (region: 5 rows, nation⋈region: ≤25 rows);
    customer, orders, lineitem, and supplier are all sf-scaled, so
    their join strategies are left to AQE — runtime broadcast at test
    scale, shuffle hash join at cluster scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    nr = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    cnr = c.join(F.broadcast(nr), c.c_nationkey == nr.n_nationkey)
    oc = o.join(cnr, o.o_custkey == cnr.c_custkey)
    lio = li.join(oc, li.l_orderkey == oc.o_orderkey)
    j = lio.join(
        s,
        (lio.l_suppkey == s.s_suppkey) & (s.s_nationkey == lio.c_nationkey),
    )
    return j.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


@register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top-20.
    nation broadcasts (25 rows); customer, orders, and the
    orders-derived intermediate are sf-scaled — no hints, AQE picks
    the join strategy from runtime sizes."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    oc = o.join(c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey),
                o.o_custkey == F.col("c_custkey"))
    j = li.join(oc, li.l_orderkey == oc.o_orderkey)
    return (
        j.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "g1_cube_counts",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def g1_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping (all subtotal combinations) — free in Spark
    (SURVEY.md §2.3 note), one expand + one shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "g2_rollup_sum",
    """
    SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def g2_rollup_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping (hierarchical subtotals)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@register(
    "a8_count_distinct",
    """
    SELECT COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem
    """,
)
def a8_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column COUNT DISTINCT (expand + two-phase agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@register("a9_approx_distinct", None)
def a9_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct (rows-only: approximate by
    design) — the 100-TB path where exact distinct's expand blows up
    the shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("n_parts_approx"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("n_orders_approx"),
    )


@register(
    "set1_union_distinct",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0
    """,
)
def set1_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two filtered projections."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 9000.0).select("c_custkey")
    return a.union(b).distinct()


@register(
    "set2_intersect",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
    """,
)
def set2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .intersect(c.filter(F.col("c_acctbal") > 5000.0).select("c_custkey"))
    )


@register(
    "set3_except",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
    """,
)
def set3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .exceptAll(c.filter(F.col("c_acctbal") > 5000.0).select("c_custkey"))
        .distinct()
    )


@register(
    "j3_salted_join",
    """
    SELECT o.o_orderkey, o.o_custkey, c.c_name
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderpriority = '1-URGENT'
    """,
)
def j3_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted join: the big side gets a deterministic
    salt (hash of its unique key, NOT rand() — reproducible), the
    small side explodes across all salt values; the join key becomes
    (key, salt) so one hot key spreads over N partitions. Result is
    identical to the plain join — which is exactly what the oracle
    checks."""
    n_salts = 8
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = o.withColumn("__salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(n_salts)))
    small = c.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)]))
    )
    return big.join(
        small,
        (big["o_custkey"] == small["c_custkey"]) & (big["__salt"] == small["__salt"]),
    ).select("o_orderkey", "o_custkey", "c_name")
