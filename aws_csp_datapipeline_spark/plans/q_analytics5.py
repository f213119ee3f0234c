"""Fifth analytics batch: the last TPC-H silhouettes this schema can
express — profit rollup across a 4-way star (Q9), argmax-by-scalar-
subquery (Q15), and IN-against-aggregated-subquery (Q20)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.catalog import load_table
from aws_csp_datapipeline_spark.plans.registry import register


@register(
    "q9_profit_by_nation_year",
    """
    SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)
                     - 0.4 * p_retailprice * l_quantity), 2) AS profit
    FROM lineitem
    JOIN part     ON l_partkey  = p_partkey
    JOIN supplier ON l_suppkey  = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus a cost proxy) per
    (supplier nation, order year) across a 4-way star. The selective
    part filter is applied BEFORE the join so the fact rows that
    survive are only those touching '%red%' parts. Only nation (25
    rows) is hint-broadcast; part, supplier, and orders all grow with
    sf, so their join strategies are AQE's call — runtime broadcast
    at test scale, shuffle hash joins keyed on partkey / suppkey /
    orderkey at cluster scale. The final shuffle is the tiny
    (nation, year) grouped result."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    j = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(sn, F.col("l_suppkey") == sn.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.4 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return j.groupBy(
        "n_name", F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(F.round(F.sum(profit), 2).alias("profit"))


@register(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, ROUND(total_rev, 2) AS total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly
    revenue — a grouped aggregate compared against its own scalar MAX
    (the reference's MAX high-water idiom, lambda_function.py:299,
    lifted from keys to measures). The scalar max is a 1-row
    broadcast cross join, so the plan is two passes over the small
    grouped result, not a re-scan of lineitem."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev")
    )
    top = rev.agg(F.max("total_rev").alias("__max_rev"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("__max_rev"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.round("total_rev", 2).alias("total_rev"))
    )


@register(
    "q20_excess_shippers",
    """
    SELECT s_suppkey, s_name, s_nationkey FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%blue%'
      GROUP BY l_suppkey
      HAVING SUM(l_quantity) > 2000
    )
    """,
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN against an aggregated subquery — suppliers
    who shipped more than a threshold quantity of the filtered parts.
    Done as filter -> part join -> grouped HAVING -> left-semi back
    to supplier. part and the HAVING survivors are both bounded by
    sf-scaled tables, so neither is hint-broadcast — AQE broadcasts
    the (small at runtime) semi-join probe side itself."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%"))
    shipped = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 2000)
    )
    s = load_table(spark, sf_dir, "supplier")
    return s.join(
        shipped, s.s_suppkey == shipped.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name", "s_nationkey")


@register(
    "g4_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS cnt
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def g4_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind cube/rollup):
    detail, per-flag subtotal, and grand total in one pass — Spark
    expands the sets in a single Expand + aggregate, one shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "x4_gap_fill",
    """
    WITH m AS (
      SELECT o_orderpriority, date_trunc('month', o_orderdate) AS month,
             ROUND(SUM(o_totalprice), 2) AS rev
      FROM orders WHERE o_totalprice > 450000 GROUP BY 1, 2
    ),
    span AS (
      SELECT o_orderpriority,
             min(date_trunc('month', o_orderdate)) AS lo,
             max(date_trunc('month', o_orderdate)) AS hi
      FROM orders WHERE o_totalprice > 450000 GROUP BY 1
    ),
    grid AS (
      SELECT o_orderpriority,
             unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month
      FROM span
    )
    SELECT g.o_orderpriority, CAST(g.month AS DATE) AS month,
           COALESCE(m.rev, 0.0) AS rev
    FROM grid g
    LEFT JOIN m ON g.o_orderpriority = m.o_orderpriority AND g.month = m.month
    """,
)
def x4_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: per-group monthly revenue on a dense
    month grid (sequence + explode between each group's min and max
    month), missing months zero-filled via left join. The grid is
    |groups| x |months| — tiny at any fact-table scale, so it
    broadcasts; the fact side aggregates down before joining."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    month = F.date_trunc("month", F.col("o_orderdate"))
    monthly = o.groupBy("o_orderpriority", month.alias("month")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    span = o.groupBy("o_orderpriority").agg(
        F.min(month).alias("lo"), F.max(month).alias("hi")
    )
    grid = span.select(
        "o_orderpriority",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 month"))).alias("month"),
    )
    return (
        F.broadcast(grid)
        .join(monthly, ["o_orderpriority", "month"], "left")
        .select(
            "o_orderpriority",
            F.col("month").cast("date").alias("month"),
            F.coalesce("rev", F.lit(0.0)).alias("rev"),
        )
    )


@register(
    "h1_histogram",
    """
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bin,
           CAST(FLOOR(o_totalprice / 50000) * 50000 AS DOUBLE) AS bin_lo,
           COUNT(*) AS n
    FROM orders GROUP BY 1, 2
    """,
)
def h1_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (the profiling/EDA primitive): bin id by
    FLOOR division — FLOOR on both engines so double→int truncation
    semantics can't diverge. Partial-aggregates map-side; the shuffle
    carries only |bins| rows."""
    o = load_table(spark, sf_dir, "orders")
    bin_ = F.floor(F.col("o_totalprice") / 50000)
    return o.groupBy(
        bin_.cast("long").alias("bin"),
        (bin_ * 50000).cast("double").alias("bin_lo"),
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "f11_unpivot",
    """
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
           ROUND(l_quantity, 4) AS val
    FROM lineitem WHERE l_orderkey <= 300
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', ROUND(l_extendedprice, 4)
    FROM lineitem WHERE l_orderkey <= 300
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', ROUND(l_discount, 4)
    FROM lineitem WHERE l_orderkey <= 300
    """,
)
def f11_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (unpivot/melt): one row per (id, metric).
    Spark plans this as a single Expand over one scan — NOT the
    oracle's three scans; same result, one pass."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 300)
    wide = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("extendedprice"),
        F.col("l_discount").alias("discount"),
    )
    out = wide.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "extendedprice", "discount"],
        "metric",
        "val",
    )
    return out.withColumn("val", F.round("val", 4))


@register(
    "a13_bool_aggs",
    """
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000)   AS all_over_1k,
           bool_or(o_totalprice > 450000)  AS any_over_450k,
           CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_finished
    FROM orders GROUP BY o_orderpriority
    """,
)
def a13_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean-aggregate battery: ALL/ANY predicates and conditional
    count per group — single-pass native aggregates."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 450000).alias("any_over_450k"),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
    )


@register(
    "j6_null_safe_join",
    """
    WITH a AS (SELECT n_nationkey, nullif(n_regionkey, 2) AS rk, n_name
               FROM nation),
    b AS (SELECT nullif(r_regionkey, 2) AS rk, r_name FROM region)
    SELECT a.n_nationkey, a.n_name, b.r_name
    FROM a JOIN b ON a.rk IS NOT DISTINCT FROM b.rk
    """,
)
def j6_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of dropping — still a hash join (the
    null bucket is just another key), not a nested loop."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    a = n.select(
        "n_nationkey", F.nullif(F.col("n_regionkey"), F.lit(2)).alias("rk"), "n_name"
    )
    b = r.select(F.nullif(F.col("r_regionkey"), F.lit(2)).alias("rk"), "r_name")
    return a.join(F.broadcast(b), a.rk.eqNullSafe(b.rk)).select(
        "n_nationkey", "n_name", "r_name"
    )


@register(
    "a14_pivot_sum",
    """
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS "F",
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS "O"
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a14_pivot_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with a SUM measure (explicit pivot values → single pass,
    no distinct-values pre-job); absent cells stay NULL like the
    CASE-without-ELSE oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return out


@register(
    "a16_mode_per_group",
    """
    SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt FROM (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    ) WHERE rn = 1
    """,
)
def a16_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with a deterministic tie-break (smallest value)
    — unlike the built-in ``mode()``, whose tie winner is
    partitioning-dependent. Two-level shape: the groupBy count is
    partial-aggregated (raw rows never shuffle), and the ranking
    window runs over |status|x|priority| rows — constant-size at any
    corpus scale."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("cnt"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "cnt",
        )
    )


@register("a17_hll_sketch_rollup", None)
def a17_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (rows-only: approximate by design):
    one Apache DataSketches HLL sketch per (day) over user ids, then
    per-month distinct-user estimates by UNIONING the day sketches —
    never re-scanning the raw events. This is the incremental pattern
    that maintains distinct counts over a 100-TB event history: daily
    partials are tiny, persistable, and re-aggregable to any coarser
    grain. Estimate error is pinned by tests/test_approx_quality.py."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
    )
    monthly = (
        daily.groupBy(F.date_trunc("month", "day").alias("month"))
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select(
            F.date_format("month", "yyyy-MM").alias("month"),
            F.hll_sketch_estimate("sk").alias("n_users_approx"),
        )
    )
    return monthly


@register(
    "a19_winsorized_mean",
    """
    WITH bounds AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.05) AS p05,
             quantile_cont(o_totalprice, 0.95) AS p95
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
           COUNT(*) AS n,
           ROUND(AVG(greatest(least(o.o_totalprice, b.p95), b.p05)), 4)
             AS winsorized_mean
    FROM orders o JOIN bounds b USING (o_orderpriority)
    GROUP BY o.o_orderpriority
    """,
)
def a19_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (5%/95%-clipped) mean per group — the outlier-
    robust aggregate a metrics pipeline uses instead of a raw AVG.
    Exact interpolated percentiles per group (constant-size result)
    broadcast back onto the fact rows; clipping keeps boundary-equal
    values unchanged in both engines, so the oracle is exact."""
    o = load_table(spark, sf_dir, "orders")
    pct = F.percentile("o_totalprice", F.array(F.lit(0.05), F.lit(0.95)))
    bounds = o.groupBy("o_orderpriority").agg(
        pct.getItem(0).alias("p05"), pct.getItem(1).alias("p95")
    )
    joined = o.join(F.broadcast(bounds), "o_orderpriority")
    clipped = F.greatest(F.least(F.col("o_totalprice"), F.col("p95")), F.col("p05"))
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(clipped), 4).alias("winsorized_mean"),
    )
