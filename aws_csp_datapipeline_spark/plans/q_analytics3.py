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
    disjunction and pushes them below the join. part is sf-scaled —
    no broadcast hint, AQE decides from runtime size."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
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
    "f10_json_extract",
    """
    SELECT CAST(props->>'k' AS INT) // 10 AS k_bucket,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS total
    FROM events
    GROUP BY 1
    """,
)
def f10_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-column extraction (S2 parity: the reference ingests JSON
    bodies, lambda_function.py:972): pull a typed field out of the
    events.props JSON string and aggregate on it. get_json_object is
    JVM-side (Jackson), no UDF."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k_bucket",
            (F.get_json_object("props", "$.k").cast("int") / 10).cast("int"),
        )
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
    )


@register(
    "q13_order_count_distribution",
    """
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    SELECT n_orders, COUNT(*) AS n_customers
    FROM per_cust GROUP BY n_orders
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join with an ON-clause filter, then a
    histogram of per-customer counts (COUNT(col) skips the NULLs of
    unmatched customers — the 0-orders bucket)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "q22_inactive_high_balance",
    """
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment, COUNT(*) AS n_custs,
           ROUND(SUM(c.c_acctbal), 2) AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    """,
)
def q22_inactive_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold (global average as a
    broadcast 1-row cross join) + anti-join, grouped."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__a")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("__a")
    )
    inactive = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return inactive.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


@register(
    "x3_explode_tokens",
    """
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
          FROM documents)
    GROUP BY token
    HAVING COUNT(*) >= 100
    """,
)
def x3_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode/UNNEST as a user-facing operator: token frequency table
    (the word-count of corpus engineering) — explode + group-count
    with a HAVING floor."""
    from aws_csp_datapipeline_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 100)
    )


@register(
    "a10_median_percentile",
    """
    SELECT o_orderpriority,
           ROUND(MEDIAN(o_totalprice), 2) AS med_price,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def a10_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped median (plus min/max) — the order-statistics
    aggregate; Spark's median() is exact (approx_percentile is the
    scale path when a full sort per group is too dear)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.median("o_totalprice"), 2).alias("med_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@register(
    "a11_string_agg",
    """
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a11_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered distinct string aggregation (collect_set → sort →
    join) — deterministic despite collect_set's arbitrary order."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias(
            "statuses"
        )
    )


@register(
    "ap1_zscore_per_user",
    """
    SELECT event_id, user_id,
           ROUND((value - AVG(value) OVER w) / STDDEV_SAMP(value) OVER w, 4) + 0 AS z
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
)
def ap1_zscore_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-user z-score normalization —
    the Arrow-batched per-group escape hatch, checked against the
    pure-SQL window formulation."""
    from aws_csp_datapipeline_spark.functions.grouped import zscore_per_group

    ev = load_table(spark, sf_dir, "events")
    return zscore_per_group(ev, "user_id", "value", "event_id")


@register(
    "q2_min_per_group_lookup",
    """
    SELECT p.p_type, p.p_partkey, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice = (SELECT MIN(p2.p_retailprice) FROM part p2
                             WHERE p2.p_type = p.p_type)
    """,
)
def q2_min_per_group_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery (cheapest part per
    type) decorrelated into a grouped-min + join — ties all kept,
    exactly like the subquery form."""
    p = load_table(spark, sf_dir, "part")
    mins = p.groupBy(F.col("p_type").alias("__t")).agg(
        F.min("p_retailprice").alias("__min_price")
    )
    return (
        p.join(
            F.broadcast(mins),
            (p.p_type == mins.__t) & (p.p_retailprice == mins.__min_price),
        )
        .select("p_type", "p_partkey", "p_retailprice")
    )


@register(
    "q21_exists_not_exists",
    """
    SELECT c.c_mktsegment, COUNT(*) AS n
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderstatus = 'F')
    GROUP BY c.c_mktsegment
    """,
)
def q21_exists_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: chained EXISTS + NOT EXISTS (customers with
    orders but none finished) as semi-join then anti-join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    of = o.filter(F.col("o_orderstatus") == "F")
    with_orders = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    none_finished = with_orders.join(
        of, with_orders.c_custkey == of.o_custkey, "left_anti"
    )
    return none_finished.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))


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


@register(
    "ap2_cogrouped_threshold",
    """
    WITH th AS (SELECT user_id, ROUND(AVG(value), 6) AS thresh
                FROM events GROUP BY user_id)
    SELECT e.user_id,
           CAST(SUM(CASE WHEN e.value > th.thresh THEN 1 ELSE 0 END) AS BIGINT)
             AS n_above
    FROM events e JOIN th ON e.user_id = th.user_id
    GROUP BY e.user_id
    """,
)
def ap2_cogrouped_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas: per-user events cogrouped with a
    per-user threshold table (here: the user's own mean, rounded so
    both engines agree), counting values above it in pandas. The
    integer count is what crosses the Arrow boundary — float
    discipline stays inside each engine."""
    from aws_csp_datapipeline_spark.functions.grouped import (
        count_above_threshold_cogrouped,
    )

    ev = load_table(spark, sf_dir, "events")
    th = ev.groupBy("user_id").agg(F.round(F.avg("value"), 6).alias("thresh"))
    return count_above_threshold_cogrouped(ev, th, "user_id", "value", "thresh")


@register(
    "f12_try_ops_battery",
    """
    SELECT COUNT(ratio) AS n_ratio_ok,
           COUNT(*) - COUNT(ratio) AS n_div0,
           COUNT(parsed) AS n_parsed,
           CAST(ROUND(SUM(ratio), 2) AS DOUBLE) + 0 AS sum_ratio
    FROM (
      SELECT l_extendedprice / NULLIF(l_quantity - 25, 0) AS ratio,
             TRY_CAST(CASE WHEN l_linenumber % 2 = 0
                           THEN CAST(l_linenumber AS VARCHAR)
                           ELSE 'x' END AS INTEGER) AS parsed
      FROM lineitem)
    """,
)
def f12_try_ops_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant ETL arithmetic: try_divide turns div-by-zero
    into NULL instead of failing the job under ANSI mode, try_cast
    does the same for unparseable strings — bad cells become NULLs
    routed to quarantine, never task failures that kill a 100-TB
    run. Single aggregation, map-side combined."""
    li = load_table(spark, sf_dir, "lineitem")
    probe = li.select(
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25).alias(
            "ratio"
        ),
        F.when(F.col("l_linenumber") % 2 == 0, F.col("l_linenumber").cast("string"))
        .otherwise(F.lit("x"))
        .try_cast("int")
        .alias("parsed"),
    )
    return probe.agg(
        F.count("ratio").alias("n_ratio_ok"),
        (F.count(F.lit(1)) - F.count("ratio")).alias("n_div0"),
        F.count("parsed").alias("n_parsed"),
        F.round(F.sum("ratio"), 2).cast("double").alias("sum_ratio"),
    )


@register(
    "f13_string_battery",
    """
    SELECT s_suppkey,
           split_part(s_name, '#', 2) AS name_num,
           translate(s_name, '#', '-') AS name_dashed,
           reverse(s_name) AS name_rev,
           lpad(CAST(s_suppkey AS VARCHAR), 8, '0') AS key_padded,
           left(s_name, 10) AS name_head,
           right(s_name, 4) AS name_tail,
           ascii(s_name) AS first_char_code,
           repeat('*', CAST(s_suppkey % 4 AS INT)) AS stars
    FROM supplier
    """,
)
def f13_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-function battery (split_part, translate,
    reverse, lpad, left/right slices, ascii, repeat) — the cleaning /
    formatting surface an ETL layer leans on, all JVM-side in one
    codegen'd projection."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.split_part(F.col("s_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.translate("s_name", "#", "-").alias("name_dashed"),
        F.reverse("s_name").alias("name_rev"),
        F.lpad(F.col("s_suppkey").cast("string"), 8, "0").alias("key_padded"),
        F.substring("s_name", 1, 10).alias("name_head"),
        F.substring("s_name", -4, 4).alias("name_tail"),
        F.ascii("s_name").alias("first_char_code"),
        F.repeat(F.lit("*"), (F.col("s_suppkey") % 4).cast("int")).alias("stars"),
    )


@register(
    "f14_datetime_battery",
    """
    SELECT o_orderkey,
           date_part('year', o_orderdate) AS y,
           date_part('quarter', o_orderdate) AS q,
           date_part('month', o_orderdate) AS m,
           date_part('day', o_orderdate) AS d,
           CAST(isodow(o_orderdate) AS INT) AS iso_dow,
           weekofyear(o_orderdate) AS iso_week,
           last_day(o_orderdate) AS month_end,
           date_trunc('quarter', o_orderdate) AS quarter_start,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
           datediff('day', DATE '1992-01-01', o_orderdate) AS epoch_days
    FROM orders WHERE o_orderkey < 3000
    """,
)
def f14_datetime_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar battery: calendar parts, ISO day-of-week/week,
    month-end, quarter truncation, month-clamped addition, day
    arithmetic — the time-dimension surface of every ETL layer, all
    codegen'd projections. ISO dow bridges the engines' differing
    week conventions (weekday()+1 ≡ isodow)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    dt = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(dt).cast("long").alias("y"),
        F.quarter(dt).cast("long").alias("q"),
        F.month(dt).cast("long").alias("m"),
        F.dayofmonth(dt).cast("long").alias("d"),
        (F.weekday(dt) + 1).cast("int").alias("iso_dow"),
        F.weekofyear(dt).cast("long").alias("iso_week"),
        F.last_day(dt).alias("month_end"),
        F.date_trunc("quarter", dt).cast("date").alias("quarter_start"),
        F.add_months(dt, 3).alias("plus_3m"),
        F.datediff(dt, F.lit("1992-01-01").cast("date")).cast("long").alias(
            "epoch_days"
        ),
    )


@register(
    "f15_conditional_battery",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount > 0.05 THEN 'deep'
                WHEN l_discount > 0.0 THEN 'light' ELSE 'none' END AS disc_band,
           nullif(l_returnflag, 'N') AS returned_or_null,
           ifnull(nullif(l_linestatus, 'O'), 'open') AS status_label,
           coalesce(nullif(l_returnflag, 'A'), nullif(l_linestatus, 'F'),
                    'fallback') AS flag_pick,
           least(l_quantity, 25.0) AS qty_capped,
           greatest(l_discount, 0.02) AS disc_floor
    FROM lineitem WHERE l_orderkey < 2000
    """,
)
def f15_conditional_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-scalar battery: multi-branch CASE, nullif/ifnull
    laddering, coalesce fallback chains, least/greatest clamps — the
    branching surface of cleaning rules, one codegen'd projection."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_discount") > 0.05, "deep")
        .when(F.col("l_discount") > 0.0, "light")
        .otherwise("none")
        .alias("disc_band"),
        F.nullif(F.col("l_returnflag"), F.lit("N")).alias("returned_or_null"),
        F.ifnull(F.nullif(F.col("l_linestatus"), F.lit("O")), F.lit("open")).alias(
            "status_label"
        ),
        F.coalesce(
            F.nullif(F.col("l_returnflag"), F.lit("A")),
            F.nullif(F.col("l_linestatus"), F.lit("F")),
            F.lit("fallback"),
        ).alias("flag_pick"),
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("qty_capped"),
        F.greatest(F.col("l_discount"), F.lit(0.02)).alias("disc_floor"),
    )


@register(
    "f16_bitwise_battery",
    """
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 1 AS set_low,
           xor(o_orderkey, o_custkey) AS key_xor,
           CAST(bit_count(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS pop_count,
           o_orderkey << 2 AS shl2,
           o_orderkey >> 3 AS shr3
    FROM orders WHERE o_orderkey < 4000
    """,
)
def f16_bitwise_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar battery (mask, set, xor, popcount, shifts) —
    the flag-field and hash-manipulation surface (the MinHash/SimHash
    operators build on exactly these)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 4000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(1)).alias("set_low"),
        k.bitwiseXOR(F.col("o_custkey")).alias("key_xor"),
        F.bit_count(k).cast("long").alias("pop_count"),
        F.shiftleft(k, 2).cast("long").alias("shl2"),
        F.shiftright(k, 3).cast("long").alias("shr3"),
    )


@register(
    "f18_variant_extract",
    """
    SELECT CAST(props->>'k' AS INT) % 7 AS k_mod,
           COUNT(*) AS n,
           ROUND(AVG(CAST(props->>'k' AS INT)), 4) AS avg_k
    FROM events
    GROUP BY 1
    """,
)
def f18_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON via Spark 4 VariantType — the engine-native
    fast path for schemaless columns: ``parse_json`` builds the binary
    variant ONCE per row, ``variant_get`` then extracts typed fields
    without re-parsing (vs f10's ``get_json_object``, which re-runs
    Jackson per extraction). Same oracle family as f10 on a different
    rollup so both JSON lanes stay independently attested. At 100 TB
    the variant column would be materialized at ingest so every
    downstream read skips string parsing entirely."""
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select(k.alias("__k"))
        .groupBy((F.col("__k") % 7).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("__k"), 4).alias("avg_k"),
        )
    )


@register(
    "p10_collated_eq",
    """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE lower(c_mktsegment) = 'building'
    """,
)
def p10_collated_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive predicate via Spark 4 COLLATIONS: compare
    under UTF8_LCASE instead of wrapping both sides in lower() (the
    p8 idiom). Collated comparisons keep the column's original bytes
    (no derived expression), stay codegen'd, and — unlike the lower()
    rewrite — compose with ORDER BY/GROUP BY semantics when a whole
    column is declared case-insensitive. The oracle states the
    equivalent lower() form."""
    c = load_table(spark, sf_dir, "customer")
    coll = F.collate(F.col("c_mktsegment"), "UTF8_LCASE")
    return c.filter(coll == F.collate(F.lit("building"), "UTF8_LCASE")).select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "ap3_trimmed_mean_udaf",
    """
    WITH ranked AS (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT lang,
           ROUND(SUM(n_chars) * 1.0 / COUNT(*), 4) AS trimmed_mean
    FROM ranked
    WHERE rn > CAST(FLOOR(n * 0.1) AS BIGINT)
      AND rn <= n - CAST(FLOOR(n * 0.1) AS BIGINT)
    GROUP BY lang
    """,
)
def ap3_trimmed_mean_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean document length per language via a
    GROUPED_AGG pandas UDF — the UDAF lane of the §2.10 UDF ladder
    (scalar pandas_udf = s15, grouped-map = ap1, cogrouped = ap2,
    UDTF = t16, mapInPandas = mm*). The trim is multiset-based and
    the surviving sum integer-exact, so the DuckDB window
    formulation reproduces it bit-for-bit."""
    from aws_csp_datapipeline_spark.functions.grouped import (
        trimmed_mean_grouped_agg,
    )

    d = load_table(spark, sf_dir, "documents")
    return trimmed_mean_grouped_agg(d, "lang", "n_chars", trim_frac=0.1)


@register(
    "q23_copurchase_pairs",
    """
    WITH parts AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM parts a JOIN parts b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 50
    """,
)
def q23_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: part pairs co-occurring in ≥2
    orders, top-50 by support — the association-rule primitive
    (recommendation candidates, co-occurrence stats) in its exact
    self-join form.

    Scale shape — JOIN-FREE: one groupBy(orderkey) collects each
    basket's distinct item array (collect_set — the only scan and
    first shuffle), pairs are generated INLINE from the sorted array
    (flatten-of-transforms, ≤C(items,2) structs per basket — bounded
    by the ≤7-item basket, so a constant factor, the er1 fixed-block
    lesson in basket form), then one pair-keyed count aggregate with
    map-side combine and a TakeOrdered. The naive self-join form
    computes the distinct item table TWICE and needs a broadcast (or
    an orderkey re-shuffle) that stops being available at corpus
    scale — this shape replaces the join with per-basket array
    expressions entirely (the oracle states the self-join
    formulation)."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("items"))
        .filter(F.size("items") >= 2)
    )
    pairs = F.flatten(
        F.transform(
            F.col("items"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("items"), i + 2, F.size(F.col("items")) - i - 1
                ),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.part_a"), F.col("p.part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(50)
    )
