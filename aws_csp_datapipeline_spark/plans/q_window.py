"""Window-function queries (SURVEY.md §2.4 + the common OLAP shapes).

The reference's only windowing use-case is serial-key assignment
(covered by m1_serial_insert); these add the standard analytical
window surface: ranking, running aggregates, lag deltas, and
sessionization — each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.catalog import load_table
from aws_csp_datapipeline_spark.plans.registry import register


@register(
    "w1_topk_per_group",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice FROM orders
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey) <= 3
    """,
)
def w1_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per priority — rank-filter window. One
    shuffle on the partition key; AQE splits skewed keys."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


@register(
    "w2_running_sum",
    """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 4) AS run_total
    FROM events
    """,
)
def w2_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running total ordered by event id — cumulative frame
    window (same sequential fold order in both engines)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 4).alias("run_total")
    )


@register(
    "w3_sessionize",
    """
    WITH g AS (
      SELECT user_id, event_id,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000 THEN 1
                  ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM g GROUP BY user_id
    """,
)
def w3_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: a 30-min inactivity gap starts a new session
    (lag + cumulative flag — the batch form of session_window).
    Millisecond granularity on both sides (ns→ms truncation composes
    identically)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "event_id",
        F.when(F.lag("ts").over(w).isNull() | (gap_ms > 1800000), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("is_new").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )


@register(
    "w4_lag_delta",
    """
    SELECT event_id, user_id,
           ROUND(value - lag(value) OVER (PARTITION BY user_id ORDER BY event_id),
                 4) AS delta
    FROM events
    """,
)
def w4_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value delta vs the previous event (lag window)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta"),
    )


@register(
    "w5_rank_battery",
    """
    SELECT o_orderkey, o_orderpriority,
           CAST(ntile(4)  OVER w AS INTEGER) AS quartile,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist()    OVER w, 6) AS cdist,
           first_value(o_orderkey) OVER w AS first_key,
           last_value(o_orderkey)  OVER (PARTITION BY o_orderpriority
                                         ORDER BY o_totalprice DESC, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND UNBOUNDED FOLLOWING) AS last_key
    FROM orders
    WHERE o_orderkey <= 2000
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def w5_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ranking-window battery: ntile / percent_rank /
    cume_dist / first_value / last_value per priority partition, with
    a unique (price, key) sort so every function is deterministic.
    last_value gets an explicit whole-partition frame — the default
    running frame is a classic wrong-answer trap in both engines."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w_full).alias("last_key"),
    )


@register(
    "fun1_funnel",
    """
    WITH v AS (SELECT user_id, MIN(event_id) AS v_id FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.event_id) AS c_id
          FROM events e JOIN v ON e.user_id = v.user_id AND e.event_id > v.v_id
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.event_id) AS p_id
          FROM events e JOIN c ON e.user_id = c.user_id AND e.event_id > c.c_id
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked_after,
           (SELECT COUNT(*) FROM p) AS n_purchased_after
    """,
)
def fun1_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: users progressing view → click → purchase in
    event order (sequenced by the monotone event_id — no timestamp
    precision trap). Each stage is a grouped MIN + a join back to the
    stream; stage tables shrink monotonically, and the per-user
    grouped frames are what shuffles, never raw events twice."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("event_id").alias("v_id"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("event_id") > F.col("v_id"))
        .groupBy("user_id")
        .agg(F.min("event_id").alias("c_id"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("event_id") > F.col("c_id"))
        .groupBy("user_id")
        .agg(F.min("event_id").alias("p_id"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(F.broadcast(c.agg(F.count(F.lit(1)).alias("n_clicked_after"))))
        .crossJoin(F.broadcast(p.agg(F.count(F.lit(1)).alias("n_purchased_after"))))
    )


@register(
    "fun2_retention",
    """
    WITH wk AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events
    ),
    cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM wk GROUP BY user_id)
    SELECT c.cohort_week, w.week, COUNT(*) AS n_users
    FROM wk w JOIN cohort c ON w.user_id = c.user_id
    GROUP BY 1, 2
    """,
)
def fun2_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users' first-activity week vs every
    week they were active. The (user, week) distinct set is the only
    big shuffle; the cohort table is one row PER USER — which grows
    with the data — so it carries no broadcast hint (AQE decides; at
    scale the wk⋈cohort join reuses the user_id hash partitioning the
    groupBy already established, so no extra exchange either way).
    Week truncation is precision-safe across engines."""
    ev = load_table(spark, sf_dir, "events")
    wk = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    cohort = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        wk.join(cohort, "user_id")
        .groupBy("cohort_week", "week")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "w6_moving_avg",
    """
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(value) AS total
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, day,
           ROUND(AVG(total) OVER (PARTITION BY user_id ORDER BY day
                                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
                 4) + 0.0 AS ma7
    FROM daily
    """,
)
def w6_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row trailing moving average of per-user daily totals — the
    sliding-frame window. Two shuffles total: the daily rollup and
    the per-user window; frames never re-scan raw events."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.sum("value").alias("total"))
    w = Window.partitionBy("user_id").orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "user_id",
        "day",
        (F.round(F.avg("total").over(w), 4) + 0.0).alias("ma7"),
    )


@register(
    "w7_share_of_total",
    """
    SELECT user_id, event_type,
           ROUND(SUM(value) / SUM(SUM(value)) OVER (PARTITION BY user_id),
                 6) + 0.0 AS share
    FROM events GROUP BY user_id, event_type
    """,
)
def w7_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total: each (user, type)'s fraction of the user's
    total — an aggregate nested inside a window (one shuffle for the
    group-by; the window re-partitions by a prefix of the same key,
    so AQE/planner reuses the partitioning)."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("user_id", "event_type").agg(F.sum("value").alias("tv"))
    w = Window.partitionBy("user_id")
    return g.select(
        "user_id",
        "event_type",
        (F.round(F.col("tv") / F.sum("tv").over(w), 6) + 0.0).alias("share"),
    )


@register(
    "w8_range_frame",
    """
    SELECT event_id, user_id,
           COUNT(*) OVER (PARTITION BY user_id
                          ORDER BY CAST(FLOOR(date_part('epoch', ts)) AS BIGINT)
                          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
             AS n_last_hour
    FROM events
    """,
)
def w8_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, unlike w6's ROWS frame): per-user
    count of events in the trailing hour, keyed on epoch seconds so
    both engines frame identically. The per-partition sort is the
    only cost — no self-join range explosion."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id", "user_id", F.count(F.lit(1)).over(w).alias("n_last_hour")
    )


@register(
    "w9_running_distinct",
    """
    SELECT event_id, user_id,
           CAST(COUNT(DISTINCT event_type)
                OVER (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS INTEGER) AS n_types_seen
    FROM events
    """,
)
def w9_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct count (COUNT(DISTINCT) OVER — which Spark's
    window aggregates don't accept): re-expressed as the size of a
    running ``collect_set``. State per row is the distinct-value set
    (≤5 event types here), not the row history, so the frame stays
    O(distinct) at any scale."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).alias("n_types_seen"),
    )


@register(
    "w10_gaps_islands",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), anchored AS (
      SELECT user_id,
             datediff('day', DATE '1970-01-01', day)
               - row_number() OVER (PARTITION BY user_id ORDER BY day) AS anchor
      FROM days
    ), islands AS (
      SELECT user_id, COUNT(*) AS island_len
      FROM anchored GROUP BY user_id, anchor
    )
    SELECT user_id, COUNT(*) AS n_streaks, MAX(island_len) AS longest_streak
    FROM islands GROUP BY user_id
    """,
)
def w10_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands (activity streaks): consecutive active days
    collapse to one island via the epoch-day-minus-row_number anchor;
    per-user streak count and longest streak. Two grouped passes over
    (user, day) pairs — raw events reduce to distinct days first, so
    the window input is bounded by |users|x|days|."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    anchored = days.select(
        "user_id",
        (
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("anchor"),
    )
    islands = anchored.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("island_len")
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("island_len").alias("longest_streak"),
    )


@register(
    "w11_max_concurrency",
    """
    WITH pts AS (
      SELECT event_type, ts AS t, 1 AS delta FROM events
      UNION ALL
      SELECT event_type, ts + INTERVAL 300 SECOND, -1 FROM events
    ), run AS (
      SELECT event_type,
             SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      FROM pts
    )
    SELECT event_type, CAST(MAX(conc) AS BIGINT) AS max_concurrent
    FROM run GROUP BY event_type
    """,
)
def w11_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max concurrent 5-minute activity windows per event type via
    the +1/-1 boundary sweep and a running sum — interval-overlap
    analytics without a range self-join (which is quadratic in
    overlap density). Ends sort before starts at the same instant
    (delta ascending), giving exact half-open-interval semantics;
    the result is deterministic even with tied boundary times since
    equal-delta orderings can't change the running maximum."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    starts = ev.select("event_type", F.col("ts").alias("t"), F.lit(1).alias("delta"))
    ends = ev.select(
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 300 SECONDS")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    pts = starts.unionByName(ends)
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.withColumn("conc", F.sum("delta").over(w))
    return run.groupBy("event_type").agg(F.max("conc").alias("max_concurrent"))


@register(
    "x7_time_downsample",
    """
    WITH b AS (
      SELECT *, time_bucket(INTERVAL '5 minutes', ts) AS bkt FROM events
    )
    SELECT user_id, CAST(bkt AS TIMESTAMP) AS bucket, event_id,
           event_type, value
    FROM b
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, bkt
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def x7_time_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry downsampling: keep the LAST event per (user, 5-min
    bucket) — the lossy-but-ordered compaction applied to high-
    frequency streams before sessionization or storage. Bucketing is
    a narrow epoch-aligned expression (Spark window() ≡ DuckDB
    time_bucket); the keep-last is one window over (user, bucket)
    with a deterministic (ts, id) tie-break. One shuffle, output
    bounded by users x buckets regardless of raw event rate."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.select("*", F.window("ts", "5 minutes").alias("__w")).withColumn(
        "bucket", F.col("__w.start")
    )
    w = Window.partitionBy("user_id", "bucket").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        b.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "bucket", "event_id", "event_type", "value")
    )


@register(
    "w14_ewma",
    r"""
    WITH RECURSIVE seq AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ),
    r AS (
      SELECT user_id, event_id, rn, value, value AS ewma FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.event_id, s.rn, s.value,
             0.2 * s.value + 0.8 * r.ewma
      FROM seq s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT event_id, user_id, ROUND(ewma, 4) AS ewma FROM r
    """,
)
def w14_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (α = 0.2) over event time: the recursive window
    SQL can't state directly — oracle restates it as a recursive CTE,
    the engine as grouped-map applyInPandas with the identical
    float64 step order (see ``functions/grouped.ewma_per_group``)."""
    from aws_csp_datapipeline_spark.functions.grouped import ewma_per_group

    ev = load_table(spark, sf_dir, "events")
    return ewma_per_group(
        ev, "user_id", ["ts", "event_id"], "value", "event_id", alpha=0.2
    )


@register(
    "w15_rolling_zscore",
    """
    WITH r AS (
      SELECT user_id, event_id, value,
             AVG(value) OVER w AS mu,
             STDDEV_SAMP(value) OVER w AS sd,
             COUNT(*) OVER w AS n
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id,
           ROUND((value - mu) / sd, 4) + 0 AS z,
           CASE WHEN ABS((value - mu) / sd) > 3 THEN 1 ELSE 0 END AS is_anomaly
    FROM r
    WHERE n >= 10 AND sd > 0
    """,
)
def w15_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event scored against
    its user's TRAILING 20 observations (exclusive of itself, so an
    anomaly can't mask itself in its own baseline); |z| > 3 flags.
    The streaming-monitoring primitive in batch form — one window
    frame computes mean, stddev, and warm-up count in a single pass
    over the shared (user, time) sort; warm-up rows (< 10 priors) and
    flat baselines are excluded on both sides."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    mu = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    n = F.count(F.lit(1)).over(w)
    z = (F.col("value") - mu) / sd
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round(z, 4).alias("z"),
            F.when(F.abs(z) > 3, 1).otherwise(0).alias("is_anomaly"),
            n.alias("__n"),
            sd.alias("__sd"),
        )
        .filter((F.col("__n") >= 10) & (F.col("__sd") > 0))
        .drop("__n", "__sd")
    )


@register(
    "w16_moving_median",
    """
    SELECT o_orderkey,
           ROUND(median(o_totalprice) OVER (
             PARTITION BY o_orderpriority
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS mov_median
    FROM orders
    """,
)
def w16_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving median (trailing 5-row window per priority lane): the
    robust smoother a mean-based rolling average can't give — one
    outlier order no longer drags the trend line (pairs with w15's
    rolling z-score, which flags the outliers this smooths past).
    Spark's exact `percentile` evaluates as a window aggregate over
    the bounded ROWS frame, so cost is frame-sized per row (5 values
    sorted per output), not partition-sized; the frame ordering
    (date, key) is total, so results are deterministic and
    engine-portable (verified element-exact vs DuckDB's windowed
    median)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-4, 0)
    )
    med = F.expr("percentile(o_totalprice, 0.5)")
    return o.select(
        "o_orderkey", F.round(med.over(w), 4).alias("mov_median")
    )
