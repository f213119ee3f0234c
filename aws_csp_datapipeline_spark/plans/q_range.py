"""Range-join and time-rollup queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.catalog import load_table
from aws_csp_datapipeline_spark.operators.range_join import interval_join
from aws_csp_datapipeline_spark.plans.registry import register


@register(
    "x2_interval_join",
    """
    SELECT v.event_id, v.user_id, p.event_id AS purchase_id
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND v.ts >= p.ts
     AND v.ts < p.ts + INTERVAL 2 DAY
    """,
)
def x2_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View events landing inside the 2-day attribution window after
    a same-user purchase — bucketized interval containment as a pure
    equi-join on (key, bucket) + exact filter; no nested-loop join at
    any scale."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_start"),
        )
        .withColumn("p_end", F.col("p_start") + F.expr("INTERVAL 2 DAYS"))
    )
    out = interval_join(
        views,
        purchases,
        point_ts="ts",
        start_ts="p_start",
        end_ts="p_end",
        key=("user_id", "p_user"),
        bucket_days=2,
    )
    return out.select("event_id", "user_id", "purchase_id")


@register(
    "g3_time_rollup",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
           'day' AS granularity, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS total
    FROM events GROUP BY 1, 3
    UNION ALL
    SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS bucket_start,
           'week' AS granularity, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS total
    FROM events GROUP BY 1, 3
    """,
)
def g3_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup (day + week
    continuous aggregates in one result). At scale the coarser level
    derives from the finer one (re-aggregate day rows into weeks)
    instead of rescanning the raw events — that's how it's built here.
    """
    ev = load_table(spark, sf_dir, "events")
    day = (
        ev.groupBy(
            F.date_trunc("day", "ts").alias("bucket_start"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("raw_total"))
    )
    day_out = day.select(
        "bucket_start",
        F.lit("day").alias("granularity"),
        "event_type",
        "n",
        F.round("raw_total", 2).alias("total"),
    )
    week_out = (
        day.groupBy(
            F.date_trunc("week", "bucket_start").alias("bucket_start"),
            F.col("event_type"),
        )
        .agg(F.sum("n").alias("n"), F.round(F.sum("raw_total"), 2).alias("total"))
        .select(
            "bucket_start", F.lit("week").alias("granularity"), "event_type", "n", "total"
        )
    )
    return day_out.unionByName(week_out)


@register(
    "x9_interval_coalesce",
    """
    WITH iv AS (
      SELECT user_id, event_id, ts AS s,
             ts + INTERVAL 300 SECONDS AS e
      FROM events
    ),
    m AS (
      SELECT user_id, event_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_e
      FROM iv
    ),
    g AS (
      SELECT user_id, s, e,
             SUM(CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1
                      ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, event_id
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM m
    ),
    isl AS (
      SELECT user_id, island, MIN(s) AS s0, MAX(e) AS e1
      FROM g GROUP BY user_id, island
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_intervals,
           ROUND(SUM(epoch_ms(e1) - epoch_ms(s0)) / 1000.0, 1) AS covered_s
    FROM isl GROUP BY user_id
    """,
)
def x9_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union (coalesce overlapping ranges): each event claims
    [ts, ts+5min]; overlapping claims per user merge into maximal
    intervals, reporting how many remain and the total covered time —
    the range twin of gaps-and-islands (`w10`) and the dual of
    `w11_max_concurrency`'s boundary sweep.

    One hash shuffle on user_id, then two windows over the same
    (user, start) sort — the running-max-end comparison marks island
    starts without any self-join, so merging N intervals is O(N log N)
    per partition and per-user state never leaves the executor. At
    100 TB, partition by user/day first and the same plan coalesces
    per shard."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 300 SECONDS")).alias("e"),
    )
    w_order = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_max_e = F.max("e").over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "is_new",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(0),
    )
    # same total order as the flag window, so island ids are stable
    # even when two events share a timestamp
    w_cum = Window.partitionBy("user_id").orderBy("s", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    islands = flagged.withColumn("island", F.sum("is_new").over(w_cum))
    isl = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("s0"), F.max("e").alias("e1")
    )
    return isl.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.round(
            F.sum(F.unix_millis(F.col("e1")) - F.unix_millis(F.col("s0")))
            / 1000.0,
            1,
        ).alias("covered_s"),
    )


@register(
    "x10_time_weighted_avg",
    """
    WITH iv AS (
      SELECT user_id, value,
             (epoch_ms(lead(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id))
              - epoch_ms(ts)) / 1000.0 AS dt
      FROM events
    )
    SELECT user_id,
           ROUND(SUM(value * dt) / SUM(dt), 4) AS twap,
           CAST(COUNT(dt) AS BIGINT) AS n_intervals
    FROM iv WHERE dt IS NOT NULL AND dt > 0
    GROUP BY user_id
    """,
)
def x10_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each observation holds until the
    user's next event, so its weight is that interval's duration —
    the correct mean for irregularly-sampled series (a plain AVG
    over-weights bursts). One window (lead over the same user/time
    sort every other sequence op shares) + one grouped agg;
    zero-length intervals (same-timestamp bursts) carry zero weight
    and are excluded on both sides."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt = (
        (F.unix_millis(F.lead("ts").over(w)) - F.unix_millis(F.col("ts")))
        / 1000.0
    )
    iv = ev.select("user_id", "value", dt.alias("dt")).filter(
        F.col("dt").isNotNull() & (F.col("dt") > 0)
    )
    return iv.groupBy("user_id").agg(
        F.round(F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 4).alias(
            "twap"
        ),
        F.count("dt").cast("long").alias("n_intervals"),
    )


@register(
    "x11_minmax_downsample",
    """
    WITH b AS (
      SELECT user_id, event_id, value,
             CAST(floor(epoch_ms(ts) / 3600000) AS BIGINT) AS bucket
      FROM events
    ),
    ext AS (
      SELECT user_id, bucket,
             MIN(value) AS lo, MAX(value) AS hi
      FROM b GROUP BY user_id, bucket
    ),
    pick AS (
      SELECT x.user_id, x.bucket, x.lo, x.hi,
             MIN(CASE WHEN b.value = x.lo THEN b.event_id END) AS lo_event,
             MIN(CASE WHEN b.value = x.hi THEN b.event_id END) AS hi_event
      FROM ext x JOIN b
        ON b.user_id = x.user_id AND b.bucket = x.bucket
      GROUP BY x.user_id, x.bucket, x.lo, x.hi
    )
    SELECT user_id, bucket, ROUND(lo, 4) AS lo, ROUND(hi, 4) AS hi,
           lo_event, hi_event
    FROM pick
    """,
)
def x11_minmax_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max downsampling for time-series rendering: per (user,
    hour-bucket) keep the extreme values and the row identity of each
    extreme (lowest event_id on ties) — the reduction that preserves
    visual envelopes when a 10^9-point series must become 10^4 plot
    points. One grouped pass computes envelope AND witnesses: the
    argmin/argmax rows come from MIN/MAX over (value, ±event_id)
    structs — struct ordering is lexicographic, so the extreme value
    arrives with its lowest-event_id witness in the same combiner-
    friendly aggregation, no join-back (the oracle restates the
    witness lookup as a join). Single shuffle on (user, bucket)."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.unix_millis(F.col("ts")) / 3600000).cast("long")
    b = ev.select("user_id", "event_id", "value", bucket.alias("bucket"))
    lo_s = F.min(F.struct(F.col("value"), F.col("event_id")))
    # negated id: MAX of (value, -event_id) is the max value with the
    # LOWEST event_id on ties, matching the oracle's MIN(event_id)
    hi_s = F.max(F.struct(F.col("value"), (-F.col("event_id")).alias("neg")))
    return (
        b.groupBy("user_id", "bucket")
        .agg(lo_s.alias("ls"), hi_s.alias("hs"))
        .select(
            "user_id",
            "bucket",
            F.round(F.col("ls.value"), 4).alias("lo"),
            F.round(F.col("hs.value"), 4).alias("hi"),
            F.col("ls.event_id").alias("lo_event"),
            (-F.col("hs.neg")).alias("hi_event"),
        )
    )
