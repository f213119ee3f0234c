"""Event-sequence pattern matching (MATCH_RECOGNIZE-style shapes).

The reference has no sequence operator (its event path is a single
S3-notification trigger — SURVEY.md §3 entry point 4), but any
clickstream pipeline built on it would need one. Spark has no
MATCH_RECOGNIZE either; the idiomatic re-expressions are:

- contiguous-pattern detection: per-key ordered ``collect_list`` →
  string/array form → regex (one shuffle, JVM-side regex);
- next-event transition: ``lead`` window (one shuffle, no UDF);
- first-A-to-first-B latency: conditional ``min`` aggregates.

Ordering key is ``event_id`` (unique, monotone with ingestion), never
raw ``ts``: the parquet stores nanosecond timestamps and engines that
truncate differently would disagree on tie order.

All shapes scale linearly: the only shuffle is the per-user hash
partition, and per-user state is the user's own event list (bounded by
the heaviest user, not the table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.catalog import load_table
from aws_csp_datapipeline_spark.plans.registry import register

FUNNEL = "view click purchase"


@register(
    "pm1_path_regex",
    """
    WITH seq AS (
      SELECT user_id,
             string_agg(event_type, ' ' ORDER BY event_id) AS path
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(regexp_extract_all(path, 'view click purchase'))
                AS BIGINT) AS n_hits
    FROM seq
    WHERE len(regexp_extract_all(path, 'view click purchase')) > 0
    """,
)
def pm1_path_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous-sequence detection: users whose event stream contains
    an *adjacent* view→click→purchase run, with the match count.

    MATCH_RECOGNIZE(PATTERN (view click purchase)) re-expressed as
    ordered collect_list → array_join → regexp_count. One shuffle on
    user_id; the regex runs JVM-side on one string per user. At 100 TB
    the per-user path string is the only memory term — heavy users
    would be range-split by day before the fold."""
    ev = load_table(spark, sf_dir, "events")
    path = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("event_id", "event_type"))
            ),
            lambda s: s["event_type"],
        ),
        " ",
    )
    return (
        ev.groupBy("user_id")
        .agg(F.regexp_count(path, F.lit(FUNNEL)).cast("long").alias("n_hits"))
        .filter(F.col("n_hits") > 0)
    )


@register(
    "pm2_next_after_error",
    """
    WITH nxt AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY event_id) AS next_type
      FROM events
    )
    SELECT next_type, COUNT(*) AS n
    FROM nxt
    WHERE event_type = 'error' AND next_type IS NOT NULL
    GROUP BY next_type
    """,
)
def pm2_next_after_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transition distribution: what users do immediately after an
    error. ``lead`` window then group — the window shuffle partitions
    by user_id and the following aggregation is map-side partial, so
    the second shuffle moves only ~5 rows per task."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    nxt = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        nxt.filter((F.col("event_type") == "error") & F.col("next_type").isNotNull())
        .groupBy("next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "pm3_time_to_convert",
    """
    WITH f AS (
      SELECT user_id,
             MIN(CAST(FLOOR(date_part('epoch', ts)) AS BIGINT))
               FILTER (WHERE event_type = 'signup')   AS s_sec,
             MIN(CAST(FLOOR(date_part('epoch', ts)) AS BIGINT))
               FILTER (WHERE event_type = 'purchase') AS p_sec
      FROM events GROUP BY user_id
    )
    SELECT user_id, p_sec - s_sec AS sec_to_convert
    FROM f
    WHERE s_sec IS NOT NULL AND p_sec IS NOT NULL AND p_sec >= s_sec
    """,
)
def pm3_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-signup → first-purchase latency per user. Two conditional
    MIN aggregates in ONE pass (no self-join of two filtered scans).
    Seconds are truncated *before* the MIN on both engines — floor is
    monotone, so min(floor(ts)) ≡ floor(min(ts)) and the nanosecond
    parquet precision (driver-contract gotcha) cannot leak in."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", sec)).alias("s_sec"),
        F.min(F.when(F.col("event_type") == "purchase", sec)).alias("p_sec"),
    )
    return f.filter(
        F.col("s_sec").isNotNull()
        & F.col("p_sec").isNotNull()
        & (F.col("p_sec") >= F.col("s_sec"))
    ).select(
        "user_id", (F.col("p_sec") - F.col("s_sec")).alias("sec_to_convert")
    )


@register(
    "pm4_last_touch_attribution",
    """
    WITH ordered AS (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_id,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_type,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_ts
      FROM events
    )
    SELECT event_id AS purchase_id, user_id, touch_id, touch_type,
           date_diff('millisecond', touch_ts, ts) AS lag_ms
    FROM ordered
    WHERE event_type = 'purchase' AND touch_id IS NOT NULL
    """,
)
def pm4_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the most
    recent preceding click/view by the same user — the marketing-
    attribution as-of lookup done with ONE pass and no self-join.
    last(ignorenulls) over a (user, time)-ordered frame ending at the
    previous row carries the latest touch forward; all three touch
    attributes ride in one struct so the window is evaluated once.
    Scale: one shuffle on user_id (the session partitioning every
    sequence op here reuses); per-user frames stream in sorted order
    with O(1) state per row. The millisecond lag is an integer delta
    of ms-truncated instants, identical in both engines."""
    ev = load_table(spark, sf_dir, "events")
    touch = F.col("event_type").isin("click", "view")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = F.last(
        F.when(touch, F.struct("event_id", "event_type", "ts")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("__touch", carried)
        .filter((F.col("event_type") == "purchase") & F.col("__touch").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("__touch.event_id").alias("touch_id"),
            F.col("__touch.event_type").alias("touch_type"),
            (F.unix_millis("ts") - F.unix_millis("__touch.ts")).alias("lag_ms"),
        )
    )


@register(
    "pm5_markov_transitions",
    """
    WITH nxt AS (
      SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY event_id) AS next_type
      FROM events
    ),
    c AS (
      SELECT event_type, next_type, COUNT(*) AS n
      FROM nxt WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    t AS (SELECT event_type, SUM(n) AS tot FROM c GROUP BY 1)
    SELECT c.event_type AS from_type, c.next_type AS to_type, c.n,
           ROUND(CAST(c.n AS DOUBLE) / t.tot, 6) AS p
    FROM c JOIN t USING (event_type)
    """,
)
def pm5_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full first-order Markov transition matrix over user event
    sequences (generalizing pm2's single-row slice): per (from, to)
    pair the count and the row-normalized probability — the
    session-model input for next-action prediction and anomaly
    scoring. One user-partitioned lead window, then two constant-size
    aggregates (|types|² rows); the normalizing totals broadcast."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    nxt = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    c = nxt.groupBy("event_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("event_type").agg(F.sum("n").alias("tot"))
    return c.join(F.broadcast(t), "event_type").select(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
        "n",
        F.round(F.col("n").cast("double") / F.col("tot"), 6).alias("p"),
    )


@register(
    "pm6_linear_attribution",
    """
    WITH seq AS (
      SELECT event_type,
             COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_clicks,
             COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_views
      FROM events
    ),
    p AS (
      SELECT n_clicks, n_views FROM seq
      WHERE event_type = 'purchase' AND n_clicks + n_views > 0
    )
    SELECT COUNT(*) AS n_purchases,
           ROUND(SUM(n_clicks / CAST(n_clicks + n_views AS DOUBLE)), 4)
             AS click_credit,
           ROUND(SUM(n_views / CAST(n_clicks + n_views AS DOUBLE)), 4)
             AS view_credit
    FROM p
    """,
)
def pm6_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (multi-touch) attribution: each purchase's unit of
    credit splits equally across ALL the user's preceding touches,
    summed per channel — pm4's last-touch generalized to fractional
    credit. Two conditional running counts share ONE window frame
    (single shuffle on user_id, one sort), and the credit math runs
    on the |purchases| filtered rows. Counts are integers, so the
    credit fractions are exact ratios before the one rounded sum."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click = F.when(F.col("event_type") == "click", 1).otherwise(0)
    view = F.when(F.col("event_type") == "view", 1).otherwise(0)
    seq = ev.select(
        "event_type",
        F.coalesce(F.sum(click).over(w), F.lit(0)).alias("n_clicks"),
        F.coalesce(F.sum(view).over(w), F.lit(0)).alias("n_views"),
    )
    tot = (F.col("n_clicks") + F.col("n_views")).cast("double")
    p = seq.filter(
        (F.col("event_type") == "purchase")
        & (F.col("n_clicks") + F.col("n_views") > 0)
    )
    return p.agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum(F.col("n_clicks") / tot), 4).alias("click_credit"),
        F.round(F.sum(F.col("n_views") / tot), 4).alias("view_credit"),
    )


@register(
    "pm7_top_session_paths",
    """
    WITH g AS (
      SELECT user_id, event_id, event_type, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, event_type, ts, event_id,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sess
      FROM g
    ),
    r AS (
      SELECT user_id, sess, event_type,
             row_number() OVER (PARTITION BY user_id, sess
                                ORDER BY ts, event_id) AS rn
      FROM s
    ),
    p AS (
      SELECT user_id, sess,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= 3 GROUP BY user_id, sess
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM p GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 20
    """,
)
def pm7_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session-opening paths: the 20 most common first-3-event
    sequences across 30-min-gap sessions — the navigation-pattern
    query behind funnel design (composes `w3_sessionize`'s gap logic
    with an ordered path fold).

    One hash shuffle on user_id serves the session and rank windows
    (same partition key, same sort); the path build is a grouped
    array_sort over ≤3-element structs (rn is unique per session, so
    the sorted fold is deterministic regardless of collect order) and
    the final count shuffles path singletons. No self-joins, no
    per-row Python."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.when(F.lag("ts").over(w).isNull() | (gap_ms > 1800000), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn("sess", F.sum("is_new").over(w_cum))
    w_rank = Window.partitionBy("user_id", "sess").orderBy("ts", "event_id")
    ranked = sess.withColumn("rn", F.row_number().over(w_rank)).filter(
        F.col("rn") <= 3
    )
    paths = ranked.groupBy("user_id", "sess").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rn"), F.col("event_type")))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(20)
    )


@register(
    "pm8_session_durations",
    """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sess
      FROM g
    ),
    dur AS (
      SELECT user_id, sess,
             (epoch_ms(MAX(ts)) - epoch_ms(MIN(ts))) / 60000.0 AS minutes
      FROM s GROUP BY user_id, sess
    )
    SELECT CAST(least(floor(minutes / 5), 12) AS INT) AS bucket_5min,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           ROUND(AVG(minutes), 3) AS avg_minutes
    FROM dur GROUP BY 1 ORDER BY 1
    """,
)
def pm8_session_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-duration distribution: 30-min-gap sessions bucketed
    into 5-minute duration bins (capped at 60+) with per-bin counts
    and mean — the engagement histogram behind session-quality
    dashboards. Reuses the single (user, time) sort for both the gap
    flag and the cumulative session id; durations aggregate per
    (user, session) then collapse to a 13-row histogram."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.lag("ts").over(w).isNull() | (gap_ms > 1800000), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn("sess", F.sum("is_new").over(w_cum))
    dur = sess.groupBy("user_id", "sess").agg(
        (
            (F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts"))) / 60000.0
        ).alias("minutes")
    )
    return (
        dur.groupBy(
            F.least(F.floor(F.col("minutes") / 5), F.lit(12))
            .cast("int")
            .alias("bucket_5min")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.round(F.avg("minutes"), 3).alias("avg_minutes"),
        )
        .orderBy("bucket_5min")
    )
