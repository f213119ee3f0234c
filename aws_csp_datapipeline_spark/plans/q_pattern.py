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
        .agg(F.regexp_count(path, F.lit(FUNNEL)).alias("n_hits"))
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
