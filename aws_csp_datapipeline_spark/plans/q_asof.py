"""As-of join query with DuckDB's native ASOF JOIN as the oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.catalog import load_table
from aws_csp_datapipeline_spark.operators.asof import asof_join
from aws_csp_datapipeline_spark.plans.registry import register


@register(
    "x1_asof_join",
    """
    SELECT v.event_id, v.user_id,
           p.event_id AS asof_event_id, p.value AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id AND v.ts >= p.ts
    """,
)
def x1_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: each 'view' event gets the latest
    prior 'purchase' (id, value) for the same user — one shuffle on
    user_id via the union+window as-of form."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view")
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = asof_join(
        views,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["event_id", "value"],
        left_cols=["event_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_event_id"),
        F.col("asof_value").alias("asof_value"),
    )


@register(
    "x5_asof_forward",
    """
    SELECT v.event_id, v.user_id,
           p.event_id AS next_event_id, p.value AS next_value
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id AND v.ts <= p.ts
    """,
)
def x5_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each 'view' gets the same user's NEXT purchase
    at-or-after it (time-to-conversion enrichment) — the same
    single-shuffle tagged-union plan with the window sort flipped."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view")
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = asof_join(
        views,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["event_id", "value"],
        left_cols=["event_id"],
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_event_id").alias("next_event_id"),
        F.col("asof_value").alias("next_value"),
    )


@register(
    "x6_asof_nearest",
    """
    WITH v AS (SELECT * FROM events WHERE event_type = 'view'),
    p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    b AS (
      SELECT v.event_id, v.user_id, v.ts,
             p.event_id AS b_id, p.ts AS b_ts
      FROM v ASOF LEFT JOIN p
        ON v.user_id = p.user_id AND v.ts >= p.ts
    ),
    f AS (
      SELECT v.event_id, p.event_id AS f_id, p.ts AS f_ts
      FROM v ASOF LEFT JOIN p
        ON v.user_id = p.user_id AND v.ts <= p.ts
    ),
    j AS (SELECT b.*, f.f_id, f.f_ts FROM b JOIN f USING (event_id))
    SELECT event_id, user_id,
           CASE WHEN b_id IS NULL THEN f_id
                WHEN f_id IS NULL THEN b_id
                WHEN date_diff('microsecond', b_ts, ts)
                     <= date_diff('microsecond', ts, f_ts) THEN b_id
                ELSE f_id END AS nearest_event_id,
           CASE WHEN b_id IS NULL THEN date_diff('millisecond', f_ts, ts)
                WHEN f_id IS NULL THEN date_diff('millisecond', b_ts, ts)
                WHEN date_diff('microsecond', b_ts, ts)
                     <= date_diff('microsecond', ts, f_ts)
                  THEN date_diff('millisecond', b_ts, ts)
                ELSE date_diff('millisecond', f_ts, ts) END AS signed_lag_ms
    FROM j
    WHERE b_id IS NOT NULL OR f_id IS NOT NULL
    """,
)
def x6_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of: each 'view' gets the same user's CLOSEST
    purchase in either direction (tie → earlier) — completing the
    as-of family (x1 backward, x5 forward). One shuffle on user_id;
    both directional carries run inside the same exchange as two
    window sorts, and the arbitration is a per-row expression. The
    signed lag (positive = purchase before view) is a millisecond-
    truncated integer delta, identical in both engines."""
    from aws_csp_datapipeline_spark.operators.asof import asof_nearest

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view")
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = asof_nearest(
        views,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["event_id"],
        left_cols=["event_id"],
    )
    return out.filter(F.col("nearest_event_id").isNotNull()).select(
        "event_id",
        "user_id",
        F.col("nearest_event_id"),
        (F.unix_millis("ts") - F.unix_millis("nearest_ts")).alias("signed_lag_ms"),
    )
