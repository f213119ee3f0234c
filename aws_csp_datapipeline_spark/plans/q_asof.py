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
