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
