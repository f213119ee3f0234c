"""Incremental micro-batch ingest — the reference's Phase-1 design
(S3 object upload → trigger → clean → dedup → load; README.md:42-56)
restated as a Structured Streaming file source.

Exactly-once = file-source checkpointing (each file processed once)
+ idempotent dedup inside ``foreachBatch`` (the reference's
"date check", README.md:56). Watermarked event-time windows cover the
late-data case the reference never handled.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stream_ingest_files(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    dedup_keys: list[str],
    order_col: str,
    fmt: str = "parquet",
    checkpoint_dir: str | None = None,
    sink_table: str = "ingested",
) -> DataFrame:
    """Replay a landing directory through a checkpointed file-source
    stream with per-batch dedup, synchronously (availableNow), into an
    in-memory sink table. Returns the final ingested DataFrame.

    In production the sink is a parquet/Delta append inside
    ``foreachBatch`` with the same dedup-vs-sink anti-join; the memory
    sink keeps the driver check hermetic.
    """
    from aws_csp_datapipeline_spark.operators.crud import dedup_by_keys

    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="ingest_ckpt_")
    stream = spark.readStream.schema(schema).format(fmt).load(source_dir)

    spark.sql(f"DROP TABLE IF EXISTS {sink_table}")
    batches: list = []

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        cleaned = dedup_by_keys(batch_df, dedup_keys, order_col)
        cleaned.write.mode("append").saveAsTable(sink_table)

    q = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_table)


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_len: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts — the streaming aggregation
    shape (late rows beyond the watermark are dropped; state is
    bounded). Works on both a stream and a batch DataFrame (Spark
    window() is the same expression)."""
    w = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        w.groupBy(F.window(F.col(ts_col), window_len).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col(key_col),
            F.col("n"),
            F.col("total"),
        )
    )


def attribution_join(
    purchases: DataFrame,
    clicks: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: attribute each purchase to the same
    user's clicks within ``horizon`` before it — the canonical
    two-stream event-time join. The time-range condition plus
    watermarks is what bounds join state on an unbounded stream
    (clicks older than watermark + horizon are evicted); without them
    a stream-stream join would buffer forever. Works identically on
    batch DataFrames (same expression, no watermark), which is how
    the result is verified.
    """
    if purchases.isStreaming:
        purchases = purchases.withWatermark(ts_col, watermark)
        clicks = clicks.withWatermark(ts_col, watermark)
    p = purchases.select(
        F.col(user_col).alias("p_user"),
        F.col(ts_col).alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    c = clicks.select(
        F.col(user_col).alias("c_user"),
        F.col(ts_col).alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    cond = (
        (p.p_user == c.c_user)
        & (c.click_ts <= p.purchase_ts)
        & (c.click_ts >= p.purchase_ts - F.expr(f"INTERVAL {horizon}"))
    )
    return p.join(c, cond, "inner").select(
        F.col("p_user").alias("user_id"), "purchase_id", "click_id"
    )
