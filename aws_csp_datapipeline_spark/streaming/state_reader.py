"""Streaming state inspection: the `statestore` / `state-metadata`
batch data sources (Spark 4) over a structured-streaming checkpoint.

This is the operational surface a production stream needs and the
reference's Lambda pipeline has no analog for: inspect what per-key
state a stateful query is carrying WITHOUT stopping it — state-size
audits, debugging a hot key, or backfilling a corrupted sink from
state. Both readers are plain batch DataFrames: they scan the
checkpoint's state files directly (no interaction with the running
query), so an audit of a TB-sized state store is just another
distributed scan, partitioned the same way the state is (one task
per state-store partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_state(
    spark: SparkSession,
    checkpoint_dir: str,
    operator_id: int = 0,
    batch_id: int | None = None,
) -> DataFrame:
    """The per-key state of one stateful operator as (key, value,
    partition_id) structs — latest committed batch unless ``batch_id``
    pins a historical version (state time travel over retained
    deltas)."""
    r = spark.read.format("statestore").option("operatorId", str(operator_id))
    if batch_id is not None:
        r = r.option("batchId", str(batch_id))
    return r.load(checkpoint_dir)


def state_metadata(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """Operator-level checkpoint metadata: operator ids/names, state
    store names, partition counts, min/max retained batch ids — the
    map you need before pointing `read_state` at a multi-operator
    query."""
    return spark.read.format("state-metadata").load(checkpoint_dir)


def state_size_profile(
    spark: SparkSession, checkpoint_dir: str, operator_id: int = 0
) -> DataFrame:
    """Per-partition key-count profile of an operator's state — the
    skew diagnostic for streaming state (a partition carrying far more
    keys than the rest is the streaming analog of `dq12_skew_profile`).
    """
    st = read_state(spark, checkpoint_dir, operator_id)
    return (
        st.groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .orderBy("partition_id")
    )
