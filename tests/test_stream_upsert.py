"""Streaming CDC upsert: the foreachBatch fold over mtime-ordered
change files must equal applying all changes at once (batch oracle),
including updates superseded across batches and delete-then-reinsert."""

import os

from aws_csp_datapipeline_spark.operators.crud import apply_cdc
from aws_csp_datapipeline_spark.streaming.upsert import stream_upsert_cdc

CHANGE_SCHEMA = "k long, op string, seq long, v string"


def _write_change_file(spark, landing, idx, rows):
    part = os.path.join(landing, f"part{idx}")
    spark.createDataFrame(rows, CHANGE_SCHEMA).coalesce(1).write.parquet(part)
    for f in os.listdir(part):
        if f.endswith(".parquet"):
            dst = os.path.join(landing, f"changes_{idx}.parquet")
            os.rename(os.path.join(part, f), dst)
            os.utime(dst, (1_000_000 + idx, 1_000_000 + idx))


def test_stream_fold_equals_batch_apply(spark, tmp_path):
    snapshot = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    batches = [
        # batch 0: update k=1 twice (seq 2 wins), delete k=2
        [(1, "U", 1, "a1"), (1, "U", 2, "a2"), (2, "D", 3, None)],
        # batch 1: re-insert k=2, insert k=9, update k=3
        [(2, "I", 4, "b2"), (9, "I", 5, "z"), (3, "U", 6, "c2")],
        # batch 2: delete k=9 again
        [(9, "D", 7, None)],
    ]
    landing = str(tmp_path / "changes")
    os.makedirs(landing)
    for i, rows in enumerate(batches):
        _write_change_file(spark, landing, i, rows)

    streamed = stream_upsert_cdc(
        spark, snapshot, landing, "k",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    all_changes = spark.createDataFrame(
        [r for b in batches for r in b], CHANGE_SCHEMA
    )
    batch = apply_cdc(snapshot, all_changes, "k")
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    ) == [(1, "a2"), (2, "b2"), (3, "c2")]
