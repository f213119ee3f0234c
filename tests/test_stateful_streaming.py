"""Stateful streaming: state carries across micro-batches; watermarks
drop late data. Driven through real Structured Streaming queries on a
multi-file landing directory (one file per micro-batch via
maxFilesPerTrigger)."""

import os
import tempfile

from pyspark.sql import functions as F


def _landing_two_batches(spark, tmpdir):
    """Two parquet files: batch 1 = first half of a small event set,
    batch 2 = second half (so keys span batches)."""
    rows = [
        (i, f"2024-01-01 0{i % 8}:00:00", i % 3, float(i)) for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d1, d2 = df.filter("event_id < 20"), df.filter("event_id >= 20")
    p1, p2 = os.path.join(tmpdir, "b1"), os.path.join(tmpdir, "b2")
    d1.coalesce(1).write.parquet(p1)
    d2.coalesce(1).write.parquet(p2)
    landing = os.path.join(tmpdir, "landing")
    os.makedirs(landing)
    for i, src in enumerate((p1, p2)):
        for f in os.listdir(src):
            if f.endswith(".parquet"):
                os.symlink(os.path.join(src, f), os.path.join(landing, f"f{i}.parquet"))
    return df, landing


def test_stateful_running_totals_across_batches(spark):
    from aws_csp_datapipeline_spark.streaming.stateful import (
        batch_user_totals,
        running_user_totals,
    )

    with tempfile.TemporaryDirectory() as td:
        df, landing = _landing_two_batches(spark, td)
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, value double"
            )
            .option("maxFilesPerTrigger", 1)  # force 2 micro-batches
            .parquet(landing)
        )
        out = running_user_totals(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("running_totals")
            .outputMode("update")
            .option("checkpointLocation", os.path.join(td, "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        # the LAST update per user must equal the batch aggregate
        # (state carried across both micro-batches)
        updates = spark.sql("SELECT * FROM running_totals")
        final = {}
        for r in updates.collect():
            final[r["user_id"]] = (r["n_events"], r["total_value"], r["max_value"])
        expected = {
            r["user_id"]: (r["n_events"], r["total_value"], r["max_value"])
            for r in batch_user_totals(df).collect()
        }
        # per-user maxima over updates == final state == batch result
        got_final = {
            u: max(
                (v for v in [final[u]]), key=lambda t: t[0]
            )
            for u in final
        }
        assert got_final == expected


def test_checkpoint_restart_exactly_once(spark):
    """Exactly-once across a stop/restart: process file 1, stop the
    query, land file 2, restart with the SAME checkpoint and sink —
    file 1 must not be reprocessed, file 2 must land once."""
    with tempfile.TemporaryDirectory() as td:
        landing = os.path.join(td, "landing")
        sink = os.path.join(td, "sink")
        ckpt = os.path.join(td, "ckpt")
        os.makedirs(landing)

        def land(df, name):
            src = os.path.join(td, name)
            df.coalesce(1).write.parquet(src)
            for f in os.listdir(src):
                if f.endswith(".parquet"):
                    os.symlink(
                        os.path.join(src, f), os.path.join(landing, f"{name}.parquet")
                    )

        def run_once():
            stream = spark.readStream.schema("id long, v double").parquet(landing)
            q = (
                stream.writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        land(spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double"), "b1")
        run_once()
        land(spark.createDataFrame([(3, 3.0)], "id long, v double"), "b2")
        run_once()

        rows = sorted(r["id"] for r in spark.read.parquet(sink).collect())
        assert rows == [1, 2, 3]  # each row exactly once across restarts


def test_watermark_drops_late_rows(spark):
    """Append-mode windowed agg with a watermark: a row arriving far
    behind the watermark in a later batch is dropped."""
    with tempfile.TemporaryDirectory() as td:
        # late data merges into UN-evicted state, so the guaranteed
        # drop needs the window emitted+evicted first: b1 sets the
        # watermark past the 10:00 window, b2 advances it further and
        # evicts, b3 delivers the genuinely-too-late row
        on_time = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00", 1.0), (2, "2024-01-01 12:30:00", 1.0)],
            "event_id long, ts string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        closer = spark.createDataFrame(
            [(4, "2024-01-01 15:00:00", 1.0)],
            "event_id long, ts string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        late = spark.createDataFrame(
            [(3, "2024-01-01 10:05:00", 100.0)],  # hours behind the watermark
            "event_id long, ts string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        landing = os.path.join(td, "landing")
        os.makedirs(landing)
        on_time.coalesce(1).write.parquet(os.path.join(td, "b1"))
        closer.coalesce(1).write.parquet(os.path.join(td, "b2"))
        late.coalesce(1).write.parquet(os.path.join(td, "b3"))
        for i, src in enumerate(("b1", "b2", "b3")):
            sdir = os.path.join(td, src)
            for f in os.listdir(sdir):
                if f.endswith(".parquet"):
                    os.symlink(
                        os.path.join(sdir, f), os.path.join(landing, f"f{i}.parquet")
                    )
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("win"))
            .agg(F.sum("value").alias("total"))
            .select(F.col("win.start").alias("ws"), "total")
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("wm_out")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(td, "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        rows = {r["ws"].hour: r["total"] for r in spark.sql("SELECT * FROM wm_out").collect()}
        # the late 100.0 at 10:05 must NOT appear in the 10:00 window
        assert rows.get(10) == 1.0
        assert all(v < 100.0 for v in rows.values())


def test_transform_with_state_matches_batch(spark):
    """transformWithStateInPandas (the Spark 4 named-state API) must
    carry state across micro-batches exactly like the
    applyInPandasWithState twin: the last update per user equals the
    batch aggregate. Skipped (with the gate asserted) when protobuf —
    required by the state-server driver worker — is absent."""
    import pytest

    from aws_csp_datapipeline_spark.streaming.stateful import (
        batch_user_totals,
        have_transform_with_state,
        running_user_totals_tws,
    )

    if not have_transform_with_state():
        with tempfile.TemporaryDirectory() as empty:
            stream = spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, value double"
            ).parquet(empty)
            with pytest.raises(NotImplementedError, match="protobuf"):
                running_user_totals_tws(stream)
        pytest.skip("protobuf not installed: transformWithState gated")

    with tempfile.TemporaryDirectory() as td:
        df, landing = _landing_two_batches(spark, td)
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        out = running_user_totals_tws(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("running_totals_tws")
            .outputMode("update")
            .option("checkpointLocation", os.path.join(td, "ckpt_tws"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        final = {}
        for r in spark.sql("SELECT * FROM running_totals_tws").collect():
            cur = final.get(r["user_id"])
            row = (r["n_events"], r["total_value"], r["max_value"])
            if cur is None or row[0] >= cur[0]:
                final[r["user_id"]] = row
        expected = {
            r["user_id"]: (r["n_events"], r["total_value"], r["max_value"])
            for r in batch_user_totals(df).collect()
        }
        assert final == expected


def test_state_reader_matches_query_state(spark):
    """The statestore batch source must read back exactly the per-key
    aggregation state a stopped streaming query committed, and the
    state-metadata source must describe the operator; the size profile
    accounts for every key."""
    import os
    import tempfile

    from aws_csp_datapipeline_spark.streaming.state_reader import (
        read_state,
        state_metadata,
        state_size_profile,
    )

    with tempfile.TemporaryDirectory() as td:
        src = spark.range(0, 100).select(
            (F.col("id") % 7).alias("user_id"), F.col("id").alias("v")
        )
        landing = os.path.join(td, "landing")
        src.coalesce(1).write.parquet(landing)
        stream = spark.readStream.schema("user_id long, v long").parquet(landing)
        agg = stream.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        ckpt = os.path.join(td, "ckpt")
        q = (
            agg.writeStream.format("memory")
            .queryName("state_reader_t")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

        got = {
            r["key"]["user_id"]: r["value"]["count"]
            for r in read_state(spark, ckpt).collect()
        }
        want = {
            r["user_id"]: r["n"]
            for r in src.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert got == want

        meta = state_metadata(spark, ckpt).collect()
        assert len(meta) == 1 and meta[0]["operatorId"] == 0

        prof = state_size_profile(spark, ckpt)
        assert sum(r["n_keys"] for r in prof.collect()) == len(want)
