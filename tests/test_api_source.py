"""Custom Python Data Source (paged_api): the paginated-API ingest
shape as a real Spark source — partition-per-page, executor-side
fetch, full DataFrame composability downstream."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.sources.api_source import register_paged_api


def test_paged_api_reads_all_pages(spark):
    register_paged_api(spark)
    df = (
        spark.read.format("paged_api")
        .option("pages", 6)
        .option("page_size", 50)
        .load()
    )
    assert df.count() == 300
    # every page arrived exactly once, each with its full record run
    per_page = {
        r["page"]: (r["n"], r["lo"], r["hi"])
        for r in df.groupBy("page")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("rec_id").alias("lo"),
            F.max("rec_id").alias("hi"),
        )
        .collect()
    }
    assert set(per_page) == set(range(6))
    for p, (n, lo, hi) in per_page.items():
        assert (n, lo, hi) == (50, p * 50, p * 50 + 49)


def test_paged_api_partitions_per_page(spark):
    """The point of the source: each page is its own input partition,
    so the fetch parallelizes across executors."""
    register_paged_api(spark)
    df = spark.read.format("paged_api").option("pages", 5).load()
    parts = df.select(F.spark_partition_id().alias("pid"), "page").distinct()
    # 5 pages -> 5 scan partitions, and no page spans two partitions
    assert parts.select("pid").distinct().count() == 5
    assert parts.count() == 5


def test_paged_api_composes_downstream(spark):
    register_paged_api(spark)
    df = (
        spark.read.format("paged_api")
        .option("pages", 3)
        .option("page_size", 10)
        .load()
    )
    out = (
        df.filter(F.col("rec_id") % 2 == 0)
        .groupBy("page")
        .agg(F.count(F.lit(1)).alias("n_even"))
        .orderBy("page")
        .collect()
    )
    assert [(r["page"], r["n_even"]) for r in out] == [(0, 5), (1, 5), (2, 5)]


def test_paged_api_streaming_drains_and_restarts_exactly_once(spark, tmp_path):
    """Streaming lane: the page cursor is the checkpointed offset.
    Run 1 sees 2 pages and lands them; two more pages 'arrive' (the
    source reports pages=4) and run 2 on the SAME checkpoint must
    land ONLY the new pages — no replay, no gap; run 3 with no new
    pages lands nothing."""
    register_paged_api(spark)
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def run_once(pages):
        stream = (
            spark.readStream.format("paged_api")
            .option("pages", pages)
            .option("page_size", 25)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once(pages=2)
    first = spark.read.parquet(sink)
    assert first.count() == 50
    assert first.select("rec_id").distinct().count() == 50

    run_once(pages=4)  # pages 2-3 arrived since the last commit
    second = spark.read.parquet(sink)
    assert second.count() == 100
    assert second.select("rec_id").distinct().count() == 100  # no dupes

    run_once(pages=4)  # cursor drained: nothing reprocessed
    assert spark.read.parquet(sink).count() == 100
