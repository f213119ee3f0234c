"""Physical layout: partition pruning reaches the scan, bucketed
joins plan without a shuffle, compaction restores file sizes."""

from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.catalog import load_table
from aws_csp_datapipeline_spark.sources import layout as L
from aws_csp_datapipeline_spark.sources.sinks import write_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes_directories(spark, sf_smoke, tmp_path):
    ev = load_table(spark, sf_smoke, "events")
    write_table(ev, str(tmp_path / "ev"), mode="overwrite",
                partition_by=["event_type"])
    back = spark.read.parquet(str(tmp_path / "ev"))
    q = back.filter(F.col("event_type") == "click")
    plan = q._jdf.queryExecution().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters"
    )[1][:120], plan
    want = ev.filter(F.col("event_type") == "click").count()
    assert q.count() == want


def test_bucketed_join_has_no_exchange(spark, sf_smoke):
    o = load_table(spark, sf_smoke, "orders")
    c = load_table(spark, sf_smoke, "customer")
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_customer_b")
    L.write_bucketed(o, "t_orders_b", ["o_custkey"], 8,
                     sort_cols=["o_custkey"])
    L.write_bucketed(c, "t_customer_b", ["c_custkey"], 8,
                     sort_cols=["c_custkey"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ob = spark.table("t_orders_b")
        cb = spark.table("t_customer_b")
        j = ob.join(cb, ob.o_custkey == cb.c_custkey).select(
            "o_orderkey", "c_name"
        )
        n = j.count()
        assert "Exchange" not in _plan(j), _plan(j)
        # un-bucketed baseline DOES shuffle
        plain = o.join(c, o.o_custkey == c.c_custkey).select(
            "o_orderkey", "c_name"
        )
        assert "Exchange" in _plan(plain)
        assert n == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_customer_b")


def test_compact_parquet_reduces_files(spark, sf_smoke, tmp_path):
    ev = load_table(spark, sf_smoke, "events")
    src = str(tmp_path / "many")
    ev.repartition(64).write.parquet(src)
    assert len(L.parquet_data_files(src)) == 64
    dst = str(tmp_path / "compact")
    L.compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    files = L.parquet_data_files(dst)
    assert len(files) == 1
    assert spark.read.parquet(dst).count() == ev.count()


def test_zorder_bounds_both_dimensions(spark, sf_smoke, tmp_path):
    """Z-ordered files must each cover a small sub-rectangle of the
    (custkey, orderkey) space: the mean per-file min-max span of the
    SECOND dimension must be far below the global span, while a
    linear sort on the first dimension leaves it near-global."""
    import pyarrow.parquet as pq

    o = load_table(spark, sf_smoke, "orders").select("o_custkey", "o_orderkey")
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "lin")
    L.write_zordered(o, zdir, "o_custkey", "o_orderkey", n_files=8)
    (o.repartitionByRange(8, "o_custkey").sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(ldir))

    lo, hi = o.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    global_span = hi - lo

    def mean_span(d):
        spans = []
        for f in L.parquet_data_files(d):
            md = pq.ParquetFile(f).metadata
            col_idx = next(
                i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == "o_orderkey"
            )
            mn = min(md.row_group(g).column(col_idx).statistics.min
                     for g in range(md.num_row_groups))
            mx = max(md.row_group(g).column(col_idx).statistics.max
                     for g in range(md.num_row_groups))
            spans.append(mx - mn)
        return sum(spans) / len(spans)

    z_span, lin_span = mean_span(zdir), mean_span(ldir)
    # z-order: each of 8 files covers ~1/4 of dim2 (2 bits of tiling);
    # linear sort leaves dim2 unclustered (~full span per file)
    assert z_span < 0.6 * global_span, (z_span, global_span)
    assert z_span < 0.75 * lin_span, (z_span, lin_span)

    back = spark.read.parquet(zdir)
    assert back.count() == o.count()
