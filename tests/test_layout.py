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
