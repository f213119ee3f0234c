"""ensure_min_parallelism guard semantics: repartition single-row-group
local extracts, but leave alone (a) many-file inputs, (b) remote
inputs, (c) large local files that already byte-range-split into
enough parquet row-group tasks, and (d) in-memory relations with
enough partitions. No-op is asserted as object identity — the guard
must not add an exchange to the plan in those cases.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from aws_csp_datapipeline_spark.parallelism import (
    _estimated_local_scan_tasks,
    _parse_byte_conf,
    ensure_min_parallelism,
)


def test_parse_byte_conf():
    assert _parse_byte_conf("134217728b") == 128 << 20
    assert _parse_byte_conf("128m") == 128 << 20
    assert _parse_byte_conf("128MB") == 128 << 20
    assert _parse_byte_conf("1g") == 1 << 30
    assert _parse_byte_conf("64") == 64
    assert _parse_byte_conf("garbage", default=7) == 7


def test_single_row_group_extract_repartitions(spark, tmp_path):
    p = str(tmp_path / "small")
    spark.range(1000).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    assert len(df.inputFiles()) == 1
    out = ensure_min_parallelism(df, 8)
    assert out is not df
    assert out.rdd.getNumPartitions() == 8


def test_large_splittable_local_file_is_noop(spark, tmp_path):
    """One LOCAL file, but with many row groups and a small
    maxPartitionBytes it already scans as >= target tasks — the guard
    must not force an extra round-robin exchange (ADVICE r5)."""
    f = str(tmp_path / "big.parquet")
    pq.write_table(
        pa.table({"x": list(range(20000))}), f, row_group_size=200
    )
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1k")
    try:
        df = spark.read.parquet(f)
        assert _estimated_local_scan_tasks(spark, df.inputFiles()) >= 8
        out = ensure_min_parallelism(df, 8)
        assert out is df
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_many_files_is_noop(spark, tmp_path):
    p = str(tmp_path / "many")
    spark.range(1000).repartition(8).write.parquet(p)
    df = spark.read.parquet(p)
    assert len(df.inputFiles()) >= 8
    assert ensure_min_parallelism(df, 8) is df


def test_in_memory_with_enough_partitions_is_noop(spark):
    df = spark.range(0, 1000, 1, 16).toDF("id")
    assert ensure_min_parallelism(df, 8) is df


def test_in_memory_few_partitions_repartitions(spark):
    df = spark.range(0, 100, 1, 1).toDF("id")
    out = ensure_min_parallelism(df, 8)
    assert out.rdd.getNumPartitions() == 8


def test_estimator_counts_row_group_cap(spark, tmp_path):
    """A big file with ONE row group stays one task no matter how many
    byte-range splits it gets."""
    f = str(tmp_path / "one_rg.parquet")
    pq.write_table(pa.table({"x": list(range(20000))}), f, row_group_size=10**9)
    assert os.path.getsize(f) > 4096
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1k")
    try:
        assert _estimated_local_scan_tasks(spark, ["file://" + f]) == 1
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")


def test_corrupt_footer_counts_one_task_and_never_raises(spark, tmp_path):
    """A byte-range-splittable local '.parquet' whose footer pyarrow
    cannot read (ArrowInvalid, which is NOT an OSError) must count as
    ONE scan task — erring toward repartitioning — instead of
    crashing plan construction."""
    f = str(tmp_path / "junk.parquet")
    with open(f, "wb") as fh:
        fh.write(b"\x00" * 4096)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1k")
    try:
        assert _estimated_local_scan_tasks(spark, [f"file://{f}"]) == 1
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
