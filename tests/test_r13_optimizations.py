"""Round-13 optimization pins.

Each test pins a structural property a round-13 change introduced, so
a later edit (or Spark upgrade) that silently regresses it fails
loudly rather than re-serializing a driver or executor path.
"""

from __future__ import annotations

import os
import shutil
import time

import pytest

from aws_csp_datapipeline_spark import catalog


class TestLoadTableMemo:
    """load_table returns a per-session memoized plan handle: repeated
    reads of an unchanged path must not re-pay the JVM round-trip +
    footer schema inference (measured ~90 ms/call, 82 calls per
    headline registry pass), while a REWRITTEN path must get a fresh
    relation (stat-stamped key)."""

    def test_same_path_same_handle(self, spark, tmp_path):
        df = spark.range(5).selectExpr("id", "id * 2 as v")
        p = tmp_path / "t.parquet"
        df.write.parquet(str(p))
        a = catalog.load_table(spark, str(tmp_path), "t")
        b = catalog.load_table(spark, str(tmp_path), "t")
        assert a is b

    def test_rewrite_invalidates(self, spark, tmp_path):
        p = tmp_path / "t.parquet"
        spark.range(3).write.parquet(str(p))
        a = catalog.load_table(spark, str(tmp_path), "t")
        assert a.count() == 3
        time.sleep(0.02)  # ensure a distinct mtime_ns stamp
        shutil.rmtree(str(p))
        spark.range(7).write.parquet(str(p))
        b = catalog.load_table(spark, str(tmp_path), "t")
        assert b is not a
        assert b.count() == 7

    def test_memo_is_per_session_object(self, spark, tmp_path):
        """A different SparkSession wrapper must not share handles:
        plan objects are bound to the session that created them."""
        p = tmp_path / "t.parquet"
        spark.range(4).write.parquet(str(p))
        a = catalog.load_table(spark, str(tmp_path), "t")
        other = spark.newSession()
        b = catalog.load_table(other, str(tmp_path), "t")
        assert a is not b
        assert b.count() == 4
