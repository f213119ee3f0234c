"""Physical-layout control: bucketing, partitioned layout, compaction.

The reference delegates layout to Redshift (``DISTSTYLE AUTO
SORTKEY(s_no)``, sql/ddl_create_tables.sql:26). On Spark the same
levers are explicit, and at 100 TB they are the difference between a
co-located join and a full shuffle of the fact table:

- ``write_bucketed`` ≙ DISTKEY: both sides of a recurring equi-join
  written with the same bucket count on the join key join with NO
  exchange — the shuffle is paid once at write time, amortized over
  every subsequent join.
- ``write_table(partition_by=...)`` ≙ coarse partition pruning
  (sinks.py): predicate on the partition column skips whole
  directories before any I/O.
- ``compact_parquet`` is the maintenance pass every incremental
  pipeline needs: streaming/micro-batch appends leave many small
  files; rewriting to size-targeted files restores scan efficiency
  (row-group pruning, fewer tasks, less namenode/listing pressure).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Joins/aggregations keyed on ``bucket_cols`` between tables that
    share ``n_buckets`` read co-located — no Exchange in the plan;
    with matching ``sort_cols`` the per-bucket Sort disappears too."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def parquet_data_files(path: str) -> list[str]:
    """The parquet data files under a table directory (recursive,
    skipping _SUCCESS/_metadata markers)."""
    out = []
    for root, _dirs, files in os.walk(path):
        out.extend(
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
    return out


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a many-small-files parquet directory into
    size-targeted files; returns the output file count. File count is
    sized from the actual on-disk bytes (compression-aware), not row
    counts. Overwrites ``dst_path``."""
    total = sum(os.path.getsize(f) for f in parquet_data_files(src_path))
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_path)
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    return n_files
