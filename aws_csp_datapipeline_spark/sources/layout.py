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


def zorder_key(c1, c2, min1, max1, min2, max2, bits: int = 16):
    """Z-order (Morton) key over two numeric columns: each value is
    min-max normalized to ``bits`` bits and the bit strings are
    interleaved — points close in BOTH dimensions get close keys, so
    sorting by the key clusters the 2-D space into file-sized tiles.
    Pure column expression (32 shift/or terms for bits=16)."""
    from pyspark.sql import functions as F

    def norm(c, lo, hi):
        span = float(hi - lo) or 1.0
        scaled = (c.cast("double") - float(lo)) * ((1 << bits) - 1) / span
        return F.round(scaled).cast("long")

    x, y = norm(c1, min1, max1), norm(c2, min2, max2)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    return z


def write_zordered(
    df: DataFrame, path: str, col1: str, col2: str, n_files: int = 8, bits: int = 16
) -> None:
    """Write parquet clustered by the Z-order key of (col1, col2) —
    the SORTKEY analog for TWO query dimensions: each output file
    covers a bounded sub-rectangle, so min/max row-group stats prune
    scans filtered on EITHER column (a linear sort only prunes its
    leading column). One tiny stats agg (4 scalars) + one range
    repartition by the key."""
    from pyspark.sql import functions as F

    lo1, hi1, lo2, hi2 = df.agg(
        F.min(col1), F.max(col1), F.min(col2), F.max(col2)
    ).first()
    z = zorder_key(F.col(col1), F.col(col2), lo1, hi1, lo2, hi2, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
