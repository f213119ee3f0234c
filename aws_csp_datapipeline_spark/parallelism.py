"""Scan-stage parallelism guard for per-row-expensive operators.

A Parquet scan parallelizes at row-group granularity. A table written
as one file with one row group (common for small extracts — and
exactly how the driver's test data is laid out) therefore scans as a
SINGLE task, and every expression evaluated in that scan stage
(shingling, per-char hashing, dot products) runs on one core no
matter how many the session has.

``ensure_min_parallelism`` redistributes a *narrow projection* across
the session's cores before the expensive expressions are applied:

- It must be called on a projection that carries only the columns the
  operator needs (id + text / id + vector), so the exchange moves
  kilobytes per row at most — never the full table width.
- On a real cluster reading real multi-row-group data the scan
  already has >= cores partitions and the guard is a NO-OP (no
  exchange is added to the plan).
- The round-robin repartition also evens out per-row cost skew
  (document lengths are long-tailed), which hash-partitioned or
  file-split inputs do not guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to ``min_partitions`` (default:
    the session's core count) — a no-op when the input layout already
    guarantees at least that many scan tasks.

    The decision reads only ``df.inputFiles()`` (driver-side listing on
    the analyzed plan — no physical planning, no job, and critically no
    ``df.rdd`` conversion, which would force a full plan + RDD-DAG
    build per call on the driver):

    - >= target input files: every file is at least one scan task, the
      guard is a no-op.
    - fewer files but on a remote filesystem (s3/hdfs/...): a cluster
      layout; large parquet files there byte-range-split into many
      tasks, so no exchange is forced onto a 100-TB scan.
    - fewer LOCAL files: the single-file/single-row-group extract this
      guard exists for — repartition the narrow projection.
    - no input files (in-memory test relations) or listing unavailable:
      repartition; the data is driver-created and tiny by construction.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df.repartition(target)
    if len(files) >= target:
        return df
    if files and any(not f.startswith("file:") for f in files):
        return df
    return df.repartition(target)
