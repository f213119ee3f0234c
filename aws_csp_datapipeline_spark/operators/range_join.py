"""Range (interval-containment) join — like the as-of join, an
operator Spark has no native form for, composed from built-ins.

Naive formulation ``left JOIN right ON key AND point BETWEEN start
AND end`` plans as a broadcast-nested-loop or a key-equi-join with a
fat residual — fine per key, catastrophic when keys are hot. The
scalable form bucketizes time: each point maps to ONE bucket, each
interval explodes to the (few) buckets it covers, and the join becomes
a pure equi-join on (key, bucket) + an exact containment filter.
Bucket width tunes fan-out: width ≈ typical interval length ⇒ ≤2
buckets per interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_US_PER_DAY = 86_400_000_000


def interval_join(
    left: DataFrame,
    right: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    key: tuple[str, str] | None = None,
    bucket_days: int = 7,
    how: str = "inner",
) -> DataFrame:
    """Join left rows (a point column) to right rows (an interval
    [start, end)), optionally also on an equality key pair
    ``(left_key, right_key)``. Containment is start <= point < end.
    """
    width = bucket_days * _US_PER_DAY

    def _us(c: str):
        # NTZ columns (parquet isAdjustedToUTC=false) need an explicit
        # cast; with the UTC session the instant is unchanged
        return F.unix_micros(F.col(c).cast("timestamp"))

    l = left.withColumn("__b", (_us(point_ts) / width).cast("long"))
    r = right.withColumn(
        "__bs", (_us(start_ts) / width).cast("long")
    ).withColumn("__be", (_us(end_ts) / width).cast("long"))
    r = r.withColumn("__b", F.explode(F.sequence(F.col("__bs"), F.col("__be")))).drop(
        "__bs", "__be"
    )
    cond = (l["__b"] == r["__b"]) & (
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    )
    if key is not None:
        cond = cond & (l[key[0]] == r[key[1]])
    return l.join(r, cond, how).drop("__b")
