"""Count-Min Sketch built from plain DataFrame aggregations.

A CMS is d hash rows × w buckets of counters; estimate(key) = min over
rows of its bucket's counter (always an overestimate, error ≤ εN with
ε ≈ e/w at high probability). Because the sketch is just a (seed,
bucket) → count table, it is mergeable by UNION + re-aggregate —
per-partition / per-day sketches roll up exactly like a17's HLL
sketches, which is what makes frequency monitoring affordable over a
100-TB event history: the persisted state is d×w integers per grain,
re-aggregable to any coarser grain without re-scanning raw data.

Spark-first: the build is one explode(d tags) + one partial-aggregated
groupBy — no UDFs, no driver state; xxhash64(key, seed) keeps the hash
family inside whole-stage codegen. (Spark's own F.count_min_sketch
emits an opaque binary; this relational form stays queryable/mergeable
with plain SQL, which the pipeline needs.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_build(
    df: DataFrame, key: Column, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the (seed, bucket, cnt) sketch table for ``key`` over all
    rows of ``df``. At most depth × width rows come out of the one
    shuffle; the explode multiplies rows before the map-side partial
    aggregation, so the exchange itself carries only per-partition
    bucket partials."""
    tagged = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        F.pmod(F.xxhash64(key, F.lit(s)), F.lit(width)).alias(
                            "bucket"
                        ),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("t")
    )
    return (
        tagged.select("t.seed", "t.bucket")
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, candidates: DataFrame, key_col: str, depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Estimated frequency for each candidate key: join each key's d
    (seed, bucket) coordinates against the sketch and take the MIN
    counter. The sketch is d×w rows → broadcast; candidates never
    shuffle."""
    key = F.col(key_col)
    coords = candidates.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        F.pmod(F.xxhash64(key, F.lit(s)), F.lit(width)).alias(
                            "bucket"
                        ),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("t"),
    ).select(key_col, "t.seed", "t.bucket")
    return (
        coords.join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est_count"))
    )
