"""As-of (point-in-time) join — an operator Spark has no native form
for, composed from built-ins (preference (a) of the custom-operator
ladder; no Pandas UDF needed).

For each left row, attach the latest right row with the same key and
``right.ts <= left.ts``. Implementation: tag and union both sides,
then one per-key window carries the last-seen right payload forward
(``last(..., ignorenulls=True)`` over rows-between-unbounded-preceding).
Cost: ONE shuffle on the key — same as any keyed join — regardless of
how unbalanced the two sides are; no range-explosion, no per-group
Python. This is the scalable form of pandas ``merge_asof``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    left_cols: list[str] | None = None,
    suffix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every left row, plus the payload of the most
    recent right row at-or-before its timestamp (``direction=
    'backward'``, the default) or the earliest right row at-or-after
    it (``'forward'``). NULLs when none exists. Same single-shuffle
    tagged-union plan either way — forward only flips the window's
    sort direction.

    Tie handling: a right row at exactly left.ts IS visible
    (inclusive), ordered before the left row in the union; among
    right rows sharing a timestamp the highest payload-order row wins
    deterministically via the trailing sort key.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left_cols or [c for c in left.columns if c not in (key, left_ts)]
    tagged_l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_payload],
    )
    tagged_r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    )
    unioned = tagged_l.unionByName(tagged_r)
    ts_ord = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(ts_ord, F.col("__is_left"), F.col(f"__r_{right_payload[0]}"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{suffix}{c}")
            for c in right_payload
        ],
    )
    return (
        carried.filter(F.col("__is_left") == 1)
        .select(
            F.col("__k").alias(key),
            F.col("__ts").alias(left_ts),
            *[F.col(c) for c in lcols],
            *[F.col(f"{suffix}{c}") for c in right_payload],
        )
    )


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    left_cols: list[str] | None = None,
    suffix: str = "nearest_",
) -> DataFrame:
    """Nearest as-of join: every left row, plus the payload of the
    CLOSEST right row in either time direction (tie → the earlier,
    i.e. backward, row). Same single-shuffle tagged-union plan as
    ``asof_join``, with TWO window passes over the one partitioning —
    a backward carry and a forward carry (Spark plans them as two
    sorts inside the same exchange, not two shuffles) — then a
    per-row arbitration on the absolute time gap.
    """
    lcols = left_cols or [c for c in left.columns if c not in (key, left_ts)]
    payload = list(dict.fromkeys([*right_payload, right_ts]))
    tagged_l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        F.lit(None)
        .cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload) + ">"
        )
        .alias("__r"),
    )
    tagged_r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*[F.col(c) for c in payload]).alias("__r"),
    )
    unioned = tagged_l.unionByName(tagged_r)
    wb = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc(), F.col("__r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").desc(), F.col("__is_left").asc(), F.col("__r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        F.last("__r", ignorenulls=True).over(wb).alias("__b"),
        F.last("__r", ignorenulls=True).over(wf).alias("__f"),
    ).filter(F.col("__is_left") == 1)
    b_gap = F.unix_micros(F.col("__ts")) - F.unix_micros(F.col(f"__b.{right_ts}"))
    f_gap = F.unix_micros(F.col(f"__f.{right_ts}")) - F.unix_micros(F.col("__ts"))
    chosen = (
        F.when(F.col("__b").isNull(), F.col("__f"))
        .when(F.col("__f").isNull(), F.col("__b"))
        .when(b_gap <= f_gap, F.col("__b"))
        .otherwise(F.col("__f"))
    )
    return carried.withColumn("__n", chosen).select(
        F.col("__k").alias(key),
        F.col("__ts").alias(left_ts),
        *[F.col(c) for c in lcols],
        *[F.col(f"__n.{c}").alias(f"{suffix}{c}") for c in right_payload],
        F.col(f"__n.{right_ts}").alias(f"{suffix}ts"),
    )
