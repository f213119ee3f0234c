"""Slowly-changing-dimension type 2 (versioned upsert) — the
dimension-history operator an ETL warehouse adds once "Add more
tables for dimensional modelling" (reference README.md:116) becomes
real. Pure snapshot transformation: close current versions of changed
keys, append the new versions; one broadcast join, big side never
shuffles."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    change_ts,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension.

    ``dim``: (key, attrs..., effective_from, effective_to) with
    NULL effective_to marking current rows. ``updates``: (key,
    attrs...). Changed keys get their current row closed at
    ``change_ts`` and a new open version appended; rows whose attrs
    are unchanged are left untouched (no spurious versions).
    """
    ts = F.lit(change_ts).cast("timestamp")
    upd = updates.select(
        F.col(key),
        F.lit(True).alias("__has_upd"),
        *[F.col(a).alias(f"__u_{a}") for a in attrs],
    )
    joined = dim.join(F.broadcast(upd), key, "left")

    # current row of a key that has an update with any attr differing
    # (null-safe comparison)
    changed = (
        F.col(to_col).isNull()
        & F.coalesce(F.col("__has_upd"), F.lit(False))
        & ~F.expr(" AND ".join(f"({a} <=> __u_{a})" for a in attrs))
    )

    closed = joined.withColumn(
        to_col, F.when(changed, ts).otherwise(F.col(to_col))
    ).select(*dim.columns)

    new_versions = (
        joined.filter(changed)
        .select(
            F.col(key),
            *[F.col(f"__u_{a}").alias(a) for a in attrs],
            ts.alias(from_col),
            F.lit(None).cast("timestamp").alias(to_col),
        )
        .select(*dim.columns)
    )
    return closed.unionByName(new_versions)


def pit_lookup(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    fact_ts: str,
    effective_from: str = "effective_from",
    effective_to: str = "effective_to",
    broadcast_dim: bool = False,
) -> DataFrame:
    """Point-in-time dimension lookup: join each fact row to the SCD2
    version that was valid at its timestamp (from ≤ ts < to, open
    version when ``effective_to`` IS NULL) — the read side of
    ``scd2_apply``. The equality on the dim key drives the join and
    the validity range rides as a residual predicate, so this is a
    hash/merge join on the key, never a range explosion. A versioned
    dim can itself be data-scaled (billions of customer versions), so
    there is no broadcast hint: statistics + AQE broadcast genuinely
    small dims and fall back to a keyed shuffle join for big ones.
    Pass ``broadcast_dim=True`` only when the caller KNOWS the dim is
    bounded."""
    cond = (
        (fact[fact_key] == dim[dim_key])
        & (fact[fact_ts] >= dim[effective_from])
        & (dim[effective_to].isNull() | (fact[fact_ts] < dim[effective_to]))
    )
    return fact.join(F.broadcast(dim) if broadcast_dim else dim, cond)
