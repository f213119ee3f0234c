"""Data-quality operators: column profiling, referential-integrity
audits, and snapshot reconciliation.

The reference has no explicit quality layer, but its ingest path
implies one — null-spelling normalization (lambda_function.py:247-248)
and the insert-if-absent existence probe (lambda_function.py:342-364)
are point fixes for exactly the defects these operators measure in
bulk. A 100-TB pipeline runs these as gate checks between stages.

Scale notes:
- ``profile_columns`` is ONE scan: every per-column statistic is an
  aggregate expression in a single ``agg`` (count-distincts expand via
  Catalyst's Expand, still one pass over the data), and the wide
  1-row result is re-shaped driver-free with ``stack``.
- ``orphan_counts`` is one left-anti join per declared FK; Catalyst
  broadcasts small parents, AQE shuffles large ones. Only per-relation
  scalar counts ever cross the network.
- ``snapshot_diff`` is a single full-outer join on the key, comparing
  columns null-safely — no row hashing, so no cross-engine hash/
  serialization contract, and Catalyst prunes to key+compare columns.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column profile: (column_name, n_rows, n_nulls, n_distinct).

    One job, one scan. NULLs are excluded from n_distinct (SQL
    COUNT(DISTINCT col) semantics on both engines).
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', `__nn_{c}`, `__nd_{c}`" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (column_name, n_nulls, n_distinct)",
        "n_rows",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct")


def orphan_counts(
    checks: Sequence[tuple[str, DataFrame, Column, DataFrame, Column]],
) -> DataFrame:
    """Referential-integrity audit: for each (name, child, child_key,
    parent, parent_key), count child rows whose key has no parent.
    Returns (relation, n_orphans), one row per declared FK.

    NULL child keys never match an anti-join probe, so they count as
    orphans — the strict reading of an FK constraint.
    """
    parts = []
    for name, child, ckey, parent, pkey in checks:
        orphans = child.join(parent, ckey == pkey, "left_anti")
        parts.append(
            orphans.agg(F.count(F.lit(1)).alias("n_orphans")).select(
                F.lit(name).alias("relation"), "n_orphans"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Row-level reconciliation of two snapshots of a keyed table:
    key columns + ``diff_status`` ∈ {added, removed, changed,
    unchanged}. The CDC-validation / anti-entropy primitive.

    Full-outer join on the key; compare columns are checked with
    null-safe inequality (IS DISTINCT FROM), so NULL→value edits
    register as changes.
    """
    o = old.select(*key_cols, *compare_cols).alias("o")
    n = new.select(*key_cols, *compare_cols).alias("n")
    cond = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in key_cols]
    joined = o.join(n, cond, "full_outer")
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    status = (
        F.when(F.col(f"o.{key_cols[0]}").isNull(), F.lit("added"))
        .when(F.col(f"n.{key_cols[0]}").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    keys = [
        F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in key_cols
    ]
    return joined.select(*keys, status.alias("diff_status"))


def duplicate_key_audit(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Uniqueness expectation: (n_dup_keys, max_multiplicity) for a
    declared natural key. Two aggregations, the second over the
    (already tiny after the HAVING-style filter) per-key counts."""
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("m"))
    dups = per_key.filter(F.col("m") > 1)
    return dups.agg(
        F.count(F.lit(1)).alias("n_dup_keys"),
        F.coalesce(F.max("m"), F.lit(1)).alias("max_multiplicity"),
    )

@dataclass(frozen=True)
class FunctionalDependency:
    """X → Y declaration: ``name`` labels the output row,
    ``determinants`` is X (1+ columns), ``dependent`` is Y (single
    column — the min/max combiner trick is single-dependent)."""

    name: str
    determinants: tuple[str, ...]
    dependent: str


def fd_violation_counts(
    df: DataFrame, deps: list[FunctionalDependency]
) -> DataFrame:
    """Count violating determinant values for EVERY declared
    dependency of one table in a SINGLE pass: (dependency,
    violating_keys), one row per dependency.

    How the single scan works — a manual, narrow Expand: each input
    row explodes into k copies, copy j carrying ONLY dependency j's
    (fd tag, stringified determinant tuple, stringified dependent).
    One hash aggregate on (fd, keys) computes min/max of the
    dependent; `min != max` detects "more than one distinct value"
    exactly (for strings as for any type — min != max ⇔ ≥2 distinct),
    with COUNT(DISTINCT)-compatible NULL semantics for free (min/max
    skip NULLs; all-NULL ⇒ NULL ≠ NULL ⇒ NULL ⇒ not a violation).

    Why not `groupingSets`: Spark's Expand for grouping sets carries
    every dependent column into every copy and computes all k min/max
    aggregate pairs per grouping set — shuffle rows 2k values wide
    plus the padded determinant union. The explode form keeps each
    copy exactly (tag, keys, dep) — the same per-row shuffle width as
    k separate passes — while still reading the table once. Why not a
    union of k per-FD projections: a self-union plans k separate
    scans, which is precisely the cost being removed.

    Scale shape: one scan of the union of referenced columns (column
    pruning intact — only det∪dep columns are read), one shuffle of
    k·N narrow rows with map-side partial aggregation, one tiny
    per-fd count. Slot types stay NATIVE whenever the FDs agree on a
    type family per position (integrals promote to long, the common
    audit case — key→key dependencies): a first cut stringified every
    slot for type uniformity and measured 5× SLOWER than the k-pass
    form at sf0.1 (per-row string allocation + string-keyed hash
    aggregation swamped the saved scans), so strings are only the
    fallback for genuinely mixed-type slots. min/max is only ever
    compared for EQUALITY (min != max ⇔ ≥2 distinct), so the cast
    never changes the verdict — any injective per-column mapping
    preserves it.

    Measured — both regimes (SCALE.md "dq19"): on PAGE-CACHED local
    parquet the k-pass form wins or washes (k-pass med 1.62 s vs
    shared 2.78 s at sf0.1; 235.3 vs 240.9 s at sf100 warm) because
    decode is CPU-cheap relative to the ×k explode through the
    aggregate. COLD — page cache dropped before each run, fresh JVM,
    alternating forms, 11 GB sf100 lineitem (round-11 A/B) — the
    shared scan wins both reps: 266.3/281.6 s vs k-pass 282.8/312.8 s
    (1.06×/1.11×), the bytes-read-dominated regime this form exists
    for. The gap is bounded here because the three FDs share most
    columns (6 vs 4 column-chunk reads); disjoint-column FD sets and
    object-store scans widen it.
    """
    k_max = max(len(d.determinants) for d in deps)
    dtypes = dict(df.dtypes)
    _INTEGRAL = {"tinyint", "smallint", "int", "bigint"}

    def slot_type(cols: list[str]) -> str:
        ts = {dtypes[c] for c in cols}
        if len(ts) == 1:
            return ts.pop()
        if ts <= _INTEGRAL:
            return "bigint"
        return "string"  # mixed-type slot: injective fallback

    key_types = [
        slot_type(
            [d.determinants[i] for d in deps if i < len(d.determinants)]
        )
        for i in range(k_max)
    ]
    dep_type = slot_type([d.dependent for d in deps])
    # the per-row FD tag is a SMALL INT, not the name string — the tag
    # rides every exploded/shuffled row, and a 20-30 byte string key
    # (hashed per row, k·N times) is pure overhead when a byte works;
    # names join back onto the k-row result at the end
    copies = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("fd"),
                *[
                    (
                        F.col(d.determinants[i]).cast(key_types[i])
                        if i < len(d.determinants)
                        else F.lit(None).cast(key_types[i])
                    ).alias(f"k{i}")
                    for i in range(k_max)
                ],
                F.col(d.dependent).cast(dep_type).alias("dep"),
            )
            for j, d in enumerate(deps)
        ]
    )
    # spread the narrow det∪dep projection before the ×k explode
    # (r12): the explode + map-side partial aggregation is the
    # per-row-expensive step, and a few-row-group local extract
    # otherwise runs it at scan parallelism (measured 1.7 s at 3
    # tasks for sf0.1 lineitem). No-op on real multi-row-group
    # layouts, where the scan already has ≥ cores tasks — the cold
    # sf100 single-scan story is unchanged.
    from aws_csp_datapipeline_spark.parallelism import ensure_min_parallelism

    referenced: list[str] = []
    for d in deps:
        for c in (*d.determinants, d.dependent):
            if c not in referenced:
                referenced.append(c)
    exploded = (
        ensure_min_parallelism(df.select(*referenced))
        .select(F.explode(copies).alias("c"))
        .select("c.*")
    )
    key_cols = ["fd"] + [f"k{i}" for i in range(k_max)]
    per_key = exploded.groupBy(*key_cols).agg(
        F.min("dep").alias("lo"), F.max("dep").alias("hi")
    )
    violating = per_key.filter(F.col("lo") != F.col("hi"))
    counts = violating.groupBy("fd").agg(
        F.count(F.lit(1)).cast("long").alias("violating_keys")
    )
    # dependencies with zero violations still get a row (the audit
    # contract: absence of a row must never read as "not checked")
    names = df.sparkSession.createDataFrame(
        [(j, d.name) for j, d in enumerate(deps)], "fd int, dependency string"
    )
    return (
        names.join(counts, "fd", "left")
        .select(
            "dependency",
            F.coalesce("violating_keys", F.lit(0).cast("long")).alias(
                "violating_keys"
            ),
        )
    )
