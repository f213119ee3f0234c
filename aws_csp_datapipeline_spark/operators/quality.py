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
