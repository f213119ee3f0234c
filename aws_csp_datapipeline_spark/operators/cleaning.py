"""Cleaning & schema-evolution operators (SURVEY.md §2.7 F3-F10).

The reference's ingest path normalizes null spellings, coerces
booleans/numbers, and copes with messy date strings
(sample-data/Sample_Input.csv: values like ``23-Dec``, ``Feb-25``,
``2013``, ``-``). Its ALTER TABLE history (sql/ddl_create_tables.sql:
38-50) is schema evolution. All of it is pure column expressions —
JVM-side, codegen'd, no UDFs — so the cleaning layer adds zero Python
overhead per row at any scale.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Null spellings observed in the reference inputs
#: (lambda/lambda_function.py:247-248; Sample_Input.csv throughout).
NULL_SPELLINGS = ("NA", "N/A", "", "-", "null", "NULL")


def normalize_nulls(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    spellings: Sequence[str] = NULL_SPELLINGS,
) -> DataFrame:
    """F3: map the reference's null spellings to SQL NULL on string
    columns (lambda/lambda_function.py:247-248). Trims before
    comparing so ``' N/A '`` also normalizes.
    """
    targets = cols or [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    out = df
    for c in targets:
        out = out.withColumn(
            c,
            F.when(F.trim(F.col(c)).isin(list(spellings)), F.lit(None)).otherwise(
                F.col(c)
            ),
        )
    return out


def coerce_boolean(col: Column) -> Column:
    """F4: case-drifting yes/no/true/false strings → BooleanType
    (the ``can_be_reused_across_csp_teams`` yes/no/Yes/No drift,
    dashboard bottom-right pie)."""
    lowered = F.lower(F.trim(col))
    return (
        F.when(lowered.isin("yes", "true", "y", "1"), F.lit(True))
        .when(lowered.isin("no", "false", "n", "0"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def normalize_enum(col: Column) -> Column:
    """Case/whitespace-drift folding for enum-ish columns
    (``Internal`` vs ``internal`` vs ``Internal `` —
    Sample_Input.csv:57): trim + lower."""
    return F.lower(F.trim(col))


def parse_messy_date(col: Column, default_year: int = 2000) -> Column:
    """F7: messy-date normalizer for the reference's created_date
    strings (``23-Dec``, ``Feb-25``, ``2013``, ``24-Jun``, ``-`` —
    Sample_Input.csv:2-14, stored as VARCHAR per
    sql/ddl_create_tables.sql:14).

    Deterministic, oracle-expressible (regexp + make_date, no UDF):
    - ``yyyy``        → Jan 1 of that year
    - ``dd-MMM``      → default_year, that month/day
    - ``MMM-yy``      → 2000+yy, that month, day 1
    - anything else   → NULL
    """
    s = F.trim(col)
    month_num = _month_to_num(F.lower(F.regexp_extract(s, r"([A-Za-z]{3})", 1)))
    year4 = F.regexp_extract(s, r"^(\d{4})$", 1)
    dd_mmm_day = F.regexp_extract(s, r"^(\d{1,2})-[A-Za-z]{3}$", 1)
    mmm_yy_year = F.regexp_extract(s, r"^[A-Za-z]{3}-(\d{2})$", 1)
    return (
        F.when(year4 != "", F.make_date(year4.cast("int"), F.lit(1), F.lit(1)))
        .when(
            (dd_mmm_day != "") & month_num.isNotNull(),
            F.make_date(F.lit(default_year), month_num, dd_mmm_day.cast("int")),
        )
        .when(
            (mmm_yy_year != "") & month_num.isNotNull(),
            F.make_date(mmm_yy_year.cast("int") + 2000, month_num, F.lit(1)),
        )
        .otherwise(F.lit(None).cast("date"))
    )


def _month_to_num(mmm_lower: Column) -> Column:
    m = F.create_map(
        *[
            x
            for i, name in enumerate(
                ["jan", "feb", "mar", "apr", "may", "jun",
                 "jul", "aug", "sep", "oct", "nov", "dec"]
            )
            for x in (F.lit(name), F.lit(i + 1))
        ]
    )
    return F.element_at(m, mmm_lower)


# ------------------------------------------------ schema evolution (F8-F10)

def add_column_default(df: DataFrame, name: str, default) -> DataFrame:
    """F8: ``ALTER TABLE ... ADD COLUMN x DEFAULT 'N/A'``
    (sql/ddl_create_tables.sql:41-46) as a transformation."""
    return df.withColumn(name, F.lit(default))


def drop_column(df: DataFrame, name: str) -> DataFrame:
    """F9: ``ALTER TABLE ... DROP COLUMN``
    (sql/ddl_create_tables.sql:38-39)."""
    return df.drop(name)


def rename_column(df: DataFrame, old: str, new: str) -> DataFrame:
    """F10: ``ALTER TABLE ... RENAME COLUMN``
    (sql/ddl_create_tables.sql:49-50)."""
    return df.withColumnRenamed(old, new)


def evolve(df: DataFrame, steps: Sequence[Mapping]) -> DataFrame:
    """Apply a recorded schema-evolution history (the reference keeps
    its ALTERs as a script) as a fold of add/drop/rename steps."""
    out = df
    for st in steps:
        kind = st["op"]
        if kind == "add":
            out = add_column_default(out, st["name"], st.get("default"))
        elif kind == "drop":
            out = drop_column(out, st["name"])
        elif kind == "rename":
            out = rename_column(out, st["old"], st["new"])
        else:
            raise ValueError(f"unknown evolution op: {kind}")
    return out


def route_quarantine(
    df: DataFrame, rules: Sequence[tuple[str, Column]], col_name: str = "reason"
) -> DataFrame:
    """Dead-letter routing: tag each row with the FIRST failing rule's
    reason, or 'valid'. ``rules`` is an ordered sequence of
    (reason, invalid_condition). The caller splits the stream with two
    filters on the tag (both prune to the same scan; no double read of
    the raw bytes under parquet/ORC column pruning).

    This is the bulk form of the reference's per-row validation
    replies (the 400-response paths, lambda/lambda_function.py:
    975-1001): bad rows are data, not exceptions — they land in a
    quarantine table for reprocessing instead of failing the job.
    """
    expr: Column = F.lit("valid")
    for reason, cond in reversed(list(rules)):
        expr = F.when(cond, F.lit(reason)).otherwise(expr)
    return df.withColumn(col_name, expr)


def schema_drift(expected, actual) -> dict:
    """Drift report between an expected table schema and an incoming
    frame's schema (both StructType): the out-of-band gap the
    reference bridged by hand-run ALTERs (27-col sample CSV vs 20-col
    DDL; SURVEY.md §1.3, sql/ddl_create_tables.sql:38-50)."""
    exp = {f.name: f.dataType for f in expected.fields}
    act = {f.name: f.dataType for f in actual.fields}
    return {
        "added": sorted(n for n in act if n not in exp),
        "missing": sorted(n for n in exp if n not in act),
        "type_changed": sorted(
            n for n, t in exp.items() if n in act and act[n] != t
        ),
    }


def conform(df: DataFrame, expected, fill=None) -> DataFrame:
    """Conform an incoming frame to the expected schema: drop extra
    columns, add missing ones as ``fill``, cast type drift — the
    automated form of the reference's recorded ALTER bridge, applied
    per batch at ingest so writers never see a drifted shape."""
    cols = []
    have = {f.name: f.dataType for f in df.schema.fields}
    for f in expected.fields:
        if f.name not in have:
            cols.append(F.lit(fill).cast(f.dataType).alias(f.name))
        elif have[f.name] != f.dataType:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)
