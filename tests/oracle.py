"""Local mirror of the driver's DuckDB-oracle correctness gate:
row-count + column-name set + order-insensitive value comparison,
with float rounding so engine-order summation drift can't flake.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb

from aws_csp_datapipeline_spark.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # fold -0.0: engines disagree on its sign
        # absorb last-bit drift beyond the explicit ROUNDs in queries
        return round(v, 6)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def assert_type_parity(spark_df, rel) -> None:
    """Hard-fail oracle/Spark result-TYPE divergence.

    The external driver's value hash is result-type sensitive: round 8
    hash-failed dq9/dq13/mm4 on HUGEINT / DECIMAL(38,0) oracle columns
    with bit-identical values, while this module's Python-value compare
    (Decimal('15000') == 15000) was blind to it. This closes that gap:
    every column's canonical type must match, and the proven-fatal
    types (int128, wide decimals) are rejected even when both sides
    declare them (dq13 failed with DECIMAL(38,0) on BOTH sides)."""
    from tools.type_parity import (
        column_report,
        duck_canonical_schema,
        spark_canonical_schema,
    )

    mismatches = list(
        column_report(duck_canonical_schema(rel), spark_canonical_schema(spark_df))
    )
    assert not mismatches, (
        "result-type parity failure (driver hash is type-sensitive): "
        + "; ".join(f"{c}: oracle={d} spark={s}" for c, d, s, _ in mismatches)
    )


def _assert_no_negzero(rows, cols, side: str) -> None:
    """The driver's value hash is sign-of-zero sensitive while this
    module's _norm_cell folds -0.0 — which is exactly how r11's ml2
    defect shipped: DuckDB's ROUND preserves -0.0 (Spark's never
    does). A -0.0 in either result means the query pair is missing
    the `+ 0` zero-fold after a ROUND of a signed quantity."""
    def neg0(v) -> bool:
        if isinstance(v, float):
            return v == 0.0 and math.copysign(1.0, v) < 0
        if isinstance(v, (list, tuple)):
            return any(neg0(x) for x in v)
        return False

    for r in rows:
        for c, v in zip(cols, r):
            if neg0(v):
                raise AssertionError(
                    f"IEEE -0.0 in {side} column {c!r}: the driver hash "
                    "distinguishes it from +0.0 — add a `+ 0` zero-fold "
                    "after the ROUND on the oracle side (registry.py "
                    "float discipline)"
                )


def compare(spark_df, sql: str, sf_dir: str) -> None:
    """Assert the Spark result and the DuckDB oracle result match."""
    con = duck_connection(sf_dir)
    try:
        rel = con.sql(sql)
        assert_type_parity(spark_df, rel)
        exp_cols = list(rel.columns)
        exp_rows = rel.fetchall()
    finally:
        con.close()

    got_cols = list(spark_df.columns)
    got_rows = [tuple(r) for r in spark_df.collect()]
    _assert_no_negzero(exp_rows, exp_cols, "oracle")
    _assert_no_negzero(got_rows, got_cols, "spark")

    assert sorted(got_cols) == sorted(exp_cols), (
        f"column mismatch: spark={sorted(got_cols)} oracle={sorted(exp_cols)}"
    )
    assert len(got_rows) == len(exp_rows), (
        f"row count mismatch: spark={len(got_rows)} oracle={len(exp_rows)}"
    )
    got_n = _normalize(got_rows, got_cols)
    exp_n = _normalize(exp_rows, exp_cols)
    if got_n != exp_n:
        diffs = [(g, e) for g, e in zip(got_n, exp_n) if g != e][:5]
        raise AssertionError(f"value mismatch; first diffs (spark, oracle): {diffs}")
