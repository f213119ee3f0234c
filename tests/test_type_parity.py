"""The result-type parity gate (tools/type_parity.py + the
``assert_type_parity`` hook inside tests/oracle.compare).

Round 8's defining miss: dq9/dq13/mm4 hash-failed at the external
driver on oracle columns typed HUGEINT / DECIMAL(38,0) while every
VALUE was identical — and both local gates compared Python values
(Decimal('15000') == 15000 is True) so 516 green tests shipped a red
attestation. These tests prove the gate now catches that class:
the PRE-fix dq9 oracle (uncast SUM → HUGEINT) must fail, the fixed
one must pass, and the proven-fatal types are rejected even when
both sides declare them.
"""

import pytest

from aws_csp_datapipeline_spark.catalog import load_table
from tests.oracle import compare
from tools.type_parity import _canon_duck, _canon_spark, classify

# dq9's round-8 oracle, verbatim minus the CAST the fix added: DuckDB
# types SUM(CASE...) over INTEGER as HUGEINT -> the driver hash-fails
# it against Spark's BIGINT even though every value matches.
_DQ9_PREFIX_SQL = """
    WITH stats AS (
      SELECT event_type, COUNT(*) AS n,
             ROUND(AVG(value) - 3 * stddev_samp(value), 6) AS lo_bound,
             ROUND(AVG(value) + 3 * stddev_samp(value), 6) AS hi_bound
      FROM events GROUP BY event_type
    )
    SELECT s.event_type, s.n,
           ROUND(s.lo_bound, 4) AS lo,
           ROUND(s.hi_bound, 4) AS hi,
           SUM(CASE WHEN e.value < s.lo_bound OR e.value > s.hi_bound
                    THEN 1 ELSE 0 END) AS n_outliers
    FROM events e JOIN stats s USING (event_type)
    GROUP BY s.event_type, s.n, s.lo_bound, s.hi_bound
"""


def _dq9_df(spark, sf_dir):
    from aws_csp_datapipeline_spark.plans.q_analytics6 import dq9_outlier_audit

    return dq9_outlier_audit(spark, sf_dir)


def test_gate_rejects_prefix_dq9_hugeint_oracle(spark, sf_oracle):
    """The exact r8 failure: identical values, HUGEINT oracle column.
    Pre-fix this passed the local gate and failed the driver; now the
    local gate must fail it too."""
    df = _dq9_df(spark, sf_oracle)
    with pytest.raises(AssertionError, match="type parity"):
        compare(df, _DQ9_PREFIX_SQL, sf_oracle)


def test_gate_passes_fixed_dq9(spark, sf_oracle):
    from aws_csp_datapipeline_spark.plans import registry

    spec = {s.name: s for s in registry.specs()}["dq9_outlier_audit"]
    compare(spec.fn(spark, sf_oracle), spec.oracle, sf_oracle)


def test_gate_rejects_decimal38_even_when_both_sides_match(spark, sf_oracle):
    """dq13's r8 lesson: DECIMAL(38,0) on BOTH sides still hash-fails
    (the two engines fetch wide decimals through different Python/
    Arrow representations), so declared-equal wide decimals are
    rejected outright."""
    df = (
        load_table(spark, sf_oracle, "orders")
        .selectExpr("CAST(COUNT(*) AS DECIMAL(38,0)) AS n")
    )
    with pytest.raises(AssertionError, match="type parity"):
        compare(df, "SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n FROM orders",
                sf_oracle)


def test_classify_matrix():
    # parity
    assert classify("int64", "int64") is None
    assert classify("array<float64>", "array<float64>") is None
    # plain width mismatch: empirically survives the driver hash but
    # is still flagged so the sweep converges to zero
    assert classify("int64", "int32") == "HARD"
    # proven-fatal types, even self-paired
    assert classify("int128", "int128") == "HARD"
    assert classify("decimal(38,0)", "decimal(38,0)") == "HARD"
    assert classify("decimal(38,0)", "int64") == "HARD"
    # narrow decimals with equal precision/scale are allowed
    assert classify("decimal(12,2)", "decimal(12,2)") is None


def test_canonicalization():
    assert _canon_duck("HUGEINT") == "int128"
    assert _canon_duck("DECIMAL(38,0)") == "decimal(38,0)"
    assert _canon_duck("INTEGER[]") == "array<int32>"
    assert _canon_duck("MAP(VARCHAR, BIGINT)") == "map<string,int64>"
    assert _canon_duck("TIMESTAMP_NS") == "timestamp"
    assert _canon_spark("bigint") == "int64"
    assert _canon_spark("timestamp_ntz") == "timestamp"
    assert _canon_spark("array<double>") == "array<float64>"
    assert _canon_spark("map<string,bigint>") == "map<string,int64>"
    assert _canon_spark("struct<a:int,b:string>") == "struct<a:int32,b:string>"
    assert _canon_duck('STRUCT(a INTEGER, b VARCHAR)') == "struct<a:int32,b:string>"
