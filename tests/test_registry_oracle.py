"""Run every oracle-paired registry query against DuckDB at sf0.01 —
the same check the driver's correctness gate performs.
"""

import pytest

from aws_csp_datapipeline_spark.plans import registry
from tests.oracle import compare

SPECS = [s for s in registry.specs() if s.oracle is not None]


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_oracle_match(spark, sf_oracle, spec):
    df = spec.fn(spark, sf_oracle)
    compare(df, spec.oracle, sf_oracle)


def test_entry_smoke(spark, sf_smoke):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_rows_only_queries_run(spark, sf_smoke):
    for s in registry.specs():
        if s.oracle is None:
            assert s.fn(spark, sf_smoke).count() >= 0, s.name
