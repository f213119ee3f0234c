"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke on sf0.001.
``queries()`` — every implemented operator (SURVEY.md §2) as a
``(spark, sf_dir) -> DataFrame`` callable.
``oracle_sql()`` — DuckDB-runnable ANSI SQL twin per query (omitted
for non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_csp_datapipeline_spark.plans import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
