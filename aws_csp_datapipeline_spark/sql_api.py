"""SQL front end: register the catalog as temp views and run SQL.

Catalyst produces the same plan for SQL and DataFrame formulations;
this surface exists so reference users who think in SQL (the
reference's analysts wrote raw SQL, sql/ddl_create_tables.sql:28-72)
can run the engine without touching the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aws_csp_datapipeline_spark.catalog import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)
