"""Oracle-paired queries for the cleaning / schema-evolution layer
(SURVEY.md §2.7). Messy inputs are derived deterministically from the
test tables so both engines see identical raw strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.catalog import load_table
from aws_csp_datapipeline_spark.operators import cleaning as C
from aws_csp_datapipeline_spark.plans.registry import register

_MONTHS = "janfebmaraprmayjunjulaugsepoctnovdec"


@register(
    "f3_null_normalize",
    """
    WITH raw AS (
      SELECT event_id,
             CASE CAST(event_id % 5 AS INT)
               WHEN 0 THEN 'N/A' WHEN 1 THEN '' WHEN 2 THEN '-'
               WHEN 3 THEN ' NA ' ELSE event_type END AS raw_val
      FROM events WHERE event_id <= 2000
    )
    SELECT event_id, raw_val,
           CASE WHEN trim(raw_val) IN ('NA','N/A','','-','null','NULL')
                THEN NULL ELSE raw_val END AS clean_val
    FROM raw
    """,
)
def f3_null_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: null-spelling normalization (lambda_function.py:247-248) —
    'NA'/'N/A'/''/'-' (± whitespace) → SQL NULL, pure CASE expression.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    raw = ev.select(
        "event_id",
        F.when(F.col("event_id") % 5 == 0, F.lit("N/A"))
        .when(F.col("event_id") % 5 == 1, F.lit(""))
        .when(F.col("event_id") % 5 == 2, F.lit("-"))
        .when(F.col("event_id") % 5 == 3, F.lit(" NA "))
        .otherwise(F.col("event_type"))
        .alias("raw_val"),
    )
    cleaned = C.normalize_nulls(raw, ["raw_val"])
    return raw.withColumnRenamed("raw_val", "__tmp").join(
        cleaned.withColumnRenamed("raw_val", "clean_val"), "event_id"
    ).select("event_id", F.col("__tmp").alias("raw_val"), "clean_val")


@register(
    "f4_coerce_boolean",
    """
    WITH raw AS (
      SELECT o_orderkey,
             CASE CAST(o_orderkey % 6 AS INT)
               WHEN 0 THEN 'yes' WHEN 1 THEN 'No ' WHEN 2 THEN 'TRUE'
               WHEN 3 THEN '0' WHEN 4 THEN 'maybe' ELSE NULL END AS raw_bool
      FROM orders WHERE o_orderkey <= 3000
    )
    SELECT o_orderkey, raw_bool,
           CASE WHEN lower(trim(raw_bool)) IN ('yes','true','y','1') THEN TRUE
                WHEN lower(trim(raw_bool)) IN ('no','false','n','0') THEN FALSE
                ELSE NULL END AS coerced
    FROM raw
    """,
)
def f4_coerce_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: case-drifting yes/no booleans → BooleanType (the
    can_be_reused yes/no/Yes/No drift; lambda_function.py:249-250)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000)
    raw = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 6 == 0, F.lit("yes"))
        .when(F.col("o_orderkey") % 6 == 1, F.lit("No "))
        .when(F.col("o_orderkey") % 6 == 2, F.lit("TRUE"))
        .when(F.col("o_orderkey") % 6 == 3, F.lit("0"))
        .when(F.col("o_orderkey") % 6 == 4, F.lit("maybe"))
        .otherwise(F.lit(None).cast("string"))
        .alias("raw_bool"),
    )
    return raw.withColumn("coerced", C.coerce_boolean(F.col("raw_bool")))


@register(
    "f7_messy_dates",
    f"""
    WITH raw AS (
      SELECT o_orderkey,
             CASE CAST(o_orderkey % 4 AS INT)
               WHEN 0 THEN strftime(o_orderdate, '%d-%b')
               WHEN 1 THEN strftime(o_orderdate, '%b-%y')
               WHEN 2 THEN strftime(o_orderdate, '%Y')
               ELSE '-' END AS raw_date
      FROM orders WHERE o_orderkey <= 2000
    )
    SELECT o_orderkey, raw_date,
      CASE
        WHEN regexp_matches(raw_date, '^\\d{{4}}$')
          THEN make_date(CAST(raw_date AS INT), 1, 1)
        WHEN regexp_matches(raw_date, '^\\d{{1,2}}-[A-Za-z]{{3}}$')
          THEN make_date(2000,
                 CAST(((strpos('{_MONTHS}',
                        lower(regexp_extract(raw_date,'([A-Za-z]{{3}})',1)))-1)//3)+1 AS INT),
                 CAST(regexp_extract(raw_date,'^(\\d{{1,2}})',1) AS INT))
        WHEN regexp_matches(raw_date, '^[A-Za-z]{{3}}-\\d{{2}}$')
          THEN make_date(2000 + CAST(regexp_extract(raw_date,'(\\d{{2}})$',1) AS INT),
                 CAST(((strpos('{_MONTHS}',
                        lower(regexp_extract(raw_date,'([A-Za-z]{{3}})',1)))-1)//3)+1 AS INT),
                 1)
        ELSE NULL END AS parsed_date
    FROM raw
    """,
)
def f7_messy_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: the messy-date normalizer over reference-shaped strings
    (``23-Dec``, ``Feb-25``, ``2013``, ``-`` —
    sample-data/Sample_Input.csv:2-14). Deterministic CASE+regexp, no
    UDF, so DuckDB expresses the same parse."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    raw = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 4 == 0, F.date_format("o_orderdate", "dd-MMM"))
        .when(F.col("o_orderkey") % 4 == 1, F.date_format("o_orderdate", "MMM-yy"))
        .when(F.col("o_orderkey") % 4 == 2, F.date_format("o_orderdate", "yyyy"))
        .otherwise(F.lit("-"))
        .alias("raw_date"),
    )
    return raw.withColumn("parsed_date", C.parse_messy_date(F.col("raw_date")))


@register(
    "f8_schema_evolution",
    """
    SELECT n_nationkey, n_name AS nation_name, 'N/A' AS status
    FROM nation
    """,
)
def f8_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8-F10: the reference's recorded ALTER history
    (sql/ddl_create_tables.sql:38-50) as a fold of add/drop/rename
    transformations."""
    n = load_table(spark, sf_dir, "nation")
    return C.evolve(
        n,
        [
            {"op": "add", "name": "status", "default": "N/A"},
            {"op": "rename", "old": "n_name", "new": "nation_name"},
            {"op": "drop", "name": "n_regionkey"},
        ],
    )


@register(
    "f1_enum_fold",
    """
    SELECT lower(trim(o_orderpriority)) AS priority_norm, COUNT(*) AS cnt
    FROM orders GROUP BY lower(trim(o_orderpriority))
    """,
)
def f1_enum_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 + enum-drift folding (``Internal`` vs ``internal `` —
    Sample_Input.csv:57): trim+lower before grouping."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(C.normalize_enum(F.col("o_orderpriority")).alias("priority_norm"))
        .groupBy("priority_norm")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
