"""End-to-end Phase-1 parity: the reference's whole ingest flow
(architecture/CSP Tools Architecture - Phase1.png — "CSV/Excel upload
→ Lambda ETL → locked Redshift table → dashboard"), composed entirely
from this repo's operators:

    Excel + CSV landing files  (sources.excel_source / csv_source)
 →  cleaning ops               (operators.cleaning: nulls, dates, bools)
 →  serial-key insert under optimistic concurrency
                               (operators.crud + sources.snapshot_store
                                — the lock's guarantee, lock-free)
 →  soft-delete visibility query + dashboard aggregate
                               (operators.crud.visible / relational)

A user of the reference dropping their real input files onto this
engine exercises exactly this path.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.operators.cleaning import (
    coerce_boolean,
    normalize_nulls,
    parse_messy_date,
)
from aws_csp_datapipeline_spark.operators.crud import (
    assign_serial_keys,
    soft_delete,
)
from aws_csp_datapipeline_spark.operators.relational import visible
from aws_csp_datapipeline_spark.sources.csv_source import read_messy_csv
from aws_csp_datapipeline_spark.sources.excel_source import read_excel_local
from aws_csp_datapipeline_spark.sources.snapshot_store import SnapshotStore
from tests.test_excel_source import write_xlsx

CSV_UPLOAD = (
    "team_name,tool_name,description,created_date,reused\n"
    'FCS,Tool A,"plain text",23-Dec,yes\n'
    'GCSS,Tool B,"has, a comma",Feb-25,No\n'
)

XLSX_ROWS = [
    ["team_name", "tool_name", "description", "created_date", "reused"],
    ["CMS", "Tool C", "multi\nline\ncell", "2013", "N/A"],
    ["CCS", "Tool D", None, "-", "yes"],
]


def _clean(df):
    """The reference Lambda's ETL, as engine cleaning ops."""
    return (
        normalize_nulls(df, ["description", "reused"])
        .withColumn("created_date", parse_messy_date(F.col("created_date")))
        .withColumn("is_reused", coerce_boolean(F.col("reused")))
        .drop("reused")
        .withColumn("is_display", F.lit(True))
    )


def test_phase1_csv_excel_to_dashboard(spark):
    with tempfile.TemporaryDirectory() as d:
        csv_path = os.path.join(d, "upload.csv")
        with open(csv_path, "w") as fh:
            fh.write(CSV_UPLOAD)
        xlsx_path = os.path.join(d, "upload.xlsx")
        write_xlsx(xlsx_path, XLSX_ROWS)

        store = SnapshotStore(os.path.join(d, "table"))

        # two uploads arrive (the reference: one Lambda invocation per
        # S3 object); each cleans its file and serial-key-inserts under
        # optimistic concurrency
        def ingest(df_raw):
            def fn(table):
                batch = _clean(df_raw)
                if table is None:
                    keyed = assign_serial_keys(
                        batch.limit(0).withColumn("s_no", F.lit(0).cast("long")),
                        batch, "s_no",
                    )
                    return keyed.select("s_no", *batch.columns)
                keyed = assign_serial_keys(table, batch, "s_no")
                return table.unionByName(keyed.select(*table.columns))

            store.mutate(spark, fn)

        ingest(read_messy_csv(spark, csv_path))
        ingest(read_excel_local(spark, xlsx_path))

        table = store.read(spark)
        rows = {r["tool_name"]: r for r in table.collect()}

        # all four tools landed with unique contiguous serial keys
        assert sorted(r["s_no"] for r in rows.values()) == [1, 2, 3, 4]
        # cleaning happened at ingest: nulls normalized, bools coerced,
        # messy dates parsed
        assert rows["Tool D"]["description"] is None
        assert rows["Tool C"]["is_reused"] is None  # N/A -> NULL
        assert rows["Tool A"]["is_reused"] is True and rows["Tool B"]["is_reused"] is False
        assert rows["Tool C"]["created_date"] is not None

        # soft delete + visibility (the reference's is_display contract)
        victim = rows["Tool B"]["s_no"]
        store.mutate(spark, lambda t: soft_delete(t, "s_no", victim))
        vis = visible(store.read(spark))
        assert {r["tool_name"] for r in vis.collect()} == {"Tool A", "Tool C", "Tool D"}

        # dashboard aggregate over the visible set
        per_team = {
            r["team_name"]: r["n"]
            for r in vis.groupBy("team_name").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert per_team == {"FCS": 1, "CMS": 1, "CCS": 1}
