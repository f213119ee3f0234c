"""Excel (.xlsx) source — the reference's Phase-1 ingest accepts
"CSV/Excel" uploads (architecture/CSP Tools Architecture - Phase1.png;
SURVEY.md §2.1 S1 lists the same hazards for both), but only the CSV
lane existed here until round 5.

Physical design mirrors the event-driven landing zone: one workbook
per uploaded object, many objects. Workbooks are read through Spark's
``binaryFile`` source and parsed INSIDE ``mapInPandas`` — so N files
parse on N tasks across executors (Arrow-batched, no driver loop), the
same parallelism-from-file-count contract the multiLine CSV reader
documents. A single workbook is driver-parsed only by the thin
``read_excel_local`` convenience wrapper (the reference's
Lambda-per-upload shape, lambda/lambda_function.py:960-1010 reads one
object per event).

The parser itself is a minimal OOXML (ECMA-376 SpreadsheetML) reader
on stdlib zipfile + ElementTree: shared strings, inline strings,
booleans, and numbers; blank/skipped cells become NULL; all values
surface as strings (exactly like the CSV lane without a schema) so the
same cleaning operators (F3 null spellings, F4/F5 coercion, F7 messy
dates) apply unchanged. ``pandas.read_excel`` (openpyxl) is used
instead when installed — same output contract.
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import Iterable, Iterator
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional fast-path; absent in this sandbox
    import openpyxl  # noqa: F401

    _HAVE_OPENPYXL = True
except Exception:  # pragma: no cover
    _HAVE_OPENPYXL = False

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = (
    "{http://schemas.openxmlformats.org/package/2006/relationships}"
)
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str | None) -> int | None:
    """A1-style column letters -> 0-based index (A=0, Z=25, AA=26).
    None for a missing/unparsable ref: the r= attribute is optional in
    ECMA-376, and an unreferenced cell occupies the column after the
    previous cell (the caller tracks that running position)."""
    m = _CELL_REF.match(ref) if ref else None
    if not m:
        return None
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out: list[str] = []
    for si in ET.fromstring(data).iter(f"{_NS}si"):
        # a shared string is one <t> or a sequence of rich-text runs
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _first_sheet_path(zf: zipfile.ZipFile) -> str:
    """Resolve the first sheet in workbook order via the rels part
    (sheet files are not guaranteed to be named sheet1.xml)."""
    try:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    except KeyError:
        return "xl/worksheets/sheet1.xml"
    rel_targets = {
        r.get("Id"): r.get("Target") for r in rels.iter(f"{_REL_NS}Relationship")
    }
    for sheet in wb.iter(f"{_NS}sheet"):
        rid = sheet.get(
            "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
        )
        target = rel_targets.get(rid)
        if target:
            # OPC rel targets may be package-absolute ("/xl/...") or
            # relative to xl/ ("worksheets/sheet1.xml").
            target = target.lstrip("/")
            return target if target.startswith("xl/") else f"xl/{target}"
    return "xl/worksheets/sheet1.xml"


def _cell_value(c: ET.Element, shared: list[str]) -> str | None:
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        if is_el is None:
            return None
        return "".join(e.text or "" for e in is_el.iter(f"{_NS}t"))
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        idx = int(v.text)
        return shared[idx] if 0 <= idx < len(shared) else None
    if t == "b":
        return "true" if v.text.strip() == "1" else "false"
    # "n" (number) and "str" (formula cache): literal text, coerced
    # downstream exactly like a CSV field
    return v.text


def parse_xlsx_bytes(data: bytes) -> list[list[str | None]]:
    """First worksheet of one workbook -> rows of optional strings.
    Skipped cells (gaps in r= refs) and blank cells are None; rows are
    padded/truncated by the caller against the header width."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        shared = _shared_strings(zf)
        sheet = ET.fromstring(zf.read(_first_sheet_path(zf)))
    rows: list[list[str | None]] = []
    for row in sheet.iter(f"{_NS}row"):
        cells: list[str | None] = []
        pos = 0  # running column: cells without r= occupy the next slot
        for c in row.iter(f"{_NS}c"):
            idx = _col_index(c.get("r"))
            if idx is None:
                idx = pos
            while len(cells) < idx:
                cells.append(None)
            val = _cell_value(c, shared)
            if len(cells) == idx:
                cells.append(val)
            else:  # malformed duplicate ref: last write wins
                cells[idx] = val
            pos = idx + 1
        rows.append(cells)
    return rows


def _workbook_records(
    data: bytes, null_values: tuple[str, ...]
) -> tuple[list[str], list[list[str | None]]]:
    """(header, data rows) for one workbook, nulls normalized at parse
    time like the CSV reader's nullValue/emptyValue options."""
    if _HAVE_OPENPYXL:  # pragma: no cover - not installed in sandbox
        import pandas as pd

        pdf = pd.read_excel(io.BytesIO(data), dtype=str, engine="openpyxl")
        header = [str(c) for c in pdf.columns]
        raw = [[None if pd.isna(v) else str(v) for v in r] for r in pdf.values]
    else:
        rows = parse_xlsx_bytes(data)
        if not rows:
            return [], []
        header = [h if h is not None else f"_c{i}" for i, h in enumerate(rows[0])]
        raw = rows[1:]
    width = len(header)
    cleaned = []
    for r in raw:
        r = (r + [None] * width)[:width]
        cleaned.append(
            [None if (v is None or v == "" or v in null_values) else v for v in r]
        )
    return header, cleaned


def read_excel(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    null_values: tuple[str, ...] = ("N/A", "NA"),
) -> DataFrame:
    """Read a directory/glob of .xlsx workbooks distributed: binaryFile
    scan -> per-task OOXML parse in mapInPandas. All workbooks must
    share the S1 contract of a first-row header; columns come back as
    strings (schema applied as a cast afterwards, so a bad cell becomes
    NULL instead of failing the job — PERMISSIVE semantics)."""
    if schema is not None:
        out_names = [f.name for f in schema.fields]
    else:
        # infer column names by pulling ONE workbook through the same
        # binaryFile scan the data parse uses — works for any path the
        # cluster can read (s3a://, hdfs://, local), not just driver-
        # local files; the data parse itself stays distributed.
        # Deterministic pick: list paths first (metadata-only, content
        # column pruned), choose the lexicographically-first file, and
        # fetch only ITS bytes — a bare limit(1) over the scan would
        # return whichever file Spark's largest-first partition
        # packing happened to place first, so the inferred schema
        # could silently change as file sizes drift.
        listing = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.xlsx")
            .load(path)
            .select("path")
            .collect()
        )
        if not listing:
            raise FileNotFoundError(f"no .xlsx under {path}")
        first_path = min(r["path"] for r in listing)
        first = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.xlsx")
            .load(path)
            .filter(F.col("path") == first_path)
            .select("content")
            .collect()
        )
        out_names, _ = _workbook_records(bytes(first[0]["content"]), null_values)

    str_schema = T.StructType([T.StructField(n, T.StringType()) for n in out_names])

    def parse_partition(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            frames = []
            for content in pdf["content"]:
                header, rows = _workbook_records(bytes(content), null_values)
                frames.append(
                    pd.DataFrame(rows, columns=header).reindex(
                        columns=out_names, fill_value=None
                    )
                )
            yield (
                pd.concat(frames)
                if frames
                else pd.DataFrame(columns=out_names)
            )

    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.xlsx")
        .load(path)
        .select("content")
    )
    parsed = binary.mapInPandas(parse_partition, schema=str_schema)
    if schema is None:
        return parsed
    # try_cast, not cast: under ANSI mode (Spark 4 default) a malformed
    # cell must become NULL (the CSV lane's PERMISSIVE contract), not
    # fail the 100-TB ingest job.
    return parsed.select(
        [F.col(f.name).try_cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def read_excel_local(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    null_values: tuple[str, ...] = ("N/A", "NA"),
) -> DataFrame:
    """One workbook, parsed on the driver — the reference's
    Lambda-per-uploaded-object shape for a single small file."""
    with open(path, "rb") as fh:
        header, rows = _workbook_records(fh.read(), null_values)
    str_schema = T.StructType([T.StructField(n, T.StringType()) for n in header])
    df = spark.createDataFrame(rows, schema=str_schema)
    if schema is None:
        return df
    return df.select(
        [F.col(f.name).try_cast(f.dataType).alias(f.name) for f in schema.fields]
    )
