"""Excel (.xlsx) source goldens — mirrors test_messy_csv_roundtrip on
a generated workbook carrying the same reference-shaped hazards
(quoted commas, embedded newlines, doubled quotes, N/A and empty
nulls, trailing-space enums), plus the distributed multi-workbook
lane.

The fixture writer below builds a minimal ECMA-376 SpreadsheetML
package with stdlib zipfile (no openpyxl in the sandbox): inline
strings for text, bare <v> for numbers, gaps in cell refs for empty
cells — which also exercises the reader's sparse-row handling.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from xml.sax.saxutils import escape

from pyspark.sql import types as T

from aws_csp_datapipeline_spark.sources.excel_source import (
    parse_xlsx_bytes,
    read_excel,
    read_excel_local,
)

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_letter(idx: int) -> str:
    letters = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        letters = chr(ord("A") + rem) + letters
    return letters


def write_xlsx(path: str, rows: list[list[object]]) -> None:
    """rows -> minimal workbook. str cells become inline strings,
    int/float cells numeric <v>, None cells are OMITTED (ref gap)."""
    body = []
    for rn, row in enumerate(rows, start=1):
        cells = []
        for cn, val in enumerate(row):
            if val is None:
                continue
            ref = f"{_col_letter(cn)}{rn}"
            if isinstance(val, (int, float)) and not isinstance(val, bool):
                cells.append(f'<c r="{ref}"><v>{val}</v></c>')
            else:
                # xml:space="preserve" keeps trailing spaces / newlines
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is>'
                    f'<t xml:space="preserve">{escape(str(val))}</t></is></c>'
                )
        body.append(f'<row r="{rn}">{"".join(cells)}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<sheetData>{"".join(body)}</sheetData></worksheet>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK)
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)


MESSY_ROWS = [
    ["s_no", "team_name", "tool_name", "description", "created_date", "reused"],
    ["1", "FCS", "Tool A", "plain text", "23-Dec", "yes"],
    ["2", "GCSS", "Tool B", 'has, a comma and "quoted" words', "Feb-25", "No"],
    ["3", "CMS", "Tool C", "multi\nline\ncell", "2013", "N/A"],
    ["4", "CCS", "Tool D", None, "-", "Internal "],
]


def test_parse_xlsx_bytes_shape():
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "m.xlsx")
        write_xlsx(p, MESSY_ROWS)
        with open(p, "rb") as fh:
            rows = parse_xlsx_bytes(fh.read())
    assert rows[0] == MESSY_ROWS[0]
    # the None cell was omitted from the file; the ref gap restores it
    assert rows[4][2] == "Tool D"
    assert rows[4][3] is None
    assert rows[4][4] == "-"


def test_messy_xlsx_roundtrip(spark):
    """The CSV golden, replayed through the Excel lane."""
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "messy.xlsx")
        write_xlsx(p, MESSY_ROWS)
        df = read_excel_local(spark, p)
        rows = {r["s_no"]: r.asDict() for r in df.collect()}
    assert len(rows) == 4
    assert rows["2"]["description"] == 'has, a comma and "quoted" words'
    assert rows["3"]["description"] == "multi\nline\ncell"
    # N/A and empty become NULL at parse time
    assert rows["3"]["reused"] is None
    assert rows["4"]["description"] is None
    # trailing-space enum survives parsing (folding is a cleaning op)
    assert rows["4"]["reused"] == "Internal "


def test_read_excel_distributed_many_files(spark):
    """Multi-workbook landing dir through binaryFile + mapInPandas:
    all rows land, numeric schema cast applies, bad cells go NULL."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    with tempfile.TemporaryDirectory() as d:
        for i in range(3):
            write_xlsx(
                os.path.join(d, f"part{i}.xlsx"),
                [
                    ["id", "name", "amount"],
                    [i * 2 + 1, f"row{i*2+1}", 1.5 * (i * 2 + 1)],
                    [i * 2 + 2, f"row{i*2+2}", "oops" if i == 2 else 2.5],
                ],
            )
        df = read_excel(spark, d, schema=schema)
        got = {r["id"]: r for r in df.collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6}
    assert got[1]["amount"] == 1.5
    # PERMISSIVE cast: the unparseable amount became NULL, row kept
    assert got[6]["amount"] is None
    assert got[6]["name"] == "row6"


def _write_xlsx_raw(path: str, sheet_xml: str, wb_rels: str = _WORKBOOK_RELS) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)


def test_cells_without_ref_attribute_occupy_consecutive_columns():
    """The r= attribute is optional in ECMA-376; some writers omit it.
    Unreferenced cells must take consecutive columns (and resume after
    an explicit ref), not all collapse onto column 0."""
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        # row 1: no refs at all -> columns 0,1,2
        '<row><c t="inlineStr"><is><t>a</t></is></c>'
        '<c t="inlineStr"><is><t>b</t></is></c>'
        '<c t="inlineStr"><is><t>c</t></is></c></row>'
        # row 2: explicit C2 then an unreferenced cell -> column 3
        '<row r="2"><c r="A2"><v>1</v></c><c r="C2"><v>3</v></c>'
        "<c><v>4</v></c></row>"
        "</sheetData></worksheet>"
    )
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "noref.xlsx")
        _write_xlsx_raw(p, sheet)
        with open(p, "rb") as fh:
            rows = parse_xlsx_bytes(fh.read())
    assert rows[0] == ["a", "b", "c"]
    assert rows[1] == ["1", None, "3", "4"]


def test_absolute_rel_target_resolves():
    """OPC rel targets may be package-absolute ('/xl/...')."""
    abs_rels = _WORKBOOK_RELS.replace(
        'Target="worksheets/sheet1.xml"', 'Target="/xl/worksheets/sheet1.xml"'
    )
    assert 'Target="/xl/' in abs_rels
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>hdr</t></is></c></row>'
        '<row r="2"><c r="A2"><v>7</v></c></row>'
        "</sheetData></worksheet>"
    )
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "abs.xlsx")
        _write_xlsx_raw(p, sheet, wb_rels=abs_rels)
        with open(p, "rb") as fh:
            rows = parse_xlsx_bytes(fh.read())
    assert rows == [["hdr"], ["7"]]


def test_read_excel_infers_header_without_schema(spark):
    with tempfile.TemporaryDirectory() as d:
        write_xlsx(
            os.path.join(d, "one.xlsx"),
            [["a", "b"], ["x", 1], ["y", 2]],
        )
        df = read_excel(spark, d)
        assert df.columns == ["a", "b"]
        vals = sorted((r["a"], r["b"]) for r in df.collect())
    assert vals == [("x", "1"), ("y", "2")]


def test_header_inference_picks_lexicographically_first_file(spark):
    """With heterogeneous headers across workbooks and no explicit
    schema, the inferred column set must come from the
    lexicographically-first path — NOT whichever file Spark's
    largest-first partition packing happens to scan first (which
    would silently change as file sizes drift)."""
    with tempfile.TemporaryDirectory() as d:
        # the later-sorting file is much larger, so size-ordered
        # packing would pick it; name order must win
        write_xlsx(os.path.join(d, "a_first.xlsx"), [["x", "y"], ["1", "2"]])
        big = [["x", "y", "z"]] + [[str(i), "v" * 50, str(i)] for i in range(200)]
        write_xlsx(os.path.join(d, "b_big.xlsx"), big)
        df = read_excel(spark, d)
        assert df.columns == ["x", "y"]
