"""Excel ingress (S3, sources/excel.py) — pure-stdlib xlsx parse.

The fixture builds a genuine xlsx (ZIP + SpreadsheetML parts, shared and
inline strings, int/float/bool/empty cells) with the same stdlib the reader
uses, so the test exercises a real workbook container end-to-end.
"""

import zipfile

import pytest

from azure_medicine_data_engineering_spark.sources.excel import (
    excel_to_df,
    read_xlsx_rows,
)

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Cohort" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""

_SHARED = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
<si><t>patient_id</t></si><si><t>age</t></si><si><t>score</t></si>
</sst>"""

# header row (shared strings) + data: int, float, bool, inline string, gap
_SHEET = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c><c r="D1" t="inlineStr"><is><t>note</t></is></c></row>
<row r="2"><c r="A2"><v>101</v></c><c r="B2"><v>42</v></c><c r="C2"><v>0.75</v></c><c r="D2" t="inlineStr"><is><t>ok</t></is></c></row>
<row r="3"><c r="A3"><v>102</v></c><c r="C3"><v>1.5</v></c><c r="D3" t="b"><v>1</v></c></row>
</sheetData>
</worksheet>"""


@pytest.fixture()
def xlsx_path(tmp_path):
    p = tmp_path / "cohort.xlsx"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/sharedStrings.xml", _SHARED)
        z.writestr("xl/worksheets/sheet1.xml", _SHEET)
    return str(p)


def test_read_rows_types_and_gaps(xlsx_path):
    rows = read_xlsx_rows(xlsx_path)
    assert rows[0] == ["patient_id", "age", "score", "note"]
    assert rows[1] == [101, 42, 0.75, "ok"]
    assert rows[2] == [102, None, 1.5, True]  # B3 missing -> None


def test_sheet_selection(xlsx_path):
    assert read_xlsx_rows(xlsx_path, sheet="Cohort")[0][0] == "patient_id"
    with pytest.raises(ValueError, match="not found"):
        read_xlsx_rows(xlsx_path, sheet="Nope")


def test_excel_to_df_schema_and_values(spark, xlsx_path):
    df = excel_to_df(spark, xlsx_path)
    assert df.columns == ["patient_id", "age", "score", "note"]
    types = dict(df.dtypes)
    assert types["patient_id"] == "bigint"
    assert types["age"] == "bigint"
    assert types["score"] == "double"
    assert types["note"] == "string"  # mixed str/bool column -> string
    got = {r.patient_id: r for r in df.collect()}
    assert got[101].age == 42 and got[101].score == 0.75 and got[101].note == "ok"
    assert got[102].age is None and got[102].note == "True"


def test_excel_to_df_no_header(spark, xlsx_path):
    df = excel_to_df(spark, xlsx_path, header=False)
    assert df.columns == ["col_0", "col_1", "col_2", "col_3"]
    assert df.count() == 3
