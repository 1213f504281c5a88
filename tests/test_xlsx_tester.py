"""Tests for the stdlib xlsx test harness (reference xlsx semantics,
sql_tester.py:617-710) — reader/writer round-trip, CASE-block parsing of
the reference's real sample workbooks, end-to-end case run, and xlsx→JSON
conversion."""

import datetime as dt
import json
import os

import pytest

from easy_sql_spark.testing import SqlTester
from easy_sql_spark.testing.xlsx import (
    convert_xlsx_to_json,
    parse_date_cell,
    parse_xlsx_cases,
    read_xlsx,
    write_xlsx,
)

REFERENCE_XLSX = "/root/reference/test/sample_etl.spark.xlsx"

SAMPLE_ETL = """-- backend: spark

-- target=variables
select 1 as a

-- target=temp.result
select
    ${a} as id, ${a} + 1 as val
union all
select id, val + ${a} as val from sample.test

-- target=output.sample.result
select id, cast(val as string) as val from result
"""


def sample_sheet():
    """The xlsx twin of test_sql_tester.case_dict(), laid out exactly like
    the reference workbook: CASE / VARS / INPUT / OUTPUT label blocks."""
    return [
        ["CASE", "test for sample etl"],
        ["VARS", "", "data_date", "other_var"],
        ["", "", dt.datetime(2024, 3, 1), "v1"],
        [],
        ["INPUT", "sample.test", "id:int", "val:int"],
        ["", "one seed row", 1, 1],
        [],
        ["OUTPUT", "sample.result", "id:int", "val:string"],
        ["", "constant row", 1, "2"],
        ["", "", 1, "2"],
    ]


@pytest.fixture
def xlsx_file(tmp_path):
    (tmp_path / "sample_etl.spark.sql").write_text(SAMPLE_ETL)
    path = str(tmp_path / "sample_etl.spark.xlsx")
    return write_xlsx(path, {"Suit 1": sample_sheet()})


def test_write_read_round_trip(tmp_path):
    rows = [
        ["a", 1, 1.5, True, None, "x & <y>"],
        [dt.datetime(2021, 11, 11), "", -3],
    ]
    path = write_xlsx(str(tmp_path / "rt.xlsx"), {"Suit 1": rows, "other": []})
    sheets = read_xlsx(path)
    assert list(sheets) == ["Suit 1", "other"]
    got = sheets["Suit 1"]
    assert got[0] == ["a", 1, 1.5, True, None, "x & <y>"]
    # datetimes round-trip as excel serials; empty string cells drop to None
    assert parse_date_cell(got[1][0]) == dt.datetime(2021, 11, 11)
    assert got[1][1] is None and got[1][2] == -3


def test_parse_cases_structure(xlsx_file):
    cases = parse_xlsx_cases(xlsx_file)
    assert len(cases) == 1
    c = cases[0]
    assert c.name == "test for sample etl"
    assert c.vars == {"data_date": "2024-03-01", "other_var": "v1"}
    assert c.sql_file_path == xlsx_file[: -len(".xlsx")] + ".sql"
    assert [t.name for t in c.inputs] == ["sample.test"]
    assert c.inputs[0].column_types == ["int", "int"]
    # OUTPUT row without description still collected; INPUT would raise
    assert len(c.outputs[0].values) == 2


def test_input_row_without_description_rejected(tmp_path):
    sheet = sample_sheet()
    sheet[5] = ["", "", 2, 2]  # input data row, description blank
    path = write_xlsx(str(tmp_path / "bad.xlsx"), {"Suit 1": sheet})
    with pytest.raises(AssertionError, match="no description"):
        parse_xlsx_cases(path)


def test_non_suit_sheets_ignored(tmp_path):
    path = write_xlsx(
        str(tmp_path / "ns.xlsx"),
        {"notes": [["CASE", "ignored"]], "Suit 1": sample_sheet()},
    )
    assert len(parse_xlsx_cases(path)) == 1


def test_xlsx_case_runs_end_to_end(spark, xlsx_file, tmp_path):
    result = SqlTester(spark, work_dir=str(tmp_path)).run_file(xlsx_file)
    assert result.ok, result.render()
    assert result.passed == ["test for sample etl"]


def test_convert_xlsx_to_json_and_run(spark, xlsx_file, tmp_path):
    json_path = convert_xlsx_to_json(xlsx_file)
    assert json_path.endswith(".json")
    data = json.load(open(json_path))
    assert data[0]["name"] == "test for sample etl"
    # the JSON twin runs through the same runner and passes
    result = SqlTester(spark, work_dir=str(tmp_path)).run_file(json_path)
    assert result.ok, result.render()


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_XLSX), reason="reference checkout absent"
)
def test_reads_reference_openpyxl_workbook():
    """The stdlib reader parses a real openpyxl-written workbook (shared
    strings, serial dates) the same way the reference parser does."""
    cases = parse_xlsx_cases(REFERENCE_XLSX)
    assert len(cases) == 1
    c = cases[0]
    assert c.name == "test for sample etl"
    assert [t.name for t in c.inputs] == ["sample.test"]
    assert c.inputs[0].columns == ["id", "val"]
    assert c.inputs[0].column_types == ["int", "string"]
    assert c.outputs[0].name == "sample.result"
