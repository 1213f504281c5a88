"""Tests for the JSON ETL test harness (reference sql_tester.py semantics)."""

import json

import pytest

from easy_sql_spark.testing import SqlTester, cast_value

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

-- target=log.sample_result
select * from result
"""


def case_dict(**over):
    """Reference JSON case format: list fields JSON-encoded strings
    (sql_tester.py as_dict :54-61)."""
    base = {
        "name": "test for sample etl",
        "sql_file_path": "sample_etl.spark.sql",
        "sql_file_content": None,
        "vars": {},
        "includes": {},
        "inputs": [
            {
                "name": "sample.test",
                "columns": json.dumps(["id", "val"]),
                "column_types": json.dumps(["int", "int"]),
                "values": [json.dumps([1, 1])],
                "value_descriptions": [],
            }
        ],
        "outputs": [
            {
                "name": "sample.result",
                "columns": json.dumps(["id", "val"]),
                "column_types": json.dumps(["int", "string"]),
                "values": [json.dumps([1, "2"]), json.dumps([1, "2"])],
                "value_descriptions": [],
            }
        ],
    }
    base.update(over)
    return base


@pytest.fixture
def work_dir(tmp_path):
    (tmp_path / "sample_etl.spark.sql").write_text(SAMPLE_ETL)
    return str(tmp_path)


def write_cases(tmp_path, cases):
    f = tmp_path / "etl_test.json"
    f.write_text(json.dumps(cases))
    return str(f)


def test_sample_etl_case_passes(spark, tmp_path, work_dir):
    test_file = write_cases(tmp_path, [case_dict()])
    result = SqlTester(spark, work_dir=work_dir).run_file(test_file)
    assert result.ok, result.render()
    assert result.passed == ["test for sample etl"]


def test_output_mismatch_detected(spark, tmp_path, work_dir):
    bad = case_dict()
    bad["outputs"][0]["values"] = [json.dumps([1, "999"])]
    test_file = write_cases(tmp_path, [case_dict(), bad])
    result = SqlTester(spark, work_dir=work_dir).run_file(test_file)
    assert len(result.passed) == 1 and len(result.failed) == 1
    assert "mismatch" in result.failed[0][1]


def test_inline_sql_and_vars(spark, tmp_path):
    etl = """-- target=temp.t
select ${k} as k

-- target=output.db1.out
select k from t
"""
    case = case_dict(
        sql_file_path=None,
        sql_file_content=etl,
        vars={"k": "42"},
        inputs=[],
        outputs=[
            {
                "name": "db1.out",
                "columns": json.dumps(["k"]),
                "column_types": json.dumps(["int"]),
                "values": [json.dumps([42])],
                "value_descriptions": [],
            }
        ],
    )
    test_file = write_cases(tmp_path, [case])
    result = SqlTester(spark).run_file(test_file)
    assert result.ok, result.render()


def test_typed_columns_date_array_double(spark, tmp_path):
    etl = """-- target=temp.t
select * from typed_in

-- target=output.db1.typed_out
select d, arr, x from t
"""
    tbl = {
        "name": "typed_in",
        "columns": json.dumps(["d", "arr", "x"]),
        "column_types": json.dumps(["date", "array<string>", "double"]),
        "values": [json.dumps(["2024-03-01", "a|b", "1.5"])],
        "value_descriptions": [],
    }
    out = dict(tbl, name="db1.typed_out")
    # array compares as a set: order flipped still passes (list_item_to_set)
    out["values"] = [json.dumps(["2024-03-01", "b|a", 1.5])]
    case = case_dict(
        sql_file_path=None, sql_file_content=etl, inputs=[tbl], outputs=[out]
    )
    result = SqlTester(spark).run_file(write_cases(tmp_path, [case]))
    assert result.ok, result.render()


def test_cast_value_types():
    assert cast_value("int", "3") == 3
    assert cast_value("double", "1.5") == 1.5
    assert cast_value("decimal(10,2)", "1.5") == 1.5
    assert cast_value("boolean", "true") is True
    assert cast_value("string", " x ") == "x"
    assert cast_value("array<int>", "1|2") == [1, 2]
    assert cast_value("timestamp", "2024-01-01 10:00:00").hour == 10
    assert cast_value("date", "2024-01-01").year == 2024
    assert cast_value("int", "null") is None
    with pytest.raises(AssertionError):
        cast_value("map<string,int>", "a")


def test_cast_value_struct():
    v = cast_value("struct<name:string,n:int,d:double>", "bob|3|1.5")
    assert v == ("bob", 3, 1.5)
    with pytest.raises(AssertionError):
        cast_value("struct<a:int,b:int>", "1")


def test_cast_value_struct_parameterized_field_types():
    # commas inside decimal(10,2) are not field separators (ADVICE r1)
    v = cast_value("struct<a:decimal(10,2),b:int>", "1.25|7")
    assert v == (1.25, 7)
    with pytest.raises(AssertionError, match="name:type"):
        cast_value("struct<abc,b:int>", "1|2")


def test_generate_pytest_file(spark, tmp_path, work_dir):
    test_file = write_cases(tmp_path, [case_dict()])
    tester = SqlTester(spark, work_dir=work_dir)
    out = tester.generate_pytest_file(test_file)
    src = open(out).read()
    assert "def test_etl_case(spark, case_idx):" in src
    assert repr(work_dir) in src
    # the case the generated module would run passes through the same API
    result = tester.run_file(test_file, case_idx=0)
    assert result.ok
