"""JSON-driven ETL test harness — the reference's ``sql_tester`` re-expressed.

A test file is a JSON list of cases; each case declares VARS / INCLUDES /
INPUT tables / expected OUTPUT tables for one ETL file.  The ETL runs in
dry-run mode (output steps materialize ``{db}_{table}_{hex}_output`` temp
views instead of writing the warehouse) and each expected output is compared
order-insensitively against the materialized view.

Reference parity (easy_sql/sql_tester.py):
- JSON case format: the twin format the reference generates from xlsx
  (``convert_cases_to_json``, sql_tester.py:1003-1011); xlsx files are
  parsed by the stdlib reader in :mod:`easy_sql_spark.testing.xlsx`
  (no openpyxl in this container) and run through the same case runner.
- type system: ``cast_as_type`` (sql_tester.py:208-317) — int/tinyint/
  bigint/double/float/decimal(p,s)→double/boolean/string/date/timestamp/
  ``array<T>`` with ``|``-separated literals; unknown types fall back to a
  ``cast(null as T)`` schema probe (sql_tester.py:198-204).
- run flow: create inputs (temp views, or real tables for dotted names) →
  run processor dry-run → locate ``*_output`` views (sql_tester.py:842-865)
  → ORDER BY all columns and compare (sql_tester.py:798-840); array values
  compare as sets, mirroring ``list_item_to_set``.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import re
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SIMPLE_TYPES: dict[str, Callable[[], T.DataType]] = {
    "int": T.IntegerType,
    "tinyint": T.ShortType,
    "bigint": T.LongType,
    "double": T.DoubleType,
    "float": T.FloatType,
    "decimal": T.DoubleType,  # degraded to double, sql_tester.py:174-177
    "string": T.StringType,
    "text": T.StringType,
    "boolean": T.BooleanType,
    "bool": T.BooleanType,
    "date": T.DateType,
    "timestamp": T.TimestampType,
    "datetime": T.TimestampType,
}

_DT_FORMATS = ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d")


def _parse_dt(value: Any) -> dt.datetime:
    if isinstance(value, dt.datetime):
        return value
    if isinstance(value, dt.date):
        return dt.datetime(value.year, value.month, value.day)
    s = str(value).strip()
    for fmt in _DT_FORMATS:
        try:
            return dt.datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise ValueError(
        f"date value must be `yyyy-MM-dd` or `yyyy-MM-dd HH:mm:ss`: {value!r}"
    )


def _split_top_level(spec: str) -> list[str]:
    """Split a type-spec list on commas that sit at bracket depth 0, so
    parameterized field types like ``a:decimal(10,2),b:int`` keep their
    internal commas."""
    parts, depth, cur = [], 0, []
    for ch in spec:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def cast_value(col_type: str, value: Any) -> Any:
    """Cast one JSON cell to the python value for its declared column type
    (reference cast_as_type, sql_tester.py:208-317)."""
    col_type = col_type.strip().lower()
    if value is None or (isinstance(value, str) and value.strip() == "null"):
        return None
    base = col_type.replace(" ", "")
    if base.startswith("map<"):
        raise AssertionError(f"map type not supported in test data: {col_type}")
    if base.startswith("decimal(") or col_type in ("double", "float", "decimal"):
        return float(value)
    if col_type in ("bigint", "int", "tinyint"):
        return int(value)
    if col_type in ("boolean", "bool"):
        if str(value).lower() == "true":
            return True
        if str(value).lower() == "false":
            return False
        return bool(value)
    if col_type in ("string", "text"):
        return str(value).strip()
    if base.startswith("array<"):
        elem = base[len("array<"):-1]
        if isinstance(value, list):
            parts = value
        else:
            parts = [s.strip() for s in str(value).strip().split("|") if s.strip()]
        caster = {
            "int": int, "tinyint": int, "bigint": int,
            "double": float, "float": float,
            "boolean": lambda s: str(s).lower() == "true",
            "string": str,
            "date": lambda s: _parse_dt(s).date(),
            "timestamp": _parse_dt,
        }.get(elem, str)
        return [caster(p) for p in parts]
    if col_type == "date":
        return _parse_dt(value).date()
    if col_type in ("timestamp", "datetime"):
        return _parse_dt(value)
    if base.startswith("struct<"):
        # single-level struct, |-separated values typed per field
        # (reference sql_tester.py:273-306)
        inner = base[len("struct<"):-1]
        fields = []
        for spec in _split_top_level(inner):
            if ":" not in spec:
                raise AssertionError(
                    f"bad struct field spec {spec!r} in {col_type!r}: "
                    "expected name:type"
                )
            fields.append(spec.split(":", 1))
        parts = [s.strip() for s in str(value).split("|")]
        if len(parts) != len(fields):
            raise AssertionError(
                f"struct value needs {len(fields)} fields, got {len(parts)}: "
                f"{value!r} for {col_type}"
            )
        return tuple(
            cast_value(ftype, v) for (_, ftype), v in zip(fields, parts)
        )
    # unknown type: keep raw; schema probe decides (sql_tester.py:198-204)
    return value


def spark_schema_for(
    spark: SparkSession, columns: list[str], types: list[str]
) -> T.StructType:
    """Declared column types → Spark schema; unknown types resolved via the
    ``cast(null as T)`` engine probe (sql_tester.py:153-204)."""
    fields = []
    for col, type_ in zip(columns, types):
        tl = type_.strip().lower()
        base = tl.replace(" ", "")
        if base.startswith("decimal("):
            tl = "decimal"
            base = "decimal"
        if tl in _SIMPLE_TYPES:
            fields.append(T.StructField(col, _SIMPLE_TYPES[tl]()))
        elif base.startswith("array<") and base[len("array<"):-1] in _SIMPLE_TYPES:
            elem = base[len("array<"):-1]
            fields.append(T.StructField(col, T.ArrayType(_SIMPLE_TYPES[elem]())))
        else:
            probe = (
                spark.range(1).withColumn("c", F.expr(f"cast(null as {type_})"))
            )
            fields.append(T.StructField(col, probe.schema["c"].dataType))
    return T.StructType(fields)


@dataclass
class TableData:
    """One input or expected-output table (reference sql_tester.py:37-77)."""

    name: str
    columns: list[str]
    column_types: list[str]
    values: list[list[Any]]
    value_descriptions: list[str] = field(default_factory=list)

    @staticmethod
    def from_dict(data: dict) -> "TableData":
        def l(v):  # reference JSON stores lists JSON-encoded (as_dict :54-61)
            return json.loads(v) if isinstance(v, str) else v

        return TableData(
            name=data["name"],
            columns=l(data["columns"]),
            column_types=l(data["column_types"]),
            values=[l(v) for v in data["values"]],
            value_descriptions=data.get("value_descriptions", []),
        )

    def typed_rows(self) -> list[tuple]:
        rows = []
        for row in self.values:
            rows.append(
                tuple(
                    cast_value(t, v)
                    for t, v in zip(self.column_types, row)
                )
            )
        return rows


@dataclass
class TestCase:
    """One CASE block (reference sql_tester.py:320-367)."""

    name: str
    sql_file_path: str | None = None
    sql_file_content: str | None = None
    vars: dict[str, Any] = field(default_factory=dict)
    includes: dict[str, str] = field(default_factory=dict)
    inputs: list[TableData] = field(default_factory=list)
    outputs: list[TableData] = field(default_factory=list)
    func_file_paths: list[str] = field(default_factory=list)
    udf_file_paths: list[str] = field(default_factory=list)

    @staticmethod
    def from_dict(data: dict) -> "TestCase":
        return TestCase(
            name=data.get("name") or "unnamed case",
            sql_file_path=data.get("sql_file_path"),
            sql_file_content=data.get("sql_file_content"),
            vars=data.get("vars") or {},
            includes=data.get("includes") or {},
            inputs=[TableData.from_dict(d) for d in data.get("inputs", [])],
            outputs=[TableData.from_dict(d) for d in data.get("outputs", [])],
            func_file_paths=data.get("func_file_paths", []),
            udf_file_paths=data.get("udf_file_paths", []),
        )

    def read_sql(self, work_dir: str) -> str:
        if self.sql_file_content:
            return self.sql_file_content
        assert self.sql_file_path, "sql_file_path or sql_file_content required"
        path = self.sql_file_path
        if not os.path.isabs(path):
            path = os.path.join(work_dir, path)
        with open(path) as f:
            return f.read()


@dataclass
class TestResult:
    test_file: str
    passed: list[str] = field(default_factory=list)
    failed: list[tuple[str, str]] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.failed

    def render(self) -> str:
        lines = [f"{self.test_file}: {len(self.passed)} passed, "
                 f"{len(self.failed)} failed"]
        for name, err in self.failed:
            lines.append(f"  FAILED {name}: {err.splitlines()[0] if err else ''}")
        return "\n".join(lines)


_OUTPUT_VIEW_RE = re.compile(r"_[a-f0-9]+_output$")


class OutputMismatchError(AssertionError):
    pass


class SqlTester:
    """Run JSON ETL test files against the Spark step runtime.

    Mirrors ``TestCaseRunner`` (sql_tester.py:764-899): inputs become temp
    views (or real tables for dotted names), the ETL runs dry-run, and every
    declared output is matched against its ``*_output`` view.
    """

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str = ".",
        dry_run: bool = True,
        funcs: dict[str, Callable] | None = None,
        udfs: dict[str, Callable] | None = None,
    ) -> None:
        self.spark = spark
        self.work_dir = work_dir
        self.dry_run = dry_run
        self.funcs = funcs or {}
        self.udfs = udfs or {}
        self.collected_sql: str | None = None

    # ------------------------------------------------------------- file API
    def parse_cases(self, test_file: str) -> list[TestCase]:
        if test_file.endswith(".xlsx"):
            from .xlsx import parse_xlsx_cases

            return parse_xlsx_cases(test_file)
        if not test_file.endswith(".json"):
            raise AssertionError(
                f"unsupported format of test file: {test_file}"
            )
        with open(test_file) as f:
            data = json.load(f)
        return [TestCase.from_dict(d) for d in data]

    def run_file(self, test_file: str, case_idx: int = -1) -> TestResult:
        cases = self.parse_cases(test_file)
        if case_idx != -1:
            cases = [cases[case_idx]]
        result = TestResult(os.path.basename(test_file))
        for case in cases:
            try:
                self.run_case(case)
                result.passed.append(case.name)
            except Exception as e:  # noqa: BLE001 - collected into the report
                result.failed.append((case.name, str(e)))
        return result

    def run_files(self, test_files: list[str]) -> list[TestResult]:
        return [self.run_file(f) for f in test_files]

    def generate_pytest_file(self, test_file: str, out_path: str | None = None) -> str:
        """Write a pytest module that runs every case of a JSON test file
        (reference generate_python_unittest_file, sql_tester.py:1013-1059 —
        pytest-style instead of unittest, no jinja dependency)."""
        cases = self.parse_cases(test_file)
        if out_path is None:
            base = os.path.basename(test_file).replace(".", "__")
            out_path = os.path.join(
                os.path.dirname(test_file), base.replace("__json", "_test.py")
            )
        test_file_literal = repr(os.path.abspath(test_file))
        work_dir_literal = repr(os.path.abspath(self.work_dir))
        lines = [
            '"""Generated by easy_sql_spark.testing.SqlTester — do not edit."""',
            "",
            "import pytest",
            "",
            "from easy_sql_spark.testing import SqlTester",
            "",
            f"TEST_FILE = {test_file_literal}",
            f"WORK_DIR = {work_dir_literal}",
            "",
            "",
            "@pytest.mark.parametrize(\"case_idx\", "
            f"{list(range(len(cases)))!r})",
            "def test_etl_case(spark, case_idx):",
            "    result = SqlTester(spark, work_dir=WORK_DIR).run_file(",
            "        TEST_FILE, case_idx=case_idx",
            "    )",
            "    assert result.ok, result.render()",
            "",
        ]
        with open(out_path, "w", encoding="utf-8") as f:
            f.write("\n".join(lines))
        return out_path

    # ------------------------------------------------------------- case run
    def run_case(self, case: TestCase) -> None:
        from ..runtime.processor import SqlProcessor

        sql = case.read_sql(self.work_dir)
        created_tables: list[str] = []
        created_views: list[str] = []
        try:
            for table in case.inputs:
                self._create_input(table, created_tables, created_views)
            processor = SqlProcessor(
                self.spark,
                sql,
                variables=dict(case.vars),
                includes=dict(case.includes),
                base_dir=self.work_dir,
                funcs=self.funcs,
                udfs=self.udfs,
                logger=lambda _msg: None,
            )
            for p in case.func_file_paths:
                processor.register_funcs_from_pyfile(os.path.join(self.work_dir, p))
            for p in case.udf_file_paths:
                processor.register_udfs_from_pyfile(os.path.join(self.work_dir, p))
            processor.run(dry_run=self.dry_run)
            self.collected_sql = processor.collected_sql()
            for output in case.outputs:
                view = self._find_output_view(processor, output)
                self._verify_output(output, view)
        finally:
            self._clean(created_tables, created_views)

    # -------------------------------------------------------------- helpers
    def _create_input(
        self, table: TableData, created_tables: list[str], created_views: list[str]
    ) -> None:
        schema = spark_schema_for(self.spark, table.columns, table.column_types)
        df = self.spark.createDataFrame(table.typed_rows(), schema)
        if "." in table.name:
            db = table.name.split(".")[0]
            self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
            self.spark.sql(f"DROP TABLE IF EXISTS {table.name}")
            df.write.mode("overwrite").format("parquet").saveAsTable(table.name)
            created_tables.append(table.name)
        else:
            df.createOrReplaceTempView(table.name)
            created_views.append(table.name)

    def _find_output_view(self, processor, output: TableData) -> str:
        """Dry-run view for a dotted output; plain names are temp views
        (reference find_temp_view_for_output, sql_tester.py:842-865)."""
        if "." not in output.name:
            return output.name
        view = processor.output_view_for(output.name)
        if view:
            return view
        # fallback: scan temp views for {db}_{table}_{hex}_output
        prefix = output.name.replace(".", "_") + "_"
        candidates = [
            t.name
            for t in self.spark.catalog.listTables()
            if t.isTemporary
            and t.name.startswith(prefix)
            and _OUTPUT_VIEW_RE.search(t.name)
        ]
        if len(candidates) != 1:
            raise AssertionError(
                f"output `{output.name}` view not found or ambiguous: {candidates}"
            )
        return candidates[0]

    def _verify_output(self, output: TableData, view: str) -> None:
        cols = ", ".join(f"`{c}`" for c in output.columns)
        order = ", ".join(f"`{c}`" for c in output.columns)
        actual = self.spark.sql(
            f"select {cols} from {view} order by {order}"
        ).collect()

        schema = spark_schema_for(self.spark, output.columns, output.column_types)
        expected_df = self.spark.createDataFrame(output.typed_rows(), schema)
        exp_view = f"{view}__expected"
        expected_df.createOrReplaceTempView(exp_view)
        try:
            expected = self.spark.sql(
                f"select {cols} from {exp_view} order by {order}"
            ).collect()
        finally:
            self.spark.catalog.dropTempView(exp_view)

        def norm(rows):  # arrays compare as sets (list_item_to_set, :805-810)
            return [
                [set(v) if isinstance(v, list) else v for v in row]
                for row in rows
            ]

        a, e = norm(actual), norm(expected)
        if a != e:
            raise OutputMismatchError(
                f"output `{output.name}` mismatch:\n"
                f"  expected: {e}\n  actual:   {a}"
            )

    def _clean(self, created_tables: list[str], created_views: list[str]) -> None:
        for name in created_views:
            try:
                self.spark.catalog.dropTempView(name)
            except Exception:
                pass
        for name in created_tables:
            try:
                self.spark.sql(f"DROP TABLE IF EXISTS {name}")
            except Exception:
                pass
        # sweep stray *_output views from the dry run
        for t in self.spark.catalog.listTables():
            if t.isTemporary and _OUTPUT_VIEW_RE.search(t.name):
                try:
                    self.spark.catalog.dropTempView(t.name)
                except Exception:
                    pass
