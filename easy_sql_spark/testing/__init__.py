from .sql_tester import (
    SqlTester,
    TableData,
    TestCase,
    TestResult,
    cast_value,
    spark_schema_for,
)
from .xlsx import (
    convert_xlsx_to_json,
    parse_xlsx_cases,
    read_xlsx,
    write_xlsx,
)

__all__ = [
    "SqlTester",
    "TableData",
    "TestCase",
    "TestResult",
    "cast_value",
    "spark_schema_for",
    "convert_xlsx_to_json",
    "parse_xlsx_cases",
    "read_xlsx",
    "write_xlsx",
]
