from .sql_tester import (
    SqlTester,
    TableData,
    TestCase,
    TestResult,
    cast_value,
    spark_schema_for,
)

__all__ = [
    "SqlTester",
    "TableData",
    "TestCase",
    "TestResult",
    "cast_value",
    "spark_schema_for",
]
