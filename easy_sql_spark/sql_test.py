"""Test-runner CLI — ``python -m easy_sql_spark.sql_test`` (reference
``python -m easy_sql.sql_test``, easy_sql/sql_test.py + docs/easy_sql/
testing.md "Run test"):

    python -m easy_sql_spark.sql_test run-test -f path/to/test.json
    python -m easy_sql_spark.sql_test run-test -f path/to/test.xlsx
    python -m easy_sql_spark.sql_test convert-json -f path/to/test.xlsx

``run-test`` accepts xlsx or JSON suites (the tester dispatches on
extension); ``convert-json`` writes the JSON twin next to the xlsx file
(reference sql_tester.py:1003-1011 semantics).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="easy_sql_spark.sql_test")
    sub = ap.add_subparsers(dest="cmd", required=True)
    run_p = sub.add_parser("run-test", help="run an xlsx/JSON ETL test file")
    run_p.add_argument("-f", "--file", required=True, action="append")
    run_p.add_argument("--case", type=int, default=-1, help="run one case")
    conv_p = sub.add_parser("convert-json", help="convert xlsx test to JSON")
    conv_p.add_argument("-f", "--file", required=True)
    args = ap.parse_args(argv)

    if args.cmd == "convert-json":
        from .testing import convert_xlsx_to_json

        out = convert_xlsx_to_json(args.file)
        print(f"wrote {out}")
        return 0

    from .session import build_session
    from .testing import SqlTester

    spark = build_session("sql_test")
    failed = 0
    for f in args.file:
        tester = SqlTester(spark, work_dir=os.path.dirname(os.path.abspath(f)))
        result = tester.run_file(f, case_idx=args.case)
        print(result.render())
        if not result.ok:
            failed += 1
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
