"""CLI entry point — the ``data_process`` equivalent.

Usage::

    python -m easy_sql_spark.cli -f etl.sql [--vars a=1,b=2] [--dry-run]
    python -m easy_sql_spark.cli -f etl.sql -p   # print spark-submit command

Reference: easy_sql/data_process.py:10-44 + cli/backend_processor.py — the
two-phase launch (``-p`` prints a spark-submit command embedding all --conf
args so a cluster scheduler can re-enter this module inside the Spark
driver).
"""

from __future__ import annotations

import argparse
import os
import shlex
import sys

from .core.config import EtlConfig
from .runtime.processor import SqlProcessor
from .session import build_session


def parse_vars(text: str | None) -> dict[str, str]:
    if not text:
        return {}
    out = {}
    for pair in text.split(","):
        if "=" in pair:
            k, v = pair.split("=", 1)
            out[k.strip()] = v.strip()
    return out


def spark_submit_command(sql_file: str, config: EtlConfig, vars_text: str | None) -> str:
    confs = " ".join(
        f"--conf {shlex.quote(f'{k}={v}')}" for k, v in config.engine_conf.items()
    )
    vars_arg = f" --vars {shlex.quote(vars_text)}" if vars_text else ""
    # -- config: easy_sql.spark_submit=<binary> overrides the launcher
    # (reference config/sql_config.py:298-306); udf/func pyfiles ship with
    # the job via --files so executors/driver can re-register them
    submit = config.easy_sql_conf.get("spark_submit", "spark-submit")
    extra_files = [
        os.path.join(os.path.dirname(os.path.abspath(sql_file)), f)
        for f in (config.udf_file_path, config.func_file_path)
        if f
    ]
    files_arg = (
        " --files " + shlex.quote(",".join(extra_files)) if extra_files else ""
    )
    return (
        f"{submit} --deploy-mode client {confs}{files_arg} "
        f"{shlex.quote(os.path.abspath(__file__))} -f {shlex.quote(sql_file)}"
        f"{vars_arg}"
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="easy_sql_spark")
    ap.add_argument("-f", "--sql-file", required=True)
    ap.add_argument("--vars", default=None, help="a=1,b=2")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument(
        "-p",
        "--print-command",
        action="store_true",
        help="print the spark-submit command instead of running",
    )
    args = ap.parse_args(argv)

    if not args.sql_file.endswith(".sql"):
        ap.error("sql file must end with .sql")
    with open(args.sql_file, encoding="utf-8") as f:
        sql = f.read()
    config = EtlConfig.parse(sql)
    config.abs_sql_file_path = os.path.abspath(args.sql_file)

    if args.print_command:
        print(spark_submit_command(args.sql_file, config, args.vars))
        return 0

    spark = build_session(
        app_name=os.path.basename(args.sql_file),
        extra_conf={
            **config.engine_conf,
            # warehouse for output tables when run standalone
            "spark.sql.warehouse.dir": os.environ.get(
                "SPARK_WAREHOUSE_DIR", "/tmp/easy_sql_spark_warehouse"
            ),
        },
    )
    processor = SqlProcessor(
        spark,
        sql,
        variables=parse_vars(args.vars),
        base_dir=os.path.dirname(os.path.abspath(args.sql_file)),
        sql_file_path=args.sql_file,
    )
    report = processor.run(dry_run=args.dry_run)
    failed = any(r.status.value == "FAILED" for r in report.steps)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
