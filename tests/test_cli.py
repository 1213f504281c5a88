"""End-to-end CLI tests (the data_process equivalent)."""

import io
import contextlib
import os

from easy_sql_spark.cli import main, parse_vars, spark_submit_command
from easy_sql_spark.core.config import EtlConfig

ETL = """-- backend: spark
-- config: easy_sql.etl_type=batch
-- config: spark.sql.shuffle.partitions=4

-- target=variables
select ${base} as base

-- target=temp.t
select id, id * ${base} as v from range(10)

-- target=check.row_count
select count(*) as actual, 10 as expected from t

-- target=log.sample
select * from t limit 3
"""


def test_cli_runs_etl(tmp_path, spark):
    f = tmp_path / "job.sql"
    f.write_text(ETL)
    rc = main(["-f", str(f), "--vars", "base=3", "--dry-run"])
    assert rc == 0


def test_cli_failing_check_returns_nonzero(tmp_path, spark):
    f = tmp_path / "bad.sql"
    f.write_text(
        "-- target=check.always_fails\n"
        "select 1 as actual, 2 as expected\n"
    )
    try:
        rc = main(["-f", str(f)])
    except Exception:
        rc = 1
    assert rc == 1


def test_print_spark_submit_command(tmp_path):
    f = tmp_path / "job.sql"
    f.write_text(ETL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["-f", str(f), "-p", "--vars", "base=3"])
    cmd = buf.getvalue()
    assert rc == 0
    assert cmd.startswith("spark-submit --deploy-mode client")
    assert "spark.sql.shuffle.partitions=4" in cmd
    assert "-f" in cmd and "base=3" in cmd


def test_parse_vars():
    assert parse_vars("a=1,b=x=y") == {"a": "1", "b": "x=y"}
    assert parse_vars(None) == {}


def test_scala_udf_initializer_config_parsed():
    cfg = EtlConfig.parse(
        "-- backend: spark\n"
        "-- config: easy_sql.scala_udf_initializer=com.example.UdfInit\n"
    )
    assert cfg.scala_udf_initializer == "com.example.UdfInit"


def test_scala_udf_initializer_missing_class_raises(spark):
    """No UDF jar ships in this container; the session-init path must fail
    with a descriptive error, not an opaque py4j traceback."""
    import pytest

    from easy_sql_spark.runtime.processor import SqlProcessor

    sql = (
        "-- config: easy_sql.scala_udf_initializer=com.example.NoSuchUdfs\n"
        "\n-- target=temp.t\nselect 1 as a\n"
    )
    with pytest.raises(RuntimeError, match="scala_udf_initializer"):
        SqlProcessor(spark, sql, logger=lambda m: None)


def test_custom_spark_submit_and_files(tmp_path):
    """easy_sql.spark_submit overrides the launcher; udf/func pyfiles ride
    --files (reference config/sql_config.py:298-306)."""
    (tmp_path / "my_udfs.py").write_text("def f(x):\n    return x\n")
    f = tmp_path / "job.sql"
    f.write_text(
        "-- backend: spark\n"
        "-- config: easy_sql.spark_submit=/opt/spark3/bin/spark-submit\n"
        "-- config: easy_sql.udf_file_path=my_udfs.py\n"
        "-- target=temp.t\nselect 1 as x\n"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["-f", str(f), "-p"])
    cmd = buf.getvalue()
    assert rc == 0
    assert cmd.startswith("/opt/spark3/bin/spark-submit --deploy-mode client")
    assert "--files" in cmd and "my_udfs.py" in cmd
