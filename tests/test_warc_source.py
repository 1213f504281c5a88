"""format("warc") batch data source: per-file partitions, record rows,
filter pushdown-free full scans (the parser is the contract)."""

import pytest

from easy_sql_spark.operators.warc import write_warc
from easy_sql_spark.sources.warc_source import WarcDataSource


def _write_files(tmp_path):
    a = tmp_path / "a.warc"
    b = tmp_path / "b.warc.gz"
    a.write_bytes(write_warc([
        ({"WARC-Record-ID": "<urn:1>", "WARC-Type": "response",
          "WARC-Target-URI": "http://x/1"}, b"alpha"),
        ({"WARC-Record-ID": "<urn:2>", "WARC-Type": "conversion"}, b"beta!"),
    ]))
    b.write_bytes(write_warc([
        ({"WARC-Record-ID": "<urn:3>", "WARC-Date": "2024-01-01T00:00:00Z"},
         b"gzip body"),
    ], gzip_members=True))
    return a, b


def test_warc_source_reads_all_records(spark, tmp_path):
    spark.dataSource.register(WarcDataSource)
    _write_files(tmp_path)
    df = (spark.read.format("warc")
          .option("path", str(tmp_path / "*.warc*")).load())
    rows = {(r.file, r.record_id, r.warc_type, r.content_length,
             bytes(r.content)) for r in df.collect()}
    assert rows == {
        ("a.warc", "<urn:1>", "response", 5, b"alpha"),
        ("a.warc", "<urn:2>", "conversion", 5, b"beta!"),
        ("b.warc.gz", "<urn:3>", "", 9, b"gzip body"),
    }
    # one partition per file: the natural .warc.gz parallelism
    assert df.rdd.getNumPartitions() == 2
    # SQL over the source composes normally
    df.createOrReplaceTempView("warc_recs")
    n = spark.sql(
        "select count(*) from warc_recs where warc_type = 'response'"
    ).first()[0]
    assert n == 1


def test_warc_source_missing_path(spark, tmp_path):
    spark.dataSource.register(WarcDataSource)
    with pytest.raises(Exception, match="no files match"):
        (spark.read.format("warc")
         .option("path", str(tmp_path / "none-*.warc")).load().collect())
