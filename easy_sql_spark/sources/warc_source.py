"""Batch Spark data source for WARC web archives: ``format("warc")``.

``spark.read.format("warc").option("path", "/corpus/*.warc.gz").load()``
yields one row per WARC record — the shape a CommonCrawl-style corpus
scan starts from, without a collect-and-loop or a binaryFile +
mapInPandas sandwich:

    file string, member long, version string, record_id string,
    warc_type string, target_uri string, date string,
    content_length long, content binary

Scale shape: ``partitions()`` plans one InputPartition per FILE (the
.warc.gz member-per-record layout makes a file the natural split — gzip
members are not seekable without an index, so splitting inside a file
would re-inflate the prefix); executors run the stdlib-zlib record walk
from operators/warc.py.  CommonCrawl ships ~1 GB files by convention,
so file-granular parallelism is the layout's intended parallelism.
Paths must be posix-visible (same honest constraint as the snapshot CDF
source — the Python worker has no Hadoop FS).

Register once per session::

    spark.dataSource.register(WarcDataSource)
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_SCHEMA = StructType(
    [
        StructField("file", StringType()),
        StructField("member", LongType()),
        StructField("version", StringType()),
        StructField("record_id", StringType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("date", StringType()),
        StructField("content_length", LongType()),
        StructField("content", BinaryType()),
    ]
)


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        pattern = options.get("path")
        if not pattern:
            raise ValueError("warc source requires option 'path' (file or glob)")
        self.paths = (
            sorted(glob.glob(pattern))
            if any(c in pattern for c in "*?[")
            else [pattern]
        )
        if not self.paths:
            raise ValueError(f"no files match {pattern!r}")

    def partitions(self):
        return [_WarcFilePartition(p) for p in self.paths]

    def read(self, partition: _WarcFilePartition):
        from ..operators.warc import parse_warc

        with open(partition.path, "rb") as f:
            payload = f.read()
        for rec in parse_warc(payload):
            h = rec["headers"]
            yield (
                os.path.basename(partition.path),
                int(rec["offset"]),
                rec["version"],
                h.get("WARC-Record-ID", ""),
                h.get("WARC-Type", ""),
                h.get("WARC-Target-URI", ""),
                h.get("WARC-Date", ""),
                len(rec["content"]),
                rec["content"],
            )


class WarcDataSource(DataSource):
    """``format("warc")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> StructType:
        return _SCHEMA

    def reader(self, schema: StructType) -> WarcReader:
        return WarcReader(dict(self.options))
