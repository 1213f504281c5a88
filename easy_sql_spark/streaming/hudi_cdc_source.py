"""Streaming CHANGE-DATA-CAPTURE source over Hudi tables.

``spark.readStream.format("hudi_cdc").option("path", <hudi root>)``
tails a MOR table's supplemental ``-cdc`` log files (RFC-51,
``hoodie.table.cdc.enabled=true`` writers) — the streaming face of
:func:`sources.hudi_meta.read_hudi_cdc`, and the Spark-native
re-expression of the reference's *streaming* Flink-Hudi reads
(reference test/sample_etl.flink.postgres-hudi.sql consumes a Hudi
table as an unbounded changelog): every micro-batch delivers the
change rows of the instants COMPLETED since the last batch, in the
Debezium shape ``commit_time / op / record_key / before / after``
(images as canonical JSON strings).

Design (same contract as streaming/cdf_source.py):

- offsets ARE completed instant times (``{"instant": "..."}``); the
  timeline is the stream, so exactly-once replay falls out of the
  checkpoint — re-planning a window re-reads exactly the same
  instants (completed instants are immutable once written).
- ``partitions(start, end)`` plans one InputPartition per ``-cdc``
  file; the window's completed-instant set is resolved ONCE on the
  driver and shipped in the partition, so executors never race the
  timeline.  Files are pruned driver-side by mtime-independent content
  when possible: a cdc file whose known instants all fall outside the
  window still ships (block headers are inside the payload), but the
  executor-side decode skips foreign blocks cheaply.
- ``read`` runs ON EXECUTORS without a SparkSession: cdc blocks decode
  through ``sources/hudi_log.py`` (picklable pure Python over bytes).
  The table root must be posix-visible (local/NFS/fuse), like the
  snapshot_cdf source.
- ``max_instants_per_batch`` bounds backlog drain after a consumer
  gap; ``starting_instant`` mirrors Delta's startingVersion (changes
  strictly AFTER it; default = latest at stream start, i.e. only new
  changes).
- ``key_field`` derives ``record_key`` from an image field when the
  logging mode doesn't persist one (data_before_after) — deletes take
  it from the before image, writes from the after image, exactly like
  the batch reader.

Register once per session (``session.register_data_sources`` does)::

    spark.dataSource.register(HudiCdcDataSource)
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("commit_time", StringType(), False),
        StructField("op", StringType(), True),
        StructField("record_key", StringType(), True),
        StructField("before", StringType(), True),
        StructField("after", StringType(), True),
    ]
)


def _completed(path: str) -> list[str]:
    # shared with the batch reader (hudi_meta._completed_instants) so
    # the two CDC surfaces can never diverge on timeline semantics
    from ..sources.hudi_meta import _completed_instants

    return list(_completed_instants(path, mor=True))


def _cdc_files(path: str) -> list[str]:
    from ..sources.hudi_meta import _cdc_files as _meta_cdc_files

    return sorted(p for _rel, p in _meta_cdc_files(path))


class _CdcFilePartition(InputPartition):
    def __init__(self, file_path, lo, hi, live, key_field):
        self.file_path = file_path
        self.lo = lo  # exclusive
        self.hi = hi  # inclusive
        self.live = live  # completed instants inside the window
        self.key_field = key_field


class HudiCdcStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("hudi_cdc requires option 'path'")
        self.key_field = options.get("key_field")
        start = options.get("starting_instant")
        if start is None:
            done = _completed(self.path)
            start = done[-1] if done else ""
        self._start = str(start)
        mipb = options.get("max_instants_per_batch")
        self._max_instants = int(mipb) if mipb is not None else None
        self._committed = self._start
        # bounded admission tracks the stream position in _committed.
        # The Python DataSource API never hands the source the RESTORED
        # checkpoint offset directly, but MicroBatchExecution always
        # re-plans the restored batch (partitions(restored, restored))
        # BEFORE asking for new offsets — observed and pinned in
        # tests/test_hudi_cdc_source.py — so partitions() is where a
        # restarted source learns its true position; on a fresh start
        # the constructor-computed _start IS the position (latestOffset
        # is called before initialOffset, so arming there would be too
        # late).

    def initialOffset(self) -> dict:
        return {"instant": self._start}

    def latestOffset(self) -> dict:
        done = [i for i in _completed(self.path) if i > self._committed]
        if self._max_instants is not None:
            done = done[: self._max_instants]
        latest = done[-1] if done else self._committed
        return {"instant": latest}

    def partitions(self, start: dict, end: dict):
        lo, hi = str(start["instant"]), str(end["instant"])
        if lo > self._committed:
            self._committed = lo
        if hi <= lo:
            return []
        live = tuple(
            i for i in _completed(self.path) if lo < i <= hi
        )
        if not live:
            return []
        return [
            _CdcFilePartition(p, lo, hi, live, self.key_field)
            for p in _cdc_files(self.path)
        ]

    def read(self, partition: _CdcFilePartition):
        # executor-side: the SAME row shaper as the batch change feed
        # (hudi_meta.shape_cdc_file — pure picklable Python, no
        # SparkSession); blocks outside the window skip content decode
        # entirely (only_instants), so a long-lived tail pays O(new
        # instants) per batch, not O(file history)
        from ..sources.hudi_meta import shape_cdc_file

        yield from shape_cdc_file(
            partition.file_path,
            set(partition.live),
            partition.key_field,
        )

    def commit(self, end: dict) -> None:
        if str(end["instant"]) > self._committed:
            self._committed = str(end["instant"])


class HudiCdcDataSource(DataSource):
    """format("hudi_cdc") — streaming Hudi change feed."""

    @classmethod
    def name(cls) -> str:
        return "hudi_cdc"

    def schema(self):
        return SCHEMA

    def streamReader(self, schema: StructType) -> HudiCdcStreamReader:
        return HudiCdcStreamReader(self.options)
