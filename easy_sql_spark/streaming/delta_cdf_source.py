"""Streaming CHANGE DATA FEED source over third-party Delta tables.

``spark.readStream.format("delta_cdf").option("path", <delta root>)``
tails a Delta table's ``_delta_log`` — the streaming face of
:func:`sources.delta_log.delta_changes` (readChangeFeed without
delta-spark jars), completing the source trio: ``snapshot_cdf`` (this
repo's snapshot tables), ``hudi_cdc`` (Hudi MOR), ``delta_cdf``
(Delta).  Every micro-batch delivers the change rows of the commits
landed since the last batch with the standard CDF columns
``_change_type`` / ``_commit_version`` / ``_commit_timestamp``.

Design (same contract as the sibling sources):

- offsets ARE commit versions (``{"version": N}``); the commit log is
  the stream, so exactly-once replay falls out of the checkpoint.
- ``partitions(start, end)`` parses the window's JSON commits on the
  driver (metadata-sized by construction) and plans one InputPartition
  per changed FILE, carrying everything ``read`` needs — logical
  schema, physical-name mapping (column-mapping tables), partition
  values, change kind, version, timestamp — so executors never touch
  the log.
- per commit, Delta's own CDF rule: ``cdc`` actions are authoritative
  when present (files under ``_change_data/`` carry ``_change_type``
  physically; add/remove of such commits are ignored); otherwise
  ``add(dataChange)`` files stream as ``insert`` rows and
  ``remove(dataChange)`` files as ``delete`` rows.  A DV-carrying add
  WITHOUT a cdc action refuses loudly (row-level deltas of a DV change
  are not derivable from the log alone), as does a schema-changing
  ``metaData`` action inside the stream (CDF schema evolution), and a
  vacuumed remove-side file — never a silent wrong answer.
- ``read`` runs ON EXECUTORS without a SparkSession: pyarrow file
  scans, logical renames, typed constants (streaming/arrow_consts.py).
- ``starting_version`` mirrors Delta's startingVersion (changes
  strictly AFTER it; default = latest at stream start);
  ``max_versions_per_batch`` bounds backlog drain, restart-safe via
  the partitions(start) position update (see cdf_source notes).

Register once per session (``session.register_data_sources`` does)::

    spark.dataSource.register(DeltaChangeFeedDataSource)
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.delta_log import (
    _check_protocol,
    _column_mapping,
    _commit_versions,
    _log_dir,
    delta_latest_version,
)


def _part_values_from_path(rel_path: str) -> dict:
    """Recover partitionValues from a hive-style relative file path
    (``col=value/.../part-*.parquet``).  A ``remove`` action written
    without extendedFileMetadata (legal per the Delta PROTOCOL.md) has
    no partitionValues field; most writers still lay files out
    hive-style, so the path carries them.  Values are path-unescaped;
    ``__HIVE_DEFAULT_PARTITION__`` is the null sentinel.

    Paths are assumed Hive-escaped (Spark/Hive ``escapePathName``
    always %-escapes ``%`` itself): a literal ``%`` in a partition
    value must arrive as ``%25``.  A non-escaping foreign writer whose
    raw value contains ``%`` followed by hex digits would be
    mis-decoded here — out of contract (ADVICE r12)."""
    from urllib.parse import unquote

    out: dict = {}
    for seg in rel_path.split("/")[:-1]:
        if "=" not in seg:
            continue
        k, v = seg.split("=", 1)
        out[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
    return out


def _latest_metadata_sessionless(path: str) -> tuple[dict, dict | None]:
    """(metaData, protocol) from the newest JSON commit that carries
    them — no SparkSession (DataSource.schema() runs without one).
    Falls back to pyarrow over the newest checkpoint when the JSON tail
    carries no metaData (checkpoint-truncated logs)."""
    meta = protocol = None
    for v in reversed(_commit_versions(path)):
        f = os.path.join(_log_dir(path), f"{v:020d}.json")
        with open(f, encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                a = json.loads(line)
                if meta is None and "metaData" in a:
                    meta = a["metaData"]
                if protocol is None and "protocol" in a:
                    protocol = a["protocol"]
        if meta is not None:
            return meta, protocol
    # checkpoint-only metadata
    import pyarrow.parquet as pq

    from ..sources.delta_log import _checkpoint_at_or_below

    found = _checkpoint_at_or_below(path, delta_latest_version(path))
    if found is None:
        raise ValueError(f"no delta metaData found under {path}")
    _cp, cp_files, _form = found
    for f in cp_files:
        t = pq.read_table(f, columns=["metaData", "protocol"])
        for row in t.to_pylist():
            if meta is None and row.get("metaData") and row["metaData"].get(
                "schemaString"
            ):
                meta = row["metaData"]
            if protocol is None and row.get("protocol") and row[
                "protocol"
            ].get("minReaderVersion"):
                protocol = row["protocol"]
    if meta is None:
        raise ValueError(f"no delta metaData found under {path}")
    return meta, protocol


class _DeltaCdfPartition(InputPartition):
    def __init__(self, file_path, kind, version, ts, part_values,
                 schema_json, part_cols, phys_of):
        self.file_path = file_path
        self.kind = kind  # "cdc" | "insert" | "delete"
        self.version = version
        self.ts = ts
        self.part_values = part_values  # {physical name: str|None}
        self.schema_json = schema_json  # LOGICAL table schema
        self.part_cols = part_cols  # logical partition column names
        self.phys_of = phys_of  # logical -> physical name


class DeltaCdfStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("delta_cdf requires option 'path'")
        meta, protocol = _latest_metadata_sessionless(self.path)
        _check_protocol(protocol)
        self._schema = StructType.fromJson(json.loads(meta["schemaString"]))
        self._schema_string = meta["schemaString"]
        self._part_cols = list(meta.get("partitionColumns") or [])
        cmap = _column_mapping(meta, self._schema)
        self._phys_of = (
            cmap["phys_of"]
            if cmap
            else {f.name: f.name for f in self._schema.fields}
        )
        start = options.get("starting_version")
        self._start = (
            int(start)
            if start is not None
            else delta_latest_version(self.path)
        )
        mvpb = options.get("max_versions_per_batch")
        self._max_versions = int(mvpb) if mvpb is not None else None
        self._committed = self._start

    def stream_schema(self) -> StructType:
        return StructType(
            list(self._schema.fields)
            + [
                StructField("_change_type", StringType(), True),
                StructField("_commit_version", LongType(), True),
                StructField("_commit_timestamp", LongType(), True),
            ]
        )

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        latest = delta_latest_version(self.path)
        if self._max_versions is not None:
            latest = min(latest, self._committed + self._max_versions)
        return {"version": latest}

    def partitions(self, start: dict, end: dict):
        v0, v1 = int(start["version"]), int(end["version"])
        self._committed = max(self._committed, v0)
        parts: list[_DeltaCdfPartition] = []
        for v in range(v0 + 1, v1 + 1):
            f = os.path.join(_log_dir(self.path), f"{v:020d}.json")
            if not os.path.exists(f):
                raise ValueError(
                    f"delta log is missing commit {v} (vacuumed/cleaned "
                    "history); restart the stream at a surviving version"
                )
            ts = None
            cdcs, adds, removes = [], [], []
            with open(f, encoding="utf-8") as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    a = json.loads(line)
                    if "commitInfo" in a and a["commitInfo"].get("timestamp"):
                        ts = int(a["commitInfo"]["timestamp"])
                    elif "metaData" in a:
                        if a["metaData"].get("schemaString") != \
                                self._schema_string:
                            raise ValueError(
                                f"delta commit {v} changes the table "
                                "schema mid-stream; restart the stream "
                                "to pick up the new schema"
                            )
                    elif "cdc" in a:
                        cdcs.append(a["cdc"])
                    elif "add" in a and a["add"].get("dataChange", True):
                        adds.append(a["add"])
                    elif "remove" in a and a["remove"].get(
                        "dataChange", True
                    ):
                        removes.append(a["remove"])
            if ts is None:
                ts = int(os.path.getmtime(f) * 1000)

            def mk(action, kind, v=v, ts=ts):
                fp = os.path.join(self.path, action["path"])
                if kind == "delete" and not os.path.exists(fp):
                    raise ValueError(
                        f"remove-side file of commit {v} is gone "
                        f"({action['path']}): vacuumed history cannot "
                        "stream deletes"
                    )
                pvals = dict(action.get("partitionValues") or {})
                if self._part_cols and not pvals:
                    # ONLY a remove written without extendedFileMetadata
                    # is legal per the Delta protocol without
                    # partitionValues; add/cdc actions on a partitioned
                    # table MUST carry them, so a missing dict there is
                    # a malformed writer — refuse loudly instead of
                    # silently recovering from the path (ADVICE r12)
                    if kind != "delete":
                        raise ValueError(
                            f"commit {v} {kind} action for "
                            f"{action['path']} carries no partitionValues "
                            "on a partitioned table; the Delta protocol "
                            "only permits the omission for remove "
                            "actions without extendedFileMetadata — "
                            "malformed writer, refusing to guess"
                        )
                    pvals = _part_values_from_path(action["path"])
                    missing = [
                        c for c in self._part_cols
                        if self._phys_of.get(c, c) not in pvals
                    ]
                    if missing:
                        raise ValueError(
                            f"commit {v} {kind} action for "
                            f"{action['path']} carries no partitionValues "
                            f"and the path is not hive-style for "
                            f"partition column(s) {missing}; refusing to "
                            "stream NULL partition values"
                        )
                return _DeltaCdfPartition(
                    fp, kind, v, ts, pvals,
                    self._schema.json(), self._part_cols, self._phys_of,
                )

            if cdcs:
                # cdc actions authoritative: adds/removes ignored
                parts += [mk(c, "cdc") for c in cdcs]
            else:
                for a in adds:
                    if a.get("deletionVector"):
                        raise ValueError(
                            f"commit {v} carries a deletion vector "
                            "without cdc actions; row-level changes are "
                            "not derivable from the log alone (enable "
                            "CDF on the writer)"
                        )
                parts += [mk(a, "insert") for a in adds]
                parts += [mk(r, "delete") for r in removes]
        return parts

    def read(self, partition: _DeltaCdfPartition):
        # executor-side: pyarrow scan, no SparkSession
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_type
        from pyspark.sql.types import _parse_datatype_json_string

        from .arrow_consts import const_array

        schema = _parse_datatype_json_string(partition.schema_json)
        t = pq.read_table(partition.file_path)
        n = t.num_rows
        if n == 0:
            return
        cols, names = [], []
        for field in schema.fields:
            names.append(field.name)
            phys = partition.phys_of.get(field.name, field.name)
            if field.name in partition.part_cols:
                cols.append(
                    const_array(field, partition.part_values.get(phys), n)
                )
            elif phys in t.column_names:
                cols.append(t[phys].combine_chunks())
            else:  # column absent from an old file: NULLs, typed
                cols.append(
                    pa.nulls(n, type=to_arrow_type(field.dataType))
                )
        if partition.kind == "cdc":
            if "_change_type" not in t.column_names:
                raise ValueError(
                    f"cdc file {partition.file_path} lacks the physical "
                    "_change_type column"
                )
            cols.append(t["_change_type"].combine_chunks())
        else:
            cols.append(pa.array([partition.kind] * n, type=pa.string()))
        cols.append(pa.array([partition.version] * n, type=pa.int64()))
        cols.append(pa.array([partition.ts] * n, type=pa.int64()))
        names += ["_change_type", "_commit_version", "_commit_timestamp"]
        yield pa.RecordBatch.from_arrays(cols, names=names)

    def commit(self, end: dict) -> None:
        self._committed = max(self._committed, int(end["version"]))


class DeltaChangeFeedDataSource(DataSource):
    """format("delta_cdf") — streaming Delta change feed."""

    @classmethod
    def name(cls) -> str:
        return "delta_cdf"

    def schema(self):
        return DeltaCdfStreamReader(self.options).stream_schema()

    def streamReader(self, schema: StructType) -> DeltaCdfStreamReader:
        return DeltaCdfStreamReader(self.options)
