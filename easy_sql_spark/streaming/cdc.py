"""Changelog (CDC) envelope decoding for Structured Streaming sources.

The reference ingests database changelogs through Flink CDC connector
tables (easy_sql/sql_processor/backend/flink.py:339-414, sample ETL
test/sample_etl.flink.postgres-cdc.sql) — the connector runtime decodes
the replication stream and hands SQL a retractable table.  Spark has no
postgres-cdc source; the idiomatic equivalent is the Debezium topology:
Debezium publishes the WAL as JSON envelopes to Kafka (or files), Spark
reads the raw stream, and THIS module turns the envelopes into a typed
changelog frame that ``SnapshotTable.apply_changes`` (or any MERGE sink)
applies — upserts for create/update/snapshot-read ops, deletes for
delete ops.

Everything is JVM-side (``from_json`` + column ops): no Python UDFs in
the decode path, so a 100-TB-scale changelog replay runs at scan speed.

Envelope shapes accepted (both appear in the wild):

* wrapped — ``{"schema": …, "payload": {"op": "c|u|d|r", "before": …,
  "after": …, "ts_ms": …, "source": {"lsn": …}}}`` (Debezium default,
  ``value.converter.schemas.enable=true``);
* unwrapped — the payload object at top level
  (``schemas.enable=false``).

Output columns: the payload fields (taken from ``after`` for upserts,
``before`` for deletes), plus

* ``__op``      — ``upsert`` | ``delete``
* ``__ts_ms``   — the envelope's event timestamp (bigint millis)
* ``__seq``     — monotone apply order: the source LSN when present,
  else ``ts_ms`` (the ``precombine`` column for apply_changes)

Rows that decode to no op (tombstones, malformed JSON) are dropped —
Kafka tombstone records carry a null value and exist for log compaction,
not state.

Ordering semantics downstream (``SnapshotTable.apply_changes`` with
``precombine=__seq``): within a micro-batch the LARGEST ``__seq`` per
key wins (update-then-delete nets to the delete); ACROSS batches a
late/out-of-order event whose ``__seq`` is strictly below the stored
row's is ignored (LSN-regression protection — WAL replays and merged
topic partitions cannot regress the mirror), while an equal ``__seq``
re-applies so exact redelivery stays idempotent.  Pinned end-to-end in
tests/test_cdc.py (out-of-order batch + tombstone burst + same-key
update/delete).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _payload_struct(schema: str | T.StructType) -> T.StructType:
    if isinstance(schema, T.StructType):
        return schema
    parsed = T._parse_datatype_string(schema)
    if not isinstance(parsed, T.StructType):
        raise ValueError(f"payload schema must be a struct, got {parsed}")
    return parsed


def debezium_envelope_schema(payload: str | T.StructType) -> T.StructType:
    """The from_json schema matching BOTH wrapped and unwrapped Debezium
    envelopes for a given payload row schema."""
    row = _payload_struct(payload)
    inner = [
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("before", row),
        T.StructField("after", row),
        T.StructField(
            "source",
            T.StructType(
                [
                    T.StructField("lsn", T.LongType()),
                    T.StructField("ts_ms", T.LongType()),
                ]
            ),
        ),
    ]
    return T.StructType(inner + [T.StructField("payload", T.StructType(inner))])


def decode_debezium(
    df: DataFrame,
    payload_schema: str | T.StructType,
    value_col: str = "value",
) -> DataFrame:
    """Decode a stream/frame of raw Debezium-JSON records (in string or
    binary column ``value_col`` — Kafka's ``value``, the text source's
    ``value``) into the typed changelog frame described in the module
    docstring.  Works on both streaming and batch frames."""
    row = _payload_struct(payload_schema)
    env = debezium_envelope_schema(row)
    e = F.from_json(F.col(value_col).cast("string"), env)

    def pick(field: str):
        return F.coalesce(e["payload"][field], e[field])

    op = pick("op")
    ts = F.coalesce(
        e["payload"]["ts_ms"], e["ts_ms"],
        e["payload"]["source"]["ts_ms"], e["source"]["ts_ms"],
    )
    lsn = F.coalesce(
        e["payload"]["source"]["lsn"], e["source"]["lsn"], ts
    )
    row_struct = F.when(op == "d", pick("before")).otherwise(pick("after"))
    out = (
        df.select(
            row_struct.alias("__row"),
            F.when(op == "d", F.lit("delete"))
            .otherwise(F.lit("upsert"))
            .alias("__op"),
            ts.alias("__ts_ms"),
            lsn.alias("__seq"),
            op.alias("__raw_op"),
        )
        # tombstones / malformed json decode to NULL op — drop, they
        # carry no state; likewise a delete with no before image (Kafka
        # log-compacted away) cannot be applied by value
        .where(F.col("__raw_op").isin("c", "u", "r", "d"))
        .where(F.col("__row").isNotNull())
        .drop("__raw_op")
    )
    return out.select(
        *[F.col("__row")[f.name].alias(f.name) for f in row.fields],
        "__op",
        "__ts_ms",
        "__seq",
    )
