"""Streaming Hudi CDC source (streaming/hudi_cdc_source.py): completed
instants as offsets, one partition per -cdc file, executor-side
pure-Python block decode, checkpointed resume, inflight invisibility —
the streaming face of read_hudi_cdc and the Spark-native counterpart of
the reference's streaming Flink-Hudi reads."""

import json
import os

from easy_sql_spark.sources.hudi_log import cdc_schema, write_cdc_data_block
from easy_sql_spark.streaming.hudi_cdc_source import HudiCdcDataSource

IMG_SCHEMA = {
    "type": "record",
    "name": "img",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "v", "type": ["null", "string"]},
    ],
}


def _mk_table(root):
    os.makedirs(root + "/.hoodie")
    with open(root + "/.hoodie/hoodie.properties", "w") as fh:
        fh.write("hoodie.table.name=s\nhoodie.table.type=MERGE_ON_READ\n")


def _commit(root, instant, action="deltacommit"):
    with open(f"{root}/.hoodie/{instant}.{action}", "w") as fh:
        fh.write("{}")


def _cdc_block(instant, op, pairs):
    return write_cdc_data_block(
        [
            {
                "op": op,
                "ts_ms": instant,
                "before": {"k": k, "v": v} if op == "d" else None,
                "after": None if op == "d" else {"k": k, "v": v},
            }
            for k, v in pairs
        ],
        instant,
        "data_before_after",
        IMG_SCHEMA,
    )


def _drain(spark, root, out, ckpt, starting_instant=None, extra=None):
    reader = (
        spark.readStream.format("hudi_cdc")
        .option("path", root)
        .option("key_field", "k")
    )
    if starting_instant is not None:
        reader = reader.option("starting_instant", starting_instant)
    for k, v in (extra or {}).items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "query still running"
    q.stop()


def _rows(spark, out):
    return {
        (r.commit_time, r.op, r.record_key)
        for r in spark.read.parquet(str(out)).collect()
    }


def test_hudi_cdc_stream_tail_and_resume(spark, tmp_path):
    spark.dataSource.register(HudiCdcDataSource)
    root = str(tmp_path / "tbl")
    _mk_table(root)
    _commit(root, "001", "commit")

    payload = _cdc_block("002", "i", [(1, "a"), (2, "b")])
    payload += _cdc_block("003", "u", [(1, "a2")])
    # inflight instant: block present, NO timeline entry -> invisible
    payload += _cdc_block("004", "i", [(9, "ghost")])
    with open(f"{root}/.f1_001.log.1_0-1-0-cdc", "wb") as fh:
        fh.write(payload)
    _commit(root, "002")
    _commit(root, "003")

    out, ckpt = tmp_path / "o", tmp_path / "c"
    _drain(spark, root, out, ckpt, starting_instant="001")
    assert _rows(spark, out) == {
        ("002", "i", "1"), ("002", "i", "2"), ("003", "u", "1"),
    }

    # late instants land in a SECOND cdc file; checkpointed resume must
    # deliver only the new window (004 completes now, 005 deletes)
    payload2 = _cdc_block("005", "d", [(2, None)])
    with open(f"{root}/.f1_001.log.2_0-1-0-cdc", "wb") as fh:
        fh.write(payload2)
    _commit(root, "004")
    _commit(root, "005")
    _drain(spark, root, out, ckpt)
    got = _rows(spark, out)
    assert ("004", "i", "9") in got  # completed now -> visible
    assert ("005", "d", "2") in got
    # no duplicates from the already-committed window
    assert len([r for r in got if r[0] == "002"]) == 2

    # before/after image shapes: deletes carry before only
    imgs = {
        (r.op, r.before is None, r.after is None)
        for r in spark.read.parquet(str(tmp_path / "o")).collect()
    }
    assert ("d", False, True) in imgs
    assert ("i", True, False) in imgs


def test_hudi_cdc_stream_backlog_bounded(spark, tmp_path):
    spark.dataSource.register(HudiCdcDataSource)
    root = str(tmp_path / "tbl2")
    _mk_table(root)
    _commit(root, "001", "commit")
    payload = b""
    for i in range(2, 8):
        payload += _cdc_block(f"{i:03d}", "i", [(i, f"v{i}")])
    with open(f"{root}/.f1_001.log.1_0-1-0-cdc", "wb") as fh:
        fh.write(payload)
    for i in range(2, 8):
        _commit(root, f"{i:03d}")

    out, ckpt = tmp_path / "o2", tmp_path / "c2"
    # max_instants_per_batch bounds every micro-batch: the source
    # tracks its position in _committed, updated from partitions(start)
    # — which ALSO pins the engine behavior this relies on: a restarted
    # query re-plans the restored batch (partitions(restored, restored))
    # before asking for new offsets, so the cap never computes below
    # the restored offset.  Python sources run ONE batch per
    # availableNow trigger, so 6 backlogged instants drain in exactly 3
    # checkpointed runs of ≤2 instants each.
    for drained_through in (3, 5, 7):
        _drain(
            spark, root, out, ckpt, starting_instant="001",
            extra={"max_instants_per_batch": "2"},
        )
        got = _rows(spark, out)
        assert got == {
            (f"{i:03d}", "i", str(i)) for i in range(2, drained_through + 1)
        }


def test_hudi_cdc_stream_fresh_start_sees_only_new(spark, tmp_path):
    """Default starting_instant = latest at stream start: history is
    not replayed, only post-start commits stream."""
    spark.dataSource.register(HudiCdcDataSource)
    root = str(tmp_path / "tbl3")
    _mk_table(root)
    _commit(root, "001", "commit")
    with open(f"{root}/.f1_001.log.1_0-1-0-cdc", "wb") as fh:
        fh.write(_cdc_block("002", "i", [(1, "old")]))
    _commit(root, "002")

    out, ckpt = tmp_path / "o3", tmp_path / "c3"
    _drain(spark, root, out, ckpt)  # nothing new yet
    assert not os.path.exists(str(out)) or not [
        f for f in os.listdir(str(out)) if f.endswith(".parquet")
    ] or not _rows(spark, out)

    with open(f"{root}/.f1_001.log.2_0-1-0-cdc", "wb") as fh:
        fh.write(_cdc_block("003", "i", [(2, "new")]))
    _commit(root, "003")
    _drain(spark, root, out, ckpt)
    assert _rows(spark, out) == {("003", "i", "2")}


def test_hudi_cdc_as_yaml_streaming_source(spark, tmp_path):
    """The step-language streaming surface routes formats generically,
    so an ETL can declare the Hudi change feed as a YAML source — the
    reference's Flink-Hudi streaming-source config, re-expressed."""
    from easy_sql_spark.streaming.tables import StreamingTables

    spark.dataSource.register(HudiCdcDataSource)
    root = str(tmp_path / "ytbl")
    _mk_table(root)
    _commit(root, "001", "commit")
    with open(f"{root}/.f1_001.log.1_0-1-0-cdc", "wb") as fh:
        fh.write(_cdc_block("002", "i", [(1, "a"), (2, "b")]))
    _commit(root, "002")

    config = {
        "sources": [{
            "name": "hudi_feed",
            "format": "hudi_cdc",
            "options": {"path": root, "starting_instant": "001",
                        "key_field": "k"},
        }],
        "sinks": [{
            "name": "out",
            "format": "parquet",
            "trigger": "availableNow",
            "checkpoint": str(tmp_path / "yck"),
            "options": {"path": str(tmp_path / "yout")},
        }],
    }
    st = StreamingTables(spark, config)
    st.register_sources()
    q = st.start_insert(spark.table("hudi_feed"), "out")
    assert q.awaitTermination(240), "query still running"
    q.stop()
    rows = {
        (r.commit_time, r.op, r.record_key)
        for r in spark.read.parquet(str(tmp_path / "yout")).collect()
    }
    assert rows == {("002", "i", "1"), ("002", "i", "2")}
