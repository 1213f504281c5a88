"""Tests for custom stateful streaming operators (applyInPandasWithState)."""

import json
import time

import pytest

from easy_sql_spark.streaming.stateful import sessionize, stream_dedupe


def _write_batch(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run_to_memory(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "query still running"
    return q


def test_stream_dedupe_across_batches(spark, tmp_path):
    src = tmp_path / "dsrc"
    # two files -> two micro-batches (maxFilesPerTrigger=1); doc 2 repeats
    _write_batch(src / "a.json", [
        {"h": "k1", "doc": 1}, {"h": "k2", "doc": 2}, {"h": "k2", "doc": 2},
    ])
    time.sleep(1.1)  # file source orders batches by mod time
    _write_batch(src / "b.json", [
        {"h": "k2", "doc": 2}, {"h": "k3", "doc": 3},
    ])
    stream = (
        spark.readStream.schema("h string, doc long")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    deduped = stream_dedupe(stream, ["h"])
    _run_to_memory(deduped, "dedup_out")
    rows = {r.h: r.doc for r in spark.sql("select * from dedup_out").collect()}
    assert rows == {"k1": 1, "k2": 2, "k3": 3}
    n = spark.sql("select count(*) as n from dedup_out").first()["n"]
    assert n == 3  # duplicates within AND across batches dropped


def test_stream_dedupe_batch_fallback(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k int, v string")
    assert stream_dedupe(df, ["k"]).count() == 2


def test_sessionize_gap_split_and_cross_batch(spark, tmp_path):
    src = tmp_path / "ssrc"
    # batch 1: user 7 events at t=0,10 (one open session)
    _write_batch(src / "a.json", [
        {"user": 7, "t": 0}, {"user": 7, "t": 10},
    ])
    time.sleep(1.1)
    # batch 2: t=15 continues the session; t=100 closes it (gap 30)
    _write_batch(src / "b.json", [
        {"user": 7, "t": 15}, {"user": 7, "t": 100}, {"user": 8, "t": 5},
    ])
    stream = (
        spark.readStream.schema("user long, t long")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    sessions = sessionize(stream, "user", "t", gap=30)
    _run_to_memory(sessions, "sess_out")
    rows = [
        (r.user, r.session_start, r.session_end, r.n_events)
        for r in spark.sql(
            "select * from sess_out order by user, session_start"
        ).collect()
    ]
    # only user 7's first session completed (closed by t=100);
    # the open sessions (7 @ t=100, 8 @ t=5) remain in state
    assert rows == [(7, 0, 15, 3)]


def test_sessionize_late_event_does_not_split(spark, tmp_path):
    """A later micro-batch delivering an event OLDER than the stored
    session's last timestamp must not move `last` backwards (ADVICE r1) —
    otherwise the next in-order event spuriously splits the session."""
    src = tmp_path / "lsrc"
    _write_batch(src / "a.json", [
        {"user": 1, "t": 0}, {"user": 1, "t": 20},
    ])
    time.sleep(1.1)
    # t=10 is late (older than last=20); t=40 is within gap of last=20 and
    # must continue the session; t=200 closes it
    _write_batch(src / "b.json", [
        {"user": 1, "t": 10}, {"user": 1, "t": 40}, {"user": 1, "t": 200},
    ])
    stream = (
        spark.readStream.schema("user long, t long")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    sessions = sessionize(stream, "user", "t", gap=30)
    _run_to_memory(sessions, "late_sess_out")
    rows = [
        (r.user, r.session_start, r.session_end, r.n_events)
        for r in spark.sql(
            "select * from late_sess_out order by session_start"
        ).collect()
    ]
    # one completed session covering 0..40 with 4 events (late t=10 merged;
    # without the max() guard, last would move back to 10 and t=40 would
    # spuriously split)
    assert rows == [(1, 0, 40, 4)]


def _run_checkpointed(df, out_dir, checkpoint):
    # file sink, not memory: only fault-tolerant sinks support restarting
    # from a checkpoint (memory raises "does not support recovering")
    q = (
        df.writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(checkpoint))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "query still running"
    q.stop()
    return q


def test_stream_dedupe_state_survives_restart(spark, tmp_path):
    """Stop/restart with the same checkpoint dir: per-key state must come
    back from the state store — a key emitted before the restart stays
    deduped after it.  This is the first thing a real streaming user hits
    (every deploy is a restart)."""
    src = tmp_path / "rsrc"
    ckpt = tmp_path / "rckpt"
    out = tmp_path / "rout"
    _write_batch(src / "a.json", [{"h": "k1", "doc": 1}, {"h": "k2", "doc": 2}])

    def build():
        stream = spark.readStream.schema("h string, doc long").json(str(src))
        return stream_dedupe(stream, ["h"])

    _run_checkpointed(build(), out, ckpt)
    assert sorted(r.h for r in spark.read.parquet(str(out)).collect()) == [
        "k1",
        "k2",
    ]

    # new data after shutdown: k1 repeats (must drop — state restored),
    # k3 is new (must emit)
    time.sleep(1.1)
    _write_batch(src / "b.json", [{"h": "k1", "doc": 1}, {"h": "k3", "doc": 3}])
    _run_checkpointed(build(), out, ckpt)
    # cumulative sink holds exactly one row per key ever seen — k1 NOT
    # re-emitted after the restart proves its state marker was restored
    assert sorted(r.h for r in spark.read.parquet(str(out)).collect()) == [
        "k1",
        "k2",
        "k3",
    ]


def test_sessionize_state_survives_restart(spark, tmp_path):
    """An open session carried in state before shutdown must complete from
    the restored state after restart — start/last/n all survive."""
    src = tmp_path / "rssrc"
    ckpt = tmp_path / "rsckpt"
    out = tmp_path / "rsout"
    _write_batch(src / "a.json", [{"user": 7, "t": 0}, {"user": 7, "t": 10}])

    def build():
        stream = spark.readStream.schema("user long, t long").json(str(src))
        return sessionize(stream, "user", "t", gap=30)

    _run_checkpointed(build(), out, ckpt)
    assert spark.read.parquet(str(out)).count() == 0  # still open

    time.sleep(1.1)
    _write_batch(src / "b.json", [{"user": 7, "t": 100}])
    _run_checkpointed(build(), out, ckpt)
    rows = [
        (r.user, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(str(out)).collect()
    ]
    # t=100 closes the restored 0..10 session; both its bounds and its
    # event count prove the full state tuple survived the restart
    assert rows == [(7, 0, 10, 2)]


def test_stream_dedupe_watermarked(spark, tmp_path):
    """Built-in bounded-state dedup: withWatermark +
    dropDuplicatesWithinWatermark (state sized by the delay window)."""
    from easy_sql_spark.streaming.stateful import stream_dedupe_watermarked

    src = tmp_path / "wsrc"
    _write_batch(src / "a.json", [
        {"h": "k1", "doc": 1, "ts": "2026-01-01 00:00:00"},
        {"h": "k1", "doc": 1, "ts": "2026-01-01 00:00:05"},
        {"h": "k2", "doc": 2, "ts": "2026-01-01 00:00:10"},
    ])
    stream = (
        spark.readStream.schema("h string, doc long, ts timestamp")
        .json(str(src))
    )
    deduped = stream_dedupe_watermarked(stream, ["h"], "ts", "10 minutes")
    _run_to_memory(deduped, "wdedup_out")
    rows = spark.sql("select h from wdedup_out").collect()
    assert sorted(r.h for r in rows) == ["k1", "k2"]

    # batch fallback
    df = spark.createDataFrame([("a", 1), ("a", 2)], "k string, v int")
    assert stream_dedupe_watermarked(df, ["k"], "k", "1 minute").count() == 1


def test_sessionize_builtin_matches_batch_query_semantics(spark):
    """The built-in session_window path must produce the same sessions as
    the lag-flag-cumsum batch query on real events data (same 30-min
    gap)."""
    from pyspark.sql import functions as F

    from easy_sql_spark.datasets import load_table
    from easy_sql_spark.queries import QUERIES
    from easy_sql_spark.streaming.stateful import sessionize_builtin

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    built = {
        (r.user_id, int(r.session_start.timestamp()), r.n_events)
        for r in sessionize_builtin(ev, "user_id", "ts", "30 minutes").collect()
    }
    batch = {
        (r.user_id, r.session_start, r.n_events)
        for r in QUERIES["events_sessionize_batch"](spark, sf).collect()
    }
    assert built == batch


def test_sessionize_builtin_streaming_append(spark, tmp_path):
    """Streaming mode: watermark + session_window emits a session once the
    watermark passes its close."""
    from easy_sql_spark.streaming.stateful import sessionize_builtin

    src = tmp_path / "swsrc"
    _write_batch(src / "a.json", [
        {"user": 1, "ts": "2026-01-01 00:00:00"},
        {"user": 1, "ts": "2026-01-01 00:10:00"},
    ])
    time.sleep(1.1)
    # far-future event pushes the watermark past the first session's close
    _write_batch(src / "b.json", [{"user": 1, "ts": "2026-01-02 00:00:00"}])
    stream = (
        spark.readStream.schema("user long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    out = sessionize_builtin(stream, "user", "ts", "30 minutes", "10 minutes")
    _run_to_memory(out, "sw_out")
    rows = [
        (r.user, str(r.session_start), r.n_events)
        for r in spark.sql("select * from sw_out").collect()
    ]
    assert rows == [(1, "2026-01-01 00:00:00", 2)]


def test_stream_dedupe_restart_under_rocksdb_state_store(spark, tmp_path):
    """Same restart flow as test_stream_dedupe_state_survives_restart but
    with the RocksDB state store provider — the beyond-memory state
    backend a 100 TB streaming dedup actually needs (HDFS-backed default
    keeps every key in executor heap; RocksDB spills to local disk).
    Pins that our applyInPandasWithState operators work unchanged under
    ``spark.sql.streaming.stateStore.providerClass``."""
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        src = tmp_path / "rdbsrc"
        ckpt = tmp_path / "rdbckpt"
        out = tmp_path / "rdbout"
        _write_batch(src / "a.json", [{"h": "k1", "doc": 1}, {"h": "k2", "doc": 2}])

        def build():
            stream = spark.readStream.schema("h string, doc long").json(str(src))
            return stream_dedupe(stream, ["h"])

        _run_checkpointed(build(), out, ckpt)
        assert sorted(r.h for r in spark.read.parquet(str(out)).collect()) == [
            "k1", "k2"]

        time.sleep(1.1)
        _write_batch(src / "b.json", [{"h": "k1", "doc": 1}, {"h": "k3", "doc": 3}])
        _run_checkpointed(build(), out, ckpt)
        # k1 deduped across the restart → RocksDB state restored
        assert sorted(r.h for r in spark.read.parquet(str(out)).collect()) == [
            "k1", "k2", "k3"]
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_stream_quota_token_budget_across_batches(spark, tmp_path):
    """transformWithStateInPandas per-key budget: batch 1 spends part of
    each key's budget, batch 2 may only spend the remainder — admission
    is cumulative across micro-batches via the 8-byte value state."""
    from easy_sql_spark.streaming.stateful import stream_quota

    src = tmp_path / "qsrc"
    ckpt = tmp_path / "qckpt"
    out = tmp_path / "qout"
    # key a: weights 4+4 => cap 10 admits both (8); key b: 7+7 admits one
    _write_batch(src / "a.json", [
        {"k": "a", "doc": 1, "w": 4}, {"k": "a", "doc": 2, "w": 4},
        {"k": "b", "doc": 3, "w": 7}, {"k": "b", "doc": 4, "w": 7},
    ])

    def build():
        stream = spark.readStream.schema("k string, doc long, w long").json(str(src))
        return stream_quota(stream, ["k"], cap=10, weight_col="w",
                            order_cols=["doc"])

    _run_checkpointed(build(), out, ckpt)
    got = {(r.k, r.doc) for r in spark.read.parquet(str(out)).collect()}
    assert got == {("a", 1), ("a", 2), ("b", 3)}

    # batch 2: a has 2 budget left (admits w=2, rejects next), b has 3
    time.sleep(1.1)
    _write_batch(src / "b.json", [
        {"k": "a", "doc": 5, "w": 2}, {"k": "a", "doc": 6, "w": 1},
        {"k": "b", "doc": 7, "w": 3},
    ])
    _run_checkpointed(build(), out, ckpt)
    got = {(r.k, r.doc) for r in spark.read.parquet(str(out)).collect()}
    # a: 8+2=10 admits doc 5, then 10+1>10 rejects doc 6; b: 7+3=10 admits
    assert got == {("a", 1), ("a", 2), ("b", 3), ("a", 5), ("b", 7)}


def test_stream_quota_batch_fallback_matches_semantics(spark):
    from easy_sql_spark.streaming.stateful import stream_quota

    df = spark.createDataFrame(
        [("a", 1, 4), ("a", 2, 4), ("a", 3, 4), ("b", 4, 12)],
        "k string, doc long, w long",
    )
    got = {(r.k, r.doc) for r in
           stream_quota(df, ["k"], cap=10, weight_col="w",
                        order_cols=["doc"]).collect()}
    assert got == {("a", 1), ("a", 2)}  # 4+4 fits, +4 exceeds; b's 12 > 10
    with pytest.raises(ValueError, match="order_cols"):
        stream_quota(df, ["k"], cap=10)


def test_stream_quota_row_cap_unweighted(spark, tmp_path):
    from easy_sql_spark.streaming.stateful import stream_quota

    src = tmp_path / "rqsrc"
    ckpt = tmp_path / "rqckpt"
    out = tmp_path / "rqout"
    _write_batch(src / "a.json",
                 [{"k": "s", "doc": i} for i in range(5)])

    def build():
        stream = spark.readStream.schema("k string, doc long").json(str(src))
        return stream_quota(stream, ["k"], cap=3, order_cols=["doc"])

    _run_checkpointed(build(), out, ckpt)
    assert sorted(r.doc for r in spark.read.parquet(str(out)).collect()) == [0, 1, 2]
