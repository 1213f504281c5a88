"""Streaming-mode integration tests: file source → step SQL → sinks,
deferred multi-sink start, watermarked windowed aggregation."""

import json
import os
import shutil

import pytest

from easy_sql_spark.runtime.processor import SqlProcessor


def fresh_db(spark, name: str) -> None:
    """DROP + recreate a test database AND its warehouse directory.

    ``DROP DATABASE CASCADE`` only removes what the in-memory catalog
    knows about — files left by an interrupted earlier attempt (e.g. a
    CTAS that wrote before registering) survive it and fail the next
    managed CREATE with LOCATION_ALREADY_EXISTS (the conftest/bench.py
    stale-dir idiom, applied per test)."""
    from urllib.parse import urlparse

    spark.sql(f"drop database if exists {name} cascade")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(wh, f"{name}.db"), ignore_errors=True)
    spark.sql(f"create database {name}")


@pytest.fixture()
def stream_dirs(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"id": i, "kind": "a" if i % 2 == 0 else "b", "amount": float(i)}
        for i in range(100)
    ]
    with open(src / "batch1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return {"src": str(src), "out": str(tmp_path / "out"), "ck": str(tmp_path / "ck")}


def test_streaming_etl_multi_sink(spark, stream_dirs):
    config = {
        "sources": [
            {
                "name": "raw_stream",
                "format": "json",
                "schema": "id long, kind string, amount double",
                "path": stream_dirs["src"],
            }
        ],
        "sinks": [
            {
                "name": "sdb.agg_out",
                "format": "memory",
                "output_mode": "complete",
                "trigger": "availableNow",
            },
            {
                "name": "sdb.raw_out",
                "format": "parquet",
                "path": stream_dirs["out"],
                "checkpoint": stream_dirs["ck"],
                "output_mode": "append",
                "trigger": "availableNow",
            },
        ],
    }
    sql = """-- backend: spark
-- config: easy_sql.etl_type=streaming

-- target=temp.enriched
select id, kind, amount * 2 as doubled from raw_stream

-- target=output.sdb.agg_out
select kind, count(*) as n, cast(sum(cast(amount as decimal(20,2))) as double) as total
from raw_stream group by kind

-- target=output.sdb.raw_out
select * from enriched

-- target=func.execute_streaming_inserts()
"""
    p = SqlProcessor(
        spark, sql, streaming_config=config, logger=lambda m: None
    )
    report = p.run()
    assert all(r.status.value in ("SUCCEEDED", "SKIPPED") for r in report.steps)
    # memory sink: complete-mode aggregate
    agg = {r.kind: (r.n, r.total) for r in spark.sql("select * from sdb_agg_out").collect()}
    assert agg == {"a": (50, 2450.0), "b": (50, 2500.0)}
    # parquet sink: transformed rows
    out = spark.read.parquet(stream_dirs["out"])
    assert out.count() == 100
    assert out.where("doubled = 198.0").count() == 1


def test_streaming_dry_run_guard(spark, stream_dirs):
    config = {
        "sources": [
            {
                "name": "raw_stream",
                "format": "json",
                "schema": "id long, kind string, amount double",
                "path": stream_dirs["src"],
            }
        ],
        "sinks": [],
    }
    sql = """-- config: easy_sql.etl_type=streaming

-- target=variables
select 1 as __dry_run__

-- target=output.sdb.never
select * from raw_stream

-- target=func.execute_streaming_inserts()
"""
    p = SqlProcessor(spark, sql, streaming_config=config, logger=lambda m: None)
    p.run()
    assert p.streaming_queries == []


def test_streaming_watermark_window(spark, tmp_path):
    """Extension beyond reference parity (SURVEY.md §2H): watermarks +
    tumbling event-time windows."""
    src = tmp_path / "wsrc"
    src.mkdir()
    with open(src / "b.json", "w") as f:
        for i in range(60):
            f.write(
                json.dumps(
                    {"ts": f"2024-01-01 00:{i:02d}:00", "v": 1.0}
                )
                + "\n"
            )
    config = {
        "sources": [
            {
                "name": "timed",
                "format": "json",
                "schema": "ts timestamp, v double",
                "path": str(src),
                "watermark": {"column": "ts", "delay": "5 minutes"},
            }
        ],
        "sinks": [
            {
                "name": "w.out",
                "format": "memory",
                "output_mode": "append",
                "trigger": "availableNow",
            }
        ],
    }
    sql = """-- config: easy_sql.etl_type=streaming

-- target=output.w.out
select window(ts, '15 minutes').start as win_start, count(*) as n
from timed group by window(ts, '15 minutes')

-- target=func.execute_streaming_inserts()
"""
    p = SqlProcessor(spark, sql, streaming_config=config, logger=lambda m: None)
    p.run()
    rows = spark.sql("select * from w_out order by win_start").collect()
    # append mode emits only watermark-closed windows: 00:00,00:15,00:30 (15
    # each); the 00:45 window stays open at watermark 00:54
    assert [(str(r.win_start), r.n) for r in rows] == [
        ("2024-01-01 00:00:00", 15),
        ("2024-01-01 00:15:00", 15),
        ("2024-01-01 00:30:00", 15),
    ]


def test_streaming_agg_update_mode(spark, tmp_path):
    """§2H streaming upsert row: continuous group-by with changelog
    semantics — update mode emits only groups changed in each micro-batch."""
    import json as _json

    src = tmp_path / "usrc"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        for i in range(10):
            f.write(_json.dumps({"k": "a" if i < 7 else "b", "v": i}) + "\n")
    config = {
        "sources": [
            {
                "name": "updates_stream",
                "format": "json",
                "schema": "k string, v long",
                "path": str(src),
            }
        ],
        "sinks": [
            {
                "name": "sdb.upd_out",
                "format": "memory",
                "output_mode": "update",
                "trigger": "availableNow",
            }
        ],
    }
    sql = """-- config: easy_sql.etl_type=streaming

-- target=output.sdb.upd_out
select k, count(*) as n, sum(v) as total from updates_stream group by k

-- target=func.execute_streaming_inserts()
"""
    p = SqlProcessor(spark, sql, streaming_config=config, logger=lambda m: None)
    p.run()
    rows = {
        r.k: (r.n, r.total)
        for r in spark.sql("select * from sdb_upd_out").collect()
    }
    assert rows == {"a": (7, 21), "b": (3, 24)}


def test_streaming_session_window(spark, tmp_path):
    """Extension: event-time SESSION windows with watermark — gaps > 5 min
    split sessions (Spark-native analogue of streaming/stateful.sessionize
    for when SQL semantics suffice)."""
    import json as _json

    from pyspark.sql import functions as F

    src = tmp_path / "sess_src"
    src.mkdir()
    with open(src / "b.json", "w") as f:
        for minute in [0, 2, 3, 20, 21]:  # two sessions: [0-3], [20-21]
            f.write(
                _json.dumps({"u": 1, "ts": f"2024-01-01 00:{minute:02d}:00"})
                + "\n"
            )
    stream = (
        spark.readStream.schema("u long, ts string")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "10 minutes")
    )
    agg = stream.groupBy(
        F.session_window("ts", "5 minutes").alias("w"), "u"
    ).agg(F.count(F.lit(1)).alias("n"))
    q = (
        agg.select("u", "n", F.col("w.start").cast("string").alias("start"))
        .writeStream.format("memory")
        .queryName("sess_win_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "query still running"
    rows = {
        r.start: r.n
        for r in spark.sql("select * from sess_win_out").collect()
    }
    # only the FIRST session is closed by the watermark (last event 00:21,
    # watermark 00:11 > session1's end 00:08); session2 stays open in state
    assert rows == {"2024-01-01 00:00:00": 3}


def test_stream_stream_interval_join_raw_api(spark, tmp_path):
    """Stream-stream inner join with watermarks and an event-time interval
    condition — Spark buffers both sides in state, bounded by the
    watermark + interval (the scale-safe configuration).  Raw DataFrame
    API variant; the YAML-surface variant is further down (this one was
    silently shadowed by that same-named test until round 7)."""
    import json as _json

    from pyspark.sql import functions as F

    imp_dir = tmp_path / "impressions"
    clk_dir = tmp_path / "clicks"
    imp_dir.mkdir()
    clk_dir.mkdir()
    with open(imp_dir / "b.json", "w") as f:
        for i, minute in [(1, 0), (2, 10), (3, 40)]:
            f.write(
                _json.dumps({"ad": i, "its": f"2024-01-01 00:{minute:02d}:00"})
                + "\n"
            )
    with open(clk_dir / "b.json", "w") as f:
        # ad1 clicked 5min after; ad2 clicked 25min after (outside window);
        # ad3 never clicked
        for i, minute in [(1, 5), (2, 35)]:
            f.write(
                _json.dumps({"ad": i, "cts": f"2024-01-01 00:{minute:02d}:00"})
                + "\n"
            )

    imps = (
        spark.readStream.schema("ad long, its string")
        .json(str(imp_dir))
        .withColumn("its", F.to_timestamp("its"))
        .withWatermark("its", "1 hour")
    )
    clicks = (
        spark.readStream.schema("ad long, cts string")
        .json(str(clk_dir))
        .withColumn("cts", F.to_timestamp("cts"))
        .withWatermark("cts", "1 hour")
    )
    joined = imps.join(
        clicks,
        (imps.ad == clicks.ad)
        & (clicks.cts >= imps.its)
        & (clicks.cts <= imps.its + F.expr("interval 15 minutes")),
        "inner",
    )
    q = (
        joined.select(imps.ad, "its", "cts")
        .writeStream.format("memory")
        .queryName("ss_join_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "query still running"
    rows = [(r.ad,) for r in spark.sql("select * from ss_join_out").collect()]
    assert rows == [(1,)]  # only ad1's click landed inside the 15-min window


def test_foreach_batch_restart_skips_processed_batches(spark, stream_dirs, tmp_path):
    """Restarting a foreach_batch query on the same checkpoint must NOT
    re-run the ETL for already-committed batches — exactly-once step-ETL
    execution across deploys, the property a production micro-batch
    pipeline stands on."""
    import time

    out_dir = tmp_path / "fbr"
    out_dir.mkdir()
    etl = f"""-- target=temp.batch_agg
select count(*) as n, ${{__batch_id__}} as bid from fbr_batch

-- target=func.write_json_local(batch_agg, {out_dir}/batch_${{__batch_id__}}.json)
"""

    def run_once():
        config = {
            "sources": [
                {
                    "name": "raw_stream_r",
                    "format": "json",
                    "schema": "id long, kind string, amount double",
                    "path": stream_dirs["src"],
                }
            ],
            "sinks": [
                {
                    "name": "sdb.fbr",
                    "format": "foreach_batch",
                    "trigger": "availableNow",
                    "checkpoint": stream_dirs["ck"] + "_fbr",
                    "options": {"etl_sql": etl, "view": "fbr_batch"},
                }
            ],
        }
        sql = """-- backend: spark
-- config: easy_sql.etl_type=streaming

-- target=output.sdb.fbr
select id, kind, amount from raw_stream_r

-- target=func.execute_streaming_inserts()
"""
        p = SqlProcessor(spark, sql, streaming_config=config, logger=lambda m: None)
        p.run()
        for q in p.streaming_queries:
            assert q.awaitTermination(240), "query still running"
            q.stop()
        p.backend.clean_temp_views()

    run_once()
    assert json.load(open(out_dir / "batch_0.json"))[0]["n"] == 100

    # new data lands after shutdown; restart on the same checkpoint
    time.sleep(1.1)
    with open(stream_dirs["src"] + "/batch2.json", "w") as f:
        for i in range(100, 130):
            f.write(json.dumps({"id": i, "kind": "c", "amount": float(i)}) + "\n")
    run_once()
    # batch 0 was NOT reprocessed (its file still reports the first run),
    # and the restarted query saw ONLY the 30 new rows
    assert json.load(open(out_dir / "batch_0.json"))[0]["n"] == 100
    assert json.load(open(out_dir / "batch_1.json"))[0]["n"] == 30


def test_foreach_batch_sink_runs_step_etl(spark, stream_dirs, tmp_path):
    """foreach_batch sink: each micro-batch runs a FULL step-language ETL
    on the driver (the statement-set analogue with step semantics)."""
    out_json = str(tmp_path / "batch_agg.json")
    etl = f"""-- target=temp.batch_agg
select count(*) as n, sum(amount) as total, ${{__batch_id__}} as bid
from fb_batch

-- target=func.write_json_local(batch_agg, {out_json})
"""
    config = {
        "sources": [
            {
                "name": "raw_stream2",
                "format": "json",
                "schema": "id long, kind string, amount double",
                "path": stream_dirs["src"],
            }
        ],
        "sinks": [
            {
                "name": "sdb.fb",
                "format": "foreach_batch",
                "trigger": "availableNow",
                "checkpoint": stream_dirs["ck"] + "_fb",
                "options": {"etl_sql": etl, "view": "fb_batch"},
            }
        ],
    }
    sql = """-- backend: spark
-- config: easy_sql.etl_type=streaming

-- target=temp.enriched
select id, kind, amount from raw_stream2 where amount >= 0

-- target=output.sdb.fb
select * from enriched

-- target=func.execute_streaming_inserts()
"""
    p = SqlProcessor(spark, sql, streaming_config=config, logger=lambda m: None)
    p.run()
    for q in p.streaming_queries:
        assert q.awaitTermination(240), "query still running"
    with open(out_json) as f:
        rows = json.load(f)
    assert rows[0]["n"] == 100 and rows[0]["total"] == sum(float(i) for i in range(100))
    assert rows[0]["bid"] == 0
    p.backend.clean_temp_views()


def test_foreach_batch_streaming_upsert_with_restart(spark, stream_dirs):
    """The streaming twin of __save_mode__=upsert: a foreach_batch ETL
    merges each micro-batch into a warehouse table on its keys (the
    reference's CDC/Hudi upsert shape), and a checkpoint restart applies
    only the new batch — no replays, no duplicate keys."""
    import time

    fresh_db(spark, "sdbup")
    etl = """-- target=variables
select true as __create_output_table__, 'upsert' as __save_mode__, 'id' as __merge_keys__

-- target=output.sdbup.t
select id, kind, amount from fbu_batch
"""

    def run_once():
        config = {
            "sources": [
                {
                    "name": "raw_stream_u",
                    "format": "json",
                    "schema": "id long, kind string, amount double",
                    "path": stream_dirs["src"],
                }
            ],
            "sinks": [
                {
                    "name": "sdb.fbu",
                    "format": "foreach_batch",
                    "trigger": "availableNow",
                    "checkpoint": stream_dirs["ck"] + "_fbu",
                    "options": {"etl_sql": etl, "view": "fbu_batch"},
                }
            ],
        }
        sql = """-- backend: spark
-- config: easy_sql.etl_type=streaming

-- target=output.sdb.fbu
select id, kind, amount from raw_stream_u

-- target=func.execute_streaming_inserts()
"""
        p = SqlProcessor(spark, sql, streaming_config=config, logger=lambda m: None)
        p.run()
        for q in p.streaming_queries:
            assert q.awaitTermination(240), "query still running"
            q.stop()
        p.backend.clean_temp_views()

    run_once()
    t = spark.table("sdbup.t")
    assert t.count() == 100

    # late CDC batch: updates ids 50..99, inserts 100..149
    time.sleep(1.1)
    with open(stream_dirs["src"] + "/batch2.json", "w") as f:
        for i in range(50, 150):
            f.write(json.dumps({"id": i, "kind": "u", "amount": 0.0}) + "\n")
    run_once()
    # the batch ETL wrote via foreachBatch's cloned session; this session
    # cached the relation at the first read — standard Spark cross-session
    # semantics: readers refresh after another session overwrites
    spark.catalog.refreshTable("sdbup.t")
    rows = {r.id: r.kind for r in spark.table("sdbup.t").collect()}
    assert len(rows) == 150  # one row per key, never a duplicate
    assert all(k == "u" for i, k in rows.items() if i >= 50)
    assert all(k in ("a", "b") for i, k in rows.items() if i < 50)
    spark.sql("drop database if exists sdbup cascade")


def test_foreach_batch_streaming_scd2(spark, stream_dirs):
    """Streaming SCD2: each micro-batch applies as a history-keeping merge
    (close changed versions, insert new ones) — the CDC-apply-with-history
    shape, riding the same foreach_batch + checkpoint machinery as the
    streaming upsert."""
    import time

    fresh_db(spark, "sdbs2")
    etl = """-- target=variables
select true as __create_output_table__, 'scd2' as __save_mode__,
       'id' as __merge_keys__, 'ts' as __scd2_ts__

-- target=output.sdbs2.dim
select id, kind, cast(amount as bigint) as ts from fbs2_batch
"""

    def run_once():
        config = {
            "sources": [
                {
                    "name": "raw_stream_s2",
                    "format": "json",
                    "schema": "id long, kind string, amount double",
                    "path": stream_dirs["src"],
                }
            ],
            "sinks": [
                {
                    "name": "sdb.fbs2",
                    "format": "foreach_batch",
                    "trigger": "availableNow",
                    "checkpoint": stream_dirs["ck"] + "_fbs2",
                    "options": {"etl_sql": etl, "view": "fbs2_batch"},
                }
            ],
        }
        sql = """-- backend: spark
-- config: easy_sql.etl_type=streaming

-- target=output.sdb.fbs2
select id, kind, amount from raw_stream_s2

-- target=func.execute_streaming_inserts()
"""
        p = SqlProcessor(spark, sql, streaming_config=config, logger=lambda m: None)
        p.run()
        for q in p.streaming_queries:
            assert q.awaitTermination(240), "query still running"
            q.stop()
        p.backend.clean_temp_views()

    run_once()
    spark.catalog.refreshTable("sdbs2.dim")
    assert spark.table("sdbs2.dim").count() == 100  # all current, no history

    # CDC batch: ids 0..9 flip kind at ts=1000 -> close + insert
    time.sleep(1.1)
    with open(stream_dirs["src"] + "/batch2.json", "w") as f:
        for i in range(10):
            f.write(json.dumps({"id": i, "kind": "FLIP", "amount": 1000.0}) + "\n")
    run_once()
    spark.catalog.refreshTable("sdbs2.dim")
    t = spark.table("sdbs2.dim")
    assert t.count() == 110  # 100 original + 10 new versions
    closed = {
        r.id for r in t.where("__is_current = false").collect()
    }
    assert closed == set(range(10))
    cur_flip = t.where("__is_current and kind = 'FLIP'")
    assert cur_flip.count() == 10


def test_stream_stream_interval_join(spark, tmp_path):
    """Watermarked stream-stream interval join through the YAML surface —
    impressions joined to clicks within [0, 10 minutes] of the impression.
    Both sides carry watermarks so Spark bounds the join state; the time
    condition makes the state eviction provable (the Flink interval-join
    analogue, native in Structured Streaming)."""
    import json as _json

    imp_dir = tmp_path / "imp"
    clk_dir = tmp_path / "clk"
    imp_dir.mkdir()
    clk_dir.mkdir()
    base = 1_700_000_000
    with open(imp_dir / "i.json", "w") as f:
        for i in range(20):
            f.write(
                _json.dumps({"ad_id": i, "imp_ts": base + i * 60}) + "\n"
            )
    with open(clk_dir / "c.json", "w") as f:
        # clicks for even ads 5 minutes after the impression (in-window),
        # clicks for ads 1 and 3 a full hour later (out-of-window)
        for i in range(0, 20, 2):
            f.write(
                _json.dumps({"ad_id": i, "clk_ts": base + i * 60 + 300}) + "\n"
            )
        for i in (1, 3):
            f.write(
                _json.dumps({"ad_id": i, "clk_ts": base + i * 60 + 3600}) + "\n"
            )

    config = {
        "sources": [
            {
                "name": "impressions",
                "format": "json",
                "schema": "ad_id long, imp_ts long",
                "path": str(imp_dir),
                "watermark": {"column": "imp_time", "delay": "30 seconds"},
            },
            {
                "name": "clicks",
                "format": "json",
                "schema": "ad_id long, clk_ts long",
                "path": str(clk_dir),
                "watermark": {"column": "clk_time", "delay": "30 seconds"},
            },
        ],
        "sinks": [
            {
                "name": "sdb.joined",
                "format": "memory",
                "output_mode": "append",
                "trigger": "availableNow",
                "checkpoint": str(tmp_path / "ck_ss"),
            }
        ],
    }
    # event_time derives the watermark column from epoch seconds in the
    # YAML itself — the full declared path, no hand-built frames
    config["sources"][0]["event_time"] = {"name": "imp_time", "from": "imp_ts"}
    config["sources"][1]["event_time"] = {"name": "clk_time", "from": "clk_ts"}
    from pyspark.sql import functions as F

    from easy_sql_spark.streaming.tables import StreamingTables

    tables = StreamingTables(spark, config)
    tables.register_sources()
    imp = spark.table("impressions")
    clk = spark.table("clicks")
    joined = imp.join(
        clk,
        (imp.ad_id == clk.ad_id)
        & (clk.clk_time >= imp.imp_time)
        & (clk.clk_time <= imp.imp_time + F.expr("interval 10 minutes")),
    ).select(imp.ad_id, "imp_time", "clk_time")
    q = tables.start_insert(joined, "sdb.joined")
    assert q.awaitTermination(240), "query still running"
    rows = spark.sql("select * from sdb_joined").collect()
    matched = sorted(r.ad_id for r in rows)
    assert matched == list(range(0, 20, 2))  # in-window only


def test_foreach_batch_medallion_rollup(spark, tmp_path):
    """Medallion composition: each micro-batch appends raw rows to a
    bronze table, then func.refresh_rollup maintains the aggregate
    incrementally — streaming incremental view maintenance built from
    the existing pieces (append save + scoped recompute + keyed upsert)."""
    import json as _json

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        for i in range(40):
            f.write(
                _json.dumps(
                    {"region": "ew"[i % 2], "amount": float(i), "dt": f"d{i % 3}"}
                )
                + "\n"
            )

    fresh_db(spark, "med")
    etl = """-- target=variables
select true as __create_output_table__, 'append' as __save_mode__

-- target=output.med.bronze
select region, amount, dt from med_batch

-- target=func.refresh_rollup(med.bronze, med.rollup, dt, region, cast(sum(amount) as double) as total|count(*) as n, true)
"""

    def run_once():
        config = {
            "sources": [
                {
                    "name": "raw_med",
                    "format": "json",
                    "schema": "region string, amount double, dt string",
                    "path": str(src),
                }
            ],
            "sinks": [
                {
                    "name": "sdb.med",
                    "format": "foreach_batch",
                    "trigger": "availableNow",
                    "checkpoint": str(tmp_path / "ck_med"),
                    "options": {"etl_sql": etl, "view": "med_batch"},
                }
            ],
        }
        sql = """-- backend: spark
-- config: easy_sql.etl_type=streaming

-- target=output.sdb.med
select region, amount, dt from raw_med

-- target=func.execute_streaming_inserts()
"""
        p = SqlProcessor(spark, sql, streaming_config=config, logger=lambda m: None)
        p.run()
        for q in p.streaming_queries:
            assert q.awaitTermination(240), "query still running"
            q.stop()
        p.backend.clean_temp_views()

    run_once()
    # second batch arrives; restart applies ONLY the new file
    import time

    time.sleep(1.1)
    with open(src / "b2.json", "w") as f:
        for i in range(10):
            f.write(
                _json.dumps({"region": "x", "amount": 1.0, "dt": "d9"}) + "\n"
            )
    run_once()

    spark.catalog.refreshTable("med.bronze")
    spark.catalog.refreshTable("med.rollup")
    got = {
        (r.dt, r.region): (r.total, r.n)
        for r in spark.table("med.rollup").collect()
    }
    want = {
        (r.dt, r.region): (r.total, r.n)
        for r in spark.sql(
            "select dt, region, cast(sum(amount) as double) as total, "
            "count(*) as n from med.bronze group by dt, region"
        ).collect()
    }
    assert got == want and ("d9", "x") in got
    assert spark.table("med.bronze").count() == 50  # no replays


def test_source_dedup_within_watermark(spark, tmp_path):
    """Declarative streaming dedup on the source config: duplicate keys
    arriving in LATER micro-batches (within the watermark delay) are
    dropped by dropDuplicatesWithinWatermark, with state bounded by the
    watermark — the only dedup shape that survives an unbounded stream."""
    src = tmp_path / "ddsrc"
    src.mkdir()
    with open(src / "a.json", "w") as f:
        for i in range(10):
            f.write(json.dumps({"id": i, "ts": f"2024-01-01 00:0{i % 10}:00"}) + "\n")
    with open(src / "b.json", "w") as f:
        # 5 replays of existing ids + 5 new ids, all inside the delay
        for i in range(5):
            f.write(json.dumps({"id": i, "ts": f"2024-01-01 00:0{i}:30"}) + "\n")
        for i in range(10, 15):
            f.write(json.dumps({"id": i, "ts": "2024-01-01 00:09:00"}) + "\n")

    config = {
        "sources": [
            {
                "name": "dd_src",
                "format": "json",
                "schema": "id int, ts timestamp",
                "path": str(src),
                "options": {"maxFilesPerTrigger": "1"},
                "watermark": {"column": "ts", "delay": "30 minutes"},
                "dedup": {"keys": ["id"]},
            }
        ],
        "sinks": [
            {
                "name": "dd.out",
                "format": "memory",
                "output_mode": "append",
                "trigger": "availableNow",
            }
        ],
    }
    sql = """-- config: easy_sql.etl_type=streaming

-- target=output.dd.out
select id from dd_src

-- target=func.execute_streaming_inserts()
"""
    p = SqlProcessor(spark, sql, streaming_config=config, logger=lambda m: None)
    p.run()
    ids = sorted(r.id for r in spark.sql("select * from dd_out").collect())
    assert ids == list(range(15))  # each id exactly once, replays dropped


def test_source_dedup_requires_watermark(spark):
    from easy_sql_spark.streaming.tables import StreamingTables

    config = {
        "sources": [
            {
                "name": "bad",
                "format": "rate",
                "dedup": {"keys": ["value"]},
            }
        ],
        "sinks": [],
    }
    with pytest.raises(ValueError, match="requires a watermark"):
        StreamingTables(spark, config).register_sources()


def test_snapshot_sink_exactly_once_via_yaml(spark, tmp_path):
    """`format: snapshot` sink: micro-batches land as manifest commits
    with batch ids; a lost checkpoint replays every batch and commits
    nothing twice (including batch 0, recorded on the CREATE commit)."""
    import shutil

    from easy_sql_spark.runtime.snapshots import SnapshotTable
    from easy_sql_spark.streaming.tables import StreamingTables

    src = tmp_path / "snsrc"
    src.mkdir()
    root = str(tmp_path / "snap_tbl")
    with open(src / "a.json", "w") as f:
        for i in range(4):
            f.write(json.dumps({"id": i, "v": "x"}) + "\n")

    config = {
        "sources": [
            {
                "name": "sn_src",
                "format": "json",
                "schema": "id int, v string",
                "path": str(src),
            }
        ],
        "sinks": [
            {
                "name": "sn.out",
                "format": "snapshot",
                "path": root,
                "checkpoint": str(tmp_path / "sn_ck"),
                "trigger": "availableNow",
            }
        ],
    }

    def run_once():
        tables = StreamingTables(spark, config)
        tables.register_sources()
        q = tables.start_insert(spark.table("sn_src"), "sn.out")
        assert q.awaitTermination(240), "query still running"
        q.stop()

    run_once()
    t = SnapshotTable(spark, root)
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 3]

    import time

    time.sleep(1.1)
    with open(src / "b.json", "w") as f:
        f.write(json.dumps({"id": 9, "v": "y"}) + "\n")
    run_once()  # same checkpoint: only the new file commits
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 3, 9]
    v = t.latest_version()

    shutil.rmtree(tmp_path / "sn_ck")  # lose the checkpoint: full replay
    run_once()
    assert t.latest_version() == v  # all replayed batch ids skipped
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 3, 9]


def test_streaming_fuzzy_dedup_via_index_in_foreach_batch(spark, tmp_path):
    """Streaming NEAR-dup dedup end-to-end: a foreach_batch step ETL
    routes each micro-batch through the persistent MinHash dedup index
    (func.dedup_index_ingest keyed by ${__batch_id__}), admitting only
    docs not fuzzy-matching anything already indexed — the streaming
    face of the incremental batch dedup, exactly-once under replay
    because the index commits carry the batch id."""
    src = tmp_path / "fsrc"
    src.mkdir()
    base = "the quick brown fox jumps over the lazy dog and then naps in the warm afternoon sun near the barn"
    docs = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + " indeed"},  # near-dup of 1
        {"doc_id": 3, "text": "completely different content about spark "
                              "structured streaming state stores and arrow batches"},
    ]
    with open(src / "b1.json", "w") as f:
        for r in docs:
            f.write(json.dumps(r) + "\n")

    didx = str(tmp_path / "didx")
    out = tmp_path / "fout"
    out.mkdir()
    etl = f"""-- target=func.dedup_index_ingest({didx}, fd_batch, admitted, ${{__batch_id__}})

-- target=temp.adm_count
select count(*) as n, ${{__batch_id__}} as bid from admitted

-- target=func.write_json_local(adm_count, {out}/adm_${{__batch_id__}}.json)
"""
    config = {
        "sources": [
            {
                "name": "doc_stream",
                "format": "json",
                "schema": "doc_id long, text string",
                "path": str(src),
            }
        ],
        "sinks": [
            {
                "name": "sdb.fd",
                "format": "foreach_batch",
                "trigger": "availableNow",
                "checkpoint": str(tmp_path / "fck"),
                "options": {"etl_sql": etl, "view": "fd_batch"},
            }
        ],
    }
    sql = """-- backend: spark
-- config: easy_sql.etl_type=streaming

-- target=output.sdb.fd
select doc_id, text from doc_stream

-- target=func.execute_streaming_inserts()
"""
    p = SqlProcessor(spark, sql, streaming_config=config, logger=lambda m: None)
    p.run()
    for q in p.streaming_queries:
        assert q.awaitTermination(240), "query still running"
        q.stop()
    p.backend.clean_temp_views()

    # batch 0: doc 2 is a near-dup of doc 1 -> 2 admitted of 3
    assert json.load(open(out / "adm_0.json"))[0]["n"] == 2

    # a second batch re-sends doc 3's text (cross-batch fuzzy dup) plus
    # one genuinely new doc -> only the new one admitted
    import time

    time.sleep(1.1)
    with open(src / "b2.json", "w") as f:
        f.write(json.dumps({"doc_id": 10, "text": docs[2]["text"]}) + "\n")
        f.write(json.dumps({"doc_id": 11, "text": "fresh unrelated prose on "
                            "lakehouse manifests and zero copy clones for branches"}) + "\n")
    p2 = SqlProcessor(spark, sql, streaming_config=config, logger=lambda m: None)
    p2.run()
    for q in p2.streaming_queries:
        assert q.awaitTermination(240), "query still running"
        q.stop()
    p2.backend.clean_temp_views()
    assert json.load(open(out / "adm_1.json"))[0]["n"] == 1
