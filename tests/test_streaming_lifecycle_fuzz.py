"""Crash/restart MODEL-FUZZ of the three streaming change-feed sources
(r11 verdict ask #1): randomized lifecycles for ``snapshot_cdf``,
``hudi_cdc`` and ``delta_cdf`` — random source-table commit sequences,
random backlog caps (changing across restarts), random kill points
(a checkpointed restart between every drain; plus three simulated
crash shapes: *after the sink commit but before the source checkpoint
commit* — newest ``commits/<batchId>`` deleted so the engine replays
the batch against a sink that already has it; *after the source
offsets commit but before the sink finalizes* (r12 ask #6) — newest
``commits/<id>`` AND sink ``_spark_metadata/<id>`` deleted, orphan
part files left behind, so the replay must re-commit exactly one copy;
and *mid-write* — a truncated never-committed part file planted in the
sink dir, which the metadata-log reader must keep ignoring),
interleaved maintenance (compaction / vacuum for the snapshot source;
inflight instants for Hudi) — asserted EXACTLY-ONCE against a
pure-Python replay model.

The model never trusts the source's batching behavior: executed batch
windows are recovered from the checkpoint's ``offsets/`` files (the
engine's ground truth), and the expected delivery of each window is
recomputed independently (manifest dir-diffs + pyarrow file reads for
snapshot_cdf; the generation log for hudi_cdc / delta_cdf).  A replayed
batch adds no offsets file and the parquet sink dedups by batchId, so
exactly-once must hold through every simulated crash.

This is the same discipline tests/test_reader_model_fuzz.py applies to
the batch readers; the r11 restart deadlock (latestOffset called before
initialOffset on restart) was found by hand on exactly this surface.

Seeds are env-scaled like the other campaigns: default small in-suite,
``EASY_SQL_STREAM_FUZZ_SEEDS=200`` for the per-round campaign.
"""

import json
import os
import random
import shutil

import pytest

import _depth

_SEEDS = int(
    os.environ.get("EASY_SQL_STREAM_FUZZ_SEEDS", "2" if _depth.FULL else "1")
)


# ------------------------------------------------------------ shared


def _ckpt_windows(ckpt, start_offset):
    """Recover the executed batch windows [(start, end), ...] from the
    checkpoint's offsets files — ground truth for what the engine
    actually planned, independent of availableNow batching quirks."""
    d = os.path.join(str(ckpt), "offsets")
    if not os.path.isdir(d):
        return []
    ids = sorted(int(n) for n in os.listdir(d) if n.isdigit())
    offs = []
    for i in ids:
        with open(os.path.join(d, str(i))) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        o = json.loads(lines[-1])
        if isinstance(o, str):  # python-source offsets are doubly json-encoded
            o = json.loads(o)
        offs.append(o)
    windows, prev = [], start_offset
    for o in offs:
        windows.append((prev, o))
        prev = o
    return windows


def _crash_before_source_commit(ckpt):
    """Simulate a crash between the sink's batch commit and the source
    checkpoint commit: drop the newest ``commits/<id>`` file.  On the
    next start the engine replays that batch with the SAME offsets
    (offsets/<id> survives); the parquet sink's _spark_metadata already
    has the batch, so exactly-once requires the source to reproduce the
    window deterministically and the sink to dedup it."""
    d = os.path.join(str(ckpt), "commits")
    if not os.path.isdir(d):
        return False
    ids = sorted((int(n) for n in os.listdir(d) if n.isdigit()),
                 reverse=True)
    if not ids:
        return False
    os.remove(os.path.join(d, str(ids[0])))
    # the local ChecksumFs keeps a .N.crc sidecar; a dangling one makes
    # the replay's rename-into-place fail (test artifact, not a crash
    # shape any real HDFS/object store produces)
    crc = os.path.join(d, f".{ids[0]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    return True


def _crash_before_sink_finalize(out, ckpt):
    """Simulate a crash AFTER the source offsets commit but BEFORE the
    sink finalizes the batch (r12 verdict ask #6): ``offsets/<id>`` is
    on disk, the batch's part files may be too, but neither the sink's
    ``_spark_metadata/<id>`` entry nor the engine's ``commits/<id>``
    exists.  Manufactured from a completed batch by deleting BOTH
    trailing records; the already-written part files are left behind
    exactly as a real crash leaves them — orphans invisible to the
    metadata-log reader.  On restart the engine replays the batch from
    the surviving offsets: the source must reproduce the window and the
    sink must commit exactly one copy (the replay's files), never
    surfacing the orphans."""
    d = os.path.join(str(ckpt), "commits")
    if not os.path.isdir(d):
        return False
    ids = sorted((int(n) for n in os.listdir(d) if n.isdigit()),
                 reverse=True)
    if not ids:
        return False
    i = ids[0]
    sink_meta = os.path.join(str(out), "_spark_metadata", str(i))
    if not os.path.isfile(sink_meta):
        # the newest sink entry is a .compact (or missing): deleting it
        # would drop prior batches' history, which no crash does — skip
        return False
    for p in (
        os.path.join(d, str(i)),
        os.path.join(d, f".{i}.crc"),
        sink_meta,
        os.path.join(str(out), "_spark_metadata", f".{i}.crc"),
    ):
        if os.path.exists(p):
            os.remove(p)
    return True


def _plant_partial_sink_file(out, rng):
    """Simulate a crash mid-write (r12 verdict ask #6): a truncated,
    never-committed part file left in the sink dir.  The sink's
    metadata-log reader must keep ignoring it across restarts — if any
    path ever falls back to directory listing, the corrupt footer
    fails the final read loudly."""
    d = str(out)
    if not os.path.isdir(d):
        return False
    name = f"part-00000-{rng.randint(0, 10**9):09d}-crash.snappy.parquet"
    with open(os.path.join(d, name), "wb") as f:
        f.write(b"PAR1\x13\x37truncated-by-crash")
    return True


def _run_stream(spark, reader, out, ckpt):
    q = (
        reader.load()
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "stream still running"
    q.stop()


def _multiset(rows):
    d = {}
    for r in rows:
        d[r] = d.get(r, 0) + 1
    return d


# ------------------------------------------------- snapshot_cdf fuzzer


def _snap_dir_rows(root, rel_dir):
    """Independent read of one live dir's rows (pyarrow, no Spark):
    data columns from the files, partition columns from the hive path —
    the model's own implementation of the source's read contract."""
    import pyarrow.parquet as pq

    path = os.path.join(root, "data", rel_dir)
    segs = dict(
        s.split("=", 1) for s in rel_dir.split("/")[1:] if "=" in s
    )
    rows = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(path, f))
        for rec in t.to_pylist():
            p = segs.get("p")
            if p == "__HIVE_DEFAULT_PARTITION__":
                p = None
            rows.append((rec["id"], rec["v"], p))
    return rows


@pytest.mark.parametrize("seed", range(_SEEDS))
def test_snapshot_cdf_lifecycle_fuzz(spark, tmp_path, seed):
    from easy_sql_spark.runtime.snapshots import SnapshotTable
    from easy_sql_spark.streaming.cdf_source import (
        SnapshotChangeFeedDataSource,
    )

    spark.dataSource.register(SnapshotChangeFeedDataSource)
    rng = random.Random(0xCDF000 + seed)
    root = str(tmp_path / "snap")
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    t = SnapshotTable(spark, root)

    def df(rows):
        return spark.createDataFrame(rows, "id int, v string, p string")

    next_id = [0]

    def mk_rows(n):
        rows = []
        for _ in range(n):
            next_id[0] += 1
            rows.append(
                (next_id[0], f"v{next_id[0]}",
                 rng.choice(["p0", "p1", "p2"]))
            )
        return rows

    t.create(df(mk_rows(rng.randint(1, 3))), ["p"])

    expected = {}  # multiset of (id, v, p, change, version)
    seen_windows = set()

    def absorb_new_windows():
        """Compute expected rows for windows not yet absorbed — done
        right after each drain, while every referenced manifest / data
        dir still physically exists (vacuum runs later)."""
        for a, b in _ckpt_windows(ckpt, {"version": 0}):
            va, vb = int(a["version"]), int(b["version"])
            if (va, vb) in seen_windows or vb <= va:
                seen_windows.add((va, vb))
                continue
            seen_windows.add((va, vb))
            live_a = set(t.manifest(va)["live"]) if va else set()
            live_b = set(t.manifest(vb)["live"])
            for d in live_b - live_a:
                for row in _snap_dir_rows(root, d):
                    key = row + ("insert", vb)
                    expected[key] = expected.get(key, 0) + 1
            for d in live_a - live_b:
                for row in _snap_dir_rows(root, d):
                    key = row + ("delete", vb)
                    expected[key] = expected.get(key, 0) + 1

    def drain(cap):
        reader = (
            spark.readStream.format("snapshot_cdf")
            .option("root", root)
            .option("starting_version", "0")
            .option("allow_rewrites", "true")
        )
        if cap is not None:
            reader = reader.option("max_versions_per_batch", str(cap))
        _run_stream(spark, reader, out, ckpt)
        absorb_new_windows()

    for _epoch in range(rng.randint(3, 4)):
        for _ in range(rng.randint(0, 2)):
            action = rng.random()
            if action < 0.55:
                t.append(df(mk_rows(rng.randint(1, 3))))
            elif action < 0.8:
                t.overwrite_partitions(df(mk_rows(rng.randint(1, 2))))
            else:
                t.compact(target_mb=1)
        drain(rng.choice([None, 1, 2, 3]))
        if rng.random() < 0.35 and _crash_before_source_commit(ckpt):
            drain(rng.choice([None, 1, 2]))  # replayed batch, deduped
        if rng.random() < 0.25 and _crash_before_sink_finalize(out, ckpt):
            drain(rng.choice([None, 1, 2]))  # replay re-commits the batch
        if rng.random() < 0.2:
            _plant_partial_sink_file(out, rng)
        if rng.random() < 0.25:
            # vacuum only history strictly below the REPLAY HORIZON —
            # the START of the newest planned window, not its end: a
            # crash between the sink commit and the source checkpoint
            # commit (either simulated shape) rewinds the committed
            # position to that start, and the replay then needs the
            # start version's manifest.  r13 campaign seed 34 caught
            # the looser end-of-window rule: vacuum dropped the start
            # manifest, and the engine refused the replay LOUDLY
            # (correct behavior — the operational contract is that
            # vacuum retention must exceed the checkpoint replay
            # horizon, which is one uncommitted batch beyond the
            # committed position).
            wins = _ckpt_windows(ckpt, {"version": 0})
            pos = int(wins[-1][0]["version"]) if wins else 0
            retain = max(1, t.latest_version() - pos + 1)
            t.vacuum(retain_versions=retain, min_age_seconds=0)

    # final catch-up: uncapped drains until no new window appears
    for _ in range(12):
        before = len(seen_windows)
        drain(None)
        if len(seen_windows) == before:
            break

    got = _multiset(
        (r.id, r.v, r.p, r._change_type, r._commit_version)
        for r in spark.read.parquet(str(out)).collect()
    ) if os.path.isdir(str(out)) else {}
    assert got == expected, (
        f"seed={seed}: delivered != model "
        f"(extra={ {k: v for k, v in got.items() if v > expected.get(k, 0)} }, "
        f"missing={ {k: v for k, v in expected.items() if v > got.get(k, 0)} })"
    )


# ---------------------------------------------------- hudi_cdc fuzzer


@pytest.mark.parametrize("seed", range(_SEEDS))
def test_hudi_cdc_lifecycle_fuzz(spark, tmp_path, seed):
    from easy_sql_spark.sources.hudi_log import write_cdc_data_block
    from easy_sql_spark.streaming.hudi_cdc_source import HudiCdcDataSource

    spark.dataSource.register(HudiCdcDataSource)
    rng = random.Random(0x44D1 + seed)
    root = str(tmp_path / "hudi")
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    os.makedirs(root + "/.hoodie")
    with open(root + "/.hoodie/hoodie.properties", "w") as fh:
        fh.write(
            "hoodie.table.name=fz\nhoodie.table.type=MERGE_ON_READ\n"
        )
    img_schema = {
        "type": "record",
        "name": "img",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "v", "type": ["null", "string"]},
        ],
    }

    def block(instant, op, pairs):
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
            img_schema,
        )

    def complete(instant):
        with open(f"{root}/.hoodie/{instant}.deltacommit", "w") as fh:
            fh.write("{}")

    with open(f"{root}/.hoodie/000.commit", "w") as fh:
        fh.write("{}")

    next_i = [0]
    file_n = [0]
    gen = {}  # instant -> [(op, key), ...]
    pending = None  # at most one unresolved inflight instant at a time

    def new_instant():
        next_i[0] += 1
        return f"{next_i[0]:03d}"

    def write_instant(instant, complete_now):
        ops = []
        for _ in range(rng.randint(1, 3)):
            op = rng.choice(["i", "i", "u", "d"])
            k = rng.randint(1, 20)
            ops.append((op, (k, None if op == "d" else f"v{instant}")))
        file_n[0] += 1
        with open(
            f"{root}/.f1_001.log.{file_n[0]}_0-1-0-cdc", "wb"
        ) as fh:
            payload = b""
            for op, pair in ops:
                payload += block(instant, op, [pair])
            fh.write(payload)
        if complete_now:
            complete(instant)
            gen[instant] = [(op, str(pair[0])) for op, pair in ops]
        return [(op, str(pair[0])) for op, pair in ops]

    def drain(cap):
        reader = (
            spark.readStream.format("hudi_cdc")
            .option("path", root)
            .option("key_field", "k")
            .option("starting_instant", "000")
        )
        if cap is not None:
            reader = reader.option("max_instants_per_batch", str(cap))
        _run_stream(spark, reader, out, ckpt)

    for _epoch in range(rng.randint(3, 4)):
        # resolve a pending inflight BEFORE any newer instant completes,
        # so a late completion can never fall below the stream position
        if pending is not None and rng.random() < 0.7:
            instant, ops = pending
            complete(instant)
            gen[instant] = ops
            pending = None
        for _ in range(rng.randint(0, 2)):
            instant = new_instant()
            if pending is None and rng.random() < 0.25:
                pending = (instant, write_instant(instant, False))
            else:
                if pending is not None:
                    # an inflight blocks later completions in this fuzz
                    # (late out-of-order completion below the consumed
                    # position is a documented non-delivery, not fuzzed)
                    write_instant(instant, False)
                else:
                    write_instant(instant, True)
        drain(rng.choice([None, 1, 2]))
        if rng.random() < 0.35 and _crash_before_source_commit(ckpt):
            drain(rng.choice([None, 1]))
        if rng.random() < 0.25 and _crash_before_sink_finalize(out, ckpt):
            drain(rng.choice([None, 1]))
        if rng.random() < 0.2:
            _plant_partial_sink_file(out, rng)

    for _ in range(12):
        n_off = len(_ckpt_windows(ckpt, {"instant": "000"}))
        drain(None)
        if len(_ckpt_windows(ckpt, {"instant": "000"})) == n_off:
            break

    # model: every completed instant within the drained range delivers
    # its change rows exactly once; inflight-only instants never appear
    windows = _ckpt_windows(ckpt, {"instant": "000"})
    hi = max((w[1]["instant"] for w in windows), default="000")
    expected = _multiset(
        (instant, op, key)
        for instant, ops in gen.items()
        if instant <= hi
        for op, key in ops
    )
    got = _multiset(
        (r.commit_time, r.op, r.record_key)
        for r in spark.read.parquet(str(out)).collect()
    ) if os.path.isdir(str(out)) else {}
    assert got == expected, f"seed={seed}: {got} != {expected}"
    shutil.rmtree(str(tmp_path), ignore_errors=True)


# ---------------------------------------------------- delta_cdf fuzzer


@pytest.mark.parametrize("seed", range(_SEEDS))
def test_delta_cdf_lifecycle_fuzz(spark, tmp_path, seed):
    from easy_sql_spark.streaming.delta_cdf_source import (
        DeltaChangeFeedDataSource,
    )

    spark.dataSource.register(DeltaChangeFeedDataSource)
    rng = random.Random(0xDE17A + seed)
    root = str(tmp_path / "delta")
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    os.makedirs(root)

    schema_str = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "val", "type": "string", "nullable": True,
             "metadata": {}},
            {"name": "p", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    })

    def write_file(rel, rows, with_change_type=False):
        sch = "id long, val string" + (
            ", _change_type string" if with_change_type else ""
        )
        df = spark.createDataFrame(rows, sch)
        tmp = os.path.join(root, "_tmp")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            n for n in os.listdir(tmp) if n.endswith(".parquet")
        )
        dest = os.path.join(root, rel)
        os.makedirs(os.path.dirname(dest) or root, exist_ok=True)
        os.replace(os.path.join(tmp, part), dest)
        shutil.rmtree(tmp)

    def commit(version, actions, ts):
        log = os.path.join(root, "_delta_log")
        os.makedirs(log, exist_ok=True)
        acts = [{"commitInfo": {"operation": "FUZZ", "timestamp": ts}}]
        acts += actions
        with open(os.path.join(log, f"{version:020d}.json"), "w") as f:
            for a in acts:
                f.write(json.dumps(a) + "\n")

    commit(0, [{
        "metaData": {
            "id": "fz", "schemaString": schema_str,
            "partitionColumns": ["p"],
            "format": {"provider": "parquet"},
        }
    }], 1000)

    next_id = [0]
    next_f = [0]
    live = {}  # rel_path -> (p, [(id, val), ...])
    gen = {}  # version -> [(id, val, p, change_type, version), ...]
    v = 0

    def mk_add(version):
        next_f[0] += 1
        p = rng.choice(["a", "b"])
        rows = []
        for _ in range(rng.randint(1, 3)):
            next_id[0] += 1
            rows.append((next_id[0], f"x{next_id[0]}"))
        rel = f"p={p}/f{next_f[0]}.parquet"
        write_file(rel, rows)
        live[rel] = (p, rows)
        gen.setdefault(version, []).extend(
            (i, val, p, "insert", version) for i, val in rows
        )
        return {"add": {"path": rel, "partitionValues": {"p": p},
                        "size": 1, "modificationTime": 1,
                        "dataChange": True}}

    def mk_remove(version):
        rel = rng.choice(sorted(live))
        p, rows = live.pop(rel)
        gen.setdefault(version, []).extend(
            (i, val, p, "delete", version) for i, val in rows
        )
        act = {"remove": {"path": rel, "dataChange": True}}
        if rng.random() < 0.5:
            # half the removes carry partitionValues; the other half
            # exercise the hive-path recovery (protocol-legal bare form)
            act["remove"]["partitionValues"] = {"p": p}
        return act

    def mk_cdc(version):
        """An UPDATE commit with authoritative cdc actions: the add and
        remove in the same commit must be ignored by the stream."""
        rel = rng.choice(sorted(live))
        p, rows = live.pop(rel)
        i, old = rows[0]
        new = f"u{version}"
        next_f[0] += 1
        cdc_rel = f"_change_data/c{next_f[0]}.parquet"
        write_file(
            cdc_rel,
            [(i, old, "update_preimage"), (i, new, "update_postimage")]
            + [(j, vv, "update_postimage") for j, vv in rows[1:]],
            with_change_type=True,
        )
        next_f[0] += 1
        new_rel = f"p={p}/f{next_f[0]}.parquet"
        new_rows = [(i, new)] + rows[1:]
        write_file(new_rel, new_rows)
        live[new_rel] = (p, new_rows)
        gen.setdefault(version, []).extend(
            [(i, old, p, "update_preimage", version),
             (i, new, p, "update_postimage", version)]
            + [(j, vv, p, "update_postimage", version)
               for j, vv in rows[1:]]
        )
        return [
            {"cdc": {"path": cdc_rel, "partitionValues": {"p": p},
                     "size": 1, "dataChange": False}},
            {"remove": {"path": rel, "partitionValues": {"p": p},
                        "dataChange": True}},
            {"add": {"path": new_rel, "partitionValues": {"p": p},
                     "size": 1, "modificationTime": 1,
                     "dataChange": True}},
        ]

    def drain(cap):
        reader = (
            spark.readStream.format("delta_cdf")
            .option("path", root)
            .option("starting_version", "0")
        )
        if cap is not None:
            reader = reader.option("max_versions_per_batch", str(cap))
        _run_stream(spark, reader, out, ckpt)

    for _epoch in range(rng.randint(3, 4)):
        for _ in range(rng.randint(0, 2)):
            v += 1
            roll = rng.random()
            if roll < 0.5 or not live:
                commit(v, [mk_add(v)], 1000 + v)
            elif roll < 0.75:
                commit(v, [mk_remove(v)], 1000 + v)
            else:
                commit(v, mk_cdc(v), 1000 + v)
        drain(rng.choice([None, 1, 2]))
        if rng.random() < 0.35 and _crash_before_source_commit(ckpt):
            drain(rng.choice([None, 1]))
        if rng.random() < 0.25 and _crash_before_sink_finalize(out, ckpt):
            drain(rng.choice([None, 1]))
        if rng.random() < 0.2:
            _plant_partial_sink_file(out, rng)

    for _ in range(12):
        n_off = len(_ckpt_windows(ckpt, {"version": 0}))
        drain(None)
        if len(_ckpt_windows(ckpt, {"version": 0})) == n_off:
            break

    windows = _ckpt_windows(ckpt, {"version": 0})
    hi = max((int(w[1]["version"]) for w in windows), default=0)
    expected = _multiset(
        row for ver, rows in gen.items() if ver <= hi for row in rows
    )
    got = _multiset(
        (r.id, r.val, r.p, r._change_type, r._commit_version)
        for r in spark.read.parquet(str(out)).collect()
    ) if os.path.isdir(str(out)) else {}
    assert got == expected, (
        f"seed={seed}: delivered != model "
        f"(extra={ {k: c for k, c in got.items() if c > expected.get(k, 0)} }, "
        f"missing={ {k: c for k, c in expected.items() if c > got.get(k, 0)} })"
    )
    shutil.rmtree(str(tmp_path), ignore_errors=True)
