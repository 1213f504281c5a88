"""Model-based randomized testing of the LAKEHOUSE READERS (r10 ask #5):
the write-path model fuzzers (test_scd2_model, test_snapshots_model)
keep finding real bugs, so the Delta and Hudi readers get the same
treatment — a seeded random ACTION SEQUENCE is materialized as a
spec-built table (JSON delta log / framed Hudi log blocks, the same
byte-level fixture discipline as test_delta_log/test_hudi_log), then
replayed by the production reader and, independently, by a pure-Python
log-replay model; every historical version/instant must match.

What each fuzzer randomizes:

- Delta: add / remove / replace / inline-DV delete (including DV
  widening re-adds) / metaData re-emit / classic checkpoint placement
  followed by log cleanup — the reader must reconstruct every version
  through any checkpoint/json mix.
- Hudi MOR: avro upsert blocks / parquet insert blocks / v3 and legacy
  Kryo delete blocks / INFLIGHT instants (written to the log, absent
  from the timeline) / rollback command blocks targeting them — the
  snapshot at every committed instant must equal the model's fold; a
  supplemental -cdc file is co-fuzzed alongside every data instant and
  read_hudi_cdc's feed must equal the generated change log restricted
  to committed instants.
"""

import json
import os
import random

import pytest

import _depth

SCHEMA_STR = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "val", "type": "string", "nullable": True, "metadata": {}},
            {"name": "p", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


# ------------------------------------------------------------- delta side


def _write_file(spark, table, rel, rows):
    df = spark.createDataFrame(rows, "id long, val string")
    tmp = os.path.join(table, "_tmp")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(n for n in os.listdir(tmp) if n.endswith(".parquet"))
    os.replace(os.path.join(tmp, part), os.path.join(table, rel))
    import shutil

    shutil.rmtree(tmp)


def _commit(table, version, actions):
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _meta_action():
    return {
        "metaData": {
            "id": "fuzz-1",
            "schemaString": SCHEMA_STR,
            "partitionColumns": ["p"],
            "format": {"provider": "parquet"},
        }
    }


def _dv_inline(positions):
    from easy_sql_spark.sources.delta_dv import encode_bitmap_array, z85_encode

    data = encode_bitmap_array(sorted(positions))
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(data),
        "sizeInBytes": len(data),
        "cardinality": len(positions),
    }


@pytest.mark.slow
@pytest.mark.parametrize("seed", _depth.seeds([13, 61]))
def test_delta_reader_matches_log_replay_model(spark, tmp_path, seed):
    from easy_sql_spark.sources.delta_log import read_delta

    rng = random.Random(seed)
    t = str(tmp_path / f"dfz{seed}")
    os.makedirs(t)

    #: model: path -> (partition, [ordered rows], deleted position set)
    files: dict[str, tuple[str, list, set]] = {}
    live: set[str] = set()
    history: list[set] = []  # visible (id, val, p) per version
    next_id = 0
    next_file = 0

    def visible():
        out = set()
        for path in live:
            p, rows, dv = files[path]
            out |= {
                (i, v, p) for pos, (i, v) in enumerate(rows) if pos not in dv
            }
        return out

    def new_add(n_rows):
        nonlocal next_id, next_file
        p = rng.choice("ab")
        rows = [(next_id + i, f"v{rng.randrange(100)}") for i in range(n_rows)]
        next_id += n_rows
        rel = f"f-{next_file}.parquet"
        next_file += 1
        _write_file(spark, t, rel, rows)
        files[rel] = (p, rows, set())
        live.add(rel)
        return {
            "add": {
                "path": rel,
                "partitionValues": {"p": p},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
            }
        }

    ts = [1000]

    def info(op):
        ts[0] += 1000
        return {"commitInfo": {"operation": op, "timestamp": ts[0]}}

    _commit(
        t,
        0,
        [
            info("WRITE"),
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors"],
                    "writerFeatures": ["deletionVectors"],
                }
            },
            _meta_action(),
            new_add(3),
            new_add(2),
        ],
    )
    history.append(visible())
    version = 0
    checkpointed_at = None

    for _step in range(8):
        version += 1
        op = rng.choice(
            ["add", "remove", "replace", "dv", "meta", "checkpoint"]
        )
        if op == "add":
            _commit(t, version, [info("WRITE"), new_add(rng.randrange(1, 4))])
        elif op == "remove" and live:
            path = rng.choice(sorted(live))
            live.discard(path)
            _commit(
                t,
                version,
                [info("DELETE"), {"remove": {"path": path, "dataChange": True}}],
            )
        elif op == "replace" and live:
            path = rng.choice(sorted(live))
            live.discard(path)
            _commit(
                t,
                version,
                [
                    info("MERGE"),
                    {"remove": {"path": path, "dataChange": True}},
                    new_add(rng.randrange(1, 3)),
                ],
            )
        elif op == "dv" and live:
            # inline-DV delete: re-add a live file with a (possibly
            # widened) vector — the Delta DV update idiom
            path = rng.choice(sorted(live))
            p, rows, dv = files[path]
            dv = dv | {rng.randrange(len(rows))}
            files[path] = (p, rows, dv)
            _commit(
                t,
                version,
                [
                    info("DELETE"),
                    {"remove": {"path": path, "dataChange": True}},
                    {
                        "add": {
                            "path": path,
                            "partitionValues": {"p": p},
                            "size": 1,
                            "modificationTime": 0,
                            "dataChange": True,
                            "deletionVector": _dv_inline(dv),
                        }
                    },
                ],
            )
        elif op == "meta":
            # benign metaData + protocol re-emit mid-log
            _commit(
                t,
                version,
                [
                    info("SET TBLPROPERTIES"),
                    _meta_action(),
                    {
                        "protocol": {
                            "minReaderVersion": 3,
                            "minWriterVersion": 7,
                            "readerFeatures": ["deletionVectors"],
                            "writerFeatures": ["deletionVectors"],
                        }
                    },
                ],
            )
        else:  # checkpoint placement: empty-ish commit + classic ckpt,
            # randomly single-part or 2-part multipart (the large-table
            # form), exercising the reader's checkpoint selection
            _commit(t, version, [info("WRITE"), new_add(1)])
            _write_classic_checkpoint(
                spark, t, version, files, live,
                parts=rng.choice([1, 2]),
            )
            checkpointed_at = version
        history.append(visible())

        got = {
            (r.id, r.val, r.p) for r in read_delta(spark, t).collect()
        }
        assert got == history[-1], f"seed={seed} v={version} latest mismatch"

    # every historical version must replay (time travel is contract)
    for v, want in enumerate(history):
        got = {
            (r.id, r.val, r.p)
            for r in read_delta(spark, t, version=v).collect()
        }
        assert got == want, f"seed={seed} version {v} mismatch"

    # log cleanup: drop every JSON at or below the last checkpoint —
    # replay must reconstruct from the checkpoint alone; an ABORTED
    # multipart set at the latest version (1 of 2 parts) must be
    # ignored by checkpoint selection
    if checkpointed_at is not None:
        log = os.path.join(t, "_delta_log")
        if version > checkpointed_at:
            # orphan 1-of-2 part at a LATER version than the complete
            # checkpoint: selection must skip the incomplete set
            import shutil as _sh

            src_part = next(
                os.path.join(log, n)
                for n in sorted(os.listdir(log))
                if ".checkpoint." in n
            )
            _sh.copyfile(
                src_part,
                os.path.join(
                    log,
                    f"{version:020d}.checkpoint.{1:010d}.{2:010d}.parquet",
                ),
            )
        for v in range(checkpointed_at + 1):
            j = os.path.join(log, f"{v:020d}.json")
            if os.path.exists(j):
                os.remove(j)
        for v in range(checkpointed_at, version + 1):
            got = {
                (r.id, r.val, r.p)
                for r in read_delta(spark, t, version=v).collect()
            }
            assert got == history[v], (
                f"seed={seed} post-cleanup version {v} mismatch"
            )


def _write_classic_checkpoint(spark, t, version, files, live, parts=1):
    """Classic checkpoint of the CURRENT state, spec layout: one parquet
    of action structs at {v}.checkpoint.parquet, or `parts` files at
    {v}.checkpoint.{i}.{n}.parquet (the multipart form)."""
    cp_schema = (
        "metaData struct<id string, schemaString string, "
        "partitionColumns array<string>, format struct<provider string>>, "
        "protocol struct<minReaderVersion int, minWriterVersion int, "
        "readerFeatures array<string>, writerFeatures array<string>>, "
        "add struct<path string, partitionValues map<string,string>, "
        "size long, modificationTime long, dataChange boolean, "
        "deletionVector struct<storageType string, pathOrInlineDv string, "
        "offset int, sizeInBytes int, cardinality long>>"
    )
    md = _meta_action()["metaData"]
    rows = [
        (
            (md["id"], md["schemaString"], md["partitionColumns"],
             (md["format"]["provider"],)),
            None,
            None,
        ),
        (
            None,
            (3, 7, ["deletionVectors"], ["deletionVectors"]),
            None,
        ),
    ]
    for path in sorted(live):
        p, _rows, dv = files[path]
        dvs = None
        if dv:
            d = _dv_inline(dv)
            dvs = (d["storageType"], d["pathOrInlineDv"], None,
                   d["sizeInBytes"], d["cardinality"])
        rows.append(
            (None, None, (path, {"p": p}, 1, 0, False, dvs))
        )
    log = os.path.join(t, "_delta_log")
    chunks = (
        [rows]
        if parts == 1
        else [rows[: len(rows) // 2], rows[len(rows) // 2:]]
    )
    for i, chunk in enumerate(chunks, 1):
        df = spark.createDataFrame(chunk, cp_schema)
        tmp = os.path.join(t, "_cpt")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(n for n in os.listdir(tmp) if n.endswith(".parquet"))
        name = (
            f"{version:020d}.checkpoint.parquet"
            if parts == 1
            else f"{version:020d}.checkpoint.{i:010d}.{parts:010d}.parquet"
        )
        os.replace(os.path.join(tmp, part), os.path.join(log, name))
        import shutil

        shutil.rmtree(tmp)


# -------------------------------------------------------------- hudi side


@pytest.mark.slow
@pytest.mark.parametrize("seed", _depth.seeds([17, 43]))
def test_hudi_mor_reader_matches_timeline_replay_model(spark, tmp_path, seed):
    from easy_sql_spark.sources import hudi_log as hl
    from easy_sql_spark.sources.hudi_meta import read_hudi

    rng = random.Random(seed)
    t = str(tmp_path / f"hfz{seed}")
    os.makedirs(t)

    rec_schema = {
        "type": "record",
        "name": "rec",
        "fields": [
            {"name": "_hoodie_commit_time", "type": "string"},
            {"name": "_hoodie_record_key", "type": "string"},
            {"name": "_hoodie_partition_path", "type": "string"},
            {"name": "k", "type": "long"},
            {"name": "v", "type": ["null", "string"]},
        ],
    }

    base_rows = [(k, f"b{k}") for k in range(6)]
    spark.createDataFrame(
        [("001", str(k), "", k, v) for k, v in base_rows],
        "_hoodie_commit_time string, _hoodie_record_key string, "
        "_hoodie_partition_path string, k long, v string",
    ).coalesce(1).write.parquet(t + "/_s")
    part = next(n for n in os.listdir(t + "/_s") if n.endswith(".parquet"))
    os.replace(f"{t}/_s/{part}", f"{t}/f1_0-1-0_001.parquet")
    import shutil

    shutil.rmtree(t + "/_s")

    #: pure-Python replay model: ordered event log of committed writes
    events: list[tuple[str, str, int | None, str | None, bool]] = []
    committed = ["001"]
    payload = b""
    cdc_payload = b""  # supplemental -cdc file, co-fuzzed with the data
    img_schema = {
        "type": "record",
        "name": "img",
        "fields": [{"name": "k", "type": "long"},
                   {"name": "v", "type": ["null", "string"]}],
    }
    next_key = 100
    last_inflight = None

    cdc_events: list[tuple[str, str, int]] = []  # (instant, op, key)

    def cdc_block(instant, op, pairs):
        cdc_events.extend((instant, op, k) for k, _ in pairs)
        return hl.write_cdc_data_block(
            [
                {
                    "op": op,
                    "ts_ms": instant,
                    "before": {"k": k, "v": v} if op == "d" else None,
                    "after": None if op == "d" else {"k": k, "v": v},
                }
                for k, v in pairs
            ],
            instant, "data_before_after", img_schema,
        )

    def fold_to(instant):
        # key -> (val, last write instant) after committed events <= instant
        st = {k: (v, "001") for k, v in base_rows} if instant >= "001" else {}
        for ins, kind, k, v, _ in events:
            if ins > instant or ins not in committed:
                continue
            if kind == "del":
                st.pop(k, None)
            else:
                st[k] = (v, ins)
        return st

    def state_at(instant):
        return {(k, v) for k, (v, _i) in fold_to(instant).items()}

    def recs(instant, pairs):
        return [
            {
                "_hoodie_commit_time": instant,
                "_hoodie_record_key": str(k),
                "_hoodie_partition_path": "",
                "k": k,
                "v": v,
            }
            for k, v in pairs
        ]

    for step in range(6):
        instant = f"{(step + 2):03d}"
        op = rng.choice(
            ["upsert", "insert_pq", "delete_v3", "delete_kryo",
             "inflight", "rollback"]
        )
        live_keys = sorted({k for k, _ in state_at("999")})
        if op == "upsert":
            ups = [
                (k, f"u{instant}")
                for k in rng.sample(live_keys, min(2, len(live_keys)))
            ] or [(next_key, f"u{instant}")]
            payload += hl.write_data_block(rec_schema, recs(instant, ups),
                                           instant)
            cdc_payload += cdc_block(instant, "u", ups)
            committed.append(instant)
            events.extend((instant, "up", k, v, True) for k, v in ups)
        elif op == "insert_pq":
            ins = [(next_key + i, f"i{instant}") for i in range(2)]
            next_key += 10
            payload += hl.write_parquet_data_block(
                rec_schema, recs(instant, ins), instant
            )
            cdc_payload += cdc_block(instant, "i", ins)
            committed.append(instant)
            events.extend((instant, "up", k, v, True) for k, v in ins)
        elif op in ("delete_v3", "delete_kryo"):
            dels = rng.sample(live_keys, min(2, len(live_keys)))
            dels.append(999999)  # never-present key: no-op
            keys = [(str(k), "") for k in dels]
            if op == "delete_v3":
                payload += hl.write_delete_block(keys, instant)
            else:
                payload += hl.write_delete_block_kryo(
                    keys, instant, version=rng.choice([1, 2])
                )
            cdc_payload += cdc_block(instant, "d", [(k, None) for k in dels])
            committed.append(instant)
            events.extend((instant, "del", k, None, True) for k in dels)
        elif op == "inflight":
            # written to the log, NO timeline entry: invisible
            payload += hl.write_data_block(
                rec_schema, recs(instant, [(next_key, "ghost")]), instant
            )
            next_key += 10
            cdc_payload += cdc_block(instant, "i", [(next_key - 10, "ghost")])
            events.append((instant, "up", next_key - 10, "ghost", False))
            last_inflight = instant
        else:  # rollback command block targeting an inflight instant
            tgt = last_inflight or "000"
            payload += hl.write_rollback_block(tgt, instant)
            committed.append(instant)
            last_inflight = None

    with open(f"{t}/.f1_001.log.1_0-1-0", "wb") as fh:
        fh.write(payload)
    if cdc_payload:
        with open(f"{t}/.f1_001.log.1_0-1-0-cdc", "wb") as fh:
            fh.write(cdc_payload)
    os.makedirs(f"{t}/.hoodie")
    with open(f"{t}/.hoodie/hoodie.properties", "w") as fh:
        fh.write("hoodie.table.name=fz\nhoodie.table.type=MERGE_ON_READ\n")
    with open(f"{t}/.hoodie/001.commit", "w") as fh:
        fh.write("{}")
    for ins in committed[1:]:
        with open(f"{t}/.hoodie/{ins}.deltacommit", "w") as fh:
            fh.write("{}")

    # the snapshot at EVERY committed instant equals the model's fold
    for ins in committed:
        want = state_at(ins)
        got = {(r.k, r.v) for r in read_hudi(spark, t, as_of=ins).collect()}
        assert got == want, f"seed={seed} as_of={ins} mismatch"
    got = {(r.k, r.v) for r in read_hudi(spark, t).collect()}
    assert got == state_at("999"), f"seed={seed} latest mismatch"

    # the CDC feed equals the generated change log restricted to
    # committed instants (inflight cdc blocks invisible; deletes carry
    # before images, writes after — key extracted from the right image)
    import json as _json

    from easy_sql_spark.sources.hudi_meta import read_hudi_cdc

    want_feed = {(i, o, k) for i, o, k in cdc_events if i in committed}
    got_feed = set()
    for r in read_hudi_cdc(spark, t).collect():
        img = r.before if r.op == "d" else r.after
        assert (r.before is None) == (r.op != "d")
        assert (r.after is None) == (r.op == "d")
        got_feed.add((r.commit_time, r.op, _json.loads(img)["k"]))
    assert got_feed == want_feed, f"seed={seed} cdc feed mismatch"

    # incremental pull over every committed window: the snapshot at
    # `hi` restricted to keys last WRITTEN inside (lo, hi] — updates
    # resolve to final state, deletes vanish, untouched keys stay out
    from easy_sql_spark.sources.hudi_meta import read_hudi_incremental

    for i, lo in enumerate(committed):
        for hi in committed[i + 1:]:
            want = {
                (k, v)
                for k, (v, ins) in fold_to(hi).items()
                if lo < ins <= hi
            }
            got = {
                (r.k, r.v)
                for r in read_hudi_incremental(spark, t, lo, hi).collect()
            }
            assert got == want, (
                f"seed={seed} incremental ({lo}, {hi}] mismatch"
            )


# ----------------------------------------------------------- iceberg side


@pytest.mark.slow
@pytest.mark.parametrize("seed", _depth.seeds([29, 83]))
def test_iceberg_reader_matches_snapshot_replay_model(spark, tmp_path, seed):
    """Same discipline for the THIRD format: random snapshot sequences
    (delta-manifest appends / full-state-collapse overwrites /
    position-delete snapshots) built byte-by-byte to the v2 spec
    (avro manifests + manifest lists via avro_lite), replayed by
    read_iceberg at EVERY snapshot id against a pure-Python model; the
    incremental append scan is checked over every all-append window
    and must refuse windows containing an overwrite/delete snapshot."""
    from tests.test_iceberg_meta import (
        ICE_SCHEMA,
        _data_file,
        _entry,
        _eq_delete_file,
        _manifest,
        _manifest_list,
        _metadata,
    )

    from easy_sql_spark.sources.iceberg_meta import (
        IcebergUnsupportedError,
        read_iceberg,
        read_iceberg_incremental,
    )

    rng = random.Random(seed)
    t = str(tmp_path / f"ifz{seed}")

    #: model: path -> (ordered rows, set of dead positions — pos- or
    #: eq-deleted); file_seq: path -> data sequence (= adding snapshot)
    files: dict[str, tuple[list, set]] = {}
    file_seq: dict[str, int] = {}
    live: list[str] = []
    history: dict[int, set] = {}  # snapshot id -> visible (id, val)
    ops: dict[int, str] = {}
    added_rows: dict[int, set] = {}  # append snapshots' own new rows
    #: manifest stack carried forward: (path, content, added_snapshot_id)
    stack: list[tuple[str, int, int]] = []
    snapshots, log = [], []
    next_id = 0
    nf = 0

    def visible():
        out = set()
        for p in live:
            rows, dead = files[p]
            out |= {
                (i, v) for pos, (i, v) in enumerate(rows) if pos not in dead
            }
        return out

    def new_file(n_rows):
        nonlocal next_id, nf
        rows = [(next_id + i, f"v{rng.randrange(100)}") for i in range(n_rows)]
        next_id += n_rows
        p = _data_file(spark, t, f"f{nf}.parquet", rows)
        nf += 1
        files[p] = (rows, set())
        return p, rows

    def eq_kill(target_id, sid):
        # spec rule: an equality delete at data sequence `sid` kills
        # matching rows ONLY in data files with sequence STRICTLY below
        for q in live:
            if file_seq[q] >= sid:
                continue
            rows, dead = files[q]
            for pos, (i, _v) in enumerate(rows):
                if i == target_id:
                    dead.add(pos)

    def commit(sid, op):
        mls = _manifest_list(
            t, f"sl{sid}.avro",
            [m for m, _c, _a in stack],
            contents=[c for _m, c, _a in stack],
            seqs=[a for _m, _c, a in stack],
            added_snaps=[a for _m, _c, a in stack],
        )
        snapshots.append(
            {"snapshot-id": sid, "timestamp-ms": sid * 1000,
             "manifest-list": mls, "summary": {"operation": op}}
        )
        log.append({"timestamp-ms": sid * 1000, "snapshot-id": sid})
        ops[sid] = op
        history[sid] = visible()

    # s1 always seeds with an append
    p, rows = new_file(3)
    live.append(p)
    file_seq[p] = 1
    stack.append((_manifest(t, "m1.avro", [_entry(1, p)]), 0, 1))
    added_rows[1] = set(rows)
    commit(1, "append")

    #: path -> its current v3 DV manifest (the spec allows at most ONE
    #: deletion vector per data file; a new DV REPLACES the old one)
    dv_manifest_for: dict[str, str] = {}
    used_v3 = False

    for sid in range(2, 9):
        op = rng.choice(
            ["append", "overwrite", "pos_delete", "eq_upsert", "dv_delete"]
        )
        if op == "append":
            p, rows = new_file(rng.randrange(1, 3))
            live.append(p)
            file_seq[p] = sid
            stack.append(
                (_manifest(t, f"m{sid}.avro", [_entry(1, p)]), 0, sid)
            )
            added_rows[sid] = set(rows)
            commit(sid, "append")
        elif op == "overwrite":
            # collapse to ONE full-state data manifest: victim deleted,
            # survivors EXISTING (keeping their ORIGINAL data sequence —
            # the spec's existing-entry rule, and what keeps later
            # equality deletes applying correctly), one new file added
            victim = rng.choice(live)
            live.remove(victim)
            p, _rows = new_file(rng.randrange(1, 3))
            entries = [
                _entry(0, q, seq=file_seq[q]) for q in live
            ] + [
                _entry(2, victim, seq=file_seq[victim]), _entry(1, p),
            ]
            live.append(p)
            file_seq[p] = sid
            stack[:] = [e for e in stack if e[1] == 1] + [
                (_manifest(t, f"m{sid}.avro", entries), 0, sid)
            ]
            commit(sid, "overwrite")
        elif op == "eq_upsert":
            # the upsert pattern: equality-delete an id and re-add it in
            # the SAME snapshot — the re-added file (seq == sid) must
            # survive its own delete (strictly-below rule)
            vis = sorted({i for i, _v in visible()})
            if not vis:
                ops[sid] = "skipped"
                continue
            k = rng.choice(vis)
            eq_kill(k, sid)
            fe = _eq_delete_file(
                spark, t, f"eq{sid}.parquet", [(k,)], "id long"
            )
            rows = [(k, f"u{sid}")]
            p = _data_file(spark, t, f"f{nf}.parquet", rows)
            nf += 1
            files[p] = (rows, set())
            file_seq[p] = sid
            live.append(p)
            stack.append(
                (_manifest(t, f"m{sid}.avro", [_entry(1, p)]), 0, sid)
            )
            stack.append(
                (_manifest(t, f"me{sid}.avro",
                           [_entry(1, fe, content=2, eq_ids=[1])]), 1, sid)
            )
            commit(sid, "overwrite")
        elif op == "dv_delete":
            # v3 deletion vector: kill one still-visible row via a
            # puffin deletion-vector-v1 blob.  The new DV carries ALL
            # dead positions of the target file and REPLACES any prior
            # DV for it (spec: at most one DV per data file).
            from easy_sql_spark.sources.puffin import (
                encode_dv_blob,
                write_puffin,
            )

            cands = [
                (q, pos)
                for q in live
                for pos in range(len(files[q][0]))
                if pos not in files[q][1]
            ]
            if not cands:
                ops[sid] = "skipped"
                continue
            q, pos = rng.choice(cands)
            files[q][1].add(pos)
            used_v3 = True
            dead_sorted = sorted(files[q][1])
            data, metas = write_puffin(
                [
                    (
                        "deletion-vector-v1",
                        encode_dv_blob(dead_sorted),
                        {"referenced-data-file": q,
                         "cardinality": str(len(dead_sorted))},
                    )
                ]
            )
            puf = os.path.join(t, "data", f"dv{sid}.puffin")
            with open(puf, "wb") as fh:
                fh.write(data)
            old = dv_manifest_for.get(q)
            if old:
                stack[:] = [e for e in stack if e[0] != old]
            md = _manifest(
                t,
                f"mdv{sid}.avro",
                [
                    _entry(1, puf, content=1, fmt="PUFFIN", ref=q,
                           offset=metas[0]["offset"],
                           size=metas[0]["length"])
                ],
            )
            dv_manifest_for[q] = md
            stack.append((md, 1, sid))
            commit(sid, "delete")
        else:
            # position delete: kill one still-visible row of a live file
            cands = [
                (q, pos)
                for q in live
                for pos in range(len(files[q][0]))
                if pos not in files[q][1]
            ]
            if not cands:
                ops[sid] = "skipped"
                continue
            q, pos = rng.choice(cands)
            files[q][1].add(pos)
            dd = spark.createDataFrame(  # noqa: position-delete payload
                [(q, pos)], "file_path string, pos long"
            )
            tmpd = os.path.join(t, f"_td{sid}")
            dd.coalesce(1).write.parquet(tmpd)
            part = next(
                n for n in os.listdir(tmpd) if n.endswith(".parquet")
            )
            fdel = os.path.join(t, "data", f"del{sid}.parquet")
            os.replace(os.path.join(tmpd, part), fdel)
            import shutil

            shutil.rmtree(tmpd)
            stack.append(
                (_manifest(t, f"md{sid}.avro",
                           [_entry(1, fdel, content=1)]), 1, sid)
            )
            commit(sid, "delete")

    sids = sorted(history)
    _metadata(
        t, snapshots, current=sids[-1], log=log, schema=ICE_SCHEMA,
        fv=3 if used_v3 else 2,
    )

    # every snapshot must replay (time travel is contract)
    for sid in sids:
        got = {
            (r.id, r.val)
            for r in read_iceberg(spark, t, snapshot_id=sid).collect()
        }
        assert got == history[sid], f"seed={seed} snapshot {sid} mismatch"
    got = {(r.id, r.val) for r in read_iceberg(spark, t).collect()}
    assert got == history[sids[-1]], f"seed={seed} current mismatch"

    # incremental append scan over every ALL-APPEND window; any window
    # containing an overwrite/delete snapshot must refuse loudly
    for i, lo in enumerate(sids):
        for hi in sids[i + 1:]:
            window = [s for s in sids if lo < s <= hi]
            if all(ops[s] == "append" for s in window):
                want = set().union(
                    *(added_rows[s] for s in window)
                ) if window else set()
                got = {
                    (r.id, r.val)
                    for r in read_iceberg_incremental(
                        spark, t, lo, hi
                    ).collect()
                }
                assert got == want, (
                    f"seed={seed} incremental ({lo}, {hi}] mismatch"
                )
            else:
                with pytest.raises(
                    (IcebergUnsupportedError, ValueError)
                ):
                    read_iceberg_incremental(spark, t, lo, hi).collect()


# ------------------------------------------- hudi compaction/clean side

#: lifecycle count is env-scalable (suite default 4; the r11 campaign
#: ran EASY_SQL_HUDI_FUZZ_SEEDS=200, results in COVERAGE.md)
_HUDI_CC_SEEDS = int(
    os.environ.get("EASY_SQL_HUDI_FUZZ_SEEDS", "4" if _depth.FULL else "2")
)


@pytest.mark.parametrize("seed", range(_HUDI_CC_SEEDS))
def test_hudi_mor_compaction_clean_model_fuzz(spark, tmp_path, seed):
    """MOR lifecycle fuzz ACROSS FILE SLICES (VERDICT r10 ask #6): the
    r10 fuzzer froze one slice; this one folds random compactions (new
    base file at instant C preserving per-record commit times, later
    logs attach to the new slice), cleans (physical removal of
    superseded slices — time travel before the surviving base must
    DISAPPEAR from what we assert, and the CDC feed shrinks to the
    surviving slices' -cdc files), HFILE data blocks (the r11 decode),
    avro/parquet upserts, v3 deletes, inflight writes, and rollbacks,
    against a pure-Python replay model.  Checks per lifecycle: latest
    snapshot, one random readable as_of, the CDC feed, and one random
    incremental window above the clean horizon."""
    from easy_sql_spark.sources import hudi_log as hl
    from easy_sql_spark.sources.hudi_meta import (
        read_hudi,
        read_hudi_cdc,
        read_hudi_incremental,
    )

    rng = random.Random(909_000 + seed)
    t = str(tmp_path / f"hcc{seed}")
    os.makedirs(t)

    rec_schema = {
        "type": "record",
        "name": "rec",
        "fields": [
            {"name": "_hoodie_commit_time", "type": "string"},
            {"name": "_hoodie_record_key", "type": "string"},
            {"name": "_hoodie_partition_path", "type": "string"},
            {"name": "k", "type": "long"},
            {"name": "v", "type": ["null", "string"]},
        ],
    }
    img_schema = {
        "type": "record",
        "name": "img",
        "fields": [{"name": "k", "type": "long"},
                   {"name": "v", "type": ["null", "string"]}],
    }

    def write_base(instant, state):
        """state: {k: (v, last_write_instant)} -> base parquet file."""
        rows = [(ins, str(k), "", k, v) for k, (v, ins) in sorted(state.items())]
        df = spark.createDataFrame(
            rows or [],
            "_hoodie_commit_time string, _hoodie_record_key string, "
            "_hoodie_partition_path string, k long, v string",
        )
        df.coalesce(1).write.parquet(t + "/_s")
        part = next(n for n in os.listdir(t + "/_s")
                    if n.endswith(".parquet"))
        dest = f"{t}/f1_0-1-0_{instant}.parquet"
        os.replace(f"{t}/_s/{part}", dest)
        import shutil

        shutil.rmtree(t + "/_s")
        return dest

    base_rows = {k: (f"b{k}", "001") for k in range(5)}
    os.makedirs(f"{t}/.hoodie")
    with open(f"{t}/.hoodie/hoodie.properties", "w") as fh:
        fh.write("hoodie.table.name=cc\nhoodie.table.type=MERGE_ON_READ\n")

    #: replay model
    events: list[tuple[str, str, int, str | None]] = []  # instant kind k v
    committed: list[tuple[str, str]] = [("001", "commit")]
    cdc_events: list[tuple[str, str, int]] = []

    #: slices: each is {"base": instant, "files": [paths], "log": bytes,
    #: "cdc": bytes, "cdc_events": [...]} — log/cdc flushed lazily
    first_base = write_base("001", base_rows)
    slices = [{"base": "001", "files": [first_base], "log": b"",
               "cdc": b"", "cdc_events": []}]
    min_readable = "001"
    next_key = 100
    last_inflight = None

    def fold_to(instant):
        st = dict(base_rows) if instant >= "001" else {}
        names = {i for i, _a in committed}
        for ins, kind, k, v in events:
            if ins > instant or ins not in names:
                continue
            if kind == "del":
                st.pop(k, None)
            else:
                st[k] = (v, ins)
        return st

    def flush_slice(sl):
        if sl["log"]:
            p = f"{t}/.f1_{sl['base']}.log.1_0-1-0"
            with open(p, "wb") as fh:
                fh.write(sl["log"])
            sl["files"].append(p)
            sl["log"] = b""
        if sl["cdc"]:
            p = f"{t}/.f1_{sl['base']}.log.1_0-1-0-cdc"
            with open(p, "wb") as fh:
                fh.write(sl["cdc"])
            sl["files"].append(p)
            sl["cdc"] = b""

    def cdc_block(instant, op, pairs):
        slices[-1]["cdc_events"].extend(
            (instant, op, k) for k, _ in pairs
        )
        return hl.write_cdc_data_block(
            [
                {
                    "op": op,
                    "ts_ms": instant,
                    "before": {"k": k, "v": v} if op == "d" else None,
                    "after": None if op == "d" else {"k": k, "v": v},
                }
                for k, v in pairs
            ],
            instant, "data_before_after", img_schema,
        )

    def recs(instant, pairs):
        return [
            {
                "_hoodie_commit_time": instant,
                "_hoodie_record_key": str(k),
                "_hoodie_partition_path": "",
                "k": k,
                "v": v,
            }
            for k, v in pairs
        ]

    for step in range(rng.randint(6, 9)):
        instant = f"{(step + 2):03d}"
        op = rng.choice(
            ["upsert", "upsert_hfile", "insert_pq", "delete_v3",
             "inflight", "rollback", "compact", "compact", "clean"]
        )
        live_keys = sorted(fold_to("999"))
        sl = slices[-1]
        if op in ("upsert", "upsert_hfile"):
            ups = [
                (k, f"u{instant}")
                for k in rng.sample(live_keys, min(2, len(live_keys)))
            ] or [(next_key, f"u{instant}")]
            if op == "upsert":
                sl["log"] += hl.write_data_block(
                    rec_schema, recs(instant, ups), instant
                )
            else:
                sl["log"] += hl.write_hfile_data_block(
                    rec_schema, recs(instant, ups), instant,
                    key_field="_hoodie_record_key",
                    compression=rng.choice(["none", "gz"]),
                    include_mvcc=rng.random() < 0.5,
                )
            sl["cdc"] += cdc_block(instant, "u", ups)
            committed.append((instant, "deltacommit"))
            events.extend((instant, "up", k, v) for k, v in ups)
        elif op == "insert_pq":
            ins = [(next_key + i, f"i{instant}") for i in range(2)]
            next_key += 10
            sl["log"] += hl.write_parquet_data_block(
                rec_schema, recs(instant, ins), instant
            )
            sl["cdc"] += cdc_block(instant, "i", ins)
            committed.append((instant, "deltacommit"))
            events.extend((instant, "up", k, v) for k, v in ins)
        elif op == "delete_v3":
            dels = rng.sample(live_keys, min(2, len(live_keys)))
            dels.append(999999)
            sl["log"] += hl.write_delete_block(
                [(str(k), "") for k in dels], instant
            )
            sl["cdc"] += cdc_block(instant, "d", [(k, None) for k in dels])
            committed.append((instant, "deltacommit"))
            events.extend((instant, "del", k, None) for k in dels)
        elif op == "inflight":
            sl["log"] += hl.write_data_block(
                rec_schema, recs(instant, [(next_key, "ghost")]), instant
            )
            sl["cdc"] += cdc_block(instant, "i", [(next_key, "ghost")])
            next_key += 10
            last_inflight = instant
        elif op == "rollback":
            tgt = last_inflight or "000"
            sl["log"] += hl.write_rollback_block(tgt, instant)
            committed.append((instant, "deltacommit"))
            last_inflight = None
        elif op == "compact":
            # fold committed state < instant into a new base; per-record
            # commit times PRESERVED (hudi compaction keeps metadata)
            flush_slice(sl)
            state = fold_to(instant)
            base = write_base(instant, state)
            committed.append((instant, "commit"))
            slices.append({"base": instant, "files": [base], "log": b"",
                           "cdc": b"", "cdc_events": []})
            last_inflight = None
        elif op == "clean" and len(slices) > 1:
            # physically drop every superseded slice; .clean timeline
            # marker must be IGNORED by the reader's instant parsing
            for old in slices[:-1]:
                for p in old["files"]:
                    if os.path.exists(p):
                        os.unlink(p)
            with open(f"{t}/.hoodie/{instant}.clean", "w") as fh:
                fh.write("{}")
            slices = slices[-1:]
            min_readable = slices[0]["base"]

    flush_slice(slices[-1])
    for ins, action in committed:
        with open(f"{t}/.hoodie/{ins}.{action}", "w") as fh:
            fh.write("{}")

    def state_set(instant):
        return {(k, v) for k, (v, _i) in fold_to(instant).items()}

    # latest snapshot
    got = {(r.k, r.v) for r in read_hudi(spark, t).collect()}
    assert got == state_set("999"), f"seed={seed} latest mismatch"

    readable = [i for i, _a in committed if i >= min_readable]
    # one random readable as_of
    ins = rng.choice(readable)
    got = {(r.k, r.v) for r in read_hudi(spark, t, as_of=ins).collect()}
    assert got == state_set(ins), f"seed={seed} as_of={ins} mismatch"

    # CDC feed = committed cdc events of SURVIVING slices only
    names = {i for i, _a in committed}
    want_feed = {
        (i, o, k)
        for sl in slices
        for i, o, k in sl["cdc_events"]
        if i in names
    }
    got_feed = set()
    import json as _json

    for r in read_hudi_cdc(spark, t).collect():
        img = r.before if r.op == "d" else r.after
        got_feed.add((r.commit_time, r.op, _json.loads(img)["k"]))
    assert got_feed == want_feed, f"seed={seed} cdc feed mismatch"

    # one incremental window above the clean horizon
    if len(readable) >= 2:
        i = rng.randrange(len(readable) - 1)
        lo = readable[i]
        hi = rng.choice(readable[i + 1:])
        want = {
            (k, v)
            for k, (v, ins2) in fold_to(hi).items()
            if lo < ins2 <= hi
        }
        got = {
            (r.k, r.v)
            for r in read_hudi_incremental(spark, t, lo, hi).collect()
        }
        assert got == want, f"seed={seed} incremental ({lo},{hi}] mismatch"
