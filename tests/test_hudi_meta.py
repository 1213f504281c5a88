"""Hudi COW reader (sources/hudi_meta.py): tables constructed to the
open layout — .hoodie timeline instants, base files named
fileId_writeToken_instant.parquet, replacecommit metadata."""

import json
import os

import pytest

import _depth

from easy_sql_spark.sources.hudi_meta import (
    HudiUnsupportedError,
    hudi_history,
    read_hudi,
)


def _base_file(spark, table, partition, file_id, instant, rows):
    df = spark.createDataFrame(rows, "id long, val string")
    df = df.selectExpr(f"'{instant}' as _hoodie_commit_time", "id", "val")
    tmp = os.path.join(table, "_tmp")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(n for n in os.listdir(tmp) if n.endswith(".parquet"))
    dest_dir = os.path.join(table, partition) if partition else table
    os.makedirs(dest_dir, exist_ok=True)
    os.replace(
        os.path.join(tmp, part),
        os.path.join(dest_dir, f"{file_id}_0-1-0_{instant}.parquet"),
    )
    import shutil

    shutil.rmtree(tmp)


def _instant(table, t, action="commit", body=None):
    td = os.path.join(table, ".hoodie")
    os.makedirs(td, exist_ok=True)
    with open(os.path.join(td, f"{t}.{action}"), "w") as f:
        json.dump(body or {}, f)


def _props(table, ttype="COPY_ON_WRITE"):
    td = os.path.join(table, ".hoodie")
    os.makedirs(td, exist_ok=True)
    with open(os.path.join(td, "hoodie.properties"), "w") as f:
        f.write(f"hoodie.table.name=t\nhoodie.table.type={ttype}\n")


def _mk_table(spark, root):
    """Instants: 001 seeds f1(p=a) + f2(p=b); 003 updates file group f1
    (new slice, same fileId); 004 exists on disk but is NOT committed;
    005 replacecommit kills f2 and adds f3(p=b)."""
    t = str(root)
    _props(t)
    _base_file(spark, t, "p=a", "f1", "001", [(1, "x"), (2, "y")])
    _base_file(spark, t, "p=b", "f2", "001", [(3, "z")])
    _base_file(spark, t, "p=a", "f1", "003", [(1, "x2"), (2, "y2"), (9, "w")])
    _base_file(spark, t, "p=a", "f9", "004", [(99, "uncommitted")])
    _base_file(spark, t, "p=b", "f3", "005", [(7, "c")])
    _instant(t, "001")
    _instant(t, "003")
    # 004 intentionally has no timeline entry (inflight write)
    _instant(
        t, "005", "replacecommit",
        {"partitionToReplaceFileIds": {"p=b": ["f2"]}},
    )
    return t


def test_hudi_snapshot_time_travel_and_replace(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "hudi")

    cur = {(r.id, r.val) for r in read_hudi(spark, t).collect()}
    assert cur == {(1, "x2"), (2, "y2"), (9, "w"), (7, "c")}

    # time travel below the update and the replace: original slices
    at1 = {(r.id, r.val) for r in read_hudi(spark, t, as_of="002").collect()}
    assert at1 == {(1, "x"), (2, "y"), (3, "z")}
    at3 = {(r.id, r.val) for r in read_hudi(spark, t, as_of="004").collect()}
    assert at3 == {(1, "x2"), (2, "y2"), (9, "w"), (3, "z")}

    # meta columns dropped by default, kept on request
    assert all(not c.startswith("_hoodie_") for c in read_hudi(spark, t).columns)
    assert "_hoodie_commit_time" in read_hudi(spark, t, keep_meta=True).columns

    assert [(h["instant"], h["action"]) for h in hudi_history(t)] == [
        ("005", "replacecommit"), ("003", "commit"), ("001", "commit"),
    ]


def test_hudi_cow_refuses_mor_artifacts(spark, tmp_path):
    """A COPY_ON_WRITE table whose timeline or data dirs carry MOR
    artifacts is corrupt / mis-declared — refuse rather than return
    stale rows."""
    t2 = str(tmp_path / "mor2")
    _props(t2)
    _base_file(spark, t2, "p=a", "f1", "001", [(1, "x")])
    _instant(t2, "001", "deltacommit")
    with pytest.raises(HudiUnsupportedError, match="COPY_ON_WRITE"):
        read_hudi(spark, t2)

    t3 = str(tmp_path / "mor3")
    _props(t3)
    _base_file(spark, t3, "p=a", "f1", "001", [(1, "x")])
    _instant(t3, "001")
    os.makedirs(os.path.join(t3, "p=a"), exist_ok=True)
    with open(os.path.join(t3, "p=a", ".f1_001.log.1_0-1-0"), "wb") as f:
        f.write(b"")
    with pytest.raises(HudiUnsupportedError, match="COPY_ON_WRITE"):
        read_hudi(spark, t3)


# ----------------------------------------------------------------- MOR
MOR_AVRO_SCHEMA = {
    "type": "record",
    "name": "rec",
    "fields": [
        {"name": "_hoodie_commit_time", "type": ["null", "string"]},
        {"name": "_hoodie_record_key", "type": ["null", "string"]},
        {"name": "id", "type": ["null", "long"]},
        {"name": "val", "type": ["null", "string"]},
    ],
}


def _mor_base_file(spark, table, partition, file_id, instant, rows):
    """Base parquet WITH populated hoodie key/partition meta columns
    (real Hudi writers always materialize them unless virtual keys)."""
    df = spark.createDataFrame(rows, "id long, val string")
    df = df.selectExpr(
        f"'{instant}' as _hoodie_commit_time",
        "cast(id as string) as _hoodie_record_key",
        f"'{partition}' as _hoodie_partition_path",
        "id",
        "val",
    )
    tmp = os.path.join(table, "_tmp")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(n for n in os.listdir(tmp) if n.endswith(".parquet"))
    dest_dir = os.path.join(table, partition) if partition else table
    os.makedirs(dest_dir, exist_ok=True)
    os.replace(
        os.path.join(tmp, part),
        os.path.join(dest_dir, f"{file_id}_0-1-0_{instant}.parquet"),
    )
    import shutil

    shutil.rmtree(tmp)


def _log_file(table, partition, file_id, base_instant, version, payload):
    dest_dir = os.path.join(table, partition) if partition else table
    os.makedirs(dest_dir, exist_ok=True)
    name = f".{file_id}_{base_instant}.log.{version}_0-1-0"
    with open(os.path.join(dest_dir, name), "wb") as f:
        f.write(payload)


def _rec(instant, id_, val):
    return {
        "_hoodie_commit_time": instant,
        "_hoodie_record_key": str(id_),
        "id": id_,
        "val": val,
    }


def test_hudi_mor_merge_update_delete_insert(spark, tmp_path):
    """The canonical MOR shape: base file + a log with an update, an
    insert and a delete; latest event per record key wins."""
    from easy_sql_spark.sources.hudi_log import (
        write_data_block,
        write_delete_block,
    )

    t = str(tmp_path / "mor")
    _props(t, "MERGE_ON_READ")
    _mor_base_file(spark, t, "p=a", "f1", "001", [(1, "x"), (2, "y"), (3, "z")])
    _instant(t, "001")
    payload = write_data_block(
        MOR_AVRO_SCHEMA, [_rec("002", 1, "x2"), _rec("002", 9, "new")], "002"
    ) + write_delete_block([("2", "p=a")], "003")
    _log_file(t, "p=a", "f1", "001", 1, payload)
    _instant(t, "002", "deltacommit")
    _instant(t, "003", "deltacommit")

    cur = {(r.id, r.val) for r in read_hudi(spark, t).collect()}
    assert cur == {(1, "x2"), (3, "z"), (9, "new")}
    # meta columns dropped by default
    assert all(not c.startswith("_hoodie_") for c in read_hudi(spark, t).columns)

    # time travel: below the deltas, pure base
    at1 = {(r.id, r.val) for r in read_hudi(spark, t, as_of="001").collect()}
    assert at1 == {(1, "x"), (2, "y"), (3, "z")}
    # between the two delta commits: update+insert visible, delete not
    at2 = {(r.id, r.val) for r in read_hudi(spark, t, as_of="002").collect()}
    assert at2 == {(1, "x2"), (2, "y"), (3, "z"), (9, "new")}

    assert [(h["instant"], h["action"]) for h in hudi_history(t)] == [
        ("003", "deltacommit"), ("002", "deltacommit"), ("001", "commit"),
    ]


def test_hudi_mor_log_only_group_and_rollback(spark, tmp_path):
    """Inserts into MOR before any compaction produce log-only file
    groups; a rollback command block invalidates its target instant's
    earlier blocks."""
    from easy_sql_spark.sources.hudi_log import (
        write_data_block,
        write_rollback_block,
    )

    t = str(tmp_path / "morlo")
    _props(t, "MERGE_ON_READ")
    payload = (
        write_data_block(MOR_AVRO_SCHEMA, [_rec("001", 1, "a")], "001")
        + write_data_block(MOR_AVRO_SCHEMA, [_rec("002", 2, "bad")], "002")
        + write_rollback_block("002", "003")
        + write_data_block(MOR_AVRO_SCHEMA, [_rec("004", 2, "good")], "004")
    )
    _log_file(t, "p=a", "f1", "001", 1, payload)
    _instant(t, "001", "deltacommit")
    _instant(t, "004", "deltacommit")

    cur = {(r.id, r.val) for r in read_hudi(spark, t).collect()}
    assert cur == {(1, "a"), (2, "good")}


def test_hudi_mor_uncommitted_delta_invisible(spark, tmp_path):
    """A data block whose instant never completed (no .deltacommit)
    must not surface — inflight writes are invisible."""
    from easy_sql_spark.sources.hudi_log import write_data_block

    t = str(tmp_path / "morinf")
    _props(t, "MERGE_ON_READ")
    _mor_base_file(spark, t, "", "f1", "001", [(1, "x")])
    _instant(t, "001")
    payload = write_data_block(MOR_AVRO_SCHEMA, [_rec("005", 1, "inflight")], "005")
    _log_file(t, "", "f1", "001", 1, payload)
    # no 005.deltacommit
    cur = {(r.id, r.val) for r in read_hudi(spark, t).collect()}
    assert cur == {(1, "x")}


def test_hudi_mor_compaction_supersedes_logs(spark, tmp_path):
    """After compaction (a .commit writing a newer base for the file
    group), the old slice's log files are dead — newest base wins."""
    from easy_sql_spark.sources.hudi_log import write_data_block

    t = str(tmp_path / "morc")
    _props(t, "MERGE_ON_READ")
    _mor_base_file(spark, t, "p=a", "f1", "001", [(1, "x")])
    _instant(t, "001")
    payload = write_data_block(MOR_AVRO_SCHEMA, [_rec("002", 1, "x2")], "002")
    _log_file(t, "p=a", "f1", "001", 1, payload)
    _instant(t, "002", "deltacommit")
    # compaction at 003 folds the log into a new base
    _mor_base_file(spark, t, "p=a", "f1", "003", [(1, "x2")])
    _instant(t, "003")

    cur = {(r.id, r.val) for r in read_hudi(spark, t).collect()}
    assert cur == {(1, "x2")}
    at2 = {(r.id, r.val) for r in read_hudi(spark, t, as_of="002").collect()}
    assert at2 == {(1, "x2")}  # via log merge, pre-compaction


def test_hudi_mor_virtual_keys_refused(spark, tmp_path):
    """Base files without _hoodie_record_key cannot be merged with log
    deltas — refuse loudly rather than mis-merge."""
    from easy_sql_spark.sources.hudi_log import write_data_block

    t = str(tmp_path / "morvk")
    _props(t, "MERGE_ON_READ")
    _base_file(spark, t, "p=a", "f1", "001", [(1, "x")])  # no key meta col
    _instant(t, "001")
    payload = write_data_block(MOR_AVRO_SCHEMA, [_rec("002", 1, "x2")], "002")
    _log_file(t, "p=a", "f1", "001", 1, payload)
    _instant(t, "002", "deltacommit")
    with pytest.raises(HudiUnsupportedError, match="_hoodie_record_key"):
        read_hudi(spark, t).collect()


def test_hudi_view_step_function(spark, tmp_path):
    from easy_sql_spark.runtime.processor import SqlProcessor

    t = _mk_table(spark, tmp_path / "hudi3")
    etl = f"""-- target=func.hudi_view({t}, hv)
-- target=func.hudi_view({t}, hv_old, 002)

-- target=check.current_rows
select (select count(*) from hv) as actual, 4 as expected
"""
    SqlProcessor(spark, etl, logger=lambda m: None).run()
    assert spark.table("hv_old").count() == 3


def test_hudi_timeline_step_function(spark, tmp_path):
    from easy_sql_spark.runtime.processor import SqlProcessor

    t = _mk_table(spark, tmp_path / "hudih")
    etl = f"""-- target=func.hudi_timeline_view({t}, htv)

-- target=check.three_instants
select (select count(*) from htv) as actual, 3 as expected
"""
    SqlProcessor(spark, etl, logger=lambda m: None).run()
    assert [r.action for r in spark.table("htv").collect()] == [
        "replacecommit", "commit", "commit",
    ]


# ---------------------------------------------------------------- export
def test_export_snapshot_to_hudi_roundtrip_incremental(spark, tmp_path):
    """Unpartitioned snapshot -> Hudi COW export: zero-copy hardlinks,
    incremental re-export (unchanged files keep their slice, dead
    fileIds die via replacecommit), and time travel across exported
    instants through read_hudi."""
    from easy_sql_spark.runtime.snapshots import SnapshotTable
    from easy_sql_spark.sources.hudi_meta import export_snapshot_to_hudi

    root = str(tmp_path / "snap")
    t = SnapshotTable(spark, root)
    t.create(spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string"))
    rep1 = export_snapshot_to_hudi(t)
    dest = rep1["dest"]
    assert rep1["adds"] >= 1 and rep1["removes"] == 0

    got1 = {(r.id, r.v) for r in read_hudi(spark, dest).collect()}
    assert got1 == {(1, "a"), (2, "b")}
    # zero copy: every exported base file is a hardlink (nlink > 1)
    base_files = [
        os.path.join(dest, n)
        for n in os.listdir(dest)
        if n.endswith(".parquet")
    ]
    assert base_files and all(os.stat(p).st_nlink > 1 for p in base_files)

    # v2: append -> incremental export adds only the new file
    t.append(spark.createDataFrame([(3, "c")], "id int, v string"))
    rep2 = export_snapshot_to_hudi(t)
    assert rep2["instant"] > rep1["instant"]
    assert rep2["removes"] == 0
    got2 = {(r.id, r.v) for r in read_hudi(spark, dest).collect()}
    assert got2 == {(1, "a"), (2, "b"), (3, "c")}
    # time travel to the first exported instant
    back = {(r.id, r.v)
            for r in read_hudi(spark, dest, as_of=rep1["instant"]).collect()}
    assert back == got1

    # v3: full overwrite -> dead fileIds leave via replacecommit
    t.overwrite(spark.createDataFrame([(9, "z")], "id int, v string"))
    rep3 = export_snapshot_to_hudi(t)
    assert rep3["removes"] >= 1
    assert {(r.id, r.v) for r in read_hudi(spark, dest).collect()} == {(9, "z")}
    assert {(r.id, r.v)
            for r in read_hudi(spark, dest, as_of=rep2["instant"]).collect()
            } == got2
    assert hudi_history(dest)[0]["action"] == "replacecommit"


def test_export_snapshot_to_hudi_partitioned_materialize(spark, tmp_path):
    """Partitioned snapshots refuse zero-copy (hive-layout files lack
    the partition column) and materialize on request: the exported base
    files physically carry the partition columns and read back exactly;
    re-export after a snapshot commit fully replaces."""
    from easy_sql_spark.runtime.snapshots import SnapshotTable
    from easy_sql_spark.sources.hudi_meta import export_snapshot_to_hudi

    root = str(tmp_path / "snap_p")
    t = SnapshotTable(spark, root)
    t.create(
        spark.createDataFrame(
            [(1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2")],
            "id int, v string, pt string",
        ),
        partition_by=["pt"],
    )
    with pytest.raises(ValueError, match="materialize"):
        export_snapshot_to_hudi(t)
    rep = export_snapshot_to_hudi(t, materialize=True)
    dest = rep["dest"]
    got = {(r.id, r.v, r.pt) for r in read_hudi(spark, dest).collect()}
    assert got == {(1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2")}
    # hive-style partition dirs with hudi-named files inside
    assert os.path.isdir(os.path.join(dest, "pt=p1"))

    t.overwrite_partitions(
        spark.createDataFrame([(5, "e", "p2")], "id int, v string, pt string")
    )
    rep2 = export_snapshot_to_hudi(t, materialize=True)
    assert rep2["removes"] >= 1
    got2 = {(r.id, r.v, r.pt) for r in read_hudi(spark, dest).collect()}
    assert got2 == {(1, "a", "p1"), (2, "b", "p1"), (5, "e", "p2")}
    # prior instant still reconstructs the old state
    assert {(r.id, r.v, r.pt)
            for r in read_hudi(spark, dest, as_of=rep["instant"]).collect()
            } == got


def test_export_snapshot_to_hudi_dvs_refuse_zero_copy_materialize_applies(
    spark, tmp_path
):
    """Live DVs refuse the ZERO-COPY export (base files would resurrect
    deleted rows; no record key -> no key-based translation) but export
    under materialize=True, whose rewrite reads through the DV-applying
    path — on unpartitioned AND partitioned tables."""
    from easy_sql_spark.runtime.snapshots import SnapshotTable
    from easy_sql_spark.sources.hudi_meta import export_snapshot_to_hudi

    root = str(tmp_path / "snap_dv")
    t = SnapshotTable(spark, root)
    t.create(spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string"))
    t.delete_where_dv([("id", "=", 1)])
    with pytest.raises(ValueError, match="materialize=True"):
        export_snapshot_to_hudi(t)
    rep = export_snapshot_to_hudi(t, materialize=True)
    got = {(r.id, r.v) for r in read_hudi(spark, rep["dest"]).collect()}
    assert got == {(2, "b")}

    root2 = str(tmp_path / "snap_dv_p")
    t2 = SnapshotTable(spark, root2)
    t2.create(
        spark.createDataFrame(
            [(1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2")],
            "id int, v string, pt string",
        ),
        partition_by=["pt"],
    )
    t2.delete_where_dv([("id", "<=", 2)])
    rep2 = export_snapshot_to_hudi(t2, materialize=True)
    got2 = {(r.id, r.v, r.pt) for r in read_hudi(spark, rep2["dest"]).collect()}
    assert got2 == {(3, "c", "p2")}
    assert got2 == {(r.id, r.v, r.pt) for r in t2.read().collect()}


def test_export_hudi_step_function(spark, tmp_path):
    from easy_sql_spark.runtime.processor import SqlProcessor

    root = str(tmp_path / "s")
    etl = f"""-- target=temp.seed
select 1 as id, 'a' as v union all select 2, 'b'

-- target=func.snapshot_commit({root}, seed, append)
-- target=func.snapshot_export_hudi({root})
-- target=func.hudi_view({root}/_hudi_export, via_hudi)

-- target=check.hudi_sees_snapshot
select (select count(*) from via_hudi) as actual, 2 as expected
"""
    SqlProcessor(spark, etl, logger=lambda m: None).run()
    assert {r.id for r in spark.table("via_hudi").collect()} == {1, 2}


def test_hudi_incremental_query_cow(spark, tmp_path):
    """Incremental query: rows written by commits in (from, to] — the
    003 rewrite of group f1 resolves to its FINAL rows only, untouched
    groups are pruned from the file list, and an empty change window
    returns an empty frame with the table schema."""
    from easy_sql_spark.sources.hudi_meta import read_hudi_incremental

    t = _mk_table(spark, tmp_path / "hinc")

    # (001, 003]: only the rewritten f1 slice, rows stamped 003
    inc = read_hudi_incremental(spark, t, "001", "003")
    got = {(r.id, r.val) for r in inc.collect()}
    assert got == {(1, "x2"), (2, "y2"), (9, "w")}
    # pruning: the scan lists ONLY f1's 003 base file
    files = inc.inputFiles()
    assert files and all("f1_" in os.path.basename(f) for f in files)

    # (003, latest]: only the replacecommit's new file f3
    got2 = {(r.id, r.val)
            for r in read_hudi_incremental(spark, t, "003").collect()}
    assert got2 == {(7, "c")}

    # empty window: no rows, schema intact
    empty = read_hudi_incremental(spark, t, "005")
    assert empty.count() == 0
    assert "id" in empty.columns and "val" in empty.columns

    # step-function surface
    from easy_sql_spark.runtime.processor import SqlProcessor

    etl = f"""-- target=func.hudi_incremental_view({t}, hinc_v, 001, 003)

-- target=check.incremental_rows
select (select count(*) from hinc_v) as actual, 3 as expected
"""
    SqlProcessor(spark, etl, logger=lambda m: None).run()
    assert {r.id for r in spark.table("hinc_v").collect()} == {1, 2, 9}


def test_hudi_incremental_query_mor(spark, tmp_path):
    """MOR incremental: delta events carry their own commit time, so an
    incremental pull over (from, to] returns exactly the post-merge
    rows written in the window — updates resolve to final state,
    deleted keys vanish, untouched base rows stay out."""
    from easy_sql_spark.sources.hudi_log import (
        write_data_block,
        write_delete_block,
    )
    from easy_sql_spark.sources.hudi_meta import read_hudi_incremental

    t = str(tmp_path / "mor_inc")
    _props(t, "MERGE_ON_READ")
    _mor_base_file(spark, t, "p=a", "f1", "001", [(1, "x"), (2, "y"), (3, "z")])
    _mor_base_file(spark, t, "p=b", "f2", "001", [(5, "q")])
    _instant(t, "001")
    payload = write_data_block(
        MOR_AVRO_SCHEMA, [_rec("002", 1, "x2"), _rec("002", 9, "new")], "002"
    ) + write_delete_block([("2", "p=a")], "003")
    _log_file(t, "p=a", "f1", "001", 1, payload)
    _instant(t, "002", "deltacommit")
    _instant(t, "003", "deltacommit")

    # (001, 003]: the update's final value and the insert; the deleted
    # key and untouched rows (3, 5) are absent
    got = {
        (r.id, r.val)
        for r in read_hudi_incremental(spark, t, "001").collect()
    }
    assert got == {(1, "x2"), (9, "new")}
    # (001, 002]: same rows (delete at 003 contributes no row)
    got2 = {
        (r.id, r.val)
        for r in read_hudi_incremental(spark, t, "001", "002").collect()
    }
    assert got2 == {(1, "x2"), (9, "new")}
    # untouched group f2 never enters the scan
    assert not any(
        "f2_" in os.path.basename(f)
        for f in read_hudi_incremental(spark, t, "001").inputFiles()
    )


def test_export_snapshot_to_hudi_mor_roundtrip(spark, tmp_path):
    """Unpartitioned snapshot -> Hudi MOR export: base files at the
    first instant (populated _hoodie meta columns, bucket-routed),
    incremental exports as LOG FILES only (delete block + data block
    per affected file group), layered log versions, time travel, and
    replay idempotence."""
    from easy_sql_spark.runtime.snapshots import SnapshotTable
    from easy_sql_spark.sources.hudi_meta import (
        HudiUnsupportedError,
        export_snapshot_to_hudi_mor,
    )

    root = str(tmp_path / "snap_mor")
    t = SnapshotTable(spark, root)
    t.create(
        spark.range(1, 21).selectExpr("id as k", "id * 10 as val")
    )
    rep1 = export_snapshot_to_hudi_mor(t, key_col="k", n_buckets=3)
    dest = rep1["dest"]
    assert rep1["mode"] == "base" and rep1["base_files"] >= 1
    base1 = {(r.k, r.val) for r in read_hudi(spark, dest).collect()}
    assert base1 == {(i, i * 10) for i in range(1, 21)}
    # meta columns are real (merge requires them)
    withmeta = read_hudi(spark, dest, keep_meta=True)
    assert "_hoodie_record_key" in withmeta.columns
    assert withmeta.where("_hoodie_record_key is null").count() == 0

    # v2: update 1-3, insert 100-101, delete 5-6 -> ONE delta export
    t.merge(
        spark.createDataFrame(
            [(1, 999), (2, 998), (3, 997), (100, 5), (101, 6)],
            "k long, val long",
        ),
        keys=["k"],
    )
    t.delete_where([("k", ">=", 5), ("k", "<=", 6)])
    rep2 = export_snapshot_to_hudi_mor(t, key_col="k", n_buckets=3)
    assert rep2["mode"] == "delta" and rep2["log_files"] >= 1
    # no new base file appeared
    n_base = len([n for n in os.listdir(dest) if n.endswith(".parquet")])
    assert n_base == rep1["base_files"]
    # hidden log naming is reader-discoverable
    logs = [n for n in os.listdir(dest) if ".log." in n]
    assert logs and all(n.startswith(".") for n in logs)

    got2 = {(r.k, r.val) for r in read_hudi(spark, dest).collect()}
    want2 = {(r.k, r.val) for r in t.read().collect()}
    assert got2 == want2
    # time travel back to the base instant
    back = {
        (r.k, r.val)
        for r in read_hudi(spark, dest, as_of=rep1["instant"]).collect()
    }
    assert back == base1

    # v3: second delta layer on the same groups (log version bumps)
    t.merge(
        spark.createDataFrame([(1, 1), (100, 2)], "k long, val long"),
        keys=["k"],
    )
    rep3 = export_snapshot_to_hudi_mor(t, key_col="k", n_buckets=3)
    assert rep3["mode"] == "delta"
    got3 = {(r.k, r.val) for r in read_hudi(spark, dest).collect()}
    assert got3 == {(r.k, r.val) for r in t.read().collect()}

    # replay with no new snapshot version is a no-op
    rep4 = export_snapshot_to_hudi_mor(t, key_col="k", n_buckets=3)
    assert rep4["mode"] == "noop"

    # partitioned snapshots refuse loudly
    tp = SnapshotTable(spark, str(tmp_path / "snap_mor_p"))
    tp.create(
        spark.createDataFrame([(1, "a", "p1")], "id int, v string, pt string"),
        partition_by=["pt"],
    )
    with pytest.raises(HudiUnsupportedError, match="unpartitioned"):
        export_snapshot_to_hudi_mor(tp, key_col="id")


def test_export_hudi_mor_step_function(spark, tmp_path):
    """func.snapshot_export_hudi_mor from the step language: base export
    + incremental log export + read-back through func.hudi_view."""
    from easy_sql_spark.runtime.processor import SqlProcessor

    root = str(tmp_path / "sm")
    etl = f"""-- target=temp.seed
select 1 as id, 'a' as v union all select 2, 'b'

-- target=func.snapshot_commit({root}, seed, append)
-- target=func.snapshot_export_hudi_mor({root}, , id)

-- target=temp.more
select 2 as id, 'B' as v union all select 3, 'c'

-- target=func.snapshot_merge({root}, more, id)
-- target=func.snapshot_export_hudi_mor({root}, , id)
-- target=func.hudi_view({root}/_hudi_mor_export, via_mor)

-- target=check.mor_sees_merged_state
select (select count(*) from via_mor) as actual, 3 as expected
"""
    SqlProcessor(spark, etl, logger=lambda m: None).run()
    assert {(r.id, r.v) for r in spark.table("via_mor").collect()} == {
        (1, "a"),
        (2, "B"),
        (3, "c"),
    }


@pytest.mark.parametrize("seed", _depth.seeds([7, 23]))
def test_export_snapshot_to_hudi_mor_random_walk(spark, tmp_path, seed):
    """Randomized op walk: a seeded sequence of merge/delete/append
    commits, exported after EVERY commit, must read back equal to the
    snapshot table at each step — and each exported instant must still
    time-travel to its own historical state at the end."""
    import random

    from easy_sql_spark.runtime.snapshots import SnapshotTable
    from easy_sql_spark.sources.hudi_meta import export_snapshot_to_hudi_mor

    rng = random.Random(seed)
    root = str(tmp_path / f"walk{seed}")
    t = SnapshotTable(spark, root)
    t.create(
        spark.createDataFrame(
            [(k, k * 100) for k in range(1, 31)], "k long, val long"
        )
    )
    reps = [export_snapshot_to_hudi_mor(t, key_col="k", n_buckets=3)]
    dest = reps[0]["dest"]
    expected = [{(k, k * 100) for k in range(1, 31)}]

    live = {k: k * 100 for k in range(1, 31)}
    next_key = 1000
    for _ in range(4):
        op = rng.choice(["merge_update", "merge_insert", "delete", "append"])
        if op == "merge_update" and live:
            ks = rng.sample(sorted(live), min(4, len(live)))
            rows = [(k, rng.randrange(10_000)) for k in ks]
            t.merge(spark.createDataFrame(rows, "k long, val long"), keys=["k"])
            live.update(dict(rows))
        elif op == "merge_insert":
            rows = [(next_key + i, rng.randrange(10_000)) for i in range(3)]
            next_key += 10
            t.merge(spark.createDataFrame(rows, "k long, val long"), keys=["k"])
            live.update(dict(rows))
        elif op == "delete" and len(live) > 5:
            lo = rng.choice(sorted(live)[:10])
            t.delete_where([("k", ">=", lo), ("k", "<=", lo + 2)])
            live = {k: v for k, v in live.items() if not (lo <= k <= lo + 2)}
        else:
            rows = [(next_key + i, rng.randrange(10_000)) for i in range(2)]
            next_key += 10
            t.append(spark.createDataFrame(rows, "k long, val long"))
            live.update(dict(rows))
        reps.append(export_snapshot_to_hudi_mor(t, key_col="k", n_buckets=3))
        expected.append(set(live.items()))
        got = {(r.k, r.val) for r in read_hudi(spark, dest).collect()}
        assert got == expected[-1], f"mismatch after {op}"

    # every exported instant still time-travels to its own state
    for rep, want in zip(reps, expected):
        back = {
            (r.k, r.val)
            for r in read_hudi(spark, dest, as_of=rep["instant"]).collect()
        }
        assert back == want, f"time travel to {rep['instant']} broken"


def test_export_hudi_mor_log_only_group(spark, tmp_path):
    """An incremental insert whose key hashes to a bucket that was EMPTY
    at base-export time creates a log-only file group (no base file) —
    the reader must surface it, and deletes against it must hold."""
    from easy_sql_spark.runtime.snapshots import SnapshotTable
    from easy_sql_spark.sources.hudi_meta import export_snapshot_to_hudi_mor

    root = str(tmp_path / "snap_lo")
    t = SnapshotTable(spark, root)
    # 2 seed keys over 16 buckets -> most buckets have no base file
    t.create(spark.createDataFrame([(1, 10), (2, 20)], "k long, val long"))
    rep1 = export_snapshot_to_hudi_mor(t, key_col="k", n_buckets=16)
    dest = rep1["dest"]

    # insert enough new keys that SOME land in base-less buckets
    rows = [(k, k * 7) for k in range(100, 130)]
    t.merge(spark.createDataFrame(rows, "k long, val long"), keys=["k"])
    rep2 = export_snapshot_to_hudi_mor(t, key_col="k", n_buckets=16)
    assert rep2["mode"] == "delta"
    n_base = len([n for n in os.listdir(dest) if n.endswith(".parquet")])
    n_logs = len([n for n in os.listdir(dest) if ".log." in n])
    assert n_logs > n_base, "expected log files in base-less buckets"

    got = {(r.k, r.val) for r in read_hudi(spark, dest).collect()}
    assert got == {(r.k, r.val) for r in t.read().collect()}

    # delete keys living ONLY in log-only groups; read must drop them
    t.delete_where([("k", ">=", 100), ("k", "<=", 110)])
    export_snapshot_to_hudi_mor(t, key_col="k", n_buckets=16)
    got = {(r.k, r.val) for r in read_hudi(spark, dest).collect()}
    assert got == {(r.k, r.val) for r in t.read().collect()}
    assert not any(100 <= k <= 110 for k, _ in got)


def test_export_mor_bucket_config_is_table_state(spark, tmp_path):
    """Incremental MOR exports take n_buckets/key_col from
    hoodie.properties (written at first export) — a fileId is
    md5(key) % n_buckets, so re-routing with different values would put
    log blocks in the wrong file groups.  Defaults resolve to the
    persisted values; explicit mismatches raise (ADVICE r7 #1)."""
    from easy_sql_spark.runtime.snapshots import SnapshotTable
    from easy_sql_spark.sources.hudi_meta import export_snapshot_to_hudi_mor

    root = str(tmp_path / "snap_cfg")
    t = SnapshotTable(spark, root)
    t.create(spark.range(1, 31).selectExpr("id as k", "id * 7 as val"))
    rep1 = export_snapshot_to_hudi_mor(t, key_col="k", n_buckets=8)
    dest = rep1["dest"]

    t.merge(
        spark.createDataFrame([(1, 0), (50, 1)], "k long, val long"),
        keys=["k"],
    )
    # defaulted call (the step-func shape) resolves from hoodie.properties
    rep2 = export_snapshot_to_hudi_mor(t)
    assert rep2["mode"] == "delta"
    got = {(r.k, r.val) for r in read_hudi(spark, dest).collect()}
    assert got == {(r.k, r.val) for r in t.read().collect()}
    # every log file anchors to a fileId in the 8-bucket space
    for n in os.listdir(dest):
        if ".log." in n:
            assert int(n.lstrip(".").split("_")[0].split("-")[1]) < 8

    t.merge(spark.createDataFrame([(2, 0)], "k long, val long"), keys=["k"])
    with pytest.raises(ValueError, match="persisted bucket count 8"):
        export_snapshot_to_hudi_mor(t, key_col="k", n_buckets=4)
    with pytest.raises(ValueError, match="persisted record key 'k'"):
        export_snapshot_to_hudi_mor(t, key_col="val", n_buckets=8)
    # matching explicit values still fine
    rep3 = export_snapshot_to_hudi_mor(t, key_col="k", n_buckets=8)
    assert rep3["mode"] == "delta"


def test_hudi_cdc_feed_drives_snapshot_apply_changes(spark, tmp_path):
    """End-to-end CDC consumption (the postgres-cdc shape over Hudi):
    func.hudi_cdc_view with key_field derivation feeds
    func.snapshot_apply_changes, and the mirror snapshot table
    converges to the Hudi table's own snapshot state."""
    from easy_sql_spark.runtime.processor import SqlProcessor
    from easy_sql_spark.runtime.snapshots import SnapshotTable
    from easy_sql_spark.sources.hudi_log import (
        write_cdc_data_block,
        write_data_block,
        write_delete_block,
    )
    from easy_sql_spark.sources.hudi_meta import read_hudi

    t = str(tmp_path / "cdc_apply")
    _props(t, "MERGE_ON_READ")
    base = [(1, "a"), (2, "b"), (3, "c")]
    _mor_base_file(spark, t, "", "f1", "001", base)
    _instant(t, "001", "commit")

    img = {
        "type": "record",
        "name": "img",
        "fields": [{"name": "id", "type": "long"},
                   {"name": "val", "type": ["null", "string"]}],
    }
    # 002: update id=1, insert id=9; 003: delete id=2
    data = write_data_block(
        MOR_AVRO_SCHEMA, [_rec("002", 1, "a2"), _rec("002", 9, "i9")], "002"
    ) + write_delete_block([("2", "")], "003")
    _log_file(t, "", "f1", "001", 1, data)
    cdc = write_cdc_data_block(
        [{"op": "u", "ts_ms": "002", "before": {"id": 1, "val": "a"},
          "after": {"id": 1, "val": "a2"}},
         {"op": "i", "ts_ms": "002", "before": None,
          "after": {"id": 9, "val": "i9"}}],
        "002", "data_before_after", img,
    ) + write_cdc_data_block(
        [{"op": "d", "ts_ms": "003", "before": {"id": 2, "val": "b"},
          "after": None}],
        "003", "data_before_after", img,
    )
    dest = os.path.join(t, ".f1_001.log.1_0-1-0-cdc")
    with open(dest, "wb") as f:
        f.write(cdc)
    _instant(t, "002", "deltacommit")
    _instant(t, "003", "deltacommit")

    mirror = str(tmp_path / "mirror")
    SnapshotTable(spark, mirror).create(
        spark.createDataFrame(base, "id long, val string")
    )
    examples = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "examples"
    )
    with open(os.path.join(examples, "hudi_cdc_mirror.sql")) as f:
        etl = f.read()
    SqlProcessor(
        spark, etl, logger=lambda m: None,
        variables={"hudi_table": t, "mirror": mirror, "from_instant": "001"},
    ).run()

    want = {(r.id, r.val) for r in read_hudi(spark, t).collect()}
    got = {
        (r.id, r.val) for r in SnapshotTable(spark, mirror).read().collect()
    }
    assert got == want == {(1, "a2"), (3, "c"), (9, "i9")}


def test_read_hudi_hfile_base_files_metadata_table_shape(spark, tmp_path):
    """HFile BASE files (r11) — the `.hoodie/metadata` file-group
    layout: base files named {fileId}_{token}_{instant}.hfile whose
    cells carry Avro datums of the writer schema stored in the file's
    'schema' file-info entry (HoodieAvroHFileWriter).  The payload
    schema nests a map of records (HoodieMetadataRecord shape), so this
    also pins the complex-type branch of _avro_to_spark."""
    import struct

    from easy_sql_spark.sources.avro_lite import encode_datum
    from easy_sql_spark.sources.hfile_lite import write_hfile
    from easy_sql_spark.sources.hudi_meta import read_hudi

    t = str(tmp_path / "mdt")
    os.makedirs(t + "/files")
    schema = {
        "type": "record",
        "name": "HoodieMetadataRecord",
        "fields": [
            {"name": "key", "type": "string"},
            {"name": "type", "type": "int"},
            {
                "name": "filesystemMetadata",
                "type": [
                    "null",
                    {
                        "type": "map",
                        "values": {
                            "type": "record",
                            "name": "HoodieMetadataFileInfo",
                            "fields": [
                                {"name": "size", "type": "long"},
                                {"name": "isDeleted", "type": "boolean"},
                            ],
                        },
                    },
                ],
            },
        ],
    }
    recs = [
        {"key": "p0", "type": 2,
         "filesystemMetadata": {"f1.parquet": {"size": 10, "isDeleted": False},
                                 "f2.parquet": {"size": 20, "isDeleted": True}}},
        {"key": "p1", "type": 2,
         "filesystemMetadata": {"f3.parquet": {"size": 30, "isDeleted": False}}},
        {"key": "__all_partitions__", "type": 1, "filesystemMetadata": None},
    ]
    pairs = sorted(
        (r["key"].encode(), encode_datum(schema, r)) for r in recs
    )
    blob = write_hfile(
        pairs,
        compression="gz",
        file_info_extra={b"schema": json.dumps(schema).encode()},
    )
    with open(f"{t}/files/files-0000_0-1-0_001.hfile", "wb") as fh:
        fh.write(blob)
    os.makedirs(f"{t}/.hoodie")
    with open(f"{t}/.hoodie/hoodie.properties", "w") as fh:
        fh.write("hoodie.table.name=mdt\nhoodie.table.type=MERGE_ON_READ\n")
    with open(f"{t}/.hoodie/001.deltacommit", "w") as fh:
        fh.write("{}")

    df = read_hudi(spark, t)
    rows = {r.key: r for r in df.collect()}
    assert set(rows) == {"p0", "p1", "__all_partitions__"}
    assert rows["p0"].filesystemMetadata["f1.parquet"].size == 10
    assert rows["p0"].filesystemMetadata["f2.parquet"].isDeleted is True
    assert rows["__all_partitions__"].filesystemMetadata is None


def test_read_hudi_hfile_base_with_log_merge(spark, tmp_path):
    """A MOR file slice whose BASE is an HFile and whose log carries an
    avro upsert + delete block: the merge semantics must be identical
    to a parquet-based slice (latest-wins by record key)."""
    from easy_sql_spark.sources.avro_lite import encode_datum
    from easy_sql_spark.sources.hfile_lite import write_hfile
    from easy_sql_spark.sources.hudi_log import (
        write_data_block,
        write_delete_block,
    )
    from easy_sql_spark.sources.hudi_meta import read_hudi

    t = str(tmp_path / "hfmor")
    os.makedirs(t)
    schema = {
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

    def rec(instant, k, v):
        return {
            "_hoodie_commit_time": instant,
            "_hoodie_record_key": str(k),
            "_hoodie_partition_path": "",
            "k": k,
            "v": v,
        }

    base_recs = [rec("001", k, f"b{k}") for k in range(5)]
    pairs = sorted(
        (r["_hoodie_record_key"].encode(), encode_datum(schema, r))
        for r in base_recs
    )
    blob = write_hfile(
        pairs, file_info_extra={b"schema": json.dumps(schema).encode()}
    )
    with open(f"{t}/f1_0-1-0_001.hfile", "wb") as fh:
        fh.write(blob)
    payload = write_data_block(
        schema, [rec("002", 1, "u1"), rec("002", 9, "i9")], "002"
    ) + write_delete_block([("0", "")], "003")
    with open(f"{t}/.f1_001.log.1_0-1-0", "wb") as fh:
        fh.write(payload)
    os.makedirs(f"{t}/.hoodie")
    with open(f"{t}/.hoodie/hoodie.properties", "w") as fh:
        fh.write("hoodie.table.name=hm\nhoodie.table.type=MERGE_ON_READ\n")
    for ins, act in (("001", "commit"), ("002", "deltacommit"),
                     ("003", "deltacommit")):
        with open(f"{t}/.hoodie/{ins}.{act}", "w") as fh:
            fh.write("{}")

    got = {(r.k, r.v) for r in read_hudi(spark, t).collect()}
    assert got == {(1, "u1"), (2, "b2"), (3, "b3"), (4, "b4"), (9, "i9")}
    at_001 = {(r.k, r.v) for r in read_hudi(spark, t, as_of="001").collect()}
    assert at_001 == {(k, f"b{k}") for k in range(5)}


def test_metadata_table_hfile_base_with_hfile_log_merge(spark, tmp_path):
    """The FULL metadata-table shape (r11 review finding): HFile BASE +
    HFILE log blocks whose records carry NO meta columns — the HFile
    ROW KEY is the record key on both sides (surfaced as
    _hoodie_record_key by the base frame and the block decode), so the
    latest-wins merge works on virtual-key tables."""
    from easy_sql_spark.sources.avro_lite import encode_datum
    from easy_sql_spark.sources.hfile_lite import write_hfile
    from easy_sql_spark.sources.hudi_log import write_hfile_data_block
    from easy_sql_spark.sources.hudi_meta import read_hudi

    t = str(tmp_path / "mdt2")
    os.makedirs(t)
    schema = {
        "type": "record",
        "name": "HoodieMetadataRecord",
        "fields": [
            {"name": "key", "type": "string"},
            {"name": "type", "type": "int"},
        ],
    }
    base_recs = [{"key": f"p{i}", "type": 1} for i in range(4)]
    pairs = sorted(
        (r["key"].encode(), encode_datum(schema, r)) for r in base_recs
    )
    with open(f"{t}/files-0000_0-1-0_001.hfile", "wb") as fh:
        fh.write(write_hfile(
            pairs, file_info_extra={b"schema": json.dumps(schema).encode()}
        ))
    # HFILE log block: update p1's type, insert p9 — keyed by row key
    ups = [{"key": "p1", "type": 2}, {"key": "p9", "type": 3}]
    with open(f"{t}/.files-0000_001.log.1_0-1-0", "wb") as fh:
        fh.write(write_hfile_data_block(schema, ups, "002"))
    os.makedirs(f"{t}/.hoodie")
    with open(f"{t}/.hoodie/hoodie.properties", "w") as fh:
        fh.write("hoodie.table.name=m2\nhoodie.table.type=MERGE_ON_READ\n")
    for ins, act in (("001", "commit"), ("002", "deltacommit")):
        with open(f"{t}/.hoodie/{ins}.{act}", "w") as fh:
            fh.write("{}")

    got = {(r.key, r.type) for r in read_hudi(spark, t).collect()}
    assert got == {("p0", 1), ("p1", 2), ("p2", 1), ("p3", 1), ("p9", 3)}
