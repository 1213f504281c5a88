"""Hudi COW reader (sources/hudi_meta.py): tables constructed to the
open layout — .hoodie timeline instants, base files named
fileId_writeToken_instant.parquet, replacecommit metadata."""

import json
import os

import pytest

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


def test_hudi_refuses_merge_on_read(spark, tmp_path):
    t = str(tmp_path / "mor")
    _props(t, "MERGE_ON_READ")
    _base_file(spark, t, "p=a", "f1", "001", [(1, "x")])
    _instant(t, "001")
    with pytest.raises(HudiUnsupportedError, match="MERGE_ON_READ"):
        read_hudi(spark, t)

    t2 = str(tmp_path / "mor2")
    _props(t2)
    _base_file(spark, t2, "p=a", "f1", "001", [(1, "x")])
    _instant(t2, "001", "deltacommit")
    with pytest.raises(HudiUnsupportedError, match="MERGE_ON_READ"):
        read_hudi(spark, t2)


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
