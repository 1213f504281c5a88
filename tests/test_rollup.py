"""Incremental rollup maintenance (operators/rollup.py): bootstrap,
delta catch-up incl. deletes and compaction, idempotence, and exact
agreement with a from-scratch recompute."""

import shutil

import pytest
from pyspark.sql import functions as F

from easy_sql_spark.operators.rollup import maintain_rollup
from easy_sql_spark.runtime.snapshots import SnapshotTable


@pytest.fixture()
def roots(tmp_path):
    yield str(tmp_path / "src"), str(tmp_path / "ru")
    shutil.rmtree(tmp_path, ignore_errors=True)


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, x long")


def _scratch(spark, src_root):
    t = SnapshotTable(spark, src_root)
    return {
        (r.g, r.sum_x, r.n)
        for r in t.read()
        .groupBy("g")
        .agg(F.sum("x").alias("sum_x"), F.count(F.lit(1)).alias("n"))
        .collect()
    }


def _state(spark, rollup_root):
    return {
        (r.g, r.sum_x, r.n)
        for r in SnapshotTable(spark, rollup_root).read()
        .where(F.col("n") > 0).collect()
    }


def test_rollup_bootstrap_delta_delete_compact(spark, roots):
    src_root, ru_root = roots
    src = SnapshotTable(spark, src_root)
    src.create(_df(spark, [("a", 1), ("a", 2), ("b", 10)]),
               stats_cols=["x"])

    r = maintain_rollup(spark, src_root, ru_root, ["g"], ["x"])
    assert r["mode"] == "bootstrap"
    assert _state(spark, ru_root) == _scratch(spark, src_root)

    # appends + a new group
    src.append(_df(spark, [("a", 4), ("c", 7)]))
    r = maintain_rollup(spark, src_root, ru_root, ["g"], ["x"])
    assert r["mode"] == "delta"
    assert _state(spark, ru_root) == _scratch(spark, src_root)

    # idempotent: nothing new
    assert maintain_rollup(spark, src_root, ru_root, ["g"], ["x"])["mode"] == "noop"

    # delete an entire group (b) and part of another: the rollup
    # decrements; b survives only as an n=0 row, filtered by consumers
    src.delete_where([("x", ">=", 7)])
    maintain_rollup(spark, src_root, ru_root, ["g"], ["x"])
    assert _state(spark, ru_root) == _scratch(spark, src_root)
    raw = {(r.g, r.n) for r in SnapshotTable(spark, ru_root).read().collect()}
    assert ("b", 0) in raw and ("c", 0) in raw

    # source compaction: identical rows rewritten, delta must be zero
    src.compact()
    src.append(_df(spark, [("d", 100)]))
    maintain_rollup(spark, src_root, ru_root, ["g"], ["x"])
    assert _state(spark, ru_root) == _scratch(spark, src_root)


def test_rollup_refuses_foreign_table(spark, roots):
    src_root, ru_root = roots
    SnapshotTable(spark, src_root).create(_df(spark, [("a", 1)]))
    # a rollup root that exists but has no bookmark
    SnapshotTable(spark, ru_root).create(_df(spark, [("z", 9)]))
    with pytest.raises(ValueError, match="bookmark"):
        maintain_rollup(spark, src_root, ru_root, ["g"], ["x"])
