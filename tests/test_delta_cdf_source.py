"""Streaming Delta CDF source (streaming/delta_cdf_source.py): commit
versions as offsets, one partition per changed file, executor-side
pyarrow reads with column-mapping + partition constants, cdc-action
authority, loud refusals (DV-without-cdc, schema change, vacuumed
removes), checkpointed resume."""

import json
import os

from easy_sql_spark.streaming.delta_cdf_source import (
    DeltaChangeFeedDataSource,
)

SCHEMA_STR = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "val", "type": "string", "nullable": True,
             "metadata": {}},
            {"name": "p", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    }
)


def _write_data(spark, table, rel, rows, schema="id long, val string"):
    df = spark.createDataFrame(rows, schema)
    tmp = os.path.join(table, "_tmp")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(n for n in os.listdir(tmp) if n.endswith(".parquet"))
    dest = os.path.join(table, rel)
    os.makedirs(os.path.dirname(dest) or table, exist_ok=True)
    os.replace(os.path.join(tmp, part), dest)
    import shutil

    shutil.rmtree(tmp)


def _commit(table, version, actions):
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _meta():
    return {
        "metaData": {
            "id": "t",
            "schemaString": SCHEMA_STR,
            "partitionColumns": ["p"],
            "format": {"provider": "parquet"},
        }
    }


def _drain(spark, root, out, ckpt, starting_version=None, extra=None):
    reader = spark.readStream.format("delta_cdf").option("path", root)
    if starting_version is not None:
        reader = reader.option("starting_version", str(starting_version))
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
        (r.id, r.val, r.p, r._change_type, r._commit_version)
        for r in spark.read.parquet(str(out)).collect()
    }


def test_delta_cdf_add_remove_and_resume(spark, tmp_path):
    spark.dataSource.register(DeltaChangeFeedDataSource)
    t = str(tmp_path / "dt")
    _write_data(spark, t, "f-a1.parquet", [(1, "x"), (2, "y")])
    _write_data(spark, t, "f-b1.parquet", [(3, "z")])
    _commit(t, 0, [
        {"commitInfo": {"operation": "WRITE", "timestamp": 1000}},
        _meta(),
        {"add": {"path": "f-a1.parquet", "partitionValues": {"p": "a"},
                 "size": 1, "modificationTime": 1, "dataChange": True}},
    ])
    _commit(t, 1, [
        {"commitInfo": {"operation": "WRITE", "timestamp": 2000}},
        {"add": {"path": "f-b1.parquet", "partitionValues": {"p": "b"},
                 "size": 1, "modificationTime": 1, "dataChange": True}},
    ])

    out, ckpt = tmp_path / "o", tmp_path / "c"
    _drain(spark, t, out, ckpt, starting_version=0)
    assert _rows(spark, out) == {(3, "z", "b", "insert", 1)}

    # v2 removes the p=a file -> delete rows; checkpointed resume
    _commit(t, 2, [
        {"commitInfo": {"operation": "DELETE", "timestamp": 3000}},
        {"remove": {"path": "f-a1.parquet",
                    "partitionValues": {"p": "a"}, "dataChange": True}},
    ])
    _drain(spark, t, out, ckpt)
    got = _rows(spark, out)
    assert (1, "x", "a", "delete", 2) in got and (2, "y", "a", "delete", 2) in got
    assert len(got) == 3  # no re-delivery of v1

    # _commit_timestamp rides through
    ts = {
        (r._commit_version, r._commit_timestamp)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert ts == {(1, 2000), (2, 3000)}


def test_delta_cdf_cdc_actions_authoritative(spark, tmp_path):
    spark.dataSource.register(DeltaChangeFeedDataSource)
    t = str(tmp_path / "dtc")
    _write_data(spark, t, "f1.parquet", [(1, "x")])
    _commit(t, 0, [
        {"commitInfo": {"operation": "WRITE", "timestamp": 1000}},
        _meta(),
        {"add": {"path": "f1.parquet", "partitionValues": {"p": "a"},
                 "size": 1, "modificationTime": 1, "dataChange": True}},
    ])
    # v1: an UPDATE with cdc actions — the cdc file carries _change_type
    # physically; the add/remove in the same commit must be ignored
    _write_data(
        spark, t, "_change_data/c1.parquet",
        [(1, "x", "update_preimage"), (1, "x2", "update_postimage")],
        schema="id long, val string, _change_type string",
    )
    _write_data(spark, t, "f2.parquet", [(1, "x2")])
    _commit(t, 1, [
        {"commitInfo": {"operation": "UPDATE", "timestamp": 2000}},
        {"cdc": {"path": "_change_data/c1.parquet",
                 "partitionValues": {"p": "a"}, "size": 1,
                 "dataChange": False}},
        {"remove": {"path": "f1.parquet",
                    "partitionValues": {"p": "a"}, "dataChange": True}},
        {"add": {"path": "f2.parquet", "partitionValues": {"p": "a"},
                 "size": 1, "modificationTime": 1, "dataChange": True}},
    ])
    out, ckpt = tmp_path / "o", tmp_path / "c"
    _drain(spark, t, out, ckpt, starting_version=0)
    assert _rows(spark, out) == {
        (1, "x", "a", "update_preimage", 1),
        (1, "x2", "a", "update_postimage", 1),
    }


def test_delta_cdf_refusals(spark, tmp_path):
    import pytest
    from pyspark.sql.utils import StreamingQueryException

    spark.dataSource.register(DeltaChangeFeedDataSource)
    t = str(tmp_path / "dtr")
    _write_data(spark, t, "f1.parquet", [(1, "x")])
    _commit(t, 0, [
        {"commitInfo": {"operation": "WRITE", "timestamp": 1000}},
        _meta(),
        {"add": {"path": "f1.parquet", "partitionValues": {"p": "a"},
                 "size": 1, "modificationTime": 1, "dataChange": True}},
    ])
    # DV-carrying add without cdc -> the stream must FAIL, not shrink
    _write_data(spark, t, "f2.parquet", [(1, "x")])
    _commit(t, 1, [
        {"commitInfo": {"operation": "DELETE", "timestamp": 2000}},
        {"add": {"path": "f2.parquet", "partitionValues": {"p": "a"},
                 "size": 1, "modificationTime": 1, "dataChange": True,
                 "deletionVector": {"storageType": "u", "pathOrInlineDv":
                                    "x", "offset": 1, "sizeInBytes": 1,
                                    "cardinality": 1}}},
    ])
    out, ckpt = tmp_path / "o", tmp_path / "c"
    with pytest.raises(Exception, match="deletion vector|DV|cdc"):
        _drain(spark, t, out, ckpt, starting_version=0)


def test_delta_cdf_bounded_backlog_across_restarts(spark, tmp_path):
    spark.dataSource.register(DeltaChangeFeedDataSource)
    t = str(tmp_path / "dtb")
    _commit(t, 0, [
        {"commitInfo": {"operation": "WRITE", "timestamp": 1000}},
        _meta(),
    ])
    for v in range(1, 7):
        _write_data(spark, t, f"f{v}.parquet", [(v, f"v{v}")])
        _commit(t, v, [
            {"commitInfo": {"operation": "WRITE",
                            "timestamp": 1000 + v}},
            {"add": {"path": f"f{v}.parquet",
                     "partitionValues": {"p": "a"}, "size": 1,
                     "modificationTime": 1, "dataChange": True}},
        ])
    out, ckpt = tmp_path / "o", tmp_path / "c"
    # 6 commits of backlog at 2/batch, one batch per availableNow run:
    # every checkpointed restart must advance (restart-safe bounding)
    for hi in (2, 4, 6):
        _drain(spark, t, out, ckpt, starting_version=0,
               extra={"max_versions_per_batch": "2"})
        got = {r.id for r in spark.read.parquet(str(out)).collect()}
        assert got == set(range(1, hi + 1))


def test_delta_cdf_remove_without_partition_values(spark, tmp_path):
    """A `remove` written without extendedFileMetadata (legal per the
    Delta protocol) carries no partitionValues: hive-style paths must
    recover them; a flat path must refuse loudly, never stream NULLs."""
    import pytest

    spark.dataSource.register(DeltaChangeFeedDataSource)
    t = str(tmp_path / "dtp")
    _write_data(spark, t, "p=a%20b/f1.parquet", [(1, "x")])
    _commit(t, 0, [
        {"commitInfo": {"operation": "WRITE", "timestamp": 1000}},
        _meta(),
        {"add": {"path": "p=a%20b/f1.parquet",
                 "partitionValues": {"p": "a b"}, "size": 1,
                 "modificationTime": 1, "dataChange": True}},
    ])
    # bare remove: no partitionValues at all — recovered from the path
    # (including the unescape: %20 -> space)
    _commit(t, 1, [
        {"commitInfo": {"operation": "DELETE", "timestamp": 2000}},
        {"remove": {"path": "p=a%20b/f1.parquet", "dataChange": True}},
    ])
    out, ckpt = tmp_path / "o", tmp_path / "c"
    _drain(spark, t, out, ckpt, starting_version=0)
    assert _rows(spark, out) == {(1, "x", "a b", "delete", 1)}

    # flat-path remove on a partitioned table: loud refusal
    t2 = str(tmp_path / "dtp2")
    _write_data(spark, t2, "f1.parquet", [(1, "x")])
    _commit(t2, 0, [
        {"commitInfo": {"operation": "WRITE", "timestamp": 1000}},
        _meta(),
        {"add": {"path": "f1.parquet", "partitionValues": {"p": "a"},
                 "size": 1, "modificationTime": 1, "dataChange": True}},
    ])
    _commit(t2, 1, [
        {"commitInfo": {"operation": "DELETE", "timestamp": 2000}},
        {"remove": {"path": "f1.parquet", "dataChange": True}},
    ])
    out2, ckpt2 = tmp_path / "o2", tmp_path / "c2"
    with pytest.raises(Exception, match="partitionValues"):
        _drain(spark, t2, out2, ckpt2, starting_version=0)


def test_delta_cdf_add_without_partition_values_refuses(spark, tmp_path):
    """An `add` (or cdc) action on a partitioned table MUST carry
    partitionValues per the Delta protocol — only a bare `remove`
    without extendedFileMetadata may omit them.  Recovering an add's
    values from the path would silently mask a malformed writer, so
    the source refuses loudly instead (ADVICE r12)."""
    import pytest

    spark.dataSource.register(DeltaChangeFeedDataSource)
    t = str(tmp_path / "dta")
    # hive-style path, so path recovery WOULD succeed if attempted —
    # the refusal must fire on the action kind, not on path shape
    _write_data(spark, t, "p=a/f1.parquet", [(1, "x")])
    _commit(t, 0, [
        {"commitInfo": {"operation": "CREATE", "timestamp": 500}},
        _meta(),
    ])
    _commit(t, 1, [
        {"commitInfo": {"operation": "WRITE", "timestamp": 1000}},
        {"add": {"path": "p=a/f1.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 1, "dataChange": True}},
    ])
    out, ckpt = tmp_path / "o", tmp_path / "c"
    with pytest.raises(Exception, match="malformed writer"):
        _drain(spark, t, out, ckpt, starting_version=0)
