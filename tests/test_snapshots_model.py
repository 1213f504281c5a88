"""Model-based randomized testing of the snapshot table: a seeded
sequence of append / overwrite / dynamic-overwrite / merge / delete /
rollback operations is mirrored against a plain in-memory model, and
after every step the table's read() must equal the model — plus every
historical version must still replay exactly (time travel is part of
the contract, so the model keeps its own history)."""

import random
import shutil

import pytest

import _depth

from easy_sql_spark.runtime.snapshots import SnapshotTable


@pytest.fixture()
def root(tmp_path):
    yield str(tmp_path / "model")
    shutil.rmtree(tmp_path, ignore_errors=True)


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, v, p) for i, v, p in rows], "id int, v int, p string"
    )


def _read(t, version=None):
    return {(r.id, r.v, r.p) for r in t.read(version=version).collect()}


@pytest.mark.parametrize("seed", _depth.seeds([11, 23, 47]))
def test_random_op_sequences_match_model(spark, root, seed):
    rng = random.Random(seed)
    t = SnapshotTable(spark, root + str(seed))
    model: dict[int, tuple[int, str]] = {}
    history: list[set] = []  # model state after each committed version

    def snap():
        history.append({(i, v, p) for i, (v, p) in model.items()})

    def fresh_rows(n, lo):
        return [
            (lo + i, rng.randrange(100), rng.choice("xyz")) for i in range(n)
        ]

    seed_rows = fresh_rows(6, 0)
    t.create(_mk(spark, seed_rows), partition_by=["p"])
    for i, v, p in seed_rows:
        model[i] = (v, p)
    snap()

    next_id = 100
    for step in range(10):
        op = rng.choice(["append", "overwrite_partitions", "merge",
                         "delete", "delete_dv", "rollback", "constraint"])
        if op == "append":
            rows = fresh_rows(rng.randrange(1, 4), next_id)
            next_id += 10
            t.append(_mk(spark, rows))
            for i, v, p in rows:
                model[i] = (v, p)
        elif op == "overwrite_partitions":
            part = rng.choice("xyz")
            rows = [(next_id + j, rng.randrange(100), part) for j in range(2)]
            next_id += 10
            t.overwrite_partitions(_mk(spark, rows))
            for i in [i for i, (_, p) in model.items() if p == part]:
                del model[i]
            for i, v, p in rows:
                model[i] = (v, p)
        elif op == "merge":
            # update one existing id (if any) + insert one new
            rows = []
            if model:
                upd = rng.choice(sorted(model))
                rows.append((upd, rng.randrange(100), model[upd][1]))
            rows.append((next_id, rng.randrange(100), rng.choice("xyz")))
            next_id += 10
            t.merge(_mk(spark, rows), keys=["id"])
            for i, v, p in rows:
                model[i] = (v, p)
        elif op == "delete":
            cut = rng.randrange(20, 90)
            t.delete_where([("v", "<", cut)])
            for i in [i for i, (v, _) in model.items() if v < cut]:
                del model[i]
        elif op == "delete_dv":
            # merge-on-read delete: same model semantics, DV mechanism
            cut = rng.randrange(20, 90)
            t.delete_where_dv([("v", ">=", cut)])
            for i in [i for i, (v, _) in model.items() if v >= cut]:
                del model[i]
        elif op == "constraint":
            # metadata-only commit interleaved with the data ops: state
            # is unchanged, version still advances (snap keeps indices
            # aligned for later rollbacks); "v >= 0" always holds for
            # generated data, so it validates and never rejects
            t.add_constraint(f"c{step}", "v >= 0")
        else:  # rollback to a random earlier version
            target = rng.randrange(1, len(history) + 1)
            t.rollback(target)
            model = {
                i: (v, p) for i, v, p in history[target - 1]
            }
        snap()
        assert _read(t) == history[-1], (seed, step, op)
        # metadata-only row count must track the model at every step
        assert t.row_count() == len(model), (seed, step, op)

    # the whole history is still time-travelable and exact
    for ver, want in enumerate(history, start=1):
        assert _read(t, version=ver) == want, (seed, ver)

    # the final state exports to BOTH open formats and reads back
    # byte-identical through their replay paths — whatever op sequence
    # the model produced (partition overwrites, merges, deletes,
    # rollbacks, constraint commits)
    from easy_sql_spark.sources.delta_log import export_snapshot_to_delta, read_delta
    from easy_sql_spark.sources.iceberg_meta import (
        export_snapshot_to_iceberg,
        read_iceberg,
    )

    if t.manifest(t.latest_version()).get("dvs"):
        # live deletion vectors export as REAL Delta DVs — the replay
        # must agree with the model BEFORE any materialization…
        export_snapshot_to_delta(t)
        assert {
            (r.id, r.v, r.p) for r in read_delta(spark, t.root).collect()
        } == history[-1], (seed, "delta export with live DVs")
        # …then compact (content unchanged — the model must still
        # match; partitioned iceberg DV export refuses by design) and
        # the next delta export exercises the DV-cleared re-add path
        t.compact()
        assert _read(t) == history[-1], (seed, "compact-applied DVs")
    export_snapshot_to_delta(t)
    export_snapshot_to_iceberg(t)
    want = history[-1]
    assert {
        (r.id, r.v, r.p) for r in read_delta(spark, t.root).collect()
    } == want, (seed, "delta export")
    assert {
        (r.id, r.v, r.p) for r in read_iceberg(spark, t.root).collect()
    } == want, (seed, "iceberg export")

    # shallow-clone the final state: same content, full independence
    c = t.clone_to(root + str(seed) + "_clone")
    assert _read(c) == history[-1]
    assert c.row_count() == len(model)
    c.append(_mk(spark, fresh_rows(2, next_id)))
    c.delete_where([("v", ">=", 0)])  # wipe the clone
    assert _read(c) == set()
    assert _read(t) == history[-1], "clone ops leaked into the source"
