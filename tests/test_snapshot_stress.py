"""Hot-session stress for the snapshot lifecycle queries.

Round-5 driver artifact showed ``snapshot_dv_delete`` red (hash
mismatch, rows/schema green) while the same query passed locally — an
environment-order-dependent failure.  The suspected mechanism: the
queries assumed ``create()`` lands at version 1; a commit retry/rebase
inside ``_commit_loop`` shifts the numbering and a literal
``read(version=1)`` silently reads the wrong state.  The queries now
capture the version each commit RETURNS; this module pins that under
stress:

* every lifecycle query repeated many times in ONE hot session must
  produce byte-identical results (no run-order dependence), and
* a simulated lost commit race on ``create`` (a concurrent no-op
  manifest steals version 1, forcing the rebase path) must leave every
  query's result unchanged — the exact failure signature the driver
  observed (same row count, different sums) now cannot recur.
"""

from __future__ import annotations

import pytest

import _depth

from easy_sql_spark.queries import QUERIES
from easy_sql_spark.runtime.snapshots import SnapshotTable

SF_DIR = "/root/testdata/sf0.001"

LIFECYCLE = [
    "snapshot_dv_delete",
    "snapshot_time_travel",
    "snapshot_merge_delete",
    "snapshot_change_feed",
    "snapshot_branch_lifecycle",
]


def _rows(df):
    return [tuple(r) for r in df.collect()]


@pytest.fixture()
def steal_first_version(monkeypatch):
    """Make the FIRST data commit of every new snapshot table lose its
    commit race: a concurrent no-op manifest lands at version 1 first,
    so ``_commit_loop`` rebases and the table's real seed lands at
    version 2 — shifting ALL subsequent version numbers by one, exactly
    the nondeterminism conjectured behind the round-5 driver red."""
    real = SnapshotTable._try_commit
    injected: set[str] = set()

    def patched(self, manifest):
        if (
            manifest["version"] == 1
            and manifest.get("operation") == "overwrite"
            and self.root not in injected
        ):
            injected.add(self.root)
            fake = dict(manifest)
            fake.update(operation="concurrent_noop", live=[], added=[], removed=[])
            assert real(self, fake)
            return False  # our attempt "lost"; the loop rebases
        return real(self, manifest)

    monkeypatch.setattr(SnapshotTable, "_try_commit", patched)
    yield injected


@pytest.mark.parametrize("name", LIFECYCLE)
def test_lifecycle_survives_commit_rebase(spark, name, steal_first_version):
    q = QUERIES[name]
    want = _rows(q(spark, SF_DIR))  # baseline ALSO under injection:
    assert steal_first_version  # the fixture actually fired
    # …and identical to a clean run (computed by the repeat test below
    # via the shared session) — here pin self-consistency under rebase
    again = _rows(q(spark, SF_DIR))
    assert again == want, f"{name} unstable under version-shifted commits"


@pytest.mark.parametrize(
    "name,repeats",
    [("snapshot_dv_delete", _depth.repeats(20, 5))]
    + [(n, _depth.repeats(5, 2)) for n in LIFECYCLE[1:]],
)
def test_lifecycle_hot_session_repeats(spark, name, repeats):
    q = QUERIES[name]
    want = _rows(q(spark, SF_DIR))
    for i in range(repeats - 1):
        got = _rows(q(spark, SF_DIR))
        assert got == want, f"{name} diverged on hot-session run {i + 2}"


def test_rebase_matches_clean_run(spark, monkeypatch):
    """The version-shifted run of the driver's red query must equal the
    clean run bit-for-bit (count AND sums — the r5 failure signature was
    equal counts with different sums)."""
    q = QUERIES["snapshot_dv_delete"]
    clean = _rows(q(spark, SF_DIR))

    real = SnapshotTable._try_commit
    injected: set[str] = set()

    def patched(self, manifest):
        if (
            manifest["version"] == 1
            and manifest.get("operation") == "overwrite"
            and self.root not in injected
        ):
            injected.add(self.root)
            fake = dict(manifest)
            fake.update(operation="concurrent_noop", live=[], added=[], removed=[])
            assert real(self, fake)
            return False
        return real(self, manifest)

    monkeypatch.setattr(SnapshotTable, "_try_commit", patched)
    shifted = _rows(q(spark, SF_DIR))
    assert injected, "injection never fired"
    assert shifted == clean
