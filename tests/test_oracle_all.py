"""In-repo hard gate: EVERY ``queries()`` entry vs its DuckDB oracle.

The driver's correctness gate only ever checks the first 50 registry
entries (CORRECTNESS_r02.json is byte-identical to r01), so the repo
carries its own always-on signal for the full registry.  Runs at sf0.01 —
the same scale the driver uses — and fails on any schema / rowcount /
value mismatch.  Entries without an ``oracle_sql()`` twin (by design:
engine-specific sketches, media plumbing) are asserted rows-only: they
must at least execute and collect.
"""

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_every_query_matches_its_oracle(spark):
    from tools.check_queries import run_checks

    results = run_checks(spark, SF_DIR, verbose=False)
    assert results, "queries() registry is empty"

    fails = [(n, d) for n, s, d in results if s == "fail"]
    assert not fails, "oracle mismatches:\n" + "\n".join(
        f"  {n}: {d}" for n, d in fails
    )

    # the rows-only set must stay deliberate — a dropped oracle_sql entry
    # silently weakens the gate, so pin the expected exceptions
    rows_only = sorted(n for n, s, _ in results if s == "rows-only")
    import __spark_entry__ as se

    declared = sorted(set(se.queries()) - set(se.oracle_sql()))
    assert rows_only == declared


def test_registry_fully_oracle_backed():
    """r10 closed the last 3 ``no_oracle`` gaps (generated VALUES-literal
    oracles) — every registry entry must now carry oracle SQL.  Also
    catches a silent regression to the ``_oracle_literals`` ImportError
    bootstrap (oracle=None would drop entries from ORACLES)."""
    import __spark_entry__ as se

    missing = sorted(set(se.queries()) - set(se.oracle_sql()))
    assert missing == [], f"registry entries without oracle SQL: {missing}"
    for name in ("emb_pca_project", "text_bpe_merges", "text_bpe_token_count"):
        assert "VALUES" in se.oracle_sql()[name]
