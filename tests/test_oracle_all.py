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


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_generated_oracle_fingerprints_cover_current_testdata():
    """The generated VALUES oracles dispatch per scale factor on a
    corpus fingerprint; a REGENERATED testdata drop would miss every
    branch and fail the three entries with an opaque 0-row mismatch.
    Catch it here with the actionable message instead."""
    import re

    import duckdb

    from easy_sql_spark.queries import _oracle_literals as ol

    embedded = {
        int(x)
        for x in re.findall(r"\((\d{4,})[,)]", ol.BPE_MERGES_ORACLE)
    }
    for sf_dir in (
        "/root/testdata/sf0.001", SF_DIR, "/root/testdata/sf0.1"
    ):
        if not os.path.isdir(sf_dir):
            continue
        con = duckdb.connect()
        (fp,) = con.execute(
            "SELECT SUM(LENGTH(text)) FROM read_parquet(?)",
            [f"{sf_dir}/documents.parquet"],
        ).fetchone()
        con.close()
        assert int(fp) in embedded, (
            f"{sf_dir} fingerprint {fp} not covered by the generated "
            "oracle literals — testdata was regenerated; rerun "
            "`python tools/gen_independent_oracles.py --check`"
        )
