"""The local gate must see DuckDB results with the DRIVER's dtypes.

r7 shipped local-green/driver-red on ``snapshot_dv_delete``: the gate
fetched via ``fetchall()`` (HUGEINT -> Python int -> "1956150", matches
Spark) while the driver canonicalizes via ``fetchdf()`` (HUGEINT ->
float64 -> "1956150.0", hash mismatch).  These tests pin the fix
(VERDICT r7 ask #2): the gate fetches through pandas, and a registry
lint rejects any oracle whose bound schema contains HUGEINT/UHUGEINT —
no Spark session required, so the class is checked on every fast run.
"""

import duckdb
import pytest

from tools.check_queries import (
    canon,
    lint_oracle_types,
    oracle_rows_via_pandas,
)

# the r7-red shape: leg 1 casts SUM to BIGINT, leg 2 doesn't -> DuckDB
# widens the unioned column to HUGEINT
UNCAST_UNION = """
    SELECT stage, n FROM (
        SELECT 'a' AS stage, CAST(SUM(x) AS BIGINT) AS n FROM t
        UNION ALL SELECT 'b', SUM(x) FROM t
    ) ORDER BY stage
"""


@pytest.fixture()
def con():
    c = duckdb.connect()
    c.execute("CREATE TABLE t AS SELECT range AS x FROM range(1, 2001)")
    yield c
    c.close()


def test_lint_flags_hugeint_oracle(con):
    bad = lint_oracle_types(con, {"q": UNCAST_UNION})
    assert bad == [("q", ["n HUGEINT"])]


def test_lint_passes_cast_oracle(con):
    fixed = UNCAST_UNION.replace(
        "SELECT stage, n FROM", "SELECT stage, CAST(n AS BIGINT) AS n FROM"
    )
    assert lint_oracle_types(con, {"q": fixed}) == []
    # and the pandas fetch renders integers, matching Spark's bigint
    cols, rows = oracle_rows_via_pandas(con.execute(fixed))
    assert canon(rows, cols)[1] == [("2001000", "a"), ("2001000", "b")]


def test_pandas_fetch_reproduces_the_driver_red(con):
    """fetchdf renders the HUGEINT column float64 -> '...0' strings —
    exactly the driver-side mismatch fetchall() used to hide."""
    cols, rows = oracle_rows_via_pandas(con.execute(UNCAST_UNION))
    _, vals = canon(rows, cols)
    assert vals == [("2001000.0", "a"), ("2001000.0", "b")]
    # the old fetch path hides it (documents WHY fetchdf is load-bearing)
    raw = con.execute(UNCAST_UNION).fetchall()
    _, old_vals = canon([tuple(r) for r in raw], ["stage", "n"])
    assert old_vals == [("2001000", "a"), ("2001000", "b")]


def test_registry_oracles_pass_the_lint():
    """No registered oracle may emit HUGEINT/UHUGEINT (binding only —
    zero execution, zero Spark)."""
    import __spark_entry__ as se
    from tools.check_queries import oracle_connection

    c = oracle_connection("/root/testdata/sf0.001")
    try:
        assert lint_oracle_types(c, se.oracle_sql()) == []
    finally:
        c.close()


def test_null_and_nat_canonicalization():
    """pandas object-NULLs (None) and NaT both canonicalize as NULL, the
    way the driver's pandas path treats missing cells."""
    c = duckdb.connect()
    try:
        cols, rows = oracle_rows_via_pandas(
            c.execute(
                "SELECT CAST(NULL AS VARCHAR) AS s, "
                "CAST(NULL AS TIMESTAMP) AS ts, 1 AS k"
            )
        )
        _, vals = canon(rows, cols)
        assert vals == [("1", "\x00NULL", "\x00NULL")]
    finally:
        c.close()
