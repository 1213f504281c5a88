"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir; compares row count, sorted column names, and
order-insensitive stringified values.  Importable (``run_checks``) so the
test suite can enforce the full-registry gate — the driver-side file only
ever covers the first 50 entries.  Usage:

    python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def nonatomic_columns(schema):
    """Top-level Array/Map/Struct columns in a Spark schema.

    The driver's canonicalizer (pandas ``sort_values`` over raw cells)
    crashes on them, so the registry contract is: every query's FINAL
    schema is atomic — flatten collections with ``array_join`` etc."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def canon(rows, cols):
    """Stringify values in name-sorted column order (matching the driver's
    hash), sort rows — but return the ORDERED column list so the schema
    compare is position-strict: a query emitting the right columns in the
    wrong order fails here even though the value hash would still match."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(_s(row[i]) for i in order))
    out.sort()
    return list(cols), out


def _s(v):
    import datetime
    import math

    # \x00 sentinels: a data string can never collide with NULL/NaN markers
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NaN"
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        # pd.NaT is a datetime subclass whose isoformat() is "NaT";
        # canonicalize it as NULL like the driver's pandas path does
        if v != v:
            return "\x00NULL"
        return v.isoformat()
    return str(v)


def oracle_rows_via_pandas(res):
    """Fetch a DuckDB result THROUGH PANDAS — the driver's fetch path.

    r7 shipped local-green/driver-red on ``snapshot_dv_delete`` because
    this gate fetched via ``fetchall()`` (HUGEINT -> Python int ->
    ``"1956150"``, matches Spark) while the driver canonicalizes via
    ``fetchdf()`` (HUGEINT -> float64 -> ``"1956150.0"``, mismatch).
    Fetching through pandas here makes the local gate dtype-faithful to
    the driver, so oracle typing bugs fail locally first (VERDICT r7 #2).
    """
    pdf = res.fetchdf()
    cols = list(pdf.columns)
    rows = []
    for tup in pdf.itertuples(index=False, name=None):
        rows.append(tuple(_scalar(v) for v in tup))
    return cols, rows


def _scalar(v):
    """Unwrap numpy/pandas scalars to plain Python the way pandas repr
    does for the driver: numpy floats are float subclasses already;
    numpy ints/bools stringify identically to Python's."""
    import numpy as np

    if isinstance(v, np.generic):
        return v.item()
    return v


BANNED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT")


def lint_oracle_types(con, oracles):
    """Registry lint: no oracle may emit HUGEINT/UHUGEINT columns.

    DuckDB widens uncast integer SUM()s (and UNION legs) to HUGEINT,
    which pandas renders as float64 — guaranteed driver hash mismatch
    against Spark's bigint even when values are identical.  Binding via
    ``con.sql(...)`` is lazy, so this costs no execution.  Returns a
    list of ``(name, [bad 'col TYPE' strings])`` offenders.
    """
    bad = []
    for name, sql in oracles.items():
        if sql is None:
            continue
        rel = con.sql(sql)
        offend = [
            f"{c} {t}"
            for c, t in zip(rel.columns, [str(t).upper() for t in rel.types])
            if any(b in t for b in BANNED_ORACLE_TYPES)
        ]
        if offend:
            bad.append((name, offend))
    return bad


def oracle_connection(sf_dir):
    """DuckDB connection with the standard tables registered as views."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def check_one(spark, con, sf_dir, name, fn, oracle):
    """Compare one query against its oracle.

    Returns ``(status, detail)`` where status is "pass", "fail", or
    "rows-only" (no oracle declared — count-only signal).
    """
    t0 = time.time()
    try:
        df = fn(spark, sf_dir)
        bad = nonatomic_columns(df.schema)
        if bad:
            # the DRIVER's canonicalizer sorts result cells with pandas and
            # dies on list/map/struct values (CORRECTNESS_r06:
            # `unhashable type: 'list'`) — fail here the way it fails there
            return "fail", (
                f"non-atomic output column(s) {bad}: driver canonicalizer "
                "crashes on list/map/struct cells — flatten with array_join "
                "(registry convention, see f6_array)"
            )
        # canonicalize the SPARK side through pandas too — the driver
        # does (proof: j8_nullsafe/w2_analytic/scd2_history_merge emit
        # nullable-int columns that pandas renders float64/NaN; they are
        # driver-GREEN, which is only possible if both sides take the
        # same pandas dtype path)
        spdf = df.toPandas()
        scols = list(spdf.columns)
        srows = [
            tuple(_scalar(v) for v in t)
            for t in spdf.itertuples(index=False, name=None)
        ]
    except Exception as e:
        return "fail", f"spark error: {e}"
    dt = time.time() - t0
    if oracle is None:
        return "rows-only", f"{len(srows)} rows ({dt:.1f}s)"
    try:
        res = con.execute(oracle)
        dcols, drows = oracle_rows_via_pandas(res)
    except Exception as e:
        return "fail", f"duckdb error: {e}"
    sc, sv = canon(srows, scols)
    dc, dv = canon(drows, dcols)
    if sc != dc:
        return "fail", f"schema {sc} != {dc}"
    if len(sv) != len(dv):
        return "fail", f"rowcount {len(sv)} != {len(dv)}"
    if sv != dv:
        diffs = [(a, b) for a, b in zip(sv, dv) if a != b][:3]
        return "fail", f"values differ; first diffs: {diffs}"
    return "pass", f"{len(sv)} rows ({dt:.1f}s)"


def run_checks(spark, sf_dir, only=None, verbose=True):
    """Run the oracle comparison over all ``queries()`` entries.

    Returns a list of ``(name, status, detail)`` triples covering every
    entry (filtered by ``only`` when given).
    """
    import __spark_entry__ as se

    con = oracle_connection(sf_dir)
    qs, oracles = se.queries(), se.oracle_sql()
    results = []
    for name, offend in lint_oracle_types(con, oracles):
        if only and name not in only:
            continue
        results.append(
            (name, "fail", f"oracle emits banned type(s): {offend} "
             "(pandas renders HUGEINT as float64 -> driver hash mismatch; "
             "CAST the outer select)")
        )
        if verbose:
            print(f"FAIL {name}: {results[-1][2]}")
    linted_bad = {n for n, s, _ in results if s == "fail"}
    for name, fn in qs.items():
        if (only and name not in only) or name in linted_bad:
            continue
        status, detail = check_one(spark, con, sf_dir, name, fn, oracles.get(name))
        results.append((name, status, detail))
        if verbose:
            tag = {"pass": "PASS", "fail": "FAIL", "rows-only": "rows-only"}[status]
            print(f"{tag} {name}: {detail}")
    con.close()
    return results


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from easy_sql_spark.session import build_session

    spark = build_session("check_queries")
    results = run_checks(spark, sf_dir, only=only or None)
    n_pass = sum(1 for _, s, _ in results if s == "pass")
    n_fail = sum(1 for _, s, _ in results if s == "fail")
    n_rows_only = sum(1 for _, s, _ in results if s == "rows-only")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
