"""The oracle comparator must itself detect mismatches — a silently
lenient comparator would green every query and void the whole gate."""

import duckdb
import pytest

from tools.check_queries import canon, check_one, oracle_connection


@pytest.fixture()
def con():
    c = duckdb.connect()
    yield c
    c.close()


def _fn(df):
    return lambda spark, sf_dir: df


def test_pass_on_identical(spark, con):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    status, _ = check_one(
        spark, con, "", "t", _fn(df), "SELECT 1 AS k, 'a' AS v UNION ALL SELECT 2, 'b'"
    )
    assert status == "pass"


def test_fail_on_value_difference(spark, con):
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    status, detail = check_one(
        spark, con, "", "t", _fn(df), "SELECT 1 AS k, 'X' AS v"
    )
    assert status == "fail" and "values differ" in detail


def test_fail_on_rowcount_difference(spark, con):
    df = spark.createDataFrame([(1,), (2,)], "k int")
    status, detail = check_one(spark, con, "", "t", _fn(df), "SELECT 1 AS k")
    assert status == "fail" and "rowcount" in detail


def test_fail_on_schema_difference(spark, con):
    df = spark.createDataFrame([(1,)], "k int")
    status, detail = check_one(
        spark, con, "", "t", _fn(df), "SELECT 1 AS wrong_name"
    )
    assert status == "fail" and "schema" in detail


def test_fail_on_spark_error_and_oracle_error(spark, con):
    def boom(spark, sf_dir):
        raise RuntimeError("query exploded")

    status, detail = check_one(spark, con, "", "t", boom, "SELECT 1")
    assert status == "fail" and "spark error" in detail

    df = spark.createDataFrame([(1,)], "k int")
    status, detail = check_one(spark, con, "", "t", _fn(df), "SELECT FROM nope")
    assert status == "fail" and "duckdb error" in detail


def test_fail_on_list_valued_output_column(spark, con):
    """Reproduce the r6 driver crash locally: a raw array<int> output
    column must FAIL the gate (the driver's pandas canonicalizer dies
    with `unhashable type: 'list'` before any comparison)."""
    df = spark.createDataFrame([(1, [1, 2, 3])], "k int, q array<int>")
    status, detail = check_one(
        spark, con, "", "t", _fn(df), "SELECT 1 AS k, [1,2,3] AS q"
    )
    assert status == "fail" and "non-atomic" in detail and "q" in detail

    # map and struct outputs die the same way
    df2 = spark.createDataFrame([(1, {"a": 1})], "k int, m map<string,int>")
    status, detail = check_one(spark, con, "", "t", _fn(df2), None)
    assert status == "fail" and "non-atomic" in detail


def test_rows_only_when_no_oracle(spark, con):
    df = spark.createDataFrame([(1,)], "k int")
    status, _ = check_one(spark, con, "", "t", _fn(df), None)
    assert status == "rows-only"


def test_canon_rows_order_insensitive_but_schema_position_strict():
    # values canonicalize identically regardless of row/column order...
    cols_a, rows_a = canon([(1, "x"), (2, "y")], ["k", "v"])
    cols_b, rows_b = canon([("y", 2), ("x", 1)], ["v", "k"])
    assert rows_a == rows_b
    # ...but the returned column list is ORDERED: emitting the right
    # columns in the wrong order must fail the schema compare (r3 advice)
    assert cols_a == ["k", "v"] and cols_b == ["v", "k"]
    assert cols_a != cols_b


def test_canon_distinguishes_null_nan_and_string():
    _, a = canon([(None,)], ["x"])
    _, b = canon([(float("nan"),)], ["x"])
    _, c = canon([("NULL",)], ["x"])
    assert len({a[0], b[0], c[0]}) == 3


def test_oracle_connection_registers_views(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        pq.write_table(pa.table({"a": [1]}), str(tmp_path / f"{t}.parquet"))
    c = oracle_connection(str(tmp_path))
    assert c.execute("SELECT a FROM lineitem").fetchall() == [(1,)]
    c.close()


def test_spark_round_emulation_matches_engine(spark):
    """tools/gen_independent_oracles.spark_round claims Spark's
    round(double, scale) semantics (HALF_UP over the shortest decimal
    representation, BigDecimal.valueOf). Cross-validate bit-for-bit
    against the engine over a wide deterministic sample — magnitudes
    from 1e-8 to 1e6, negatives, exact half-ties at each scale, and
    float32-originated values (the embedding path)."""
    import random
    import struct as st

    from pyspark.sql import functions as F

    from tools.gen_independent_oracles import spark_round

    rng = random.Random(7)
    vals = []
    for _ in range(1500):
        m = rng.choice([1e-8, 1e-4, 1e-2, 1.0, 1e2, 1e6])
        vals.append(rng.uniform(-m, m))
    # exact half-ties (representable ones round deterministically)
    vals += [1.5e-6, -1.5e-6, 0.0005, -0.0005, 2.5, -2.5, 1234.4995]
    # float32-originated doubles (embedding decode path)
    vals += [
        float(st.unpack("<f", st.pack("<f", rng.uniform(-2, 2)))[0])
        for _ in range(500)
    ]
    for scale in (3, 6):
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = [
            r.r for r in df.select(F.round("x", scale).alias("r")).collect()
        ]
        for v, g in zip(vals, got):
            e = spark_round(v, scale)
            assert (g == e) or (g != g and e != e), (v, scale, g, e)
