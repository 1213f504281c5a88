"""Accuracy bounds for the approximate operators (sketches, ANN).

The DuckDB gate can't check these (engine-specific estimators), so bound
them against exact computations instead: the HLL distinct sketch against
the true count, and the two bucketed ANN paths against brute-force
recall@k.  Thresholds are regression floors calibrated on the synthetic
fixtures — embeddings are UNIFORM random vectors, where any partitioned
ANN's expected recall is roughly the fraction of the space probed
(IVF nprobe/ncells ≈ 0.25 here); real clustered embeddings sit far
higher at the same settings.  A silent drop below these floors means a
bucketing/scoring regression, not "the data got unlucky" — everything
is deterministic."""

from pyspark.sql import functions as F

from easy_sql_spark.datasets import load_table
from easy_sql_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"


def test_hll_distinct_within_advertised_error(spark):
    li = load_table(spark, SF, "lineitem")
    exact = li.select(F.countDistinct("l_partkey")).first()[0]
    approx = li.select(F.approx_count_distinct("l_partkey")).first()[0]
    # default rsd is 5%; allow 2 sigma
    assert abs(approx - exact) / exact <= 0.10


def test_approx_quantiles_within_rank_error(spark):
    """Every sketched quantile (the PRODUCTION accuracy-10000 variant
    bench.py times) must land within the Greenwald-Khanna rank-error
    bound (1/accuracy = 1e-4 relative rank, padded for the grouped
    merge) of the exact percentile."""
    from easy_sql_spark.queries.llm_ops3 import a9_sketch_bench

    rows = {r.l_returnflag: r for r in a9_sketch_bench(spark, SF).collect()}
    li = load_table(spark, SF, "lineitem")
    for flag, r in rows.items():
        vals = sorted(
            x.l_extendedprice
            for x in li.where(F.col("l_returnflag") == flag)
            .select("l_extendedprice")
            .collect()
        )
        n = len(vals)
        for q, approx in zip([0.25, 0.5, 0.75, 0.95], (r.p25, r.p50, r.p75, r.p95)):
            lo = vals[max(0, int((q - 0.01) * n))]
            hi = vals[min(n - 1, int((q + 0.01) * n))]
            assert lo <= approx <= hi, (flag, q, approx, lo, hi)


def test_exact_mode_quantile_rank_convention_matches_duckdb(spark):
    """The oracle entry drives percentile_approx into its exact regime;
    that is only sound if Spark's exact-mode rank choice equals
    DuckDB's quantile_disc rule (smallest value whose cumulative
    fraction reaches p) — pin it on adversarial tiny fixtures where
    rounding conventions diverge."""
    import duckdb

    for vals in (
        [1.0, 2.0, 3.0, 4.0],
        [1.0, 1.0, 2.0, 9.0, 10.0],
        [5.0],
        [2.0, 2.0, 2.0],
        [float(i) for i in range(1, 21)],
    ):
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        ps = [0.0, 0.25, 0.5, 0.75, 0.95, 1.0]
        s = df.agg(
            F.percentile_approx("x", ps, 2147483647).alias("q")
        ).first().q
        con = duckdb.connect()
        con.execute("CREATE TABLE t(x DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
        d = con.execute(
            "SELECT ["
            + ",".join(f"quantile_disc(x,{p})" for p in ps)
            + "] FROM t"
        ).fetchone()[0]
        assert list(s) == list(d), (vals, list(s), list(d))


def _rows(name, spark):
    return QUERIES[name](spark, SF).collect()


def test_ann_recall_floors(spark):
    # each query is evaluated ONCE and both checks (recall + cosine
    # bounds) read the same collected rows — a second evaluation per
    # query bought nothing and re-ran the full index/LSH lifecycle
    bf = {(r.query_id, r.neighbor_id) for r in _rows("sim_topk_bruteforce", spark)}
    assert len(bf) == 50  # 10 query vectors x top-5, the exact ground truth
    ivf_rows = _rows("sim_ivf_topk", spark)
    lsh_rows = _rows("sim_lsh_topk", spark)
    ivf = {(r.query_id, r.neighbor_id) for r in ivf_rows}
    lsh = {(r.query_id, r.neighbor_id) for r in lsh_rows}
    ivf_recall = len(bf & ivf) / len(bf)
    lsh_recall = len(bf & lsh) / len(bf)
    # measured 0.30 / 0.44 on the uniform fixtures (see module docstring)
    assert ivf_recall >= 0.2, f"IVF recall@5 collapsed: {ivf_recall}"
    assert lsh_recall >= 0.3, f"LSH recall@5 collapsed: {lsh_recall}"
    # and every reported neighbor must carry a correct exact re-ranked
    # cosine: the approximate part is CANDIDATE SELECTION only
    for rows in (ivf_rows, lsh_rows):
        assert all(-1.0001 <= r.cos_sim <= 1.0001 for r in rows)
