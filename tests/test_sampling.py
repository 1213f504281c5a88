"""Weighted per-key sampling (operators/sampling.py): determinism,
weight bias, edge weights."""

from pyspark.sql import functions as F

from easy_sql_spark.operators.sampling import weighted_sample_per_key


def _pop(spark):
    # two keys; within each, ids 0..199 where even ids weigh 100x more
    return spark.range(400).select(
        (F.col("id") % 2).cast("string").alias("grp"),
        F.col("id").alias("id"),
        F.when((F.col("id") / 2).cast("long") % 2 == 0, 1000)
        .otherwise(10)
        .alias("w"),
    )


def test_deterministic_across_runs_and_partitionings(spark):
    df = _pop(spark)
    a = weighted_sample_per_key(df, ["grp"], "id", "w", 15).collect()
    b = weighted_sample_per_key(df.repartition(7), ["grp"], "id", "w", 15).collect()
    assert sorted((r.grp, r.id, r["__rank"]) for r in a) == sorted(
        (r.grp, r.id, r["__rank"]) for r in b
    )
    assert len(a) == 30  # 15 per key


def test_heavy_weights_dominate_sample(spark):
    out = weighted_sample_per_key(_pop(spark), ["grp"], "id", "w", 40).collect()
    heavy = sum(1 for r in out if r.w == 1000)
    # 100:1 odds — the heavy half should take the large majority of slots
    assert heavy / len(out) > 0.8


def test_nonpositive_and_null_weights_excluded(spark):
    df = spark.createDataFrame(
        [("a", 1, 5), ("a", 2, 0), ("a", 3, -1), ("a", 4, None)],
        "grp string, id int, w int",
    )
    out = weighted_sample_per_key(df, ["grp"], "id", "w", 10).collect()
    assert [r.id for r in out] == [1]
