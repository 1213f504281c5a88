"""Tests for the salted-join / skewed-aggregation operators."""

import pytest
from pyspark.sql import functions as F

from easy_sql_spark.operators.skew import explode_skewed_agg, salted_join


@pytest.fixture()
def skewed(spark):
    # 90% of rows share key 1 (the hot key)
    large = spark.range(1000).select(
        F.when(F.col("id") < 900, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [(1, "hot"), (950, "cold")], "k long, name string"
    )
    return large, small


def test_salted_inner_join_matches_plain(spark, skewed):
    large, small = skewed
    plain = large.join(small, "k").groupBy("name").count()
    salted = salted_join(large, small, "k", salt=4).groupBy("name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    assert dict(map(tuple, salted.collect())) == {"hot": 900, "cold": 1}


def test_salted_left_join_preserves_unmatched(spark, skewed):
    large, small = skewed
    out = salted_join(large, small, "k", how="left", salt=4)
    assert out.count() == 1000
    assert out.where(F.col("name").isNull()).count() == 99
    # no duplicate large rows introduced by the salt replication
    assert out.select("k", "v").distinct().count() == 1000


def test_salted_join_rejects_outer_and_bad_keys(spark, skewed):
    large, small = skewed
    with pytest.raises(ValueError):
        salted_join(large, small, "k", how="full")
    with pytest.raises(ValueError):
        salted_join(large, small, "missing")


def test_explode_skewed_agg_matches_plain(spark, skewed):
    large, _ = skewed
    plain = {
        (r.k): (r.s, r.n)
        for r in large.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("n"))
        .collect()
    }
    salted = {
        (r.k): (r.sum_v, r.count_v)
        for r in explode_skewed_agg(
            large, ["k"], {"v": "sum"} | {}, salt=8
        ).join(
            explode_skewed_agg(large, ["k"], {"v": "count"}, salt=8), "k"
        ).collect()
    }
    assert plain == salted


def test_explode_skewed_agg_rejects_nonalgebraic(spark, skewed):
    large, _ = skewed
    with pytest.raises(ValueError):
        explode_skewed_agg(large, ["k"], {"v": "avg"})
