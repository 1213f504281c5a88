"""Tests for the salted-join / skewed-aggregation operators."""

import pytest

import _depth
from pyspark.sql import functions as F

from easy_sql_spark.operators.skew import (
    capped_per_key,
    explode_skewed_agg,
    presample_for_cap,
    salted_join,
)


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


def test_salted_join_rejects_unknown_how_and_bad_keys(spark, skewed):
    large, small = skewed
    with pytest.raises(ValueError):
        salted_join(large, small, "k", how="left_semi")
    with pytest.raises(ValueError):
        salted_join(large, small, "missing")


def test_salted_right_and_full_outer_match_plain(spark):
    """r3 verdict #6: right/full variants with exact null-preservation —
    compared row-for-row against the unsalted join on a fixture with a hot
    key, NULL keys on both sides, duplicate small rows, and small-only /
    large-only keys."""
    from pyspark.sql import Row

    large = spark.createDataFrame(
        [(1, i) for i in range(900)]  # hot key
        + [(950, 1000), (960, 1001), (None, 1002)],
        "k int, v int",
    )
    small = spark.createDataFrame(
        [
            Row(k=1, name="hot"),
            Row(k=950, name="cold"),
            Row(k=777, name="only_small"),
            Row(k=777, name="only_small_dup"),  # duplicate key row
            Row(k=None, name="null_key"),
        ]
    )

    def rows(df):
        cols = sorted(df.columns)
        return sorted(
            (tuple(str(x) for x in (r[c] for c in cols)) for r in df.collect())
        )

    for how in ("right", "full"):
        plain = large.join(small, "k", how)
        salted = salted_join(large, small, "k", how=how, salt=4)
        assert rows(salted) == rows(plain), how
    # multiplicity sanity: full outer = 900 hot + 1 cold + 2 only_small
    # + 1 null small + 1 null large + 1 large-only(960)
    assert salted_join(large, small, "k", how="full", salt=4).count() == 906


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


@pytest.fixture()
def heavy_docs(spark):
    # one source holds 90% of 5000 docs — the heavy-hitter corpus shape
    return spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 4500, "common_crawl")
        .when(F.col("id") < 4800, "wiki")
        .otherwise("books")
        .alias("source"),
    )


def _naive_cap(df, cap):
    from pyspark.sql import Window as W

    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )


def test_capped_per_key_matches_naive_window(spark, heavy_docs):
    cap = 20
    naive = sorted(
        (r.source, r.doc_id) for r in _naive_cap(heavy_docs, cap).collect()
    )
    fast = sorted(
        (r.source, r.doc_id)
        for r in capped_per_key(heavy_docs, "source", "doc_id", cap).collect()
    )
    assert fast == naive
    counts = {}
    for s, _ in fast:
        counts[s] = counts.get(s, 0) + 1
    assert counts == {"common_crawl": cap, "wiki": cap, "books": cap}


def test_capped_per_key_keeps_small_keys_whole(spark, heavy_docs):
    # cap above the small sources' sizes: they must survive untouched
    out = capped_per_key(
        heavy_docs, "source", "doc_id", 300, count_col="n_total"
    )
    rows = {(r.source): r for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.max("n_total").alias("t")).collect()}
    assert (rows["wiki"].n, rows["wiki"].t) == (300, 300)
    assert (rows["books"].n, rows["books"].t) == (200, 200)
    assert (rows["common_crawl"].n, rows["common_crawl"].t) == (300, 4500)


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(
        sizes=st.lists(st.integers(1, 400), min_size=1, max_size=5),
        cap=st.integers(1, 60),
        offset=st.integers(0, 10_000),
    )
    @settings(
        max_examples=_depth.examples(12),
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_capped_per_key_equals_naive_property(spark, sizes, cap, offset):
        """Exact equality with the naive window for ARBITRARY key-size
        distributions, caps, and id ranges — the margin analysis says the
        superset event always holds in practice; this hunts for the
        counterexample."""
        rows = []
        doc_id = offset
        for k, n in enumerate(sizes):
            for _ in range(n):
                rows.append((doc_id, f"src{k}"))
                doc_id += 1
        df = spark.createDataFrame(rows, "doc_id long, source string")
        naive = sorted(
            (r.source, r.doc_id) for r in _naive_cap(df, cap).collect()
        )
        fast = sorted(
            (r.source, r.doc_id)
            for r in capped_per_key(df, "source", "doc_id", cap).collect()
        )
        assert fast == naive

except ImportError:
    pass


def test_sharded_prefix_bins_equals_single_window(spark, heavy_docs):
    """The two-level prefix-sum must assign IDENTICAL bin ids to the
    single-window plan — the md5 hex prefix shards the global order into
    contiguous ranges, so offsets + within-shard sums recompose exactly."""
    from easy_sql_spark.operators.skew import sharded_prefix_bins

    docs = heavy_docs.withColumn("tokens", (F.col("doc_id") % 37) + 1)
    single = docs.withColumn(
        "bin_id",
        F.expr("coalesce(sum(tokens) over ("
               "partition by source "
               "order by md5(cast(doc_id as string)), doc_id "
               "rows between unbounded preceding and 1 preceding), 0) div 256"),
    )
    sharded = sharded_prefix_bins(docs, "source", "doc_id", "tokens", 256)
    a = {(r.source, r.doc_id): r.bin_id for r in single.collect()}
    b = {(r.source, r.doc_id): r.bin_id for r in sharded.collect()}
    assert a == b
    # and the heavy window really is sharded: partition key includes the
    # md5 prefix, giving the hot source 16-way fan-out
    plan = sharded._jdf.queryExecution().executedPlan().toString()
    assert "__shard" in plan


def test_presample_bounds_window_input(spark, heavy_docs):
    cap = 20
    margin = int(6 * cap**0.5) + 64  # the default
    pre = presample_for_cap(heavy_docs, "source", "doc_id", cap)
    per_key = {
        r.source: r.n
        for r in pre.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # the heavy key's window input is bounded near cap+margin, NOT its
    # true 4500 rows — that is the whole point of the two-phase plan
    assert cap <= per_key["common_crawl"] <= 3 * (cap + margin)
    assert per_key["common_crawl"] < 450  # ≪ the naive window's 4500
    # counts ride along exactly
    assert {r["source"]: r["__n_key"] for r in pre.select("source", "__n_key")
            .distinct().collect()} == {
        "common_crawl": 4500, "wiki": 300, "books": 200}
    # phase-1 counts come back via a broadcast join — no extra skewed shuffle
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_capped_per_key_null_keys_and_ids(spark):
    """ADVICE r3: NULL join keys must form their own capped group (not be
    dropped by the count join), and a NULL id must survive the presample."""
    from pyspark.sql import Window

    data = [(None if i % 3 == 0 else f"k{i % 2}", i) for i in range(300)]
    data.append(("k1", None))  # NULL id in a non-null key group
    df = spark.createDataFrame(data, "k string, id integer")
    out = capped_per_key(df, "k", "id", cap=20)

    sel = F.md5(F.coalesce(F.col("id").cast("string"), F.lit("")))
    w = Window.partitionBy("k").orderBy(sel, F.col("id").asc_nulls_first())
    naive = (
        df.withColumn("__rn", F.row_number().over(w))
        .where("__rn <= 20")
        .drop("__rn")
    )
    assert sorted(
        map(tuple, out.collect()), key=str
    ) == sorted(map(tuple, naive.collect()), key=str)
    # NULL-key group capped, not dropped
    assert out.where(F.col("k").isNull()).count() == 20
    # presample keeps NULL ids (cap 2000 > group size -> everything kept)
    assert presample_for_cap(df, "k", "id", cap=2000).count() == 301


@pytest.fixture()
def chunked(spark):
    # 'boiler' appears 500 times (viral boilerplate chunk); a long tail
    # of cold keys appears 1-3 times; (doc_id, pos) unique per row
    rows = [(i, 0, "boiler") for i in range(500)]
    rows += [(i, 1, f"k{i % 120}") for i in range(300)]
    rows += [(7, 2, "boiler"), (7, 3, "k3")]
    return spark.createDataFrame(rows, "doc_id long, pos int, key string")


def test_first_occurrence_flag_matches_naive_window(spark, chunked):
    from pyspark.sql import Window

    from easy_sql_spark.operators.skew import first_occurrence_flag

    w = Window.partitionBy("key").orderBy("doc_id", "pos")
    naive = {
        (r.doc_id, r.pos, r.key): r.kept
        for r in chunked.withColumn("kept", F.row_number().over(w) == 1).collect()
    }
    got = {
        (r.doc_id, r.pos, r.key): r.kept
        for r in first_occurrence_flag(
            chunked, "key", ["doc_id", "pos"], "kept", hot_threshold=50
        ).collect()
    }
    assert got == naive
    # exactly one first per key, and the hot key's first is the global min
    assert sum(1 for (d, p, k), kept in got.items() if k == "boiler" and kept) == 1
    assert got[(0, 0, "boiler")] is True


def test_first_occurrence_flag_bounds_hot_window_input(spark, chunked):
    """The hot key must NEVER enter the row_number window: its rows take
    the min-aggregate + broadcast path, so the window's partitions stay
    bounded by the cold-key sizes."""
    from easy_sql_spark.operators.skew import first_occurrence_flag

    out = first_occurrence_flag(
        chunked, "key", ["doc_id", "pos"], "kept", hot_threshold=50
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # hot path is broadcast-joined, not windowed
    assert "BroadcastHashJoin" in plan
    # the Window node sits under a filter that excluded the hot marker;
    # verify semantically: recompute the cold branch input bound
    from pyspark.sql import functions as FF

    counts = {r.key: r.n for r in chunked.groupBy("key")
              .agg(FF.count(FF.lit(1)).alias("n")).collect()}
    assert counts["boiler"] >= 50  # really is hot in this fixture
    # all flags still correct for a cold key with multiple rows
    k3 = sorted((r.doc_id, r.pos, r.kept) for r in out.where("key = 'k3'").collect())
    assert [x[2] for x in k3] == [True] + [False] * (len(k3) - 1)


def test_first_occurrence_flag_agg_matches_naive_window(spark, chunked):
    """The detection-free agg+join variant must be bit-identical to
    row_number()==1 — including on the hot key — and its plan must be
    window-free (the whole point: no per-key row ordering anywhere)."""
    from pyspark.sql import Window

    from easy_sql_spark.operators.skew import first_occurrence_flag_agg

    w = Window.partitionBy("key").orderBy("doc_id", "pos")
    naive = {
        (r.doc_id, r.pos, r.key): r.kept
        for r in chunked.withColumn("kept", F.row_number().over(w) == 1).collect()
    }
    out = first_occurrence_flag_agg(chunked, "key", ["doc_id", "pos"], "kept")
    got = {(r.doc_id, r.pos, r.key): r.kept for r in out.collect()}
    assert got == naive
    assert sum(1 for (d, p, k), kept in got.items() if k == "boiler" and kept) == 1
    assert got[(0, 0, "boiler")] is True
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # min() is algebraic: map-side combined
