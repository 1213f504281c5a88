"""Footer-based commit statistics must match the distributed scan path.

The snapshot commit used to re-scan freshly staged parquet to compute
per-dir min/max/null-count/row-count — 2× read amplification on the
whole write path at scale.  ``_stage_stats`` now answers from the
parquet FOOTERS (driver metadata I/O only) and falls back to the scan
job when footers can't answer.  These tests pin that the two paths
produce byte-identical manifest entries across the type zoo (ints,
doubles, strings, dates, µs timestamps, both decimal physical
encodings, nullable and all-null columns, partition columns).
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from easy_sql_spark.runtime.snapshots import SnapshotTable


@pytest.fixture()
def typed_table(spark):
    df = spark.range(300).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).alias("d"),
        F.concat(F.lit("s"), F.format_string("%03d", F.col("id"))).alias("s"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 200).cast("int")).alias("dt"),
        F.timestamp_seconds(F.col("id") * 1000 + 123).alias("ts"),
        (F.col("id").cast("decimal(12,2)") / 7).alias("dec_small"),
        (F.col("id").cast("decimal(38,10)") / 7).alias("dec_big"),
        F.when(F.col("id") % 5 == 0, None)
        .otherwise(F.col("id"))
        .alias("nullable"),
        F.when(F.col("id") % 3 == 2, None)
        .otherwise(F.concat(F.lit("x"), F.col("id")))
        .alias("mixed_null"),
        (F.col("id") % 3).cast("int").alias("pt"),
    )
    # pt=2's mixed_null is partially null; make one partition's column
    # ALL null to exercise the [None, None, nc] encoding
    df = df.withColumn(
        "mixed_null",
        F.when(F.col("pt") == 2, None).otherwise(F.col("mixed_null")),
    )
    return df


STATS_COLS = [
    "k", "d", "s", "dt", "ts", "dec_small", "dec_big",
    "nullable", "mixed_null", "pt",
]


def test_footer_stats_match_scan_stats(spark, typed_table):
    import math

    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="snap_fstats_") + "/t")
    m = t.create(typed_table, partition_by=["pt"], stats_cols=STATS_COLS)
    dirs = m["added"]
    footer = t._footer_stats(dirs, STATS_COLS, ["pt"], m["schema"])
    assert footer is not None, "footer path unexpectedly fell back"
    f_stats, f_counts = footer
    s_stats, s_counts = t._scan_stats(dirs, STATS_COLS, ["pt"])
    assert f_counts == s_counts
    assert set(f_stats) == set(s_stats)
    for d in s_stats:
        for c in STATS_COLS:
            if c == "d":
                # DELIBERATE divergence on float/double: parquet footer
                # min/max exclude NaN and cannot prove NaN absence, so
                # the footer path widens the max to NaN (unknown upper
                # bound); the scan path keeps Spark's exact max
                fmn, fmx, fnc = f_stats[d][c]
                smn, _smx, snc = s_stats[d][c]
                assert fmn == smn and fnc == snc
                assert math.isnan(fmx)
                continue
            assert f_stats[d][c] == s_stats[d][c], (d, c, f_stats[d][c], s_stats[d][c])
    # the committed manifest took the footer path's values
    assert m["rows"] == f_counts
    for d in f_stats:
        for c in STATS_COLS:
            a, b = m["stats"][d][c], f_stats[d][c]
            assert a[0] == b[0] and a[2] == b[2]
            assert a[1] == b[1] or (
                isinstance(a[1], float)
                and math.isnan(a[1])
                and math.isnan(b[1])
            )


def test_float_nan_rows_never_pruned_away(spark):
    """Spark orders NaN above every double; parquet footers exclude NaN
    from min/max.  A dir whose only rows matching ``x > v`` are NaN
    must survive stats pruning on BOTH stats paths (r6 advice).

    The frame is FORCED to one file per row so the dir always contains
    an all-NaN file — whose footer min can itself be NaN, which must
    contribute no lower bound regardless of file iteration order (the
    r7 pruning flake: min(1.0, nan)=1.0 but min(nan, 1.0)=nan)."""
    rows = [(1, 1.0), (2, 2.5), (3, float("nan"))]
    df = spark.createDataFrame(rows, "k long, x double").repartition(3, "k")
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="snap_fnan_") + "/t")
    m = t.create(df, stats_cols=["x"])

    import math

    got = t.read(where=[("x", ">", 100.0)]).where("x > 100.0 or isnan(x)")
    assert [r.k for r in got.collect()] == [3]
    # the committed (footer-path) max is the NaN sentinel
    d = m["added"][0]
    assert math.isnan(m["stats"][d]["x"][1])
    # lower-bound pruning still works: nothing below min 1.0
    assert t.read(where=[("x", "<", 0.5)]).count() == 0

    # scan path records the same NaN max when NaN rows exist
    s_stats, _ = t._scan_stats(m["added"], ["x"], [])
    assert math.isnan(s_stats[d]["x"][1])
    from easy_sql_spark.runtime.snapshots import SnapshotTable as S

    assert S._dir_survives(s_stats[d], [("x", ">", 100.0)])
    assert not S._dir_survives(s_stats[d], [("x", "<", 0.5)])


def test_footer_stats_power_dir_pruning(spark, typed_table):
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="snap_fprune_") + "/t")
    t.create(typed_table, partition_by=["pt"], stats_cols=["k", "dt"])
    # k is 0..299 across all dirs; a k-range predicate outside the data
    # must read zero rows without scanning (empty pruned frame)
    assert t.read(where=[("k", ">", 10_000)]).count() == 0
    full = t.read().where(F.col("dt") >= F.lit("2024-06-01")).count()
    pruned = (
        t.read(where=[("dt", ">=", "2024-06-01")])
        .where(F.col("dt") >= F.lit("2024-06-01"))
        .count()
    )
    assert full == pruned


def test_unpartitioned_footer_stats(spark):
    df = (
        pytest.importorskip("pyspark").sql.SparkSession.getActiveSession()
        or spark
    ).range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="snap_funpart_") + "/t")
    m = t.create(df, stats_cols=["k", "v"])
    d = m["added"][0]
    assert m["rows"][d] == 100
    assert m["stats"][d]["k"] == [0, 99, 0]
    assert m["stats"][d]["v"] == [0, 198, 0]
    # appends keep using the footer path and carry prior stats forward
    m2 = t.append(df.withColumn("k", F.col("k") + 1000))
    d2 = [x for x in m2["added"]][0]
    assert m2["stats"][d2]["k"] == [1000, 1099, 0]
    assert m2["stats"][d]["k"] == [0, 99, 0]
