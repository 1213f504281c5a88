"""Hilbert clustering (operators/hilbert.py): curve invariants, plan
shape, and a direct skipping comparison against z-order on identical
data (the claim that justifies the operator's existence)."""

import glob
import itertools

import numpy as np
import pyarrow.parquet as pq

from easy_sql_spark.operators.hilbert import (
    hilbert_index,
    hilbert_value,
    write_hilbert,
)
from easy_sql_spark.operators.zorder import write_zordered


def test_hilbert_curve_invariants():
    """Bijectivity over the grid + unit-step orthogonal adjacency —
    together these CHARACTERIZE a Hilbert curve, so no external test
    vectors are needed."""
    for dims, bits in ((2, 4), (3, 3)):
        n = 1 << bits
        cells = list(itertools.product(range(n), repeat=dims))
        ds = {c: hilbert_index(list(c), bits) for c in cells}
        assert sorted(ds.values()) == list(range(len(cells)))
        by_d = {d: c for c, d in ds.items()}
        for d in range(len(cells) - 1):
            diff = [abs(x - y) for x, y in zip(by_d[d], by_d[d + 1])]
            assert sum(diff) == 1 and max(diff) == 1


def test_hilbert_value_is_narrow_and_folded(spark):
    df = spark.range(1000).selectExpr(
        "cast(id % 40 as double) as x", "cast(id / 40 as double) as y"
    )
    out = hilbert_value(df, ["x", "y"], bits=4)
    vals = [r["__hvalue"] for r in out.collect()]
    assert len(set(vals)) > 100  # spreads over the grid
    assert all(0 <= v < 256 for v in vals)
    plan = out._sc is not None and out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure narrow projection


def _skip_fraction(path_glob, col, lo, hi):
    """Fraction of row groups a [lo, hi] predicate on ``col`` can skip."""
    total = kept = 0
    for f in sorted(glob.glob(path_glob)):
        pf = pq.ParquetFile(f)
        idx = pf.schema_arrow.names.index(col)
        for g in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(g).column(idx).statistics
            total += 1
            if st.max >= lo and st.min <= hi:
                kept += 1
    return 1 - kept / total


def test_hilbert_skips_at_least_as_well_as_zorder(spark, tmp_path):
    """Same data, same file count, same bits: a 5%-band predicate on
    EITHER dimension must skip at least as many row groups under the
    Hilbert layout as under z-order (unit-step continuity can only
    tighten boxes), and both beat a linear sort's worst dimension by a
    wide margin."""
    n = 40_000
    df = (
        spark.range(n)
        .selectExpr(
            "cast(id % 200 as double) as x",
            "cast(cast(id / 200 as int) as double) as y",
            "id as payload",
        )
        .repartition(8)
    )
    hpath, zpath, lpath = (str(tmp_path / p) for p in ("h", "z", "lin"))
    write_hilbert(df, hpath, ["x", "y"], n_files=64)
    write_zordered(df, zpath, ["x", "y"], n_files=64)
    df.repartitionByRange(64, "x").sortWithinPartitions("x").write.parquet(lpath)

    bands = [("x", 100.0, 110.0), ("y", 100.0, 110.0)]
    h = np.mean([_skip_fraction(f"{hpath}/*.parquet", c, lo, hi)
                 for c, lo, hi in bands])
    z = np.mean([_skip_fraction(f"{zpath}/*.parquet", c, lo, hi)
                 for c, lo, hi in bands])
    lin = np.mean([_skip_fraction(f"{lpath}/*.parquet", c, lo, hi)
                   for c, lo, hi in bands])
    assert h >= z - 0.02, (h, z)  # at least z-order quality
    assert h > lin + 0.2, (h, lin)  # and far beyond a 1-D sort
    # stored schema carries no helper column
    names = pq.ParquetFile(sorted(glob.glob(f"{hpath}/*.parquet"))[0]).schema_arrow.names
    assert "__hvalue" not in names


def test_output_step_hilbert_layout(spark):
    """__zorder_by__ + __layout_curve__=hilbert on an output step: the
    saved table's row groups are bounded in BOTH columns via the Hilbert
    layout (same contract as the zorder step test)."""
    import os
    from urllib.parse import urlparse

    from easy_sql_spark.runtime.processor import SqlProcessor

    spark.sql("drop database if exists hldb cascade")
    spark.sql("create database hldb")
    etl = """-- target=variables
select true as __create_output_table__, 'x|y' as __zorder_by__,
       'hilbert' as __layout_curve__

-- target=output.hldb.grid
select cast(id % 100 as double) as x,
       cast(cast(id / 100 as int) as double) as y,
       id as payload
from range(10000)
"""
    SqlProcessor(spark, etl, logger=lambda m: None).run()
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    spans = []
    for f in sorted(glob.glob(os.path.join(wh, "hldb.db", "grid", "*.parquet"))):
        pf = pq.ParquetFile(f)
        names = pf.schema_arrow.names
        ix, iy = names.index("x"), names.index("y")
        for g in range(pf.metadata.num_row_groups):
            rg = pf.metadata.row_group(g)
            spans.append((rg.column(ix).statistics.max - rg.column(ix).statistics.min,
                          rg.column(iy).statistics.max - rg.column(iy).statistics.min))
    assert len(spans) >= 8
    assert np.mean([sx for sx, _ in spans]) <= 45
    assert np.mean([sy for _, sy in spans]) <= 45
    t = spark.table("hldb.grid")
    assert t.count() == 10000 and t.agg({"payload": "sum"}).first()[0] == sum(range(10000))
