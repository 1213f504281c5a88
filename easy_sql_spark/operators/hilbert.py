"""Hilbert-curve multi-dimensional clustering — the locality upgrade
over Z-order (operators/zorder.py).

A Morton (Z) curve has long diagonal jumps: consecutive curve positions
can be far apart in space, so some row groups straddle distant regions
and their min/max boxes widen.  The Hilbert curve is unit-step
continuous — every consecutive cell is an orthogonal neighbor — which
tightens per-file bounding boxes and measurably improves skipping on
the same data (Delta OPTIMIZE moved its default from Z-order to Hilbert
for exactly this reason; measured comparison in SCALE.md).

Spark-first shape, same as z-order: one driver-side quantile probe
bucketizes each column (reusing zorder's codegen'd CASE trees), the
bucket tuple is packed into a grid index, and a LOOKUP TABLE baked into
the plan as a literal array maps grid index -> Hilbert distance.  The
LUT costs 2**(bits * dims) entries — viable precisely in the regime
layout clustering is used (2-3 dims; 64x64 = 4096 entries at the 2-dim
default), and Catalyst constant-folds it so the per-row cost is one
``element_at``.  The curve math (Skilling's AxesToTranspose, from
"Programming the Hilbert curve", AIP 2004 — public domain algorithm)
runs ONCE on the driver to build the LUT; executors never see it.

Properties are self-verifying: tests pin bijectivity over the full grid
and the unit-step adjacency invariant, which together characterize a
Hilbert curve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .zorder import _bucket_expr, _quantile_probe


def hilbert_index(coords: list[int], bits: int) -> int:
    """Hilbert distance of a grid cell (one int per dimension, each in
    [0, 2**bits)).  Skilling's transpose algorithm + bit interleave."""
    X = list(coords)
    n = len(X)
    m = 1 << (bits - 1)
    q = m
    while q > 1:
        p = q - 1
        for i in range(n):
            if X[i] & q:
                X[0] ^= p
            else:
                t = (X[0] ^ X[i]) & p
                X[0] ^= t
                X[i] ^= t
        q >>= 1
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = 0
    q = m
    while q > 1:
        if X[n - 1] & q:
            t ^= q - 1
        q >>= 1
    for i in range(n):
        X[i] ^= t
    d = 0
    for b in range(bits - 1, -1, -1):
        for i in range(n):
            d = (d << 1) | ((X[i] >> b) & 1)
    return d


def hilbert_value(df: DataFrame, cols: list[str], bits: int = 6) -> DataFrame:
    """Add ``__hvalue``: the Hilbert distance of the row's rank-bucket
    cell.  Same single quantile probe as ``zorder_value``; the LUT is a
    plan literal (constant-folded), the lookup one ``element_at``."""
    if not cols:
        raise ValueError("hilbert needs at least one column")
    if bits * len(cols) > 16:
        raise ValueError(
            "bits * len(cols) must be <= 16 (the LUT is 2**(bits*dims) "
            "entries); use fewer bits or zorder_value for higher dims"
        )
    n_buckets = 1 << bits
    probe = _quantile_probe(df, cols, n_buckets)
    out = df
    bucket_cols = []
    for c in cols:
        boundaries = [b for b in (probe[c] or []) if b is not None]
        bname = f"__hb_{c}"
        out = out.withColumn(bname, _bucket_expr(c, boundaries))
        bucket_cols.append(bname)

    # grid index = buckets packed positionally; LUT maps it to Hilbert d
    dims = len(cols)
    lut = [0] * (1 << (bits * dims))
    ranges = [range(n_buckets)] * dims
    import itertools

    for cell in itertools.product(*ranges):
        packed = 0
        for i, v in enumerate(cell):
            packed |= v << (bits * i)
        lut[packed] = hilbert_index(list(cell), bits)

    packed_col = F.lit(0)
    for i, bname in enumerate(bucket_cols):
        packed_col = packed_col.bitwiseOR(
            F.shiftleft(F.col(bname), bits * i)
        )
    lut_arr = F.array(*[F.lit(v) for v in lut])
    return (
        out.withColumn(
            "__hvalue", F.element_at(lut_arr, packed_col + F.lit(1))
        )
        .drop(*bucket_cols)
    )


def write_hilbert(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 6,
) -> None:
    """Hilbert-clustered parquet write: ONE hash shuffle on the
    token-mapped curve prefix (see zorder.write_curve_clustered — same
    sampled-range-layout reproduction without the range partitioner's
    sampling pass or its guarding checkpoint), sorted within partitions
    on the full curve position, helper column dropped (the layout IS
    the artifact — any reader's stats pruning benefits)."""
    from .zorder import write_curve_clustered

    write_curve_clustered(
        hilbert_value(df, cols, bits), "__hvalue", path, n_files,
        bits * len(cols),
    )
