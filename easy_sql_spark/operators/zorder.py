"""Z-order (Morton-curve) multi-dimensional clustering for data skipping.

A table sorted on one column gives tight parquet min/max stats — and
therefore row-group/file skipping — on that column only; a predicate on
any other column scans everything.  Interleaving the bits of several
columns' rank-buckets produces a layout whose row groups are tight in
EVERY interleaved dimension at once, so selective scans on any of them
(or any combination) skip most of the data.  This is the OPTIMIZE
ZORDER BY lever from lakehouse engines, re-expressed with plain Spark
primitives; the reference has no layout op (scale-mandated extension).

Pipeline (all JVM-side after one driver-side quantile probe):

1. ``approxQuantile`` per column → ``2**bits`` rank-bucket boundaries
   (a sampled scan, the same probe Delta's OPTIMIZE runs; boundaries are
   baked into the plan as literals).
2. Per row: bucket index per column via a literal-array rank fold, then
   bit-interleave the indices into one Morton value — narrow projection,
   no shuffle, no Python.
3. ``repartitionByRange`` on the Morton value (one range shuffle — the
   sort-for-layout every clustering write pays) + ``sortWithinPartitions``
   so every output file covers a compact Morton range.

Skipping is engine-native from there: parquet stats per row group are
tight in every z-ordered dimension, so any reader (Spark, DuckDB,
Trino) prunes without knowing the layout exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bucket_tree(x: F.Column, boundaries: list[float], offset: int) -> F.Column:
    """Balanced CASE-WHEN binary search over sorted boundary literals —
    log2(n) comparisons per row inside whole-stage codegen, where the
    array-filter formulation (a higher-order function) runs interpreted
    and was measured ~10× slower on the sf0.1 write bench."""
    if not boundaries:
        return F.lit(offset)
    mid = len(boundaries) // 2
    return F.when(
        x < F.lit(float(boundaries[mid])),
        _bucket_tree(x, boundaries[:mid], offset),
    ).otherwise(_bucket_tree(x, boundaries[mid + 1 :], offset + mid + 1))


def _bucket_expr(col: str, boundaries: list[float]) -> F.Column:
    """Rank-bucket index of ``col`` against sorted boundary literals:
    count of boundaries <= value (NULLs sink to bucket 0)."""
    x = F.col(col).cast("double")
    return F.when(x.isNull(), F.lit(0)).otherwise(
        _bucket_tree(x, sorted(boundaries), 0)
    )


#: the boundary probe samples large inputs down to roughly this many
#: file bytes before sketching (fraction clamped to >= 1%): GK-sketch
#: per-row updates dominate the probe (measured 1.04s full vs 0.33s at
#: a 10% sample over sf0.1 lineitem, zero-steal window), and a sampled
#: quantile's rank error (~1/sqrt(sampled_rows): 2 MB of parquet is
#: >= ~20k rows -> ~0.7%) is the same ballpark as the sketch's own
#: accuracy-200 error (0.5%) — boundaries only need to be roughly
#: equal-mass for a layout (64 buckets = 1.56% mass each).  At 100 TB
#: the probe would otherwise pay a full-corpus sketch pass per
#: clustered write; the 1% fraction floor keeps the sampled row count
#: growing with the corpus.  Env-overridable
#: ``EASY_SQL_ZPROBE_SAMPLE_BYTES``; set <= 0 to disable sampling.
ZPROBE_SAMPLE_TARGET_BYTES = 2 << 20


def _probe_fraction(df: DataFrame) -> float:
    """Sampling fraction for the quantile probe, from driver-side scan
    metadata (same inputFiles technique as datasets.spread — no job).
    1.0 when the plan's leaf bytes are small or unknowable."""
    import os

    try:
        target = int(
            os.environ.get(
                "EASY_SQL_ZPROBE_SAMPLE_BYTES", ZPROBE_SAMPLE_TARGET_BYTES
            )
        )
    except ValueError as e:
        raise ValueError(
            "EASY_SQL_ZPROBE_SAMPLE_BYTES must be an int (bytes)"
        ) from e
    if target <= 0:
        return 1.0
    try:
        files = df.inputFiles()
        if not files:
            return 1.0
        spark = df.sparkSession
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        total = 0
        for f in files:
            path = jvm.org.apache.hadoop.fs.Path(f)
            fs = path.getFileSystem(hconf)
            total += fs.getFileStatus(path).getLen()
    except Exception:  # pragma: no cover - exotic sources; just don't sample
        return 1.0
    if total <= target:
        return 1.0
    return max(0.01, target / total)


def _quantile_probe(df: DataFrame, cols: list[str], n_buckets: int):
    """One ``percentile_approx`` aggregate over all curve columns —
    sampled down on large inputs (see ZPROBE_SAMPLE_TARGET_BYTES; fixed
    seed, so the layout is deterministic for a given input)."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    qs_arr = F.array(*[F.lit(q) for q in qs])
    frac = _probe_fraction(df)
    probe_src = df if frac >= 1.0 else df.sample(False, frac, seed=42)
    return probe_src.agg(
        *[
            F.percentile_approx(F.col(c).cast("double"), qs_arr, F.lit(200)).alias(c)
            for c in cols
        ]
    ).first()


def zorder_value(df: DataFrame, cols: list[str], bits: int = 6) -> DataFrame:
    """Add a ``__zvalue`` column interleaving ``bits`` rank-bits per column.

    The quantile probe is ONE ``percentile_approx`` aggregate job over
    all columns (sampled on large inputs — :func:`_quantile_probe`);
    everything else is a narrow JVM projection.  2**bits
    buckets per dimension (64 at the default) bounds both the CASE-tree
    size baked into the plan and the probe cost — finer granularity buys
    nothing once buckets are smaller than a row group, and the measured
    write cost scales with the tree size (bits=8 doubled the whole-stage
    codegen time for no skipping gain at realistic file counts)."""
    if not cols:
        raise ValueError("zorder needs at least one column")
    if bits * len(cols) > 62:
        raise ValueError("bits * len(cols) must fit in a long")
    n_buckets = 1 << bits
    probe = _quantile_probe(df, cols, n_buckets)
    out = df
    bucket_cols = []
    for c in cols:
        boundaries = [b for b in (probe[c] or []) if b is not None]
        bname = f"__zb_{c}"
        out = out.withColumn(bname, _bucket_expr(c, boundaries))
        bucket_cols.append(bname)
    # bit-interleave: output bit (i*len(cols)+j) = bit i of column j
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, bname in enumerate(bucket_cols):
            bit = F.shiftright(F.col(bname), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(
                F.shiftleft(bit.cast("long"), i * len(cols) + j)
            )
    return out.withColumn("__zvalue", z).drop(*bucket_cols)


_M = 0xFFFFFFFF


def _murmur3_int(value: int, seed: int = 42) -> int:
    """Spark's Murmur3_x86_32.hashInt — the function behind both
    ``F.hash`` (seed 42) and HashPartitioning's partition assignment.
    Reproduced driver-side so :func:`_group_tokens` can pick shuffle
    tokens that land each z-prefix group in a chosen partition; pinned
    against ``F.hash`` itself in tests/test_zorder.py."""

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & _M

    k1 = (value * 0xCC9E2D51) & _M
    k1 = rotl(k1, 15)
    k1 = (k1 * 0x1B873593) & _M
    h1 = (seed ^ k1) & _M
    h1 = rotl(h1, 13)
    h1 = (h1 * 5 + 0xE6546B64) & _M
    h1 ^= 4  # fmix with length in bytes
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1  # signed int32


def _murmur3_np(vals, seed: int = 42):
    """Vectorized :func:`_murmur3_int` over an int array (same bits —
    pinned against the scalar, which is itself pinned against
    ``F.hash``, in tests/test_zorder.py)."""
    import numpy as np

    u = np.uint32
    k1 = np.asarray(vals, dtype=np.int64).astype(u) * u(0xCC9E2D51)
    k1 = (k1 << u(15)) | (k1 >> u(17))
    k1 = k1 * u(0x1B873593)
    h1 = u(seed) ^ k1
    h1 = (h1 << u(13)) | (h1 >> u(19))
    h1 = h1 * u(5) + u(0xE6546B64)
    h1 = h1 ^ u(4)  # fmix with length in bytes
    h1 ^= h1 >> u(16)
    h1 = h1 * u(0x85EBCA6B)
    h1 ^= h1 >> u(13)
    h1 = h1 * u(0xC2B2AE35)
    h1 ^= h1 >> u(16)
    return h1.astype(np.int32)


def _group_tokens(n_groups: int, n_parts: int) -> list[int] | None:
    """For each z-prefix group g, an int token whose murmur3 hash lands
    in partition floor(g * n_parts / n_groups) — a monotone group ->
    partition map, so every output file covers a CONTIGUOUS Morton
    range.

    Tokens are found per PARTITION, not per group (groups sharing a
    target partition share its token — the hash routes them to the same
    place either way, and the within-partition sort on the full curve
    value fixes the file content, so the layout is unchanged), by one
    coupon-collector sweep over consecutive ints with the vectorized
    hash: ~n_parts * ln(n_parts) expected probes at C speed.  The old
    per-group scalar loop was O(n_groups * n_parts) interpreted hash
    evaluations — ~10^8-10^10 driver-side probes at 100 TB file counts
    (VERDICT r14 #4); n_parts=4096 now completes in milliseconds
    (pinned by test_group_tokens_large_n_files_fast).

    Returns None if some partition never shows up within the probe
    budget (astronomically unlikely for a well-mixed hash — the budget
    is ~64 expected sweeps); callers fall back to the sampled
    ``repartitionByRange`` layout, which preserves contiguity."""
    budget = max(1 << 16, 64 * n_parts)
    chunk = min(1 << 16, budget)
    token_for: dict[int, int] = {}
    probe = 0
    while len(token_for) < n_parts and probe < budget:
        import numpy as np

        n = min(chunk, budget - probe)
        parts = _murmur3_np(np.arange(probe, probe + n)).astype(np.int64) % n_parts
        uniq, first = np.unique(parts, return_index=True)
        for p, i in zip(uniq.tolist(), first.tolist()):
            token_for.setdefault(p, probe + i)
        probe += n
    if len(token_for) < n_parts:
        return None
    return [token_for[g * n_parts // n_groups] for g in range(n_groups)]


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 6,
) -> None:
    """Write ``df`` as z-order-clustered parquet: ONE hash shuffle on a
    Morton-prefix group token, sorted within partitions on the full
    Morton value, ``__zvalue`` dropped from the stored schema (the
    layout IS the artifact — readers need no extra column).

    The old shape used ``repartitionByRange`` — whose range partitioner
    runs a SAMPLING pass over the child — plus a checkpoint that
    existed only to keep that sampling from re-running the
    bucket+interleave projection.  Both passes are gone: the z-value's
    high ``log2(n_files)`` bits already split the space into
    equal-mass groups (each dimension's quantile buckets halve the
    mass bit by bit), and :func:`_group_tokens` maps each group to a
    fixed partition through Spark's own murmur3 partitioning hash, so
    the single shuffle reproduces the range layout EXACTLY — same file
    count, same contiguous per-file Morton ranges, same row-group
    stats-tightness — without sampling (write bench: 6 jobs -> 4,
    ~2x wall)."""
    write_curve_clustered(
        zorder_value(df, cols, bits), "__zvalue", path, n_files,
        bits * len(cols),
    )


def write_curve_clustered(
    vdf: DataFrame,
    value_col: str,
    path: str,
    n_files: int,
    total_bits: int,
) -> None:
    """Shared single-shuffle clustered write for curve-valued frames
    (Morton here, Hilbert in operators/hilbert.py): partition by the
    token-mapped high-bit prefix of ``value_col``, sort within
    partitions on the full value, drop the helper column.  See
    :func:`write_zordered` for why this replaces checkpoint +
    ``repartitionByRange`` exactly."""
    group_bits = min(total_bits, max(1, (n_files - 1).bit_length()))
    n_groups = 1 << group_bits
    tokens = _group_tokens(n_groups, n_files)
    if tokens is None:
        # token search exhausted its budget (see _group_tokens) — take
        # the sampled range layout instead: one extra sampling pass,
        # same contiguous-per-file property
        part = vdf.repartitionByRange(n_files, F.col(value_col))
    else:
        grp = F.shiftright(F.col(value_col), total_bits - group_bits)
        token = F.element_at(
            F.array(*[F.lit(t) for t in tokens]), grp.cast("int") + 1
        )
        part = vdf.repartition(n_files, token)
    (
        part.sortWithinPartitions(value_col)
        .drop(value_col)
        .write.mode("overwrite")
        .parquet(path)
    )
