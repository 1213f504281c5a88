"""Deterministic distributed Lloyd k-means over an array<double> column.

The coarse quantizer behind IVF ANN (operators/ann_index.py) and
SemDeDup-style semantic dedup (queries/llm_ops4.py:sim_semantic_dedup).
Deterministic by construction so a SQL oracle can replay it exactly:

- seeds = the vectors with the K smallest ids (no RNG);
- per-dim centroid means accumulate in DECIMAL(30,10), so summation
  order across partitions cannot perturb the result (the
  sim_ivf_topk recipe);
- assignment = argmin of a sequential squared-L2 fold with
  first-index tie-break;
- an emptied cluster keeps its previous centroid.

Scale shape: each assignment is a NARROW projection — the K x dim
centroid matrix is embedded as a literal (k-means' standard broadcast),
so no join and no shuffle; each update is ONE map-side-combined
(cluster, dim) aggregate whose K x dim result is all the driver ever
holds.  Cost per iteration is one scan + one tiny shuffle regardless of
corpus size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .iterate import iter_checkpoint

#: assignment dispatch (r14, guide §4.2): at/above this many centroid
#: CELLS (K x dim) the interpreted JVM fold — K aggregates x dim lambda
#: steps PER ROW — is replaced by ``_assign_fold_kernel``, a numpy
#: kernel that performs the IDENTICAL IEEE op sequence per Arrow batch
#: (bit-exact; pinned by test_assign_clusters_kernel_bit_exact).
#: Measured on local[32], dim=64, interleaved A/B min-of-2
#: (tools/probe_assign_scale.py): at 512 cells (k=8, the semdedup
#: fixture) the kernel's Python-stage constant loses at every n
#: (0.97→1.82 s at n=200k); at 2048 cells (k=32) it wins from n=20k up
#: (0.39→0.31 s) and costs ~0.02 s at n=2k; at 16384 cells (k=256) it
#: wins 2.6-4.8x (21.8→8.3 s at n=200k).  Production K follows the
#: corpus (k ~ n/500 — see semantic_dedup), so large-K IS the
#: at-scale regime; fixture-sized K (8/16 → 512/1024 cells) stays on
#: the fold path with a byte-identical plan.  Override via
#: ``EASY_SQL_ASSIGN_KERNEL_MIN_CELLS``.
ASSIGN_KERNEL_MIN_CELLS = 2048

#: skew guard for the per-cluster pairwise kernels (VERDICT r14 #5):
#: the n_c x n_c similarity matrix is computed in row BLOCKS of at most
#: this many CELLS (~128 MB of doubles at the default), so a degenerate
#: clustering (one giant cluster — exactly what near-duplicate corpora
#: produce) bounds task memory at block_rows x n_c instead of n_c^2.
#: Blocking slices the same elementwise IEEE ops the whole-matrix form
#: performs (identical per-cell op sequence, identical bits — pinned by
#: test_semantic_dedup_blocked_kernel_exact); clusters whose full
#: matrix fits run exactly one block, i.e. the pre-guard code path.
#: Override via ``EASY_SQL_PAIRWISE_BLOCK_CELLS``.
PAIRWISE_BLOCK_CELLS = 1 << 24


def _env_int(name: str, default: int) -> int:
    """Env-var integer override with a descriptive error — a malformed
    value must fail as a configuration error naming the variable, not
    as a bare ValueError deep inside a query plan (ADVICE r14)."""
    raw = os.environ.get(name)
    if raw is None or raw == "":
        return default
    try:
        return int(raw)
    except ValueError:
        raise ValueError(
            f"environment variable {name} must be an integer, got {raw!r}"
        ) from None


def assign_clusters(
    df: DataFrame, centroids: list[list[float]], vec_col: str = "v",
    out_col: str = "cluster",
) -> DataFrame:
    """Add ``out_col``: the 0-based index of the nearest centroid
    (squared L2, sequential fold, first-min tie-break).  Pure narrow
    projection — centroids ride as a literal (small K) or inside an
    Arrow kernel reproducing the same bits (large K); nothing shuffles
    either way, and the two paths are bit-identical (same IEEE op
    sequence — see ``_assign_fold_kernel``), so the dispatch threshold
    can never change a result."""
    if out_col in df.columns:
        # the fold path's withColumn would silently replace while the
        # kernel path appends — refuse on BOTH so the dispatch
        # threshold can never change behavior (ADVICE r14)
        raise ValueError(f"column {out_col!r} already exists")
    cells = len(centroids) * (len(centroids[0]) if centroids else 0)
    gate = _env_int(
        "EASY_SQL_ASSIGN_KERNEL_MIN_CELLS", ASSIGN_KERNEL_MIN_CELLS
    )
    if cells >= gate:
        return _assign_fold_kernel(df, centroids, vec_col, out_col)
    return _assign_fold(df, centroids, vec_col, out_col)


def _assign_fold(
    df: DataFrame, centroids: list[list[float]], vec_col: str,
    out_col: str,
) -> DataFrame:
    """The JVM fold formulation (the oracle-replay reference).

    The K x dim literal is built as ONE parsed SQL expression, not
    K*dim nested ``F.lit`` Column objects: each Column constructor is a
    py4j round-trip, and at k=16 x 64 dims the old form cost ~1000
    driver<->JVM calls PER assignment — the dominant constant of the
    kmeans lifecycle queries (measured via cProfile: socket.recv_into).
    ``repr(float)`` is shortest-round-trip, so the parsed doubles are
    bit-identical to the originals."""
    lit = F.expr(
        "array(" + ",".join(
            "array(" + ",".join(f"{float(x)!r}D" for x in c) + ")"
            for c in centroids
        ) + ")"
    )
    dists = F.expr(
        f"transform(__cents, c -> aggregate("
        f"zip_with({vec_col}, c, (x, y) -> (x - y) * (x - y)), "
        f"0D, (a, z) -> a + z))"
    )
    return (
        df.withColumn("__cents", lit)
        .withColumn("__d", dists)
        .withColumn(
            out_col,
            (F.array_position("__d", F.array_min("__d")) - 1).cast("int"),
        )
        .drop("__cents", "__d")
    )


def _assign_fold_kernel(
    df: DataFrame, centroids: list[list[float]], vec_col: str,
    out_col: str,
) -> DataFrame:
    """Ordered-exact Arrow kernel: BIT-identical to ``_assign_fold``
    by construction, not by accident (the ``_cluster_flags``
    discipline).  Per dimension d in ascending order the fold computes
    ``z = (x_d - c_d) * (x_d - c_d)`` (one rounded subtract, one
    rounded multiply) and ``acc = acc + z`` (one rounded add); the
    kernel performs the same three ops per (row, centroid, dim) cell as
    numpy elementwise ops — each a separately rounded IEEE double op —
    accumulating over d in the same ascending order, so every distance
    carries the identical bits and ``argmin`` (first minimum) picks the
    index ``array_position(__d, array_min(__d)) - 1`` picked.  Same
    preconditions as the fold's oracle replay: finite non-null doubles,
    vectors sized to the centroid dim.

    Cost: the fold evaluates K interpreted Catalyst lambdas x dim steps
    per row; the kernel does 3 vectorized passes per dim over an
    (arrow_batch x K) matrix — measured 2.6-4.8x faster at
    production-sized K (see ASSIGN_KERNEL_MIN_CELLS) at the price of
    one ArrowEvalPython stage."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    out_schema = _with_out_col(df, out_col)

    def _assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            acc = np.zeros((len(V), len(C)))
            for d in range(C.shape[1]):
                diff = V[:, d][:, None] - C[None, :, d]
                acc += diff * diff
            pdf = pdf.copy()
            pdf[out_col] = acc.argmin(axis=1).astype("int32")
            yield pdf

    return df.mapInPandas(_assign, out_schema)


def _with_out_col(df: DataFrame, out_col: str):
    """Output schema for the assignment kernels: ``df``'s fields plus
    ``out_col`` (int).  Callers guarantee ``out_col`` is absent — see
    the guard in :func:`assign_clusters`."""
    from pyspark.sql import types as T

    return T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.IntegerType())]
    )


def assign_clusters_arrow(
    df: DataFrame, centroids: list[list[float]], vec_col: str = "v",
    out_col: str = "cluster",
) -> DataFrame:
    """Vectorized assignment: one BLAS distance matrix per Arrow
    batch (||v||^2 - 2 v.C^T + ||c||^2, argmin with first-index
    tie-break — same tie rule as :func:`assign_clusters`).  BLAS may
    reorder float sums, so a NEAR-TIED pair of centroids can flip
    relative to the fold path; use for production scale, keep the fold
    path for bit-pinned oracle replays."""
    import numpy as np

    if out_col in df.columns:
        raise ValueError(f"column {out_col!r} already exists")
    C = np.asarray(centroids, dtype=np.float64)
    c2 = (C * C).sum(axis=1)
    out_schema = _with_out_col(df, out_col)

    def _assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            d2 = (V * V).sum(axis=1)[:, None] - 2.0 * (V @ C.T) + c2[None, :]
            pdf = pdf.copy()
            pdf[out_col] = d2.argmin(axis=1).astype("int32")
            yield pdf

    return df.mapInPandas(_assign, out_schema)


def lloyd_kmeans(
    df: DataFrame,
    k: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "v",
    arrow: bool = False,
) -> list[list[float]]:
    """Train centroids; returns the K x dim matrix (driver-side floats,
    tiny).  ``df`` needs a unique numeric ``id_col`` (seed selection =
    the K smallest ids) and an array<double> ``vec_col``."""
    seeds = (
        df.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(k)
        .collect()  # bounded-driver: exactly k seed rows
    )
    if len(seeds) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(seeds)}")
    cents = [list(r[vec_col]) for r in seeds]
    assign = assign_clusters_arrow if arrow else assign_clusters
    for _ in range(iters):
        assigned = assign(df, cents, vec_col=vec_col)
        cd = (
            assigned.select("cluster", F.posexplode(vec_col).alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(30,10)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("c")
            )
            .collect()  # bounded-driver: K x dim centroid cells
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in cd:
            by_cluster.setdefault(r.cluster, {})[r.dim] = r.c
        cents = [
            [by_cluster[j][d] for d in sorted(by_cluster[j])]
            if j in by_cluster
            else cents[j]  # empty cluster keeps its previous centroid
            for j in range(k)
        ]
    return cents


def semantic_dedup(
    df: DataFrame,
    k: int,
    iters: int,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "v",
    arrow: bool = False,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means the embedding space, then
    drop any vector with a more-senior (smaller id) cluster-mate above
    cosine ``tau``.  Returns (id, cluster, kept 0/1).

    SIZE K WITH THE CORPUS: the pairwise stage is an equi-join on
    cluster id, so per-cluster work is (n/k)^2 — the recipe keeps the
    expected cluster size CONSTANT (k ~ n/500..n/5000, as the paper
    does with k=11k for 600M docs).  A fixed k at growing n is
    quadratic; tests/SCALE.md measure exactly that cliff.  Norms are
    computed once per vector before the join.

    The default path is BIT-PINNED: the per-cluster kernel reproduces
    the JVM fold chain's IEEE op sequence exactly (see the comment at
    ``_cluster_flags``), so a DuckDB oracle replay matches to the last
    ulp.  ``arrow=True`` runs the pairwise stage as one BLAS matmul per
    cluster instead (fastest; memory per task is cluster_size^2 floats,
    bounded by the k ~ n/500 sizing) — BLAS may reorder float
    summations, so a cosine EXACTLY at ``tau`` could flip relative to
    the default path (flag-equality between the paths is pinned on the
    fixture in tests/test_operators.py)."""
    norm = F.sqrt(F.expr(
        f"aggregate(transform({vec_col}, t -> t * t), 0D, (acc, z) -> acc + z)"
    ))
    cents = lloyd_kmeans(
        df, k, iters, id_col=id_col, vec_col=vec_col, arrow=arrow
    )
    assign = assign_clusters_arrow if arrow else assign_clusters
    # no checkpoint: each branch below consumes ``af`` exactly once
    # (the default branch no longer joins the drop set back), so a
    # materialization barrier would only add a job
    af = assign(df, cents, vec_col=vec_col).withColumn("nrm", norm)
    # skew guard (VERDICT r14 #5): both pairwise kernels compute the
    # n_c x n_c similarity matrix in row blocks of <= block_cells cells,
    # so one degenerate giant cluster costs block_rows x n_c memory per
    # pass instead of n_c^2 (the join formulation this kernel replaced
    # would have spilled there; an applyInPandas task cannot).  A
    # cluster whose full matrix fits runs exactly one block == the
    # unblocked computation.
    block_cells = max(1, _env_int(
        "EASY_SQL_PAIRWISE_BLOCK_CELLS", PAIRWISE_BLOCK_CELLS
    ))
    if arrow:
        af = af.transform(iter_checkpoint)  # consumed twice below
        tau_f = float(tau)

        def _cluster_dropped(pdf):
            import numpy as np
            import pandas as _pd

            ids = pdf[id_col].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)[order]
            nrm = np.sqrt((V * V).sum(axis=1))
            n = len(ids)
            blk = max(1, block_cells // max(n, 1))
            dropped = np.zeros(n, dtype=bool)
            j_idx = np.arange(n)
            for i0 in range(0, n, blk):
                i1 = min(n, i0 + blk)
                S = (V[i0:i1] @ V.T) / (nrm[i0:i1, None] * nrm[None, :])
                senior = j_idx[None, :] > np.arange(i0, i1)[:, None]
                dropped |= ((S > tau_f) & senior).any(axis=0)
            return _pd.DataFrame({id_col: ids[dropped]})

        dropped = (
            af.select(id_col, vec_col, "cluster")
            .groupBy("cluster")
            .applyInPandas(_cluster_dropped, f"{id_col} long")
        )
        return (
            af.join(dropped.withColumn("__dropped", F.lit(1)), id_col, "left")
            .select(
                id_col,
                "cluster",
                F.when(F.col("__dropped").isNull(), 1).otherwise(0)
                .cast("int").alias("kept"),
            )
        )

    # Default (bit-pinned) pairwise stage: ONE applyInPandas per cluster
    # computing the kept flag directly, replacing the former
    # x JOIN y ON cluster + distinct + LEFT JOIN chain (three exchanges
    # and their AQE stage jobs) AND its interpreted per-pair JVM folds
    # (|cluster|^2 x dim lambda evaluations).  Bit-identical to that
    # fold chain BY CONSTRUCTION, not by accident: the dot accumulates
    # with one elementwise product + one add per dimension in ascending
    # order (exactly aggregate(zip_with(xv, yv, *)) left-folding +), the
    # norms are the JVM-computed ``nrm`` column carried through, and the
    # cosine is dot / (nrm_x * nrm_y) with the same operand order; every
    # numpy elementwise op is a separately rounded IEEE double op, so
    # the comparison against tau sees the identical bits the fold path
    # produced (pinned by test_semantic_dedup_pairwise_kernel_exact).
    # Memory per task is cluster_size^2 doubles — bounded by the
    # K ~ n/500 sizing exactly like the arrow path above.
    tau_f = float(tau)

    def _cluster_flags(pdf):
        import numpy as np
        import pandas as _pd

        order = np.argsort(pdf[id_col].to_numpy())
        ids = pdf[id_col].to_numpy()[order]
        V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)[order]
        nrm = pdf["nrm"].to_numpy()[order]
        n = len(ids)
        # row-blocked (skew guard — see block_cells above); every
        # per-cell op and its d-ascending accumulation order are
        # IDENTICAL to the whole-matrix form (the blocks merely slice
        # rows of the same elementwise expressions), so the kept flags
        # carry the same bits on both sides of the block boundary
        # (pinned by test_semantic_dedup_blocked_kernel_exact)
        blk = max(1, block_cells // max(n, 1))
        dropped = np.zeros(n, dtype=bool)
        j_idx = np.arange(n)
        for i0 in range(0, n, blk):
            i1 = min(n, i0 + blk)
            acc = np.zeros((i1 - i0, n))
            for d in range(V.shape[1]):
                col = V[:, d]
                acc += col[i0:i1, None] * col[None, :]
            cos = acc / (nrm[i0:i1, None] * nrm[None, :])
            senior = j_idx[None, :] > np.arange(i0, i1)[:, None]
            dropped |= ((cos > tau_f) & senior).any(axis=0)
        return _pd.DataFrame(
            {
                id_col: ids,
                "cluster": pdf["cluster"].to_numpy()[order],
                "kept": (~dropped).astype("int32"),
            }
        )

    return (
        af.select(id_col, vec_col, "nrm", "cluster")
        .groupBy("cluster")
        .applyInPandas(_cluster_flags, f"{id_col} long, cluster int, kept int")
    )
