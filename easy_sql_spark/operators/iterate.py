"""Plan-truncation helper for ITERATIVE operators (connected
components, PageRank, k-means, BPE): each round must cut lineage or the
plan tree grows linearly in rounds and analysis time quadratically.

``localCheckpoint`` (the default) materializes to executor block
storage — free of HDFS round-trips, but blocks die with their executor,
and Spark cannot recompute past a truncated lineage, so on a REAL
cluster a lost executor mid-iteration kills the job.  On
``local[...]`` this cannot happen (one JVM), which is why it is the
right default for this repo's test/bench environment.

For cluster runs, set a RELIABLE checkpoint dir
(``spark.sparkContext.setCheckpointDir("hdfs://…/ckpt")`` or the
``spark.checkpoint.dir`` conf) and :func:`iter_checkpoint` switches to
``DataFrame.checkpoint`` — durable against executor loss, at the cost
of one distributed-FS write per round.  That is the standard Pregel /
GraphX trade (GraphX's own periodic-checkpoint guidance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def iter_checkpoint(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and truncate its lineage — reliably when the
    session has a checkpoint dir configured, executor-locally
    otherwise.  Eager in both modes (iterative callers always consume
    the result in the same round)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir():
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def iter_checkpoint_lazy(df: DataFrame) -> DataFrame:
    """Lineage-truncating checkpoint whose materialization FUSES into the
    caller's next full-scan action instead of paying a dedicated job.

    Iterative loops that immediately follow each round's checkpoint with
    an aggregate over the same frame (convergence counts, edge-set
    checksums) pay two scheduler round-trips per round with the eager
    form — at small data sizes the job-launch constant, not the scan,
    dominates (SCALE.md, dedup-index lifecycle).  The lazy form
    materializes the checkpoint inside the first action's job; every
    later consumer reads the cached blocks exactly as with the eager
    form.  Only safe when the caller GUARANTEES a full-scan action runs
    before the frame is consumed elsewhere (a limit/partial action may
    materialize a subset of partitions and defer the rest)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir():
        return df.checkpoint(eager=False)
    return df.localCheckpoint(eager=False)
