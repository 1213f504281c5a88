"""Connected components via alternating large-star / small-star rounds.

The neighbor-min label propagation in ``queries/llm_ops.py``
``dedup_components`` needs rounds proportional to the component DIAMETER —
right for near-dup clusters (tiny diameters), terminal for pathological
graphs (a 10k-node chain).  This module carries the escape hatch: the
alternating-star algorithm of Kiveris et al., "Connected Components in
MapReduce and Beyond" (SOCC'14), which contracts components toward their
minimum node in O(log n) rounds regardless of diameter.

Each round is two half-steps over the edge list alone (no separate label
table):

- **large-star**: every node u emits (v, m) for each strictly larger
  neighbor v, where m = min(u ∪ N(u)) — big nodes hook onto their
  neighborhood minimum;
- **small-star**: orient each edge (max, min); every node u emits (v, m)
  for its smaller neighbors and itself — flattening local trees into
  stars.

At the fixed point every edge is (node, component-min).  Convergence is
detected by an (order-insensitive) edge-set checksum going stable:
count + bit_xor of xxhash64(u, v) — two map-side-combined aggregates per
round, no extra join.  Both half-steps are one groupBy + one equi-join on
uniform node ids; the intermediate edge set never exceeds ~2|E|, so the
plan scales to billion-edge graphs the way the paper's MapReduce original
does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .iterate import iter_checkpoint


def _large_star(edges: DataFrame) -> DataFrame:
    und = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = und.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.select("u", F.least("u", "mv").alias("m"))
    return (
        und.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    dird = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = dird.groupBy("u").agg(F.min("v").alias("m"))
    return (
        dird.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionAll(mins.select("u", F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _checksum(edges: DataFrame) -> tuple[int, int]:
    # bit_xor: order-insensitive, overflow-free under ANSI mode (edges are
    # distinct, so xor cancellation of duplicates cannot occur)
    row = edges.select(F.xxhash64("u", "v").alias("h")).agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(h)"), F.lit(0)).alias("x"),
    ).first()
    return int(row.n), int(row.x)


def connected_components_star(
    edges: DataFrame,
    u: str = "u",
    v: str = "v",
    max_rounds: int | None = None,
) -> DataFrame:
    """Component labels ``(u, label)`` — label = min node id of the
    component — for an undirected edge list, in O(log n) star rounds.

    ``max_rounds`` defaults to ``2*ceil(log2(|V|+2)) + 8``; exceeding it
    raises (the same fail-loudly contract as the label-propagation
    variant), but unlike a diameter-bound cap this one only trips on a
    genuine bug, not on a legal-but-long chain."""
    import math

    e = (
        edges.select(F.col(u).alias("u"), F.col(v).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .transform(iter_checkpoint)
    )
    nodes = (
        e.select("u")
        .unionAll(e.select(F.col("v").alias("u")))
        .distinct()
        .transform(iter_checkpoint)
    )
    if max_rounds is None:
        n_nodes = nodes.count()
        max_rounds = 2 * math.ceil(math.log2(n_nodes + 2)) + 8

    prev = _checksum(e)
    converged = False
    for _ in range(max_rounds):
        e = _small_star(_large_star(e)).transform(iter_checkpoint)
        cur = _checksum(e)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge within "
            f"{max_rounds} rounds"
        )
    mapping = e.groupBy("u").agg(F.min("v").alias("label"))
    return nodes.join(mapping, "u", "left").select(
        "u", F.coalesce("label", F.col("u")).alias("label")
    )


def label_propagation_components(
    edges: DataFrame, max_rounds: int = 20
) -> DataFrame:
    """Neighbor-min label propagation with automatic escalation.

    ``edges`` must be SYMMETRIZED (both directions present), columns
    ``u, v``.  Rounds needed equal the component diameter — the right
    cost model for near-dup clusters (tiny diameters, each round one
    join + aggregate).  A graph whose diameter exceeds ``max_rounds``
    is legal, just pathological for this plan, so instead of failing the
    loop ESCALATES to ``connected_components_star`` (O(log n) rounds
    regardless of diameter) and still returns exact labels.

    Returns ``(u, label)`` with label = component minimum."""
    edges = edges.transform(iter_checkpoint)
    # labels is a cheap distinct over the CHECKPOINTED edges — its two
    # consumers inside iteration 1 reuse the distinct's Exchange within
    # that one job, so a separate checkpoint here would only add a
    # barrier (one job per label_propagation call) without saving work
    labels = (
        edges.select("u")
        .distinct()
        .select("u", F.col("u").alias("label"))
    )

    def _neighbor_min(lab: DataFrame) -> DataFrame:
        return (
            edges.alias("e")
            .join(lab.alias("l"), F.col("e.v") == F.col("l.u"))
            .groupBy(F.col("e.u").alias("nu"))
            .agg(F.min(F.col("l.label")).alias("nmin"))
        )

    changed = 0
    # TWO propagation steps fused per iteration: near-dup components
    # have diameter 1-2, so the common case converges with ONE
    # checkpoint + ONE convergence count instead of two of each — the
    # barrier (job) count, not the data volume, is what this loop costs
    # at small diameters.  The moved flag reflects the SECOND step: if
    # nothing moved there, the first step's output (== the returned
    # labels) is a fixed point, so stopping is exact.
    for _ in range((max_rounds + 1) // 2):
        mid = (
            labels.alias("l2")
            .join(_neighbor_min(labels), F.col("l2.u") == F.col("nu"), "left")
            .select(
                F.col("l2.u").alias("u"),
                F.least(
                    F.col("l2.label"),
                    F.coalesce(F.col("nmin"), F.col("l2.label")),
                ).alias("label"),
            )
        )
        # carry a per-row moved flag so convergence detection is a filter
        # over the materialized checkpoint instead of an extra old-vs-new
        # join per round (one fewer shuffle join per iteration)
        updated = (
            mid.alias("l2")
            .join(_neighbor_min(mid), F.col("l2.u") == F.col("nu"), "left")
            .select(
                F.col("l2.u").alias("u"),
                F.least(
                    F.col("l2.label"),
                    F.coalesce(F.col("nmin"), F.col("l2.label")),
                ).alias("label"),
                (
                    F.coalesce(F.col("nmin"), F.col("l2.label"))
                    < F.col("l2.label")
                ).alias("moved"),
            )
        ).transform(iter_checkpoint)
        changed = updated.where("moved").limit(1).count()
        labels = updated.drop("moved")
        if changed == 0:
            break
    if changed != 0:
        # diameter exceeds the round cap: escalate to the star algorithm
        return connected_components_star(edges)
    return labels
