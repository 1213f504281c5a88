"""Skew-aware join: explicit key salting for hot keys.

AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
default in our sessions) splits oversized shuffle partitions at runtime and
is the first line of defense.  Salting is the complement for the cases AQE
cannot fix: a single join KEY so hot it dominates one partition (AQE can
split a partition, but a sort-merge join still needs all rows of one key
together on the probe side build), aggregations feeding a join, and
streaming joins where AQE does not apply.

``salted_join`` replicates the *small* side ``salt`` times (size × salt —
keep salt modest) and scatters the *large* side uniformly with a random or
hash-derived salt column, so one hot key spreads over ``salt`` partitions:

    large ⋈ small on k  →  (large + salt_l) ⋈ (small × salt) on (k, salt)

Only inner and left joins are offered: right/full-outer would produce
``salt`` copies of unmatched small-side rows, which no cheap post-fix
dedups correctly at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt__"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt: int = 8,
    deterministic: bool = True,
) -> DataFrame:
    """Join ``large`` to ``small`` on equi-keys with ``salt``-way key
    spreading.

    ``deterministic=True`` derives the salt from a hash of the large side's
    whole row (stable across retries — safe under speculative execution);
    ``False`` uses ``rand()`` (marginally cheaper, nondeterministic task
    retries).  The small side is exploded ``salt`` times via an array
    literal — no shuffle, the replication happens map-side on (usually)
    a broadcast.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    for k in keys:
        if k not in large.columns or k not in small.columns:
            raise ValueError(f"join key {k!r} missing from one side")
    if SALT_COL in large.columns or SALT_COL in small.columns:
        raise ValueError(f"{SALT_COL} already present")

    if deterministic:
        scatter = F.pmod(F.hash(*[F.col(c) for c in large.columns]), F.lit(salt))
    else:
        scatter = (F.rand(seed=42) * salt).cast("int")
    salted_large = large.withColumn(SALT_COL, scatter)

    replicated_small = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = salted_large.join(replicated_small, keys + [SALT_COL], how)
    return joined.drop(SALT_COL)


def explode_skewed_agg(
    df: DataFrame,
    group_cols: list[str],
    agg_exprs: dict[str, str],
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys: partial aggregate on
    (keys, salt), then final aggregate on keys.

    Only algebraic aggregates decompose this way; supported: sum, count,
    min, max.  (avg = sum/count composed by the caller.)  Spark's hash
    aggregate already does map-side partials, so this matters only when one
    key's partials STILL overwhelm a reducer — i.e. extreme cardinality
    skew at very large scale.
    """
    decompose = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for col, fn in agg_exprs.items():
        if fn not in decompose:
            raise ValueError(f"non-algebraic aggregate {fn!r} for {col!r}")

    salted = df.withColumn(
        SALT_COL, F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    partial = salted.groupBy(*group_cols, SALT_COL).agg(
        *[
            getattr(F, fn)(col).alias(f"__p_{col}")
            for col, fn in agg_exprs.items()
        ]
    )
    final = partial.groupBy(*group_cols).agg(
        *[
            getattr(F, decompose[fn])(f"__p_{col}").alias(f"{fn}_{col}")
            for col, fn in agg_exprs.items()
        ]
    )
    return final
