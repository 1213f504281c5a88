"""As-of join: for each left row, the latest right row with
``right.time <= left.time`` per key.

Implemented as union + window (NOT a range join): tag both sides, union on
(key, time), then ``last_value(right_cols) ignore nulls`` over an ordered
window.  This is the 100 TB-safe plan — one shuffle on the key, a sort
within partitions, zero row expansion; a naive ``t_r <= t_l`` theta join
explodes quadratically per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    how: str = "left",
) -> DataFrame:
    """Return ``left`` with ``right_values`` columns from the as-of match.

    Equal timestamps match (``<=`` semantics): right rows order before left
    rows at the same instant via the side tag.
    """
    lcols = left.columns
    l = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_values],
    )
    r = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in right_values],
    )
    w = (
        W.partitionBy("__k")
        .orderBy("__t", "__is_left")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = l.unionByName(r).select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in right_values
        ],
    )
    out = merged.where(F.col("__is_left") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__m_{c}").alias(c) for c in right_values],
    )
    if how == "inner":
        out = out.dropna(subset=[right_values[0]], how="any")
    return out
