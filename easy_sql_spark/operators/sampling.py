"""Deterministic weighted sampling without replacement, per key.

Sequential Poisson sampling (Ohlsson 1998; a.k.a. weighted order
sampling): each row gets priority ``xi = u / w`` for a uniform ``u``
and weight ``w``; the k smallest priorities per key form the sample.
Inclusion probability is approximately proportional to size (PPS) —
the standard design when a training-data mixture should favor, e.g.,
longer or higher-quality documents while staying a bona-fide sample.

Engineering choices, all for cross-engine/cluster determinism:

- ``u`` comes from an md5 hash of the row id, not an RNG: the sample is
  REPRODUCIBLE across runs, engines and partitionings (df.sample seeds
  per partition — resizing the cluster changes the sample).
- The priority is ``H / w`` where ``H`` is the hash's first 13 hex
  digits as an exact integer (< 2^52, exactly representable) and the
  division is a single IEEE operation — exactly rounded, hence
  BIT-IDENTICAL in any IEEE engine.  The usual exponential-key variant
  (``u^(1/w)``) ranks identically in distribution but sits behind
  ``ln``/``pow``, which are NOT exactly specified and can flip
  near-ties between engines.
- One hash + one window per key: a single shuffle on the key columns,
  the same cost envelope as any per-key top-k.  At 100 TB with a hot
  key, combine with operators/skew.py's two-phase cap to pre-thin
  before the exact window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 13 hex digits = 52 bits: the largest hash prefix a double holds exactly
_HEX_DIGITS = 13


def priority_col(id_col: str, weight_col: str) -> F.Column:
    """The sequential-Poisson priority ``H / w`` (see module docstring).
    NULL/non-positive weights have no defined priority —
    ``weighted_sample_per_key`` EXCLUDES such rows from the sample (a
    weight of 0 means "never sample"); callers who need bad weight data
    to fail loudly should validate upstream (e.g. a ``check.`` step or
    ``F.assert_true``) before sampling."""
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, _HEX_DIGITS), 16, 10
    ).cast("double")
    return h / F.col(weight_col).cast("double")


def weighted_sample_per_key(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """k-row PPS-ish sample per key: the k smallest ``H/w`` priorities,
    ties broken by id.  Adds ``__rank`` (1-based selection order)."""
    w = Window.partitionBy(*key_cols).orderBy(
        priority_col(id_col, weight_col).asc(), F.col(id_col).asc()
    )
    return (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= k)
    )
