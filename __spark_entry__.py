"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()``/``oracle_sql()`` expose the declared operator inventory
(SURVEY.md §2E + LLM-pipeline extensions) with DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from easy_sql_spark.queries import QUERIES
    from easy_sql_spark.session import tune_session

    tune_session(spark)
    return QUERIES["a1_pricing_summary"](spark, "/root/testdata/sf0.001")


#: Round-7 driver-window front (VERDICT r6 ask #2).  After six rounds the
#: union of driver-checked entries covers all but these 9 (the overflow of
#: the 50-entry r6 window plus the two r6 Hudi additions) — front them so
#: driver coverage closes to 159/159.  Then the two entries whose only
#: driver verdict was red-but-since-fixed: sim_quantize_int8 (r6 red: the
#: driver canonicalizer crashed on its raw array<int> column, now
#: flattened via array_join) and snapshot_dv_delete (r5 red, fixed +
#: stress-tested in r6, never re-adjudicated).
_ROUND7_FRONT = (
    "s6b_setops_all", "text_pii_redact", "data_shard_split",
    "seq_pack_bins", "mm_gif_frames_stats", "dedup_incremental",
    "hudi_mor_interop_read", "hudi_export_roundtrip",
    # rows-only (no hash verdict possible) goes last in the never-checked
    # block so oracle-backed entries get hash verdicts first
    "a9_approx_quantiles",
    # red-row re-confirmations
    "sim_quantize_int8", "snapshot_dv_delete",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    The driver's correctness gate samples the FIRST 50 entries.  Round-7
    rotation: the 9 never-driver-checked entries and the 2 red-row
    re-confirmations first (``_ROUND7_FRONT``), then everything else
    newest-first so round-6/7 additions fill the rest of the window.
    tests/test_oracle_all.py stays authoritative over ALL entries."""
    from easy_sql_spark.queries import QUERIES

    front = {k: QUERIES[k] for k in _ROUND7_FRONT if k in QUERIES}
    rest = {
        k: v
        for k, v in reversed(list(QUERIES.items()))
        if k not in front
    }
    return {**front, **rest}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query."""
    from easy_sql_spark.queries import ORACLES

    return dict(ORACLES)
