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


#: Round-8 driver-window front (VERDICT r7 asks #1/#3).  Stale-verdict
#: entries first — entries whose oracle or query code changed AFTER their
#: last driver verdict:
#:   - snapshot_dv_delete: the r7 red row.  Adjudicated an ORACLE dtype
#:     bug (uncast UNION ALL legs widened SUM(k) to HUGEINT -> pandas
#:     float64 "1956150.0" vs Spark bigint "1956150"); outer CAST landed
#:     r8 (queries/llm_ops5.py) — must end the r5/r7 red streak.
#:   - a4_approx_distinct: its exact-regime oracle landed r7 AFTER the r7
#:     window was sampled; the new oracle has never been
#:     driver-adjudicated.
#: Then entries new or re-planned in r8 so they get first verdicts.
_ROUND8_FRONT = (
    "snapshot_dv_delete",
    "a4_approx_distinct",
    "hudi_mor_kryo_delete_read",
    "dedup_index_incremental",
    # oracle+code changed r8 (explicit zero-token rate, found by fuzzing)
    "data_mixture_weights",
    # plan changed r8 (training-slice materialized once; semantics pinned
    # by the unchanged oracle)
    "sim_ann_index_search",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    The driver's correctness gate samples the FIRST 50 entries.  Round-8
    rotation: stale-verdict entries (oracle/code changed after their last
    driver verdict) and round-8 additions first (``_ROUND8_FRONT``), then
    everything else newest-first so recent rounds' entries fill the rest
    of the window.  tests/test_oracle_all.py stays authoritative over ALL
    entries."""
    from easy_sql_spark.queries import QUERIES

    front = {k: QUERIES[k] for k in _ROUND8_FRONT if k in QUERIES}
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
