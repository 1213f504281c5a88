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


#: Round-9 driver-window front (VERDICT r8 ask #5): changed-this-round
#: entries first, then the entries with the STALEST driver verdicts —
#: every registry entry has been driver-green at least once (union
#: r1–r8), but 49 entries' last verdict is r4 vintage (7+ rounds of code
#: movement since); fronting them refreshes the oldest evidence.  The
#: driver samples the first 50 ``queries()`` entries.
_ROUND9_FRONT = (
    # changed in r9:
    "hudi_mor_parquet_block_read",  # NEW — PARQUET-format Hudi log data blocks
    "dedup_index_incremental",      # re-planned: deferred one-commit lifecycle
    "hudi_mor_kryo_delete_read",    # kryo_lite decode path: varlong cap, Utf8
    "events_funnel",                # both sides: explicit NULL on an empty
                                    # funnel stage (ANSI 0-div, found by the
                                    # r9 funnel fuzzer)
    "sim_mmr_rerank",               # both sides: MMR score combination in
                                    # exact DECIMAL (5th-decimal half ties
                                    # were engine-dependent; found by the
                                    # r9 sf0.001 tri-SF sweep)
    # stalest (last driver verdict r4), registry order:
    "a1_pricing_summary", "a2_global_agg", "a3_distinct_agg", "a5_rollup",
    "a5_cube", "a5_grouping_sets", "a6_having", "j1_inner_equi",
    "j2_left_outer", "j3_full_outer", "j4_semi_anti", "j5_cross",
    "j6_broadcast", "j7_range_theta", "j8_nullsafe", "w1_ranking",
    "w2_analytic", "w3_framed", "s1_project_filter", "s2_topk",
    "s3_limit_offset", "q6_forecast_revenue", "s4_union_all",
    "s5_union_distinct", "s6_intersect_except", "s7_cte",
    "s8_correlated_subquery", "s9_values_inline", "s10_explode",
    "f1_string", "f2_datetime", "f3_math", "f4_json", "f5_hash",
    "f6_array", "f7_conversion", "f8_conditional", "a7_percentiles",
    "a8_derived_moments", "f9_string_agg", "w4_distribution", "s11_pivot",
    "f10_map_ops", "f11_struct_ops", "f2b_date_arith", "s12_unpivot",
    "dedup_exact_groups",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    The driver's correctness gate samples the FIRST 50 entries.  Round-9
    rotation: r9-changed entries then stalest-verdict entries
    (``_ROUND9_FRONT``), then everything else newest-first.  An unknown
    front name RAISES — a typo'd or renamed entry must not silently skip
    its re-adjudication (VERDICT r8 "what's wrong" #3).
    tests/test_oracle_all.py stays authoritative over ALL entries."""
    from easy_sql_spark.queries import QUERIES

    unknown = [k for k in _ROUND9_FRONT if k not in QUERIES]
    if unknown:
        raise KeyError(
            f"_ROUND9_FRONT names not in the query registry: {unknown}"
        )
    front = {k: QUERIES[k] for k in _ROUND9_FRONT}
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
