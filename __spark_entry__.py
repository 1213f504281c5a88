"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()``/``oracle_sql()`` expose the declared operator inventory
(SURVEY.md §2E + LLM-pipeline extensions) with DuckDB oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Self-locating: the driver may load this file by path from any cwd
# (importlib / spark-submit --py-files); ``easy_sql_spark`` lives next to
# it, so put our own directory on sys.path before the package imports
# below.  Executor workers are covered separately by
# easy_sql_spark.session.ship_package (sc.addPyFile of a package zip).
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from easy_sql_spark.queries import QUERIES
    from easy_sql_spark.session import tune_session

    tune_session(spark)
    return QUERIES["a1_pricing_summary"](spark, "/root/testdata/sf0.001")


#: Round-13 driver-window front: the one r13-CHANGED entry first
#: (dedup_index_incremental — registry-entry fixed-overhead cut), then
#: ALL 27 entries whose last driver verdict is r9 vintage, then the 22
#: alphabetically-next r10-vintage entries — after this window no
#: entry's last driver verdict is older than r10 (the r12 bar was r9).
#: Vintages computed from the union of CORRECTNESS_r01..r12
#: (r9×27, r10×50, r11×49, r12×50).  The driver samples the first 50
#: ``queries()`` entries.
_ROUND13_FRONT = (
    # changed in r13 (commit-overhead cut; semantics oracle-pinned):
    "dedup_index_incremental",
    # r9 vintage (all 27):
    "hudi_mor_kryo_delete_read", "hudi_mor_parquet_block_read",
    "j1_inner_equi", "j2_left_outer", "j3_full_outer", "j4_semi_anti",
    "j5_cross", "j6_broadcast", "j7_range_theta", "j8_nullsafe",
    "q6_forecast_revenue", "s10_explode", "s11_pivot",
    "s1_project_filter", "s2_topk", "s3_limit_offset", "s4_union_all",
    "s5_union_distinct", "s6_intersect_except", "s7_cte",
    "s8_correlated_subquery", "s9_values_inline", "sim_mmr_rerank",
    "w1_ranking", "w2_analytic", "w3_framed", "w4_distribution",
    # r10 vintage (alphabetically first 22 of the remaining 49):
    "asof_events_orders", "contamination_ngram", "dedup_components",
    "dedup_exact_groups", "dedup_exact_stats", "dedup_fingerprint",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_substring_spans", "emb_label_outliers", "emb_pca_project",
    "events_sessionize_batch", "global_row_number_order",
    "hudi_cdc_block_read", "iceberg_export_dv_partitioned",
    "iceberg_v3_dv_read", "mm_decode_stats", "mm_exif_orientation",
    "mm_frame_sample", "mm_hist_profile", "mm_image_ahash",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    The driver's correctness gate samples the FIRST 50 entries.  Round-13
    rotation: the r13-changed entry, then stalest-verdict entries
    (``_ROUND13_FRONT``), then everything else newest-first.  An unknown
    front name RAISES — a typo'd or renamed entry must not silently skip
    its re-adjudication (VERDICT r8 "what's wrong" #3).
    tests/test_oracle_all.py stays authoritative over ALL entries."""
    from easy_sql_spark.queries import QUERIES

    unknown = [k for k in _ROUND13_FRONT if k not in QUERIES]
    if unknown:
        raise KeyError(
            f"_ROUND13_FRONT names not in the query registry: {unknown}"
        )
    front = {k: QUERIES[k] for k in _ROUND13_FRONT}
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
