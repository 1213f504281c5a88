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


#: Round-15 driver-window front: stalest-driver-verdict entries first.
#: No registry entry's EXECUTION PATH changed in r15 (the round's
#: engine work was measurement/protocol + test-gate tiering — see
#: OPTIMIZATION_r15.md), so the whole 50-slot window goes to vintage
#: retirement: the three r10-vintage entries deferred from the r14
#: window (text_quality, text_stats_by_lang, text_token_count — the
#: r14 front-list promise), then all 41 remaining r11-vintage entries,
#: then the six alphabetically first r12-vintage entries.  After this
#: window no entry's last driver verdict predates r12.  Vintages
#: computed from the union of CORRECTNESS_r01..r14 (r10×3, r11×41,
#: r12×40, r13×42, r14×50).  The driver samples the first 50
#: ``queries()`` entries.
_ROUND15_FRONT = (
    # r10 vintage (the r14 deferral — MUST front this round):
    "text_quality", "text_stats_by_lang", "text_token_count",
    # r11 vintage, all 41, alphabetical:
    "a4_approx_distinct", "a9_approx_quantiles", "data_shard_split",
    "events_daily_anomaly", "events_retention_cohorts",
    "f12_higher_order", "hudi_metadata_table_read",
    "iceberg_partition_evolution_read", "interval_overlap_join",
    "j9_lateral_topk", "mm_gif_frames_stats", "mm_mp3_demux_stats",
    "mm_mp3_id3_tags", "mm_wav_dominant_freq", "q11_important_stock",
    "q12_shipping_lag", "q15_top_supplier", "q16_supplier_part_cnt",
    "q17_small_qty_revenue", "q19_discounted_revenue",
    "q20_part_promotion", "q21_waiting_suppliers",
    "q22_global_sales_opportunity", "q2_min_cost_supplier",
    "q4_order_priority", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "s13_recursive_cte", "s6b_setops_all",
    "scd2_point_in_time_join", "seq_pack_bins", "sim_quantize_int8",
    "snapshot_change_feed", "snapshot_time_travel",
    "text_gopher_filter", "text_pii_redact", "text_repetition_filter",
    "text_unicode_nfc", "text_warc_roundtrip", "text_weighted_sample",
    # r12 vintage, the six alphabetically first (fill to 50):
    "a10_kmv_distinct", "a1_pricing_summary", "a2_global_agg",
    "a3_distinct_agg", "a5_cube", "a5_grouping_sets",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    The driver's correctness gate samples the FIRST 50 entries.  Round-15
    rotation: stalest-driver-verdict entries first
    (``_ROUND15_FRONT``), then everything else newest-first.  An unknown
    front name RAISES — a typo'd or renamed entry must not silently skip
    its re-adjudication (VERDICT r8 "what's wrong" #3).
    tests/test_oracle_all.py stays authoritative over ALL entries."""
    from easy_sql_spark.queries import QUERIES

    unknown = [k for k in _ROUND15_FRONT if k not in QUERIES]
    if unknown:
        raise KeyError(
            f"_ROUND15_FRONT names not in the query registry: {unknown}"
        )
    front = {k: QUERIES[k] for k in _ROUND15_FRONT}
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
