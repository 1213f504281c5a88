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


#: Round-11 driver-window front: the three NEW entries first (the
#: Hudi HFILE data-block read closing the last log refusal, the
#: partition-evolution iceberg read, the HFile-base metadata-table
#: read), then ALL 21 entries whose last driver
#: verdict is r6 vintage, then the 8 r7-vintage entries, then the 20
#: oldest r8-vintage entries in registry order — after this window no
#: entry's last driver verdict is older than r8 (the r10 bar was r6;
#: the ask was r7).  The driver samples the first 50 ``queries()``
#: entries.
_ROUND11_FRONT = (
    # new in r11:
    "hudi_hfile_block_read",    # NEW — HFILE_DATA_BLOCK (hfile_lite:
                                # v2/v3 trailers, gz, CRC32C, mvcc)
                                # through the MOR snapshot merge
    "iceberg_partition_evolution_read",  # NEW — per-manifest identity
                                # constants across evolved specs
    "hudi_metadata_table_read",  # NEW — HFile BASE files (metadata
                                # table layout) + complex-avro mapping
    # r6 vintage (all 21):
    "mm_wav_dominant_freq", "mm_mp3_id3_tags", "mm_mp3_demux_stats",
    "q2_min_cost_supplier", "q4_order_priority", "q7_volume_shipping",
    "q8_market_share", "q9_product_profit", "q11_important_stock",
    "q12_shipping_lag", "q15_top_supplier", "q16_supplier_part_cnt",
    "q17_small_qty_revenue", "q19_discounted_revenue",
    "q20_part_promotion", "q21_waiting_suppliers",
    "q22_global_sales_opportunity", "sim_lsh_topk", "text_winnow_pairs",
    "text_source_cap", "text_repetition_filter",
    # r7 vintage (all 8):
    "sim_quantize_int8", "s6b_setops_all", "text_pii_redact",
    "data_shard_split", "seq_pack_bins", "a9_approx_quantiles",
    "mm_gif_frames_stats", "dedup_incremental",
    # r8 vintage, registry order (first 20):
    "a4_approx_distinct", "events_retention_cohorts",
    "text_gopher_filter", "events_daily_anomaly", "interval_overlap_join",
    "scd2_point_in_time_join", "text_unicode_nfc", "snapshot_time_travel",
    "snapshot_merge_delete", "text_weighted_sample",
    "text_paragraph_dedup", "snapshot_change_feed", "sim_semantic_dedup",
    "text_warc_roundtrip", "sim_ann_index_search", "s13_recursive_cte",
    "j9_lateral_topk", "f12_higher_order",
    # (a10_kmv_distinct and graph_pagerank dropped to keep the window
    # at exactly 50 when the two extra r11-new entries fronted; both
    # remain r8-vintage and covered by the full gate)
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    The driver's correctness gate samples the FIRST 50 entries.  Round-11
    rotation: the r11-new entry, then stalest-verdict entries
    (``_ROUND11_FRONT``), then everything else newest-first.  An unknown
    front name RAISES — a typo'd or renamed entry must not silently skip
    its re-adjudication (VERDICT r8 "what's wrong" #3).
    tests/test_oracle_all.py stays authoritative over ALL entries."""
    from easy_sql_spark.queries import QUERIES

    unknown = [k for k in _ROUND11_FRONT if k not in QUERIES]
    if unknown:
        raise KeyError(
            f"_ROUND11_FRONT names not in the query registry: {unknown}"
        )
    front = {k: QUERIES[k] for k in _ROUND11_FRONT}
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
