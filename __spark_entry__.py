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


#: Round-14 driver-window front: every registry entry whose execution
#: path changed in the r14 optimization round FIRST (plan/kernel changes
#: must be driver re-adjudicated the round they land), then the
#: remaining r10-vintage entries.  33 changed entries leave room for 17
#: of the 20 non-changed r10 vintages: changed-entry re-adjudication
#: takes precedence over vintage retirement, so the three alphabetically
#: last non-changed r10 entries (text_quality, text_stats_by_lang,
#: text_token_count) defer to the r15 window — after this window those
#: three are the only entries whose last driver verdict predates r11.
#: Vintages computed from the union of CORRECTNESS_r01..r13 (r10×27,
#: r11×49, r12×50, r13×50).  The driver samples the first 50
#: ``queries()`` entries.
_ROUND14_FRONT = (
    # changed in r14 (optimization round; semantics oracle-pinned —
    # see OPTIMIZATION_r14.md per-item notes), incl. the seven that are
    # ALSO r10 vintage (sim_ivf_topk, sim_topk_bruteforce,
    # text_bpe_merges, text_stratified_sample, scd2_history_merge,
    # upsert_keyed_merge, text_lm_perplexity):
    "graph_pagerank", "sim_ann_index_search", "sim_ivf_topk",
    "sim_mmr_rerank", "sim_lsh_topk", "sim_topk_bruteforce",
    "sim_recall_at_k", "sim_semantic_dedup", "dedup_components",
    "dedup_minhash_lsh", "dedup_incremental", "dedup_index_incremental",
    "s9_values_inline", "text_dsir_weights", "tokenizer_oov_rate",
    "text_bm25_topk", "data_mixture_weights", "text_paragraph_dedup",
    "text_stratified_sample", "text_bpe_merges", "text_source_cap",
    "snapshot_branch_lifecycle", "snapshot_merge_delete",
    "snapshot_incremental_rollup", "hudi_export_roundtrip",
    "hudi_export_mor_roundtrip", "upsert_keyed_merge",
    "scd2_history_merge", "text_lm_perplexity", "text_winnow_pairs",
    "dedup_substring_spans", "contamination_ngram",
    "global_row_number_order",
    # r10 vintage, the 17 of 20 not already fronted above (see note):
    "mm_jpeg_progressive_stats", "mm_jpeg_roundtrip_stats",
    "mm_mp4_demux_stats", "mm_wav_roundtrip_stats", "py_groupwise_mad",
    "q10_returned_items", "q13_customer_distribution",
    "q14_promo_revenue", "q18_large_orders", "q3_shipping_priority",
    "q5_local_supplier_volume", "s12_unpivot", "sim_label_centroids",
    "sim_neardup_pairs", "text_bpe_token_count",
    "text_html_boilerplate", "text_lang_id",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    The driver's correctness gate samples the FIRST 50 entries.  Round-14
    rotation: the r14-changed entries, then stalest-verdict entries
    (``_ROUND14_FRONT``), then everything else newest-first.  An unknown
    front name RAISES — a typo'd or renamed entry must not silently skip
    its re-adjudication (VERDICT r8 "what's wrong" #3).
    tests/test_oracle_all.py stays authoritative over ALL entries."""
    from easy_sql_spark.queries import QUERIES

    unknown = [k for k in _ROUND14_FRONT if k not in QUERIES]
    if unknown:
        raise KeyError(
            f"_ROUND14_FRONT names not in the query registry: {unknown}"
        )
    front = {k: QUERIES[k] for k in _ROUND14_FRONT}
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
