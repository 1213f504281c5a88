"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on local Spark.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced through the ``noop`` sink — the full plan runs JVM-side
(scan → shuffle → agg) without driver collect overhead, which is what a
cluster job would measure.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# one family per query class (SURVEY §2E/§2 LLM-ops), so a regression in
# any class is visible round-over-round; supersets round-1's 20 headliners
FAMILIES: dict[str, list[str]] = {
    "agg": ["a1_pricing_summary", "a3_distinct_agg", "a5_rollup", "a5_grouping_sets"],
    "join": ["j1_inner_equi", "j2_left_outer", "j6_broadcast"],
    "window": ["w1_ranking", "w3_framed", "w4_distribution"],
    "setop": ["s4_union_all", "s6_intersect_except"],
    "shape": ["s2_topk", "s10_explode", "s11_pivot"],
    "funcs": ["f3_math", "f4_json"],
    "tpch": [
        "q3_shipping_priority",
        "q6_forecast_revenue",
        "q9_product_profit",
        "q18_large_orders",
        "q21_waiting_suppliers",
    ],
    "dedup": [
        "dedup_fingerprint",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_components",
    ],
    "text": [
        "text_token_count",
        "text_lang_id",
        "text_winnow_pairs",
        "text_source_cap",
    ],
    "sim": ["sim_topk_bruteforce", "sim_ivf_topk", "sim_lsh_topk"],
    "asof": ["asof_events_orders"],
    "multimodal": ["mm_decode_stats"],
}
HEADLINE = [q for fam in FAMILIES.values() for q in fam]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    from easy_sql_spark.queries import QUERIES
    from easy_sql_spark.session import build_session

    spark = build_session(
        "bench", extra_conf={"spark.ui.enabled": "false"}
    )

    def run(name: str) -> float:
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run("a1_pricing_summary")  # warmup: JVM/codegen/parquet footer caches
    # warm the Python/Arrow worker pool so mapInPandas queries measure the
    # operator, not the one-time interpreter forks (32 workers ≈ seconds)
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(run(name), 3)

    total = round(sum(timings.values()), 3)
    families = {
        fam: round(sum(timings[q] for q in qs), 3)
        for fam, qs in FAMILIES.items()
    }
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "families": families,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
