"""Per-batch ingest cost vs PERSISTENT INDEX SIZE for the MinHash dedup
index (r12 verdict ask #4: "dedup_index_incremental's per-batch cost at
a 10x-larger index").

The sustainable-at-100TB claim for operators/dedup_index.py is that a
daily batch costs O(batch + matched bands) — i.e. the cost of ingesting
the SAME batch should stay ~flat as the committed index grows 10x.
The registry query (llm_ops4.dedup_index_incremental) pins a fixed
600-doc workload for the oracle, so it cannot show this; this probe
measures it directly:

  1. build an index over the corpus at each SF dir given (documents
     table, full corpus — sf1 ~50k docs, sf10 ~500k docs),
  2. ingest ONE fixed probe batch (the same 1,000 synthetic docs at
     every index size, half near-duplicates of corpus docs so the
     collision path does real work),
  3. report median ingest wall seconds per index size.

Usage:
    python tools/probe_dedup_index_scale.py <sf_dir> [<sf_dir> ...]
Prints one JSON line per index size; paste into SCALE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from easy_sql_spark.datasets import load_table
    from easy_sql_spark.operators.dedup_index import MinHashDedupIndex
    from easy_sql_spark.session import build_session

    spark = build_session(
        "dedup_index_scale", extra_conf={"spark.ui.enabled": "false"}
    )
    for sf_dir in sys.argv[1:]:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        n_corpus = docs.count()
        idx = MinHashDedupIndex(
            spark, tempfile.mkdtemp(prefix="dedup_idx_probe_")
        )
        t0 = time.time()
        idx.ingest(docs, batch_id=1)
        build_s = time.time() - t0

        # fixed probe batch: 500 fresh docs + 500 near-dups of corpus
        # docs (suffix tweak), identical content at every index size
        base = (
            docs.orderBy("doc_id").limit(500)
            .select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" probe")).alias("text"),
            )
        )
        fresh = spark.range(500).select(
            (F.col("id") + 20_000_000).alias("doc_id"),
            F.concat(
                F.lit("entirely novel probe document number "),
                F.col("id").cast("string"),
                F.lit(" with unique content "),
                F.md5(F.col("id").cast("string")),
            ).alias("text"),
        )
        batch = base.unionByName(fresh).localCheckpoint(eager=True)

        runs = []
        for i in range(3):
            # same CONTENT each run, fresh doc_ids (so the replay guard
            # never short-circuits): admission is judged against the
            # growing index; batch size constant
            shifted = batch.select(
                (F.col("doc_id") + i * 1_000_000).alias("doc_id"), "text"
            )
            t0 = time.time()
            idx.ingest(shifted, batch_id=10 + i)
            runs.append(time.time() - t0)
        print(json.dumps({
            "sf_dir": sf_dir,
            "corpus_docs": n_corpus,
            "index_build_s": round(build_s, 2),
            "probe_batch_docs": 1000,
            "ingest_runs_s": [round(r, 2) for r in runs],
            "ingest_median_s": round(statistics.median(runs), 2),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
