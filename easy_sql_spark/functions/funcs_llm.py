"""LLM-training-data operators as step-language functions (SURVEY §7.2 M6:
the dedup/similarity/text operators ride the same step language).

Each function reads a temp view / table and registers its result as a temp
view, so an ETL file composes them like any step::

    -- target=temp.docs
    select doc_id, text from db.documents

    -- target=func.dedupe_exact(docs, docs_unique, text)

    -- target=func.minhash_candidates(docs_unique, dup_pairs, text, doc_id)

    -- target=output.db.clean_docs
    select d.* from docs_unique d
    left anti join dup_pairs p on d.doc_id = p.doc_b

The heavy lifting delegates to the same shuffle-safe plans as the declared
queries (queries/llm_ops.py) — one hash-groupBy for exact dedup, signature →
band → bucket-join for MinHash (never all-pairs).
"""

from __future__ import annotations


def build(processor):
    spark = processor.spark
    backend = processor.backend

    def dedupe_exact(table: str, out_view: str, text_col: str = "text"):
        """Keep the first row (min of the first column) per exact text hash."""
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        df = spark.table(table)
        first_col = df.columns[0]
        w = W.partitionBy(F.md5(F.col(text_col))).orderBy(first_col)
        out = (
            df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        backend.create_temp_view(out, out_view)
        return True

    def minhash_candidates(
        table: str,
        out_view: str,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        """Near-dup candidate pairs (id_a < id_b) via MinHash+LSH — same
        plan as the declared dedup_minhash_lsh query."""
        from pyspark.sql import functions as F

        from ..queries.llm_ops import N_BANDS, N_MINHASH

        df = spark.table(table).select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
        d = df.select(
            "doc_id", F.split("text", " ").alias("w")
        ).where(F.size("w") >= 3)
        sh = d.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w)-3),"
                    " i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
                )
            ).alias("sh"),
        )
        sigs = sh.groupBy("doc_id").agg(
            *[
                F.min(F.md5(F.concat(F.lit(f"{s}|"), F.col("sh")))).alias(f"h{s}")
                for s in range(N_MINHASH)
            ]
        )
        rows_per_band = N_MINHASH // N_BANDS
        band_hashes = [
            F.md5(
                F.concat(
                    *[
                        F.col(f"h{i}")
                        for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                    ]
                )
            )
            for b in range(N_BANDS)
        ]
        bands = sigs.select(
            "doc_id", F.posexplode(F.array(*band_hashes)).alias("band_id", "band")
        )
        a, b = bands.alias("a"), bands.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
        )
        backend.create_temp_view(pairs, out_view)
        return True

    def text_stats(table: str, out_view: str, text_col: str = "text"):
        """Per-row token/char/quality columns appended (narrow map)."""
        from pyspark.sql import functions as F

        df = spark.table(table)
        words = F.split(F.col(text_col), " ")
        out = df.withColumns(
            {
                "n_tokens": F.size(words),
                "n_chars_computed": F.length(text_col),
                "uniq_ratio": F.size(F.array_distinct(words))
                / F.size(words).cast("double"),
            }
        )
        backend.create_temp_view(out, out_view)
        return True

    def ann_topk(
        table: str,
        queries_table: str,
        out_view: str,
        k: str = "10",
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ):
        """Brute-force cosine top-k of each query vector against the corpus
        (broadcast queries, single corpus scan — the declared
        sim_topk_bruteforce plan as a reusable step)."""
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        def prep(df, id_alias, v_alias, n_alias):
            v = F.expr(f"transform({vec_col}, x -> cast(x as double))")
            out = df.select(F.col(id_col).alias(id_alias), v.alias(v_alias))
            nrm = F.sqrt(
                F.expr(
                    f"aggregate(transform({v_alias}, x -> x * x), 0D,"
                    " (acc, z) -> acc + z)"
                )
            )
            return out.withColumn(n_alias, nrm)

        corpus = prep(spark.table(table), "neighbor_id", "v", "nrm")
        qs = prep(spark.table(queries_table), "query_id", "qv", "qnrm")
        dot = F.expr(
            "aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
        )
        scored = corpus.crossJoin(F.broadcast(qs)).where(
            F.col("neighbor_id") != F.col("query_id")
        )
        scored = scored.select(
            "query_id",
            "neighbor_id",
            (dot / (F.col("qnrm") * F.col("nrm"))).alias("cos_sim"),
        )
        w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
        out = (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(k))
        )
        backend.create_temp_view(out, out_view)
        return True

    return {
        k: v
        for k, v in locals().items()
        if callable(v) and not k.startswith("_") and k not in ("processor", "spark", "backend")
    }
