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
        n_hashes: str = "8",
        n_bands: str = "2",
        max_bucket: str = "64",
    ):
        """Near-dup candidate pairs (id_a < id_b) via MinHash+LSH — same
        plan as the declared dedup_minhash_lsh query (shared helpers), with
        configurable signature length, band count and band-bucket cap.
        Oversized buckets expand as a linear star instead of a quadratic
        pairwise join (see llm_ops._lsh_capped_pairs)."""
        from pyspark.sql import functions as F

        from ..queries.llm_ops import _lsh_capped_pairs, minhash_bands

        df = spark.table(table).select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
        bands = minhash_bands(df, int(n_hashes), int(n_bands))
        pairs = _lsh_capped_pairs(bands, int(max_bucket))
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

    def sample_per_source(
        table: str,
        out_view: str,
        source_col: str = "source",
        cap: str = "1000",
        id_col: str = "doc_id",
    ):
        """Deterministic per-source quota sampling (the declared
        text_source_cap plan as a reusable step): keep exactly
        min(cap, n) rows per source, selected by md5(id) order so the
        sample is uniform and reproducible across runs and engines.
        Uses the skew-safe two-phase plan (operators/skew.capped_per_key),
        so a heavy-hitter source never lands in one window task."""
        from ..operators.skew import capped_per_key

        out = capped_per_key(spark.table(table), source_col, id_col, int(cap))
        backend.create_temp_view(out, out_view)
        return True

    def repetition_signals(
        table: str, out_view: str, text_col: str = "text"
    ):
        """Gopher-style repetition signals per row (duplicate-bigram
        fraction + top-word dominance, pure per-row folds — the declared
        text_repetition_filter plan as a reusable step).  Adds
        ``dup_bigram_frac``/``top_word_frac`` columns; thresholding is the
        caller's WHERE clause."""
        from pyspark.sql import functions as F

        bigrams = (
            "transform(sequence(0, size(__w)-2),"
            " i -> concat(__w[i], ' ', __w[i+1]))"
        )
        out = (
            spark.table(table)
            .withColumn("__w", F.split(text_col, " "))
            .where(F.size("__w") >= 2)
            .withColumn(
                "dup_bigram_frac",
                F.expr(
                    f"1.0D - cast(size(array_distinct({bigrams})) as double)"
                    f" / (size(__w) - 1)"
                ),
            )
            .withColumn(
                "top_word_frac",
                F.expr(
                    "cast(array_max(transform(array_distinct(__w),"
                    " x -> size(filter(__w, y -> y = x)))) as double)"
                    " / size(__w)"
                ),
            )
            .drop("__w")
        )
        backend.create_temp_view(out, out_view)
        return True

    def pii_redact(table: str, out_view: str, text_col: str = "text"):
        """Redact the full PII_PATTERNS set (emails, IBANs, SSNs, US +
        international phones, IPv4s — queries/llm_ops3.py) and add per-row
        ``n_pii`` counts.  Pure narrow map."""
        from pyspark.sql import functions as F

        from ..queries.llm_ops3 import PII_PATTERNS, pii_redact_expr

        df = spark.table(table)
        n_pii = sum(
            F.size(F.regexp_extract_all(text_col, F.lit(p), F.lit(0)))
            for _name, p, _tok in PII_PATTERNS
        )
        out = df.withColumn("n_pii", n_pii).withColumn(
            text_col, pii_redact_expr(text_col)
        )
        backend.create_temp_view(out, out_view)
        return True

    def assign_shards(
        table: str,
        out_view: str,
        id_col: str = "doc_id",
        train_pct: str = "80",
        val_pct: str = "10",
    ):
        """Stable train/val/test ``split`` column (the declared
        data_shard_split plan): md5 hex-prefix thresholds, a pure function
        of the id — reproducible across runs, engines, and re-shards."""
        from pyspark.sql import functions as F

        # Numeric compare (not lexicographic hex): at train_pct=100 the cut
        # is 256 > any byte, so every row lands in train instead of the
        # 3-char string '100' breaking the hex comparison.
        t_cut = round(256 * int(train_pct) / 100)
        v_cut = round(256 * (int(train_pct) + int(val_pct)) / 100)
        h2 = F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 2), 16, 10
        ).cast("int")
        out = spark.table(table).withColumn(
            "split",
            F.when(h2 < t_cut, "train").when(h2 < v_cut, "val").otherwise("test"),
        )
        backend.create_temp_view(out, out_view)
        return True

    def pack_sequences(
        table: str,
        out_view: str,
        source_col: str = "source",
        id_col: str = "doc_id",
        text_col: str = "text",
        ctx: str = "2048",
    ):
        """Concat-and-chunk context packing (the declared seq_pack_bins
        plan as a reusable step): adds ``tokens`` and ``bin_id`` columns;
        one prefix-sum window keyed by source."""
        from pyspark.sql import functions as F

        out = (
            spark.table(table)
            .withColumn("tokens", F.size(F.split(text_col, " ")))
            .withColumn(
                "bin_id",
                F.expr(
                    f"coalesce(sum(tokens) over ("
                    f"partition by {source_col} "
                    f"order by md5(cast({id_col} as string)), {id_col} "
                    f"rows between unbounded preceding and 1 preceding), 0) "
                    f"div {int(ctx)}"
                ),
            )
        )
        backend.create_temp_view(out, out_view)
        return True

    def dsir_weights(
        table: str, out_view: str, target_lang: str = "en"
    ):
        """DSIR importance weights (Xie et al. 2023) of a
        (doc_id, lang, text) view against its ``target_lang`` slice —
        the registered ``text_dsir_weights`` plan as a reusable step
        (queries/llm_ops6.dsir_weight_frame, the SAME code path the
        oracle gate verifies).  Adds ``n_tokens``/``dsir_weight``."""
        from ..queries.llm_ops6 import dsir_weight_frame

        out = dsir_weight_frame(spark.table(table), target_lang=target_lang)
        backend.create_temp_view(out, out_view)
        return True

    def mixture_weights(
        table: str, out_view: str, budget_frac: str = "0.5"
    ):
        """Per-source mixture sampling rates under a token budget —
        the registered ``data_mixture_weights`` plan as a reusable step
        (queries/llm_ops6.mixture_weight_frame).  One row per source:
        n_docs, n_tokens, mix_rate, expected_tokens."""
        from ..queries.llm_ops6 import mixture_weight_frame

        out = mixture_weight_frame(
            spark.table(table), budget_frac=float(budget_frac)
        )
        backend.create_temp_view(out, out_view)
        return True

    return {
        k: v
        for k, v in locals().items()
        if callable(v) and not k.startswith("_") and k not in ("processor", "spark", "backend")
    }
