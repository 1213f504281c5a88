"""LLM-data operators as step-language functions — an ETL composing
dedup → candidate pairs → anti-join cleanup (SURVEY §7.2 M6)."""

from easy_sql_spark.runtime.processor import SqlProcessor

ETL = """-- backend: spark

-- target=temp.docs
select doc_id, text from raw_docs

-- target=func.dedupe_exact(docs, docs_unique, text)

-- target=func.minhash_candidates(docs_unique, dup_pairs, text, doc_id)

-- target=func.text_stats(docs_unique, docs_stats, text)

-- target=temp.clean
select d.doc_id from docs_unique d
left anti join dup_pairs p on d.doc_id = p.doc_b

-- target=check.kept_some
select (select count(*) from clean) > 0 as actual, true as expected
"""


def test_llm_etl_pipeline(spark, tmp_path):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat today"),  # near dup
        (4, "completely different content about spark engines here"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").createOrReplaceTempView(
        "raw_docs"
    )
    p = SqlProcessor(spark, ETL, logger=lambda m: None)
    p.run(dry_run=True)

    uniq = {r.doc_id for r in spark.table("docs_unique").collect()}
    assert uniq == {1, 3, 4}  # exact dup removed, min id kept

    pairs = {(r.doc_a, r.doc_b) for r in spark.table("dup_pairs").collect()}
    assert (1, 3) in pairs  # near-dup candidate found
    assert all(a < b for a, b in pairs)

    stats = {r.doc_id: r.n_tokens for r in spark.table("docs_stats").collect()}
    assert stats[1] == 9 and stats[3] == 10

    clean = {r.doc_id for r in spark.table("clean").collect()}
    assert clean == {1, 4}
    p.backend.clean_temp_views()


def test_lsh_bucket_cap_bounds_pair_expansion(spark):
    """A duplicate-heavy corpus (one giant band bucket) must expand
    LINEARLY (star with the min doc_id), not quadratically — the 100 TB
    hardening for dedup_minhash_lsh/minhash_candidates.  Components are
    preserved: every member still connects to the representative."""
    n_dupes = 200
    rows = [(i, "all these documents share exactly the same text content")
            for i in range(n_dupes)]
    rows.append((900, "a totally different document about spark plans here"))
    spark.createDataFrame(rows, "doc_id long, text string").createOrReplaceTempView(
        "heavy_docs"
    )
    etl = "-- target=func.minhash_candidates(heavy_docs, capped_pairs, text, doc_id, 8, 2, 16)"
    p = SqlProcessor(spark, etl, logger=lambda m: None)
    p.run(dry_run=True)
    pairs = {(r.doc_a, r.doc_b) for r in spark.table("capped_pairs").collect()}
    # star: min doc_id (0) pairs with each of the other 199 — not 19900
    assert len(pairs) == n_dupes - 1
    assert pairs == {(0, i) for i in range(1, n_dupes)}
    p.backend.clean_temp_views()

    # below the cap, behavior is the usual full pairwise candidate set
    small = [(i, "identical small cluster of documents right here now")
             for i in range(5)]
    spark.createDataFrame(small, "doc_id long, text string").createOrReplaceTempView(
        "small_docs"
    )
    etl2 = "-- target=func.minhash_candidates(small_docs, small_pairs, text, doc_id)"
    p2 = SqlProcessor(spark, etl2, logger=lambda m: None)
    p2.run(dry_run=True)
    assert spark.table("small_pairs").count() == 5 * 4 // 2
    p2.backend.clean_temp_views()


def test_ann_topk_function(spark):
    vecs = [(i, [float(i), 1.0]) for i in range(6)]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>"
    ).createOrReplaceTempView("corpus_vecs")
    spark.sql("select * from corpus_vecs where vec_id = 0").createOrReplaceTempView(
        "query_vecs"
    )
    etl = "-- target=func.ann_topk(corpus_vecs, query_vecs, knn, 3)"
    p = SqlProcessor(spark, etl, logger=lambda m: None)
    p.run()
    rows = [
        (r.neighbor_id, r.rank)
        for r in spark.table("knn").orderBy("rank").collect()
    ]
    # query (0,1): cosine = 1/sqrt(i^2+1) -> nearest are smallest i > 0
    assert rows == [(1, 1), (2, 2), (3, 3)]
    p.backend.clean_temp_views()


def test_sample_per_source_and_repetition_signals(spark):
    rows = [(i, f"src{i % 3}", "words vary here number %d ok fine" % i)
            for i in range(30)]
    rows.append((100, "src0", "dup dup dup dup dup dup dup dup"))
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).createOrReplaceTempView("mix_docs")
    etl = """-- target=func.sample_per_source(mix_docs, capped, source, 4)

-- target=func.repetition_signals(mix_docs, sig_view)

-- target=temp.kept
select doc_id from sig_view
where dup_bigram_frac <= 0.05 and top_word_frac <= 0.2
"""
    p = SqlProcessor(spark, etl, logger=lambda m: None)
    p.run(dry_run=True)
    by_src = {
        r.source: r.n
        for r in spark.sql(
            "select source, count(*) as n from capped group by source"
        ).collect()
    }
    assert all(n <= 4 for n in by_src.values()) and len(by_src) == 3
    # run twice -> identical deterministic sample
    p2 = SqlProcessor(
        spark,
        "-- target=func.sample_per_source(mix_docs, capped2, source, 4)",
        logger=lambda m: None,
    )
    p2.run(dry_run=True)
    ids = lambda v: sorted(r.doc_id for r in spark.table(v).collect())
    assert ids("capped") == ids("capped2")
    kept = {r.doc_id for r in spark.table("kept").collect()}
    assert 100 not in kept and len(kept) >= 25  # repeated doc filtered out
    p.backend.clean_temp_views()
    p2.backend.clean_temp_views()


def test_governance_step_functions(spark):
    """pii_redact / assign_shards / pack_sequences unit behavior."""
    from easy_sql_spark.runtime.processor import SqlProcessor

    spark.createDataFrame(
        [
            (i, f"doc {i} mail a{i}@x.io ip 1.2.3.{i % 250} words " + "w " * 10, "s1")
            for i in range(2000)
        ],
        "doc_id long, text string, source string",
    ).createOrReplaceTempView("gov_docs")
    etl = """-- backend: spark
-- target=func.pii_redact(gov_docs, gov_red, text)
-- target=func.assign_shards(gov_red, gov_sh, doc_id, 80, 10)
-- target=func.pack_sequences(gov_sh, gov_packed, source, doc_id, text, 64)
"""
    p = SqlProcessor(spark, etl, logger=lambda m: None)
    p.run(dry_run=True)

    red = spark.table("gov_red")
    assert red.where("text like '%@%'").count() == 0  # every email redacted
    assert red.where("n_pii < 2").count() == 0  # email + ip found per row
    assert red.where("text like '%<EMAIL>%'").count() == 2000

    sh = {r.split: r.n for r in spark.sql(
        "select split, count(*) n from gov_sh group by split").collect()}
    assert set(sh) == {"train", "val", "test"}
    # md5 is uniform: 80/10/10 within generous tolerance at n=2000
    assert 0.70 <= sh["train"] / 2000 <= 0.90
    assert 0.05 <= sh["val"] / 2000 <= 0.15

    packed = spark.table("gov_packed")
    # 13 tokens per doc, 64-token bins -> every bin holds ceil-ish docs;
    # bin ids are dense from 0 and bins hold >= 1 doc
    assert packed.where("bin_id < 0").count() == 0
    n_bins = packed.select("bin_id").distinct().count()
    total_tokens = packed.groupBy().sum("tokens").first()[0]
    assert n_bins >= total_tokens // 64  # no bin overstuffed past budget+1 doc
    p.backend.clean_temp_views()


def test_assign_shards_train_pct_100_boundary(spark):
    """ADVICE r3: at train_pct=100 the old lexicographic hex compare against
    the 3-char string '100' sent most rows to val/test; the numeric compare
    must put every row in train."""
    from easy_sql_spark.runtime.processor import SqlProcessor

    spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id long"
    ).createOrReplaceTempView("sh100_docs")
    etl = """-- backend: spark
-- target=func.assign_shards(sh100_docs, sh100_out, doc_id, 100, 0)
"""
    p = SqlProcessor(spark, etl, logger=lambda m: None)
    p.run(dry_run=True)
    splits = {r.split for r in spark.table("sh100_out").select("split").distinct().collect()}
    assert splits == {"train"}
    p.backend.clean_temp_views()


def test_pii_patterns_adversarial(spark):
    """Positive: every PII class redacts. Negative: year ranges, version
    strings, page ranges, long ids, and split IBANs survive untouched
    (the false-positive shapes the broadened patterns must not eat)."""
    from easy_sql_spark.queries.llm_ops3 import pii_redact_expr

    cases = [
        ("call +44 20 7946 0958 now", "call <PHONE> now"),
        ("dial +1 415 555 0134", "dial <PHONE>"),
        ("(415) 555-0134", "<PHONE>"),
        ("415-555-0134 or 415 555 0134", "<PHONE> or <PHONE>"),
        ("just 555-0042", "just <PHONE>"),
        ("ssn 078-05-1120 here", "ssn <SSN> here"),
        ("iban DE89370400440532013000 ok", "iban <IBAN> ok"),
        ("GB29NWBK60161331926819 pays", "<IBAN> pays"),
        ("mail a.b+c@x-y.co", "mail <EMAIL>"),
        ("host 10.0.0.1 up", "host <IP> up"),
        # negatives — must survive untouched
        ("meeting 2024-2025 budget", None),
        ("version 1.2.3.4000 build 12345678", None),
        ("pages 100-200 and 3-4", None),
        ("order id 1234567890123456", None),
        ("DE12 space breaks the iban", None),
        ("temperature -40 to 120", None),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "t string")
    got = [r.r for r in df.select(pii_redact_expr("t").alias("r")).collect()]
    for (t, want), r in zip(cases, got):
        assert r == (want if want is not None else t), (t, r)


def test_compression_ratio_bit_pinned_and_discriminative(spark):
    """text_deflate_bench (queries/llm_ops5.py) — the production DEFLATE
    variant bench.py times under the text_compression_ratio name — has
    no DuckDB oracle (no per-row DEFLATE scalar), so it is pinned here:
    the distributed result must equal a direct driver-side zlib pass
    byte-for-byte, and the signal must actually discriminate — a
    repetitive document compresses materially further than prose-like
    unique text (the property RefinedWeb-style filters rely on).
    The registry entry itself (a token-dictionary coding estimate) is
    oracle-checked cross-engine instead."""
    import zlib

    from easy_sql_spark.queries.llm_ops5 import text_deflate_bench

    out = {
        r.doc_id: (r.raw_len, r.comp_len, r.ratio)
        for r in text_deflate_bench(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .where("doc_id <= 4000")
        .select("doc_id", "text")
        .collect()
    }
    assert set(out) == set(docs)
    for doc_id, text in docs.items():
        raw = text.encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        assert out[doc_id][0] == len(raw)
        assert out[doc_id][1] == comp, doc_id
        assert out[doc_id][2] == round(comp / max(len(raw), 1), 4)

    # discriminative: boilerplate vs unique-ish text
    rep = ("subscribe now click here " * 200).encode()
    uniq = " ".join(
        f"w{i * 7919 % 104729}" for i in range(1000)
    ).encode()
    r_rep = len(zlib.compress(rep, 6)) / len(rep)
    r_uniq = len(zlib.compress(uniq, 6)) / len(uniq)
    assert r_rep < 0.1 < r_uniq


def test_pca_projection_bit_pinned_against_numpy(spark):
    """emb_pca_project (queries/llm_ops5.py) is rows-only at the oracle
    gate (no eigensolver in DuckDB): pin it against a straight numpy
    PCA of the same vectors — identical coordinates after the query's
    own 6 dp rounding — plus the PCA invariants (orthonormal
    components via reconstruction, variance ordering)."""
    import numpy as np

    from easy_sql_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["emb_pca_project"](spark, sf).collect()
    vecs = {
        r.vec_id: np.array(r.embedding, dtype=float)
        for r in spark.read.parquet(f"{sf}/embeddings.parquet").collect()
    }
    x = np.stack([vecs[r.vec_id] for r in rows])
    # mirror the query's 9 dp mean/cov rounding (partitioning-invariance
    # contract; bit-exactness itself is pinned by the generated VALUES
    # oracle — tools/gen_independent_oracles.py)
    mean = x.mean(axis=0).round(9)
    cov = ((x.T @ x) / len(x) - np.outer(mean, mean)).round(9)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    comps = evecs[:, order].T
    for i in range(4):
        if comps[i][np.argmax(np.abs(comps[i]))] < 0:
            comps[i] = -comps[i]
    proj = (x - mean) @ comps.T

    for j, r in enumerate(rows):
        for i in range(4):
            # 2e-6: a 6 dp half-tie can round apart between numpy
            # (banker's) and Spark (HALF_UP) — exact equality is the
            # oracle's job, this pin checks the math
            assert abs(r[f"pc{i}"] - round(proj[j, i], 6)) <= 2e-6, (
                r.vec_id, i,
            )
    # explained variance: descending, in (0, 1], matches numpy
    evr = [rows[0][f"evr{i}"] for i in range(4)]
    np_evr = (evals[order] / evals.sum()).round(6)
    assert evr == sorted(evr, reverse=True)
    assert all(abs(a - b) <= 1e-6 for a, b in zip(evr, np_evr))
    # projected coords reproduce the centered vectors' norms in the
    # retained subspace: ||proj row|| <= ||centered row||
    for j in range(len(x)):
        assert np.linalg.norm(proj[j]) <= np.linalg.norm(x[j] - mean) + 1e-9


def test_dsir_and_mixture_weight_funcs(spark):
    """func.dsir_weights / func.mixture_weights delegate to the SAME
    frame helpers the oracle-gated registry queries run."""
    rows = []
    for i in range(40):
        lang = "en" if i % 2 == 0 else "de"
        text = ("spark table merge " if lang == "en" else "der die das ") * 4
        rows.append((i, lang, f"src{i % 4}", text + f"word{i}"))
    spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    ).createOrReplaceTempView("sel_docs")
    etl = """-- target=func.dsir_weights(sel_docs, dsir_view, en)

-- target=func.mixture_weights(sel_docs, mix_view, 0.5)

-- target=check.dsir_covers_all_docs
select (select count(*) from dsir_view) as actual,
       (select count(*) from sel_docs) as expected
"""
    p = SqlProcessor(spark, etl, logger=lambda m: None)
    p.run(dry_run=True)
    w = {r.doc_id: r.dsir_weight for r in spark.table("dsir_view").collect()}
    # english docs must importance-score above german ones on an 'en' target
    en_avg = sum(v for k, v in w.items() if k % 2 == 0) / 20
    de_avg = sum(v for k, v in w.items() if k % 2 == 1) / 20
    assert en_avg > de_avg
    mix = {r.source: r for r in spark.table("mix_view").collect()}
    assert set(mix) == {f"src{i}" for i in range(4)}
    for r in mix.values():
        assert 0 < r.mix_rate <= 1.0
        assert r.expected_tokens <= r.n_tokens
    p.backend.clean_temp_views()
