"""Cross-validation of the per-row JVM fold operators against independent
pure-Python reimplementations (a second oracle besides DuckDB, exercising
generated corpora the fixture tables don't contain — SURVEY §5 test
strategy)."""

import hashlib

from pyspark.sql import functions as F

from easy_sql_spark.queries.llm_ops import (
    LSH_MAX_BUCKET,
    N_BANDS,
    N_MINHASH,
    _lsh_capped_pairs,
    _simhash_expr_spark,
    minhash_bands,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, "completely different text with no overlap at all here"),
    (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (4, "one two"),  # < 3 words: no shingles
    (5, "repeat repeat repeat repeat repeat"),  # degenerate vocab
    (6, "a b c d e f g h i j k l m n o p q r s t"),
]


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def py_minhash_bands(doc_id: int, text: str) -> list[tuple[int, int, str]]:
    words = text.split(" ")
    if len(words) < 3:
        return []
    shingles = [
        " ".join(words[i : i + 3]) for i in range(len(words) - 2)
    ]
    sigs = [
        min(_md5(f"{s}|{sh}") for sh in shingles) for s in range(N_MINHASH)
    ]
    rows_per_band = N_MINHASH // N_BANDS
    return [
        (
            doc_id,
            b,
            _md5("".join(sigs[b * rows_per_band : (b + 1) * rows_per_band])),
        )
        for b in range(N_BANDS)
    ]


def py_simhash(text: str) -> str:
    words = dict.fromkeys(text.split(" "))  # distinct, order-preserving
    sums = [0] * 32
    for w in words:
        h = _md5(w)
        for i in range(32):
            sums[i] += 1 if h[i] in "89abcdef" else -1
    return "".join("1" if s >= 0 else "0" for s in sums)


def test_minhash_bands_match_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r.doc_id, r.band_id, r.band)
        for r in minhash_bands(df).collect()
    }
    want = {t for (i, txt) in DOCS for t in py_minhash_bands(i, txt)}
    assert got == want


def test_capped_pairs_match_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b)
        for r in _lsh_capped_pairs(minhash_bands(df), LSH_MAX_BUCKET).collect()
    }
    # python pairing over the same band table (all buckets under the cap)
    bands = [t for (i, txt) in DOCS for t in py_minhash_bands(i, txt)]
    want = set()
    for d1, b1, h1 in bands:
        for d2, b2, h2 in bands:
            if d1 < d2 and b1 == b2 and h1 == h2:
                want.add((d1, d2))
    assert got == want
    assert (0, 3) in got  # the exact dup pair must always collide


def test_simhash_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r.simhash for r in _simhash_expr_spark(df).collect()}
    for i, txt in DOCS:
        assert got[i] == py_simhash(txt), f"doc {i}"


def test_winnow_fingerprints_match_python(spark):
    from easy_sql_spark.queries.llm_ops2 import WINNOW_W

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    h_arr = (
        "transform(sequence(0, size(w)-3),"
        " i -> md5(concat_ws(' ', w[i], w[i+1], w[i+2])))"
    )
    fps_df = (
        df.select("doc_id", F.split("text", " ").alias("w"))
        .where(F.size("w") >= 3)
        .select("doc_id", F.expr(h_arr).alias("h"))
        .where(F.size("h") >= WINNOW_W)
        .select(
            "doc_id",
            F.expr(
                f"array_distinct(transform(sequence(1, size(h) - {WINNOW_W - 1}),"
                f" j -> array_min(slice(h, j, {WINNOW_W}))))"
            ).alias("fps"),
        )
    )
    got = {r.doc_id: sorted(r.fps) for r in fps_df.collect()}
    for i, txt in DOCS:
        words = txt.split(" ")
        if len(words) < 3:
            assert i not in got
            continue
        hashes = [
            _md5(" ".join(words[j : j + 3])) for j in range(len(words) - 2)
        ]
        if len(hashes) < WINNOW_W:
            assert i not in got
            continue
        want = sorted(
            set(
                min(hashes[j : j + WINNOW_W])
                for j in range(len(hashes) - WINNOW_W + 1)
            )
        )
        assert got[i] == want, f"doc {i}"
