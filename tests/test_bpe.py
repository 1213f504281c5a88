"""BPE trainer (operators/bpe.py) — bit-exact against a pure-Python
reference implementation (the same crosscheck discipline as the minhash
folds): both run classic Sennrich pair-merge with (count desc, pair asc)
tie-break, so merge tables must match exactly."""

import re
from collections import Counter

import pytest

import _depth

from easy_sql_spark.operators.bpe import (
    bpe_encode_expr,
    bpe_train,
    word_frequencies,
)


def _py_bpe(texts, n_merges):
    vocab = Counter()
    for t in texts:
        for w in re.findall("[a-z]+", t.lower()):
            vocab[w] += 1
    seqs = {w: list(w) for w in vocab}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += vocab[w]
        if not pairs:
            break
        # max by (count, then lexicographically smallest pair)
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, cnt))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if out and out[-1] == l and syms[i] == r:
                    out[-1] = l + r
                else:
                    out.append(syms[i])
                i += 1
            seqs[w] = out
    return merges


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the thin thing thinks the thought through",
    "low lower lowest slow slower slowest",
    "new newer newest fewer fewest",
]


def test_bpe_train_matches_python_reference(spark):
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = bpe_train(docs, n_merges=12)
    want = _py_bpe(TEXTS, 12)
    assert got == want
    # sanity on the shape: ranks consecutive, weights non-increasing is NOT
    # required by BPE (later merges can outweigh), but counts are positive
    assert [r for r, *_ in got] == list(range(len(got)))
    assert all(c > 0 for *_, c in got)


def test_bpe_encode_expr_applies_merges(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges = bpe_train(docs, n_merges=8)
    enc = (
        word_frequencies(docs)
        .select(
            "word",
            F.expr(
                bpe_encode_expr("split(word, '')", merges)
            ).alias("toks"),
        )
        .collect()
    )
    by_word = {r.word: r.toks for r in enc}
    # round-trip: concatenating tokens always restores the word
    for w, toks in by_word.items():
        assert "".join(toks) == w
    # learned merges compress: total tokens < total chars
    assert sum(len(t) for t in by_word.values()) < sum(
        len(w) for w in by_word
    )
    # the trained table applied by the Python reference gives identical
    # segmentations
    pyseqs = {w: list(w) for w in by_word}
    for _, l, r, _ in merges:
        for w, syms in pyseqs.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            pyseqs[w] = out
    assert by_word == pyseqs


def test_bpe_empty_and_exhausted_corpus(spark):
    docs = spark.createDataFrame([("",), ("123 456",)], "text string")
    assert bpe_train(docs, n_merges=5) == []
    # single letters only: no pairs to merge
    docs1 = spark.createDataFrame([("a b c",)], "text string")
    assert bpe_train(docs1, n_merges=5) == []


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        texts=st.lists(
            st.text(alphabet="ab ", min_size=1, max_size=30),
            min_size=1,
            max_size=5,
        ),
        n=st.integers(1, 6),
    )
    @settings(max_examples=_depth.examples(10, 3), deadline=None)
    def test_bpe_property_crosscheck(spark_session_for_hypothesis, texts, n):
        spark = spark_session_for_hypothesis
        docs = spark.createDataFrame([(t,) for t in texts], "text string")
        assert bpe_train(docs, n_merges=n) == _py_bpe(texts, n)

    @pytest.fixture(scope="module")
    def spark_session_for_hypothesis(spark):
        return spark

except ImportError:  # hypothesis is baked in, but stay import-safe
    pass


def test_bpe_token_count_query_matches_python(spark):
    """The text_bpe_token_count recipe (train split -> merge table ->
    held-out per-doc token counts) against a pure-Python replay."""
    import re

    from pyspark.sql import functions as F

    from easy_sql_spark.queries import QUERIES

    out = {r.doc_id: (r.n_chars, r.n_tokens)
           for r in QUERIES["text_bpe_token_count"](
               spark, "/root/testdata/sf0.001").collect()}
    assert out, "held-out split empty"

    # python replay: same splits, same training, same greedy application
    import duckdb

    con = duckdb.connect()
    docs = con.execute(
        "SELECT doc_id, text FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    train = [t for d, t in docs if d <= 300]
    merges = _py_bpe(train, 12)
    held = [(d, t) for d, t in docs if 300 < d <= 400]

    def encode(word):
        syms = list(word)
        for _, l, r, _ in merges:
            nxt = []
            for s in syms:
                if nxt and nxt[-1] == l and s == r:
                    nxt[-1] = l + r
                else:
                    nxt.append(s)
            syms = nxt
        return syms

    for d, t in held:
        ws = [w for w in re.split("[^a-z]+", t.lower()) if w]
        n_chars = sum(len(w) for w in ws)
        n_tokens = sum(len(encode(w)) for w in ws)
        assert out[d] == (n_chars, n_tokens), d
