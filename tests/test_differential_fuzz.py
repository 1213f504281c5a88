"""Differential fuzzing: randomly-generated relational pipelines must
agree between Spark and DuckDB on the same parquet.

The fixed oracle gate (test_oracle_all) checks 90+ curated queries; this
generalizes it — Hypothesis draws filter predicates, a grouping column,
and aggregates over lineitem, and both engines must produce identical
results.  Everything generated is integer-exact (counts, int sums,
min/max), so comparison is equality, not tolerance.
"""

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import _depth

SF_DIR = "/root/testdata/sf0.001"
PARQUET = os.path.join(SF_DIR, "lineitem.parquet")

# integer-valued / categorical lineitem columns only: cross-engine exact
INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
CAT_COLS = ["l_returnflag", "l_linestatus"]
OPS = ["<", "<=", ">", ">=", "=", "<>"]

predicate = st.tuples(
    st.sampled_from(INT_COLS),
    st.sampled_from(OPS),
    st.integers(0, 4000),
)


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{PARQUET}'")
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"'{os.path.join(SF_DIR, 'orders.parquet')}'"
    )
    yield con
    con.close()


@given(
    preds=st.lists(predicate, min_size=1, max_size=3),
    conj=st.sampled_from(["AND", "OR"]),
    group=st.sampled_from(CAT_COLS),
    agg_col=st.sampled_from(INT_COLS),
)
@settings(
    max_examples=_depth.examples(25),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_filter_group_agg_agree(spark, ducks, preds, conj, group, agg_col):
    where_sql = f" {conj} ".join(f"{c} {op} {v}" for c, op, v in preds)
    sql = (
        f"SELECT {group}, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM({agg_col}) AS BIGINT) AS s, "
        f"CAST(MIN({agg_col}) AS BIGINT) AS mn, "
        f"CAST(MAX({agg_col}) AS BIGINT) AS mx "
        f"FROM lineitem WHERE {where_sql} GROUP BY {group}"
    )
    expected = {
        r[0]: r[1:] for r in ducks.execute(sql).fetchall()
    }

    li = spark.read.parquet(PARQUET)
    cond = None
    for c, op, v in preds:
        col = F.col(c)
        term = {
            "<": col < v, "<=": col <= v, ">": col > v,
            ">=": col >= v, "=": col == v, "<>": col != v,
        }[op]
        if cond is None:
            cond = term
        elif conj == "AND":
            cond = cond & term
        else:
            cond = cond | term
    got = {
        r[0]: tuple(r[1:])
        for r in li.where(cond)
        .groupBy(group)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(agg_col).alias("s"),
            F.min(agg_col).cast("bigint").alias("mn"),
            F.max(agg_col).cast("bigint").alias("mx"),
        )
        .collect()
    }
    assert got == expected, f"divergence on: {sql}"


@given(
    part=st.sampled_from(CAT_COLS),
    val=st.sampled_from(INT_COLS),
    frame_rows=st.integers(0, 5),
    pred=predicate,
)
@settings(
    max_examples=_depth.examples(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_window_prefix_sums_agree(spark, ducks, part, val, frame_rows, pred):
    """Framed window sums, integer-exact.  (orderkey, linenumber) is NOT
    unique in the synthetic data, so the summed column joins the ORDER BY:
    remaining ties are rows identical in (partition, order keys, value),
    which are interchangeable — the output MULTISET is order-independent
    and any divergence is an engine disagreement, not tie noise."""
    c, op, v = pred
    frame = (
        f"ROWS BETWEEN {frame_rows} PRECEDING AND CURRENT ROW"
        if frame_rows
        else "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    sql = (
        f"SELECT l_orderkey, l_linenumber, "
        f"CAST(SUM({val}) OVER (PARTITION BY {part} "
        f"ORDER BY l_orderkey, l_linenumber, {val} {frame}) AS BIGINT) AS ws "
        f"FROM lineitem WHERE {c} {op} {v}"
    )
    expected = sorted(map(tuple, ducks.execute(sql).fetchall()))
    spark.read.parquet(PARQUET).createOrReplaceTempView("lineitem")
    got = sorted(tuple(r) for r in spark.sql(sql).collect())
    assert got == expected, f"divergence on: {sql}"


@given(
    pred=predicate,
    how=st.sampled_from(["inner", "left"]),
    agg_col=st.sampled_from(["l_suppkey", "l_linenumber"]),
)
@settings(
    max_examples=_depth.examples(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_join_agg_agree(spark, ducks, pred, how, agg_col):
    c, op, v = pred
    join_sql = "JOIN" if how == "inner" else "LEFT JOIN"
    sql = (
        f"SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM(l.{agg_col}) AS BIGINT) AS s "
        f"FROM orders o {join_sql} lineitem l ON l.l_orderkey = o.o_orderkey "
        f"AND l.{c} {op} {v} "
        f"GROUP BY o.o_orderpriority"
    )
    expected = {r[0]: r[1:] for r in ducks.execute(sql).fetchall()}

    li = spark.read.parquet(PARQUET)
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    col = F.col(c)
    term = {
        "<": col < v, "<=": col <= v, ">": col > v,
        ">=": col >= v, "=": col == v, "<>": col != v,
    }[op]
    joined = orders.join(
        li, (li.l_orderkey == orders.o_orderkey) & term, how
    )
    got = {
        r[0]: (r[1], r[2])
        for r in joined.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(agg_col).alias("s"))
        .collect()
    }
    assert got == expected, f"divergence on: {sql}"


_STRING_FNS = [
    lambda e: f"upper({e})",
    lambda e: f"lower({e})",
    lambda e: f"trim({e})",
    lambda e: f"reverse({e})",
    lambda e: f"replace({e}, 'a', '@')",
    lambda e: f"substr({e}, 3)",
    lambda e: f"substr({e}, 2, 40)",
]


@given(
    fn_ids=st.lists(st.integers(0, len(_STRING_FNS) - 1), min_size=1, max_size=3),
    min_chars=st.integers(0, 900),
)
@settings(
    max_examples=_depth.examples(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_string_pipelines_agree(spark, ducks, fn_ids, min_chars):
    """Composed string-function pipelines over documents.text must hash
    identically cross-engine — substr indexing, trim/replace/reverse
    semantics and length units are classic engine-divergence spots.
    Restricted to the Spark/DuckDB-common call shapes the f1_string
    family relies on (1-based substr with positive args, plain-string
    replace)."""
    ducks.execute(
        "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(SF_DIR, 'documents.parquet')}'"
    )
    expr = "text"
    for i in fn_ids:
        expr = _STRING_FNS[i](expr)
    sql = (
        f"SELECT lang, CAST(COUNT(DISTINCT md5({expr})) AS BIGINT) AS n_distinct, "
        f"CAST(SUM(length({expr})) AS BIGINT) AS total_len "
        f"FROM documents WHERE n_chars >= {min_chars} "
        f"GROUP BY lang"
    )
    expected = sorted(map(tuple, ducks.execute(sql).fetchall()))
    spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).createOrReplaceTempView("documents")
    got = sorted(tuple(r) for r in spark.sql(sql).collect())
    assert got == expected, f"divergence on: {sql}"


_DATE_EXPRS = [
    "strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')",
    "strftime(date_trunc('week', o_orderdate), '%Y-%m-%d')",
    "CAST(date_part('year', o_orderdate) AS BIGINT)",
    "CAST(date_part('quarter', o_orderdate) AS BIGINT)",
    "CAST(date_part('dow', o_orderdate) AS BIGINT)",
    "strftime(o_orderdate + INTERVAL 7 DAY, '%Y-%m-%d')",
]
_DATE_EXPRS_SPARK = [
    "date_format(date_trunc('month', o_orderdate), 'yyyy-MM-dd')",
    "date_format(date_trunc('week', o_orderdate), 'yyyy-MM-dd')",
    "CAST(year(o_orderdate) AS BIGINT)",
    "CAST(quarter(o_orderdate) AS BIGINT)",
    "CAST(dayofweek(o_orderdate) - 1 AS BIGINT)",  # duckdb dow: 0=Sunday
    "date_format(date_add(o_orderdate, 7), 'yyyy-MM-dd')",
]


@given(
    expr_id=st.integers(0, len(_DATE_EXPRS) - 1),
    lo=st.integers(0, 140_000),
)
@settings(
    max_examples=_depth.examples(18),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_date_functions_agree(spark, ducks, expr_id, lo):
    """Date arithmetic/formatting over o_orderdate — truncation anchors
    (ISO week start), dow numbering, month boundaries and interval
    addition are the classic cross-engine traps; the f2_datetime family
    depends on the mapped pairs staying equivalent."""
    dd = (
        f"SELECT {_DATE_EXPRS[expr_id]} AS d, CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM orders WHERE o_orderkey >= {lo} GROUP BY 1"
    )
    sp = (
        f"SELECT {_DATE_EXPRS_SPARK[expr_id]} AS d, CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM orders WHERE o_orderkey >= {lo} GROUP BY 1"
    )
    expected = sorted(map(tuple, ducks.execute(dd).fetchall()))
    spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).createOrReplaceTempView(
        "orders"
    )
    got = sorted(tuple(r) for r in spark.sql(sp).collect())
    assert got == expected, f"divergence on: {sp} vs {dd}"


# ----------------------------------------------------- array HOF pipelines

# (spark template, duckdb template) over an array expression — all
# integer-exact so comparison is equality
_HOF_EXPRS = [
    (lambda a: f"aggregate({a}, 0L, (acc, x) -> acc + x)",
     lambda a: f"list_reduce(list_prepend(0, {a}), (acc, x) -> acc + x)"),
    (lambda a: f"size(filter({a}, x -> x % 2 = 0))",
     lambda a: f"len(list_filter({a}, x -> x % 2 = 0))"),
    (lambda a: f"aggregate(transform({a}, x -> x * x), 0L, (acc, x) -> acc + x)",
     lambda a: f"list_reduce(list_prepend(0, list_transform({a}, x -> x * x)), "
               "(acc, x) -> acc + x)"),
    (lambda a: f"cast(exists({a}, x -> x > 50) as int)",
     lambda a: f"CAST(len(list_filter({a}, x -> x > 50)) > 0 AS INT)"),
    (lambda a: f"array_max({a})", lambda a: f"list_max({a})"),
    (lambda a: f"size(array_distinct({a}))",
     lambda a: f"len(list_distinct({a}))"),
    (lambda a: f"aggregate(slice({a}, 1, 3), 0L, (acc, x) -> acc + x)",
     lambda a: f"list_reduce(list_prepend(0, ({a})[1:3]), (acc, x) -> acc + x)"),
]


@given(
    expr_ids=st.lists(
        st.integers(0, len(_HOF_EXPRS) - 1), min_size=1, max_size=3,
        unique=True,
    ),
    mod=st.integers(3, 9),
)
@settings(
    max_examples=_depth.examples(12), deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_array_hof_agree(spark, ducks, expr_ids, mod):
    """Higher-order array functions (the substrate of every fold-based
    operator in the repo) must agree with DuckDB's list lambdas on
    arrays derived deterministically from lineitem ints."""
    # spark sequence(1, n) == duckdb range(1, n + 1): aligned explicitly
    a_s = (f"transform(sequence(1, l_linenumber + 2), "
           f"i -> (l_orderkey * i) % {mod * 13})")
    a_d = (f"list_transform(range(1, l_linenumber + 3), "
           f"i -> (l_orderkey * i) % {mod * 13})")
    sels_s = [f"({_HOF_EXPRS[i][0](a_s)}) AS c{k}"
              for k, i in enumerate(expr_ids)]
    sels_d = [f"({_HOF_EXPRS[i][1](a_d)}) AS c{k}"
              for k, i in enumerate(expr_ids)]
    q_s = ("select l_orderkey, " + ", ".join(sels_s)
           + f" from parquet.`{PARQUET}` where l_orderkey <= 500 "
           "order by l_orderkey, l_linenumber")
    q_d = ("SELECT l_orderkey, " + ", ".join(sels_d)
           + " FROM lineitem WHERE l_orderkey <= 500 "
           "ORDER BY l_orderkey, l_linenumber")
    got = [tuple(r) for r in spark.sql(q_s).collect()]
    want = ducks.execute(q_d).fetchall()
    assert got == want


_SCHEMES = ["http", "https", "HTTP", "HTTPS", "HtTpS"]
_LABELS = ["alpha", "Beta", "GAMMA", "d7", "x"]
_SUFFIXES = ["com", "org", "io", "co.uk", "github.io", "com.au"]
_PORTS = ["", ":80", ":443", ":8080"]
_SEGS = ["a", "B", "posts", "2024"]
_KEYS = ["a", "b", "ref", "z9", "utm_source", "utm_campaign", "UTMx"]

url_parts = st.tuples(
    st.sampled_from(_SCHEMES),
    st.lists(st.sampled_from(_LABELS), min_size=1, max_size=3),
    st.sampled_from(_SUFFIXES),
    st.sampled_from(_PORTS),
    st.lists(st.sampled_from(_SEGS), min_size=0, max_size=3),
    st.booleans(),  # trailing slash
    st.lists(
        st.tuples(st.sampled_from(_KEYS), st.integers(0, 9)),
        min_size=0,
        max_size=4,
    ),
    st.booleans(),  # fragment
)


def _raw_url(parts):
    scheme, labels, suffix, port, segs, trail, params, frag = parts
    host = ".".join(labels + suffix.split("."))
    path = "/" + "/".join(segs) if segs else ""
    if trail and path != "":
        path += "/"
    q = "&".join(f"{k}={v}" for k, v in params)
    return (
        f"{scheme}://{host}{port}{path}"
        + (f"?{q}" if q else "")
        + ("#frag" if frag else "")
    )


@given(urls=st.lists(url_parts, min_size=1, max_size=8))
@settings(
    max_examples=_depth.examples(20),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_url_canonicalization_agrees(spark, ducks, urls):
    """The URL canonicalizer (queries/llm_ops5.py) must agree with its
    DuckDB oracle CTE chain on ARBITRARY generated URLs, not just the
    curated fixture — regex-dialect drift (anchor semantics, char-class
    quirks), list-sort collation and LIKE-vs-starts_with mismatches are
    exactly the bugs a fixed fixture can mask (the ESCAPE-clause bug
    this axis was added after was one)."""
    from easy_sql_spark.queries.llm_ops5 import _URL_CANON_CTES, _canonicalized

    rows = [(i, 1, _raw_url(p)) for i, p in enumerate(urls)]
    sdf = spark.createDataFrame(rows, "doc_id long, n_chars int, raw_url string")
    got = [
        (r.doc_id, r.canon_url, r.registered_domain)
        for r in _canonicalized(sdf).orderBy("doc_id").collect()
    ]

    ducks.execute("CREATE OR REPLACE TABLE fuzz_urls(doc_id BIGINT, n_chars INT, raw_url VARCHAR)")
    ducks.executemany("INSERT INTO fuzz_urls VALUES (?, ?, ?)", rows)
    expected = ducks.execute(
        "WITH d AS (SELECT * FROM fuzz_urls),"
        + _URL_CANON_CTES
        + " SELECT doc_id, canon_url, registered_domain FROM canon ORDER BY doc_id"
    ).fetchall()
    assert got == [tuple(e) for e in expected], rows


_json_scalar = st.one_of(
    st.integers(-(2**40), 2**40),
    st.text(alphabet="abxyz09 _", max_size=12),
)
_json_value = st.one_of(
    _json_scalar,
    st.lists(st.integers(-1000, 1000), min_size=0, max_size=4),
    st.dictionaries(
        st.sampled_from(["p", "q", "r"]), _json_scalar, min_size=0, max_size=3
    ),
)
_json_doc = st.dictionaries(
    st.sampled_from(["a", "b", "c", "d", "e"]),
    _json_value,
    min_size=1,
    max_size=5,
)


def _paths_of(doc, prefix="$"):
    """Every (path, leaf value) pair in the generated document."""
    out = []
    for k, v in doc.items():
        p = f"{prefix}.{k}"
        if isinstance(v, dict):
            out.extend(_paths_of(v, p))
        elif isinstance(v, list):
            for i, item in enumerate(v):
                out.append((f"{p}[{i}]", item))
        else:
            out.append((p, v))
    return out


@given(docs=st.lists(_json_doc, min_size=1, max_size=6))
@settings(
    max_examples=_depth.examples(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_variant_json_extraction_agrees(spark, ducks, docs):
    """Spark VARIANT path extraction (parse_json + try_variant_get, the
    f13 surface) must agree with DuckDB's JSON operators on arbitrary
    generated documents — typed per the generator's known leaf type, so
    the axis pins path syntax and value decoding, not cross-type
    coercion folklore."""
    import json as _json

    rows = [(i, _json.dumps(d, sort_keys=True)) for i, d in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id long, payload string")
    ducks.execute(
        "CREATE OR REPLACE TABLE fuzz_json(doc_id BIGINT, payload VARCHAR)"
    )
    ducks.executemany("INSERT INTO fuzz_json VALUES (?, ?)", rows)

    for doc_id, doc in enumerate(docs):
        paths = _paths_of(doc)[:8]
        if not paths:
            continue
        exprs, dexprs = [], []
        for i, (path, leaf) in enumerate(paths):
            t = "long" if isinstance(leaf, int) else "string"
            exprs.append(
                f"try_variant_get(parse_json(payload), '{path}', '{t}') as c{i}"
            )
            dexprs.append(
                f"CAST(json_extract(payload, '{path}') AS BIGINT) AS c{i}"
                if t == "long"
                else f"json_extract_string(payload, '{path}') AS c{i}"
            )
        got = sdf.where(f"doc_id = {doc_id}").selectExpr(*exprs).first()
        exp = ducks.execute(
            f"SELECT {', '.join(dexprs)} FROM fuzz_json WHERE doc_id = {doc_id}"
        ).fetchone()
        for i, (path, _leaf) in enumerate(paths):
            assert got[f"c{i}"] == exp[i], (doc_id, path, got[f"c{i}"], exp[i])


@given(
    docs=st.lists(
        st.lists(
            # tiny alphabet forces heavy gram repetition — the adversarial
            # regime for the sorted-run-length scan (equal runs, ties,
            # single-gram docs, all-same-word docs)
            st.sampled_from(["a", "bb", "ccc", "dd", "e"]),
            min_size=3,
            max_size=12,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(
    max_examples=_depth.examples(25),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_repetition_topgram_scan_agrees(spark, ducks, docs):
    """The SHIPPED per-row sorted-run-length top-gram scan
    (queries/llm_ops6._TOP_SCAN — what text_repetition_signals runs,
    zero-shuffle) must agree with an independent explode+GROUP BY
    formulation in DuckDB on adversarial word lists for all three gram
    orders."""
    from easy_sql_spark.queries.llm_ops6 import _G2, _G3, _TOP_SCAN

    rows = [(i, words) for i, words in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id int, ws array<string>")
    got = {
        r.doc_id: (r.f1, r.f2, r.f3)
        for r in sdf.select(
            "doc_id",
            F.expr(_TOP_SCAN.format(g="ws")).alias("f1"),
            F.expr(_TOP_SCAN.format(g=_G2)).alias("f2"),
            F.expr(_TOP_SCAN.format(g=_G3)).alias("f3"),
        ).collect()
    }

    values = ", ".join(
        "(%d, [%s])" % (i, ", ".join(f"'{w}'" for w in words))
        for i, words in rows
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in ducks.execute(
            f"""
            WITH d(doc_id, ws) AS (VALUES {values}),
            grams AS (
                SELECT doc_id, 1 AS ord, unnest(ws) AS gram FROM d
                UNION ALL
                SELECT doc_id, 2, unnest(list_transform(range(1, len(ws)),
                       i -> ws[i] || ' ' || ws[i+1])) FROM d
                UNION ALL
                SELECT doc_id, 3, unnest(list_transform(range(1, len(ws)-1),
                       i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                FROM d),
            cnt AS (
                SELECT doc_id, ord, gram, COUNT(*) AS c, length(gram) AS glen
                FROM grams GROUP BY ALL),
            top AS (
                SELECT doc_id, ord,
                       ROUND(CAST(MAX(c * glen) AS DOUBLE)
                             / SUM(c * glen), 4) AS frac
                FROM cnt GROUP BY doc_id, ord)
            SELECT doc_id,
                   MAX(CASE WHEN ord = 1 THEN frac END),
                   MAX(CASE WHEN ord = 2 THEN frac END),
                   MAX(CASE WHEN ord = 3 THEN frac END)
            FROM top GROUP BY doc_id
            """
        ).fetchall()
    }
    assert got == want


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["spark", "table", "hash", "merge", "window",
                             "filler", "pad", "noise"]),
            min_size=1,
            max_size=20,
        ),
        min_size=2,
        max_size=8,
    )
)
@settings(
    max_examples=_depth.examples(20),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_bm25_scoring_agrees(spark, ducks, docs):
    """The SHIPPED BM25 scorer (queries/llm_ops6.text_bm25_topk run over
    a temp parquet corpus) must agree with an independent DuckDB replay
    on random term mixes — including docs with zero query terms, all
    query terms, and tf saturation."""
    import tempfile

    from easy_sql_spark.queries.llm_ops6 import text_bm25_topk

    rows = [(i, "en", "src0", " ".join(words)) for i, words in enumerate(docs)]
    d = tempfile.mkdtemp(prefix="bm25_fuzz_")
    spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    ).withColumn("n_chars", F.length("text")).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    got = {
        r.doc_id: r.bm25 for r in text_bm25_topk(spark, d).collect()
    }

    values = ", ".join(
        "(%d, '%s')" % (i, " ".join(words)) for i, words in enumerate(docs)
    )
    want = {
        r[0]: r[1]
        for r in ducks.execute(
            f"""
            WITH documents(doc_id, text) AS (VALUES {values}),
            w AS (SELECT doc_id,
                         regexp_extract_all(lower(text), '[a-z]+') AS ws
                  FROM documents),
            d AS (SELECT doc_id, ws, len(ws) AS dl FROM w WHERE len(ws) > 0),
            stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM d),
            tf AS (
                SELECT doc_id, w AS term, COUNT(*) AS tf, MIN(dl) AS dl
                FROM (SELECT doc_id, dl, unnest(ws) AS w FROM d)
                WHERE w IN ('spark', 'table', 'hash', 'merge', 'window')
                GROUP BY doc_id, w),
            df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
            sc AS (
                SELECT tf.doc_id AS doc_id,
                       ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                       * tf.tf * 2.2
                       / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl))
                           AS part
                FROM tf JOIN df USING (term) CROSS JOIN stats s)
            SELECT doc_id, ROUND(SUM(part), 4) FROM sc GROUP BY doc_id
            ORDER BY 2 DESC, 1 LIMIT 20
            """
        ).fetchall()
    }
    assert got == want


_FUZZ_WORDS = ["spark", "table", "hash", "merge", "window",
               "filler", "pad", "noise", "zz"]


def _write_docs(spark, docs, langs=None, sources=None):
    """Temp sf-dir with a documents.parquet in the standard shape."""
    import tempfile

    rows = [
        (
            i,
            (langs or ["en"] * len(docs))[i],
            (sources or ["src0"] * len(docs))[i],
            " ".join(words),
        )
        for i, words in enumerate(docs)
    ]
    d = tempfile.mkdtemp(prefix="self_fuzz_")
    spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    ).withColumn("n_chars", F.length("text")).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    values = ", ".join(
        "(%d, '%s', '%s', '%s')" % (i, la, so, tx)
        for i, la, so, tx in rows
    )
    return d, f"(VALUES {values}) documents(doc_id, lang, source, text)"


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_FUZZ_WORDS), min_size=0, max_size=15),
        min_size=1,
        max_size=8,
    ),
    lang_bits=st.lists(st.booleans(), min_size=8, max_size=8),
)
@settings(
    max_examples=_depth.examples(20),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_dsir_weights_agree(spark, ducks, docs, lang_bits):
    """The SHIPPED DSIR bucket-LLR scorer (queries/llm_ops6.
    text_dsir_weights — groupBy formulation over one materialized
    (doc_id, bucket) aggregate) must agree with an independent DuckDB
    unnest+join replay on random corpora — including empty docs, corpora
    with NO target-language rows, and all-target corpora (VERDICT r7
    ask #7)."""
    from easy_sql_spark.queries.llm_ops6 import text_dsir_weights

    langs = [("en" if lang_bits[i % 8] else "de") for i in range(len(docs))]
    d, values = _write_docs(spark, docs, langs=langs)
    got = {
        r.doc_id: (r.n_tokens, r.dsir_weight)
        for r in text_dsir_weights(spark, d).collect()
    }

    want = {
        r[0]: (r[1], r[2])
        for r in ducks.execute(
            f"""
            WITH tok AS (
                SELECT doc_id, lang,
                       unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
                FROM {values}),
            b AS (SELECT doc_id, lang, substr(md5(w), 1, 2) AS bk FROM tok),
            tgt AS (SELECT bk, COUNT(*) AS tc FROM b WHERE lang = 'en'
                    GROUP BY bk),
            raw AS (SELECT bk, COUNT(*) AS rc FROM b GROUP BY bk),
            tot AS (SELECT (SELECT COALESCE(SUM(tc), 0) FROM tgt) AS tt,
                           (SELECT COALESCE(SUM(rc), 0) FROM raw) AS rt),
            scored AS (
                SELECT b.doc_id AS doc_id,
                       ln((COALESCE(t.tc, 0) + 1.0) / (tot.tt + 256.0))
                     - ln((r.rc + 1.0) / (tot.rt + 256.0)) AS ll
                FROM b JOIN raw r USING (bk) LEFT JOIN tgt t USING (bk)
                CROSS JOIN tot)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT),
                   ROUND(AVG(ll), 4) + 0.0
            FROM scored GROUP BY doc_id
            """
        ).fetchall()
    }
    assert got == want


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_FUZZ_WORDS), min_size=0, max_size=15),
        min_size=1,
        max_size=8,
    )
)
@settings(
    max_examples=_depth.examples(20),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_oov_rate_agrees(spark, ducks, docs):
    """The SHIPPED OOV scorer (queries/llm_ops6.tokenizer_oov_rate —
    top-K vocabulary with (count DESC, word) tie-break, broadcast flag
    join) must agree with an independent DuckDB replay on random
    corpora — vocab ties, all-in-vocab docs, and sub-K vocabularies
    (corpora with fewer than K distinct words) included."""
    from easy_sql_spark.queries.llm_ops6 import _VOCAB_K, tokenizer_oov_rate

    d, values = _write_docs(spark, docs)
    got = {
        r.doc_id: (r.n_tokens, r.n_oov, r.oov_rate)
        for r in tokenizer_oov_rate(spark, d).collect()
    }

    want = {
        r[0]: (r[1], r[2], r[3])
        for r in ducks.execute(
            f"""
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
                FROM {values}),
            wc AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
            vocab AS (
                SELECT w FROM (
                    SELECT w, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS r
                    FROM wc)
                WHERE r <= {_VOCAB_K})
            SELECT doc_id, CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   ROUND(CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)
                              AS DOUBLE) / COUNT(*), 4)
            FROM tok LEFT JOIN vocab v USING (w)
            GROUP BY doc_id
            """
        ).fetchall()
    }
    assert got == want


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_FUZZ_WORDS), min_size=0, max_size=15),
        min_size=1,
        max_size=10,
    ),
    src_ids=st.lists(st.integers(0, 3), min_size=10, max_size=10),
)
@settings(
    max_examples=_depth.examples(20),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_mixture_weights_agree(spark, ducks, docs, src_ids):
    """The SHIPPED mixture-rate table (queries/llm_ops6.
    data_mixture_weights — source aggregate + 1-row budget broadcast,
    round-then-floor(+0.5) discipline) must agree with an independent
    DuckDB replay — including sources made entirely of token-less docs
    (division by zero must cap at rate 1.0 identically in both
    engines)."""
    from easy_sql_spark.queries.llm_ops6 import data_mixture_weights

    sources = [f"s{src_ids[i % 10]}" for i in range(len(docs))]
    d, values = _write_docs(spark, docs, sources=sources)
    got = {
        r.source: (r.n_docs, r.n_tokens, r.mix_rate, r.expected_tokens)
        for r in data_mixture_weights(spark, d).collect()
    }

    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in ducks.execute(
            f"""
            WITH per AS (
                SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                       CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]+')))
                            AS BIGINT) AS n_tokens
                FROM {values} GROUP BY source),
            tot AS (SELECT SUM(n_tokens) AS t, COUNT(*) AS k FROM per)
            SELECT source, n_docs, n_tokens,
                   CASE WHEN n_tokens = 0 THEN 1.0 ELSE
                     ROUND(LEAST(1.0, (0.5 * tot.t / tot.k) / n_tokens), 4)
                   END,
                   CAST(FLOOR(CASE WHEN n_tokens = 0 THEN 1.0 ELSE
                                ROUND(LEAST(1.0, (0.5 * tot.t / tot.k)
                                                 / n_tokens), 4)
                              END * n_tokens + 0.5) AS BIGINT)
            FROM per CROSS JOIN tot
            """
        ).fetchall()
    }
    assert got == want


# ---------------------------------------------------------------- events/asof
# r8-close ask #7: property-fuzz the events/asof family against
# independent DuckDB formulations (correlated-subquery as-of, plain
# theta-join overlap, last-observed-hour gap-fill) — the r8 mixture
# fuzzer found a real ANSI-divide bug on its first run, so the
# technique earns its keep on this family too.

_asof_left = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20)),  # (key, t)
    min_size=1,
    max_size=12,
)
_asof_right = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20)),
    min_size=0,
    max_size=12,
)


@given(left=_asof_left, right=_asof_right)
@settings(
    max_examples=_depth.examples(25),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_asof_join_agrees(spark, ducks, left, right):
    """The SHIPPED as-of operator (operators/asof.py union+window plan,
    the one asof_events_orders ships) must agree with an independent
    DuckDB correlated-subquery formulation (latest right row with
    r.t <= l.t per key) on random streams — duplicate left timestamps,
    keys with no right rows, equal-timestamp (<=) matches."""
    from easy_sql_spark.operators.asof import asof_join

    # unique (key, t) on the right and value-deterministic payloads so
    # tie-breaking among equal right rows cannot differ by engine
    rmap = {kt: kt[0] * 1000 + kt[1] for kt in dict.fromkeys(right)}
    lrows = [(i, k, t) for i, (k, t) in enumerate(left)]
    rrows = [(k, t, v) for (k, t), v in sorted(rmap.items())]

    l = spark.createDataFrame(lrows, "id long, k long, t long")
    if rrows:
        r = spark.createDataFrame(rrows, "k long, t long, rv long")
    else:
        r = spark.createDataFrame([], "k long, t long, rv long")
    got = {
        (row.id, row.rv)
        for row in asof_join(
            l, r, "k", "k", "t", "t", right_values=["rv"]
        ).collect()
    }

    lvals = ", ".join(f"({i}, {k}, {t})" for i, k, t in lrows)
    rvals = (
        ", ".join(f"({k}, {t}, {v})" for k, t, v in rrows)
        or "(NULL, NULL, NULL)"
    )
    want = {
        (r0, r1)
        for r0, r1 in ducks.execute(
            f"""
            WITH l(id, k, t) AS (VALUES {lvals}),
                 r(k, t, rv) AS (VALUES {rvals})
            SELECT l.id,
                   (SELECT r.rv FROM r
                    WHERE r.k = l.k AND r.t <= l.t
                    ORDER BY r.t DESC LIMIT 1)
            FROM l
            """
        ).fetchall()
    }
    assert got == want


_intervals = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 12)),  # (start, length)
    min_size=0,
    max_size=10,
)


@given(
    li=_intervals,
    ri=_intervals,
    width=st.integers(1, 15),
    how=st.sampled_from(["inner", "left"]),
)
@settings(
    max_examples=_depth.examples(25),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_interval_join_agrees(spark, ducks, li, ri, width, how):
    """The SHIPPED bucketed interval-overlap join (operators/
    intervals.py — cell explode + canonical-cell equi-join, the plan
    interval_overlap_join ships) must agree with DuckDB's plain theta
    join for EVERY bucket width — the canonical-cell dedup and the
    left-outer anti-join union are exactly the pieces a width change
    could silently break."""
    from easy_sql_spark.operators.intervals import interval_join

    lrows = [(i, s, s + n) for i, (s, n) in enumerate(li)]
    rrows = [(100 + j, s, s + n) for j, (s, n) in enumerate(ri)]
    l = spark.createDataFrame(lrows or [], "id long, s long, e long")
    r = spark.createDataFrame(rrows or [], "jd long, s2 long, e2 long")
    if not lrows:
        return  # empty left: nothing to compare
    got = sorted(
        (row.id, row.jd)
        for row in interval_join(
            l, r, "s", "e", "s2", "e2", bucket_width=width, how=how
        ).collect()
    )

    lvals = ", ".join(f"({i}, {s}, {e})" for i, s, e in lrows)
    rvals = (
        ", ".join(f"({j}, {s}, {e})" for j, s, e in rrows)
        or "(NULL, NULL, NULL)"
    )
    join_kw = "JOIN" if how == "inner" else "LEFT JOIN"
    want = sorted(
        (r0, r1)
        for r0, r1 in ducks.execute(
            f"""
            WITH l(id, s, e) AS (VALUES {lvals}),
                 r(jd, s2, e2) AS (VALUES {rvals})
            SELECT l.id, r.jd FROM l {join_kw} r
              ON l.s <= r.e2 AND r.s2 <= l.e
            """
        ).fetchall()
    )
    assert got == want


@given(
    events=st.lists(
        st.tuples(
            st.integers(1, 3),     # user_id
            st.integers(0, 30),    # hour offset
            st.integers(0, 59),    # minute
            st.integers(-20, 20),  # value quarter-steps
        ),
        min_size=1,
        max_size=15,
    )
)
@settings(
    max_examples=_depth.examples(20),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_resample_ffill_agrees(spark, ducks, events):
    """The SHIPPED events_resample_ffill query (per-user hourly grid +
    forward fill) must agree with an independent DuckDB formulation
    that computes each grid cell's fill as the LAST OBSERVED HOUR'S sum
    via correlated subqueries (no window ffill at all) on random sparse
    streams — single-event users, multi-hour gaps, duplicate hours.
    Values are quarter-steps so every sum and ROUND(_, 2) is
    float-exact in both engines."""
    import datetime
    import tempfile

    from easy_sql_spark.queries.llm_ops4 import events_resample_ffill

    base = datetime.datetime(2024, 5, 1, 0, 0, 0)
    rows = [
        (u, base + datetime.timedelta(hours=h, minutes=m), q * 0.25)
        for u, h, m, q in events
    ]
    d = tempfile.mkdtemp(prefix="ffill_fuzz_")
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")

    got = [
        (r.user_id, r.bucket, r.v_filled, r.n_events, r.gap)
        for r in events_resample_ffill(spark, d).collect()
    ]

    want = [
        tuple(r)
        for r in ducks.execute(
            f"""
            WITH ev AS (
                SELECT user_id, ts, value
                FROM '{d}/events.parquet/*.parquet' WHERE user_id <= 20),
            bounds AS (
                SELECT user_id, date_trunc('hour', MIN(ts)) AS h0,
                       date_trunc('hour', MAX(ts)) AS h1
                FROM ev GROUP BY user_id),
            grid AS (
                SELECT user_id, CAST(h AS TIMESTAMP) AS bucket
                FROM bounds,
                     UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) t(h)),
            cells AS (
                SELECT g.user_id, g.bucket,
                       (SELECT ROUND(SUM(e.value), 2) FROM ev e
                        WHERE e.user_id = g.user_id
                          AND date_trunc('hour', e.ts) = (
                              SELECT MAX(date_trunc('hour', e2.ts))
                              FROM ev e2
                              WHERE e2.user_id = g.user_id
                                AND date_trunc('hour', e2.ts) <= g.bucket)
                       ) AS v_filled,
                       (SELECT COUNT(*) FROM ev e
                        WHERE e.user_id = g.user_id
                          AND date_trunc('hour', e.ts) = g.bucket) AS n
                FROM grid g)
            SELECT CAST(user_id AS BIGINT),
                   strftime(bucket, '%Y-%m-%d %H:00'),
                   CAST(v_filled AS DOUBLE), CAST(n AS BIGINT),
                   CAST(CASE WHEN n = 0 THEN 1 ELSE 0 END AS INT)
            FROM cells ORDER BY user_id, bucket
            """
        ).fetchall()
    ]
    assert got == want


@given(
    events=st.lists(
        st.tuples(
            st.integers(1, 3),        # user_id
            st.integers(0, 200),      # minute offset (spans to force
        ),                            # multi-session splits at 30-min gap)
        min_size=1,
        max_size=18,
    )
)
@settings(
    max_examples=_depth.examples(20),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_sessionize_agrees(spark, ducks, events):
    """The SHIPPED gap sessionization (lag-flag-cumsum,
    events_sessionize_batch) must agree with an independent DuckDB
    formulation that finds session STARTS by non-existence of a
    predecessor within the gap and numbers sessions by counting starts
    — no window functions at all.  Random streams include duplicate
    timestamps (gap 0) and exact-gap boundaries (same session under the
    strict-> semantics)."""
    import datetime
    import tempfile

    from easy_sql_spark.queries.llm_ops3 import (
        SESSION_GAP_S,
        events_sessionize_batch,
    )

    base = datetime.datetime(2024, 5, 1, 0, 0, 0)
    rows = [
        (u, base + datetime.timedelta(minutes=m), 1.0) for u, m in events
    ]
    d = tempfile.mkdtemp(prefix="sess_fuzz_")
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")

    got = [
        tuple(r)
        for r in events_sessionize_batch(spark, d).collect()
    ]

    want = [
        tuple(r)
        for r in ducks.execute(
            f"""
            WITH e AS (
                SELECT user_id AS u, epoch_us(ts) // 1000000 AS t
                FROM '{d}/events.parquet/*.parquet'),
            dt AS (SELECT DISTINCT u, t FROM e),
            starts AS (
                SELECT u, t FROM dt a
                WHERE NOT EXISTS (
                    SELECT 1 FROM dt b
                    WHERE b.u = a.u AND b.t < a.t
                      AND b.t >= a.t - {SESSION_GAP_S})),
            sess AS (
                SELECT e.u, e.t,
                       (SELECT COUNT(*) FROM starts s
                        WHERE s.u = e.u AND s.t <= e.t) AS session_no
                FROM e)
            SELECT CAST(u AS BIGINT), CAST(session_no AS BIGINT),
                   CAST(MIN(t) AS BIGINT), CAST(MAX(t) AS BIGINT),
                   CAST(COUNT(*) AS BIGINT)
            FROM sess GROUP BY u, session_no
            ORDER BY u, session_no
            """
        ).fetchall()
    ]
    assert got == want


@given(
    events=st.lists(
        st.tuples(
            st.integers(1, 3),                            # user_id
            st.sampled_from(["view", "click", "purchase"]),
            st.integers(0, 50),                           # minute offset
        ),
        min_size=1,
        max_size=16,
    )
)
@settings(
    max_examples=_depth.examples(20),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_funnel_agrees(spark, ducks, events):
    """The SHIPPED ordered funnel (events_funnel — chained conditional-min
    windows) must agree with an independent DuckDB correlated-subquery
    cascade on random streams — INCLUDING corpora with an empty funnel
    stage: its first run caught a REAL bug, the ANSI divide-by-zero on a
    zero-view (or zero-click) corpus where DuckDB silently emits NULL
    (the same 0-denominator class the r8 mixture fuzzer found)."""
    import datetime
    import tempfile

    from easy_sql_spark.queries.llm_ops4 import events_funnel

    base = datetime.datetime(2024, 5, 1, 0, 0, 0)
    rows = [
        (u, typ, base + datetime.timedelta(minutes=m)) for u, typ, m in events
    ]
    d = tempfile.mkdtemp(prefix="funnel_fuzz_")
    spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")

    got = [tuple(r) for r in events_funnel(spark, d).collect()]

    want = [
        tuple(r)
        for r in ducks.execute(
            f"""
            WITH e AS (
                SELECT user_id AS u, event_type AS typ, ts AS t
                FROM '{d}/events.parquet/*.parquet'),
            users AS (SELECT DISTINCT u FROM e),
            pu AS (
                SELECT u,
                       (SELECT MIN(t) FROM e
                        WHERE e.u = users.u AND typ = 'view') AS a
                FROM users),
            pu2 AS (
                SELECT u, a,
                       (SELECT MIN(t) FROM e
                        WHERE e.u = pu.u AND typ = 'click'
                          AND t > pu.a) AS b
                FROM pu),
            pu3 AS (
                SELECT u, a, b,
                       (SELECT MIN(t) FROM e
                        WHERE e.u = pu2.u AND typ = 'purchase'
                          AND t > pu2.b) AS c
                FROM pu2)
            SELECT CAST(COUNT(a) AS BIGINT), CAST(COUNT(b) AS BIGINT),
                   CAST(COUNT(c) AS BIGINT),
                   CASE WHEN COUNT(a) > 0
                        THEN ROUND(CAST(COUNT(b) AS DOUBLE) / COUNT(a), 4)
                   END,
                   CASE WHEN COUNT(b) > 0
                        THEN ROUND(CAST(COUNT(c) AS DOUBLE) / COUNT(b), 4)
                   END
            FROM pu3
            """
        ).fetchall()
    ]
    assert got == want


@given(
    events=st.lists(
        st.tuples(
            st.integers(1, 4),      # user_id
            st.integers(0, 45),     # day offset (spans week boundaries)
            st.integers(0, 23),     # hour
        ),
        min_size=1,
        max_size=16,
    ),
    base_dow=st.integers(0, 6),     # start on every weekday
)
@settings(
    max_examples=_depth.examples(20),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_retention_cohorts_agree(spark, ducks, events, base_dow):
    """The SHIPPED weekly retention cohorts (window first-seen +
    date_trunc-week cohort + day-diff//7 offset) must agree with an
    independent DuckDB formulation that computes first-seen via a
    correlated MIN and the Monday via day-of-week arithmetic (no
    date_trunc at all) — week-truncation boundary semantics are a
    classic engine-divergence spot, so streams start on every weekday
    and span multiple week boundaries."""
    import datetime
    import tempfile

    from easy_sql_spark.queries.llm_ops4 import events_retention_cohorts

    base = datetime.datetime(2024, 4, 1) + datetime.timedelta(days=base_dow)
    rows = [
        (u, base + datetime.timedelta(days=d, hours=h))
        for u, d, h in events
    ]
    d = tempfile.mkdtemp(prefix="cohort_fuzz_")
    spark.createDataFrame(rows, "user_id long, ts timestamp").write.mode(
        "overwrite"
    ).parquet(f"{d}/events.parquet")

    got = [tuple(r) for r in events_retention_cohorts(spark, d).collect()]

    want = [
        tuple(r)
        for r in ducks.execute(
            f"""
            WITH e AS (
                SELECT user_id AS u, ts FROM '{d}/events.parquet/*.parquet'),
            f AS (
                SELECT u, ts,
                       (SELECT MIN(ts) FROM e i WHERE i.u = e.u) AS first_ts
                FROM e),
            m AS (
                SELECT u,
                       -- Monday via day-of-week arithmetic (Sunday = 0)
                       strftime(first_ts::DATE
                                - CAST((dayofweek(first_ts) + 6) % 7
                                       AS INTEGER),
                                '%Y-%m-%d') AS cohort,
                       CAST((ts::DATE - first_ts::DATE) // 7 AS INT)
                           AS week_offset
                FROM f)
            SELECT cohort, week_offset,
                   CAST(COUNT(DISTINCT u) AS BIGINT) AS active_users
            FROM m GROUP BY cohort, week_offset
            ORDER BY cohort, week_offset
            """
        ).fetchall()
    ]
    assert got == want
