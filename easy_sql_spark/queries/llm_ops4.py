"""Round-4 additions: the keyed upsert/MERGE save mode exercised
end-to-end under an oracle.

Separate module (imported after llm_ops3) so pre-existing ``queries()``
positions stay stable for the driver gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..datasets import load_table
from . import query


@query(
    "upsert_keyed_merge",
    oracle="""
    SELECT doc_id,
           md5(text || CASE WHEN doc_id > 200 THEN '!' ELSE '' END) AS h,
           CAST(CASE WHEN doc_id > 200 THEN 2 ELSE 1 END AS INTEGER) AS version,
           CAST(doc_id % 4 AS INTEGER) AS pt
    FROM documents WHERE doc_id <= 400 ORDER BY doc_id
    """,
)
def upsert_keyed_merge(spark, sf_dir):
    """End-to-end keyed upsert (``__save_mode__=upsert`` +
    ``__merge_keys__``) through the FULL output-step path — the save mode
    an incremental pipeline uses to land ``dedup_incremental`` admissions
    into the corpus table (reference CDC/Hudi upsert semantics,
    easy_sql/sql_processor/backend/flink.py:196-204,
    test/sample_etl.flink.postgres-cdc.sql:35-37).

    Seed: docs 1-300 as version 1 into a pt-partitioned warehouse table.
    Merge batch: docs 201-400 with recomputed hashes as version 2 —
    201-300 are SCD1 updates, 301-400 inserts, 1-200 must survive
    untouched.  The query returns the final TABLE STATE, so the oracle
    checks the merge itself, not a query over inputs.

    Scale: the copy-on-write merge reads back only partitions touched by
    the batch (incoming partitions ∪ matched-key partitions via one
    column-pruned semi-join — the parquet analogue of Hudi's index
    lookup); a 1-partition batch against a 100 TB table reads and
    rewrites one partition, not the table.  See
    runtime/backend.py ``_merge_upsert_frame``."""
    from ..runtime.processor import SqlProcessor

    # a fresh session's in-memory catalog forgets the table but its files
    # persist in the warehouse dir — drop both, or CTAS fails with
    # LOCATION_ALREADY_EXISTS on the second-ever run
    import os
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(wh, "upsq.db"), ignore_errors=True)

    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("upsq_docs_v")
    etl = """-- backend: spark
-- prepare-sql: drop database if exists upsq cascade
-- prepare-sql: create database upsq

-- target=variables
select true as __create_output_table__, 'upsert' as __save_mode__, 'doc_id' as __merge_keys__, '' as __partition__pt

-- target=output.upsq.corpus
select doc_id, md5(text) as h, cast(1 as int) as version, cast(doc_id % 4 as int) as pt
from upsq_docs_v where doc_id <= 300

-- target=output.upsq.corpus
select doc_id, md5(concat(text, '!')) as h, cast(2 as int) as version, cast(doc_id % 4 as int) as pt
from upsq_docs_v where doc_id > 200 and doc_id <= 400
"""
    SqlProcessor(spark, etl, logger=lambda m: None).run()
    return (
        spark.table("upsq.corpus")
        .select("doc_id", "h", "version", F.col("pt").cast("int").alias("pt"))
        .orderBy("doc_id")
    )


@query(
    "scd2_history_merge",
    oracle="""
    WITH base AS (SELECT doc_id FROM documents WHERE doc_id <= 300),
    changed AS (SELECT doc_id FROM base WHERE CAST(doc_id % 3 AS INT) = 0),
    v1_closed AS (
        SELECT doc_id, md5(text) AS val, 1 AS start_at, 2 AS end_at, false AS is_current
        FROM documents WHERE doc_id <= 300 AND CAST(doc_id % 3 AS INT) = 0),
    v1_open AS (
        SELECT doc_id, md5(text) AS val, 1 AS start_at, CAST(NULL AS INT) AS end_at, true AS is_current
        FROM documents WHERE doc_id <= 300 AND CAST(doc_id % 3 AS INT) <> 0),
    v2 AS (
        SELECT doc_id, md5(text || '!') AS val, 2 AS start_at, CAST(NULL AS INT) AS end_at, true AS is_current
        FROM documents WHERE doc_id <= 300 AND CAST(doc_id % 3 AS INT) = 0),
    news AS (
        SELECT doc_id,
               CASE WHEN CAST(doc_id % 3 AS INT) = 0 THEN md5(text || '!')
                    ELSE md5(text) END AS val,
               2 AS start_at, CAST(NULL AS INT) AS end_at, true AS is_current
        FROM documents WHERE doc_id > 300 AND doc_id <= 350)
    SELECT doc_id, val, CAST(start_at AS INT) AS start_at,
           CAST(end_at AS INT) AS end_at, is_current
    FROM (SELECT * FROM v1_closed UNION ALL SELECT * FROM v1_open
          UNION ALL SELECT * FROM v2 UNION ALL SELECT * FROM news)
    ORDER BY doc_id, start_at
    """,
)
def scd2_history_merge(spark, sf_dir):
    """End-to-end SCD2 merge (``__save_mode__=scd2``) through the FULL
    output-step path — history-keeping CDC apply, one step past
    ``upsert_keyed_merge``'s SCD1 semantics.

    Seed: docs 1-300 at ts=1.  Merge batch at ts=2: every doc_id % 3 == 0
    gets a changed value (its v1 row must CLOSE at ts=2 and a current v2
    row insert), every other matched doc re-arrives UNCHANGED (must be a
    no-op — the idempotence contract), and docs 301-350 are new keys.
    The query returns the final TABLE STATE including both interval
    bounds and the current flag, so the oracle checks close/insert/no-op
    behavior row by row.  See runtime/backend.py ``_merge_scd2_frame``
    for the partition-pruned plan."""
    from ..runtime.processor import SqlProcessor

    import os
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(wh, "scd2q.db"), ignore_errors=True)

    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("scd2q_docs_v")
    etl = """-- backend: spark
-- prepare-sql: drop database if exists scd2q cascade
-- prepare-sql: create database scd2q

-- target=variables
select true as __create_output_table__, 'scd2' as __save_mode__,
       'doc_id' as __merge_keys__, 'ts' as __scd2_ts__

-- target=output.scd2q.dim
select doc_id, md5(text) as val, cast(1 as int) as ts
from scd2q_docs_v where doc_id <= 300

-- target=output.scd2q.dim
select doc_id,
       case when cast(doc_id % 3 as int) = 0 then md5(concat(text, '!'))
            else md5(text) end as val,
       cast(2 as int) as ts
from scd2q_docs_v where doc_id <= 350
"""
    SqlProcessor(spark, etl, logger=lambda m: None).run()
    t = spark.table("scd2q.dim")
    return t.select(
        "doc_id",
        "val",
        F.col("__start_at").cast("int").alias("start_at"),
        F.col("__end_at").cast("int").alias("end_at"),
        F.col("__is_current").alias("is_current"),
    ).orderBy("doc_id", "start_at")


@query("text_bpe_merges")  # rows-only: iterative trainer, not SQL-expressible
def text_bpe_merges(spark, sf_dir):
    """BPE tokenizer training over the scoped corpus (operators/bpe.py):
    learn 12 pair merges and return the merge table (rank, left, right,
    pair_weight).  No DuckDB oracle — the trainer is ITERATIVE (each
    round's argmax depends on the previous merge's re-segmentation),
    which recursive SQL cannot express; instead the Spark implementation
    is bit-exact-crosschecked against a pure-Python reference in
    tests/test_bpe.py (same discipline as the minhash folds).

    Scale: the working set after the first pass is the distinct-word
    vocabulary with multiplicities, so corpus size only affects the one
    tokenize+groupBy pass; each round is a narrow pair transform + a
    |pairs|-key aggregate + a driver-side argmax (the merge table is
    driver-sized by definition)."""
    from ..operators.bpe import bpe_train

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") <= 400)
        .select("text")
    )
    merges = bpe_train(docs, n_merges=12)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_weight long"
    ).orderBy("rank")
