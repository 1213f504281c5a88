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
