-- backend: spark
-- STREAMING fuzzy dedup against the persistent MinHash-LSH band index —
-- the dedup twin of examples/incremental_selection_stream.sql: a
-- `snapshot_cdf` source streams a growing corpus's net changes into
-- this `foreach_batch` ETL, which admits each micro-batch through
-- `operators/dedup_index.py` (collision probe against the on-disk
-- index, intra-batch clustering, index append) and maintains the
-- admitted-corpus table.  Per-batch cost is O(batch + matched bands) —
-- the corpus and the index are never rescanned — and the batch id rides
-- the snapshot commit protocol, so checkpoint-restart replays of a
-- micro-batch are skipped idempotently (exactly-once admission over the
-- at-least-once stream).
--
-- Roots arrive as ETL vars from the sink config (`vars:` in options):
--   ${didx}      the persistent LSH band index (snapshot table)
--   ${seen}      doc_ids ever processed (admitted OR rejected)
--   ${admitted}  the admitted corpus (doc_id, admitted_at_batch)
--
-- Rewrite churn discipline: a partition rewrite (compaction, a
-- delete_where) re-emits surviving rows as delete+insert pairs, and a
-- doc REJECTED once must not be retried against a now-different index —
-- so the batch is first narrowed to never-seen doc_ids via the ${seen}
-- table (broadcast-sized: the anti-join is keyed on the BATCH's ids).

-- target=temp.batch_inserts
select doc_id, text
from corpus_changes
where _change_type = 'insert'

-- target=func.snapshot_view(${seen}, seen_prev)

-- target=temp.batch_new
select b.* from batch_inserts b
left anti join seen_prev p on b.doc_id = p.doc_id

-- probe + cluster + index append, exactly-once under ${__batch_id__}
-- target=func.dedup_index_ingest(${didx}, batch_new, batch_admitted, ${__batch_id__})

-- target=func.snapshot_view(${admitted}, admitted_prev)

-- replay-safe append: the index commit itself is batch-id-idempotent,
-- but a crash between this append and the seen append would replay the
-- batch — the anti-join makes the second append a no-op instead of a
-- duplicate row
-- target=temp.admitted_rows
select b.doc_id, cast(${__batch_id__} as bigint) as admitted_at_batch
from batch_admitted b
left anti join admitted_prev p on b.doc_id = p.doc_id

-- target=func.snapshot_commit(${admitted}, admitted_rows, append)

-- target=temp.seen_rows
select doc_id from batch_new

-- target=func.snapshot_commit(${seen}, seen_rows, append)

-- admitted is a subset of this batch's never-seen docs, on EVERY batch
-- target=check.admitted_subset_of_new
select (select count(*) from batch_admitted a
        left anti join batch_new n on a.doc_id = n.doc_id) as actual,
       0 as expected
