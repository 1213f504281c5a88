-- backend: spark
-- INCREMENTAL selection-stat maintenance over a GROWING corpus — the
-- production shape of the data-selection stage: the mixture and DSIR
-- weight tables update as documents arrive (and as deletes retract
-- them), WITHOUT ever rescanning the corpus.
--
-- Driven per micro-batch by a `snapshot_cdf` streaming source feeding a
-- `foreach_batch` sink (streaming/tables.py): the batch view
-- `corpus_changes` carries the corpus columns plus `_change_type`
-- (insert | delete) and `_commit_version`.  All state lives in TINY
-- snapshot tables (one row per source; one row per 256 md5 buckets),
-- updated by SIGNED-delta merges — inserts add, deletes subtract — so a
-- day of appends to a 100 TB corpus costs one pass over the day's
-- changes plus metadata-scale state rewrites.  The derived mixture /
-- DSIR tables are recomputed FROM THE STATE each batch and stay exactly
-- equal to a full-corpus batch recompute (pinned by
-- tests/test_examples.py::test_incremental_selection_stream).
--
-- Roots arrive as ETL vars from the sink config (`vars:` in options):
--   ${state_src}  per-source token stats      (source, n_docs, n_tokens)
--   ${state_bk}   per-bucket DSIR counts      (bk, rc, tc)
--   ${mixture}    derived mixture table
--   ${weights}    derived 256-row DSIR bucket-LLR table
--   ${scored}     per-doc scores, appended at ingest time
--
-- Exactly-once note: this example uses plain overwrite commits; a
-- restart-hardened deployment records ${__batch_id__} per state commit
-- (the `snapshot` sink's commit_batch path) so checkpoint replays are
-- skipped idempotently.

-- target=temp.batch_tok
select doc_id, lang, source,
       case when _change_type = 'insert' then 1 else -1 end as sgn,
       regexp_extract_all(lower(text), '[a-z]+', 0) as ws
from corpus_changes

-- ---------------------------------------------------------------- source state
-- target=temp.delta_src
select source,
       cast(sum(sgn) as bigint) as n_docs,
       cast(sum(sgn * size(ws)) as bigint) as n_tokens
from batch_tok group by source

-- target=func.snapshot_view(${state_src}, src_state_prev)

-- target=temp.src_state_next
select coalesce(p.source, d.source) as source,
       cast(coalesce(p.n_docs, 0) + coalesce(d.n_docs, 0) as bigint) as n_docs,
       cast(coalesce(p.n_tokens, 0) + coalesce(d.n_tokens, 0) as bigint)
           as n_tokens
from src_state_prev p full outer join delta_src d on p.source = d.source

-- sources whose last doc was deleted leave the state entirely
-- target=temp.src_state
select * from src_state_next where n_docs > 0

-- target=func.snapshot_commit(${state_src}, src_state, overwrite)

-- ---------------------------------------------------------------- bucket state
-- target=temp.delta_bk
select bk,
       cast(sum(sgn) as bigint) as rc,
       cast(sum(case when lang = 'en' then sgn else 0 end) as bigint) as tc
from (select sgn, lang, substring(md5(w), 1, 2) as bk
      from (select sgn, lang, explode(ws) as w from batch_tok))
group by bk

-- target=func.snapshot_view(${state_bk}, bk_state_prev)

-- target=temp.bk_state_next
select coalesce(p.bk, d.bk) as bk,
       cast(coalesce(p.rc, 0) + coalesce(d.rc, 0) as bigint) as rc,
       cast(coalesce(p.tc, 0) + coalesce(d.tc, 0) as bigint) as tc
from bk_state_prev p full outer join delta_bk d on p.bk = d.bk

-- target=temp.bk_state
select * from bk_state_next where rc > 0

-- target=func.snapshot_commit(${state_bk}, bk_state, overwrite)

-- ------------------------------------------------ derived selection tables
-- recomputed from METADATA-SCALE state only (20 + 256 rows), never the corpus
-- target=temp.mixture_next
select source, n_docs, n_tokens,
       cast(case when n_tokens = 0 then 1.0
                 else round(least(1.0, (0.5 * t / k) / n_tokens), 4)
            end as double) as mix_rate
from src_state
cross join (select sum(n_tokens) as t, count(*) as k from src_state)

-- target=func.snapshot_commit(${mixture}, mixture_next, overwrite)

-- target=temp.weights_next
select bk,
       ln((tc + 1.0) / (tt + 256.0)) - ln((rc + 1.0) / (rt + 256.0)) as ll
from bk_state
cross join (select sum(rc) as rt, sum(tc) as tt from bk_state)

-- target=func.snapshot_commit(${weights}, weights_next, overwrite)

-- ------------------------------------------------------- score at ingest
-- new docs are scored ONCE, with the weight table as of their arrival —
-- the streaming-selection contract (recomputing old docs would be a
-- corpus rescan, exactly what incremental maintenance exists to avoid).
-- The anti-join keeps rewrite churn out: a partition rewrite (e.g. a
-- delete_where) re-emits surviving rows as delete+insert pairs — their
-- state deltas cancel exactly, and already-scored docs must not be
-- re-scored (the join is keyed on the BATCH's ids, broadcast-sized).
-- target=temp.scored_batch
select t.doc_id, cast(${__batch_id__} as bigint) as scored_at_batch,
       round(avg(w.ll), 4) + 0.0 as dsir_weight
from (select doc_id, explode(ws) as w from batch_tok where sgn = 1) t
join weights_next w on substring(md5(t.w), 1, 2) = w.bk
group by t.doc_id

-- target=func.snapshot_view(${scored}, scored_prev)

-- target=temp.scored_new
select b.* from scored_batch b
left anti join scored_prev p on b.doc_id = p.doc_id

-- target=func.snapshot_commit(${scored}, scored_new, append)

-- ------------------------------------------------------------- invariants
-- signed-delta state can never go negative, and the target slice is a
-- subset of the raw counts, on EVERY batch
-- target=check.state_counts_consistent
select (select count(*) from src_state where n_docs < 0 or n_tokens < 0)
     + (select count(*) from bk_state
        where rc < 0 or tc < 0 or tc > rc) as actual,
       0 as expected
