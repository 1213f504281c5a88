-- backend: spark
-- Data-selection stage of a training-data pipeline, composed in the
-- step language over the documents table: repetition-quality signals,
-- DSIR-style importance weights against the 'en' slice, per-source
-- mixture rates under a token budget, and sliding-window chunking of
-- the selected docs.  (tests/test_examples.py keeps it green on the
-- sf0.001 documents view; the registry twins of these steps are
-- oracle-verified in queries/llm_ops6.py.)

-- target=temp.tokenized
select doc_id, lang, source,
       regexp_extract_all(lower(text), '[a-z]+', 0) as ws
from documents

-- repetition signals: top-unigram char share + distinct ratio (the
-- Gopher rules that kill template spam)
-- target=temp.repetition
select doc_id,
       size(ws) as n_words,
       round(size(array_distinct(ws)) / cast(size(ws) as double), 4)
           as distinct_ratio,
       round(aggregate(array_sort(ws),
             named_struct('prev', '', 'run', 0L, 'best', 0L, 'tot', 0L),
             (acc, x) -> named_struct(
                 'prev', x,
                 'run', IF(x = acc.prev, acc.run + 1L, 1L),
                 'best', greatest(acc.best,
                                  IF(x = acc.prev, acc.run + 1L, 1L) * length(x)),
                 'tot', acc.tot + length(x)),
             acc -> cast(acc.best as double) / acc.tot), 4) as top1_frac
from tokenized
where size(ws) >= 3

-- DSIR importance weight: hashed-unigram log-likelihood ratio of the
-- 'en' target slice vs the raw corpus (md5 buckets, add-one smoothed)
-- target=temp.bucketed
select doc_id, lang, substring(md5(w), 1, 2) as bk
from (select doc_id, lang, explode(ws) as w from tokenized)

-- target=temp.bucket_weights
select bk,
       ln((tc + 1.0) / (tt + 256.0)) - ln((rc + 1.0) / (rt + 256.0)) as ll
from (
    select bk,
           count(*) as rc,
           sum(case when lang = 'en' then 1 else 0 end) as tc
    from bucketed group by bk) s
cross join (
    select count(*) as rt,
           sum(case when lang = 'en' then 1 else 0 end) as tt
    from bucketed) t

-- target=temp.dsir_weights
select b.doc_id, round(avg(w.ll), 4) + 0.0 as dsir_weight
from bucketed b join bucket_weights w on b.bk = w.bk
group by b.doc_id

-- mixture balancing: per-source sampling rate under a 50% token budget
-- with a uniform per-source target
-- target=temp.mixture
select source, n_docs, n_tokens,
       round(least(1.0, (0.5 * t / k) / n_tokens), 4) as mix_rate
from (
    select source, count(*) as n_docs, sum(size(ws)) as n_tokens
    from tokenized group by source) per
cross join (
    select sum(size(ws)) as t, count(distinct source) as k
    from tokenized) tot

-- select: keep docs that pass the repetition gate AND score above the
-- corpus-median DSIR weight, then chunk into 64-token windows (48 stride)
-- target=temp.selected
select r.doc_id, r.n_words
from repetition r
join dsir_weights d on r.doc_id = d.doc_id
where r.top1_frac <= 0.5
  and d.dsir_weight >= (select percentile_approx(dsir_weight, 0.5)
                        from dsir_weights)

-- target=temp.chunks
select doc_id,
       cast(tok_start / 48 as bigint) as win_idx,
       tok_start,
       least(tok_start + 64, n_words) as tok_end
from (select doc_id, n_words, explode(sequence(0, n_words - 1, 48)) as tok_start
      from selected)

-- every selected doc must produce at least one window
-- target=check.every_selected_doc_chunked
select (select count(distinct doc_id) from chunks) as actual,
       (select count(*) from selected) as expected

-- mixture rates are valid probabilities
-- target=check.mix_rates_bounded
select (select count(*) from mixture
        where mix_rate <= 0 or mix_rate > 1) as actual,
       0 as expected
