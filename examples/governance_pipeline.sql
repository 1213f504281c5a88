-- backend: spark
-- Training-data governance pipeline: the round-3 ops composed as one ETL.
-- source cap -> repetition filter -> PII redaction -> shard split ->
-- sequence packing, ending in per-split packing stats.
-- (tests/test_examples.py keeps it green on the sf0.001 documents table.)

-- target=variables
select 40 as source_cap, 512 as ctx_tokens

-- cap over-represented sources (skew-safe two-phase plan)
-- target=func.sample_per_source(documents, capped_docs, source, ${source_cap}, doc_id)

-- score repetition; keep clean docs only
-- target=func.repetition_signals(capped_docs, scored_docs, text)

-- target=temp.clean_docs
select doc_id, text, source from scored_docs
where dup_bigram_frac <= 0.2 and top_word_frac <= 0.4

-- redact PII and count hits per row
-- target=func.pii_redact(clean_docs, redacted_docs, text)

-- stable train/val/test split on doc_id
-- target=func.assign_shards(redacted_docs, sharded_docs, doc_id, 80, 10)

-- pack into fixed-token context bins per source
-- target=func.pack_sequences(sharded_docs, packed_docs, source, doc_id, text, ${ctx_tokens})

-- target=check.all_docs_have_a_split
select count(*) as actual, 0 as expected
from packed_docs where split not in ('train', 'val', 'test')

-- target=temp.packing_report
select split, count(distinct source || '#' || bin_id) as n_bins,
       count(*) as n_docs, sum(tokens) as n_tokens, sum(n_pii) as n_pii
from packed_docs
group by split

-- target=log.packing_report
select * from packing_report order by split
