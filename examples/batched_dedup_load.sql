-- backend: spark
-- Priority-ordered BATCH load against the persistent MinHash-LSH band
-- index (operators/dedup_index.py) — the batch twin of
-- examples/streaming_dedup_index.sql.  One physical load arrives as
-- three admission tiers (e.g. license-clean first, then general web,
-- then tail sources); earlier tiers WIN collisions, later tiers are
-- deduped against them.  `defer=1` on each ingest + the closing
-- `dedup_index_flush` coalesce the three index appends into ONE
-- snapshot commit: later tiers probe the committed index PLUS the
-- earlier tiers' pending admissions — admission semantics identical to
-- per-tier commits, but the commit protocol's fixed cost (stage write,
-- footer stats, atomic manifest create; NameNode round-trips on HDFS)
-- is paid once per LOAD.  A failure anywhere before the flush commits
-- nothing — the index is exactly as before the load.
--
-- Vars: ${didx} — the band-index snapshot-table root.

-- target=temp.tier_priority
select doc_id, text from documents where doc_id <= 80

-- target=func.dedup_index_ingest(${didx}, tier_priority, admitted_t1, 1, 1)

-- target=temp.tier_general
select doc_id, text from documents where doc_id > 80 and doc_id <= 160

-- target=func.dedup_index_ingest(${didx}, tier_general, admitted_t2, 2, 1)

-- target=temp.tier_tail
select doc_id, text from documents where doc_id > 160 and doc_id <= 240

-- target=func.dedup_index_ingest(${didx}, tier_tail, admitted_t3, 3, 1)

-- ONE snapshot commit for the whole load (manifest records batch ids 1-3)
-- target=func.dedup_index_flush(${didx})

-- target=temp.admitted_corpus
select doc_id, 1 as tier from admitted_t1
union all select doc_id, 2 from admitted_t2
union all select doc_id, 3 from admitted_t3

-- every tier admitted something, and no doc is admitted twice
-- target=check.admissions_unique
select (select count(*) from admitted_corpus) as actual,
       (select count(distinct doc_id) from admitted_corpus) as expected
