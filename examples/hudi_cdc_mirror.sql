-- backend: spark
-- Hudi CHANGE-DATA-CAPTURE consumption (RFC-51) — the Hudi twin of the
-- reference's Flink postgres-cdc pipeline (test/sample_etl.flink.
-- postgres-cdc.sql): a table written with `hoodie.table.cdc.enabled=
-- true` lands every change twice — regular data/delete log blocks for
-- the snapshot, and a supplemental `-cdc` log file of before/after
-- images.  `func.hudi_cdc_view` decodes the images executor-side into
-- a Debezium-shaped feed (commit_time/op/record_key/before/after as
-- JSON), `key_field` derives the record key from the images when the
-- logging mode doesn't persist one, and `func.snapshot_apply_changes`
-- merges the feed into a snapshot-table mirror: upserts replace,
-- deletes vanish, the commit_time precombine keeps late/replayed
-- events idempotent.  Incremental runs pass the last consumed instant
-- as the feed's floor — only newer cdc files are read.
--
-- Vars: ${hudi_table} — the CDC-enabled Hudi table root;
--       ${mirror}     — the snapshot-table mirror root;
--       ${from_instant} — exclusive consumption floor ('' = beginning).

-- target=func.hudi_cdc_view(${hudi_table}, hcdc, ${from_instant}, , id)

-- target=temp.changes
select cast(record_key as long)                         as id,
       get_json_object(coalesce(after, before), '$.val') as val,
       case op when 'd' then 'delete' else 'upsert' end  as __op,
       commit_time                                       as ts
from hcdc

-- target=func.snapshot_apply_changes(${mirror}, changes, id, __op, ts)
