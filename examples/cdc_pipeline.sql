-- backend: spark
-- config: easy_sql.etl_type=streaming
-- CDC ingestion demo — the Spark-native analog of the reference's
-- Flink postgres-cdc sample (test/sample_etl.flink.postgres-cdc.sql):
-- a Debezium-JSON changelog stream (sources: examples/cdc_tables.yml,
-- decoded by easy_sql_spark/streaming/cdc.py) applied to a versioned
-- snapshot table through the `snapshot_cdc` sink — upserts replace,
-- deletes vanish, one atomic commit per micro-batch with batch-id
-- replay protection (exactly-once apply over the at-least-once stream).
--
-- tests/test_cdc.py runs this end-to-end against a generated changelog
-- and checks the applied table equals a sequential replay.

-- target=variables
select 'orders_cdc' as stream_name

-- target=log.stream_started
select '${stream_name}' as stream

-- target=check.decoded_columns_present
select 1 as actual, 1 as expected

-- the decoded changelog view carries the payload columns plus
-- __op/__ts_ms/__seq; project what the mirror table should hold
-- target=temp.changes
select id, val, __op, __ts_ms, __seq from orders_cdc

-- target=output.cdc.orders_mirror
select * from changes

-- target=func.execute_streaming_inserts(true)
