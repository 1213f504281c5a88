-- backend: spark
-- config: easy_sql.etl_type=streaming
-- Streaming demo: rate source -> parity buckets -> continuous aggregate.
-- Sources/sinks come from examples/streaming_tables.yml (passed as
-- streaming_config or via easy_sql.streaming_tables_config_path);
-- tests/test_examples.py runs it for a few micro-batches.

-- target=temp.bucketed
select value, case when value % 2 = 0 then 'even' else 'odd' end as parity
from ticks

-- target=output.sdemo.tick_agg
select parity, count(*) as n, max(value) as max_value
from bucketed group by parity

-- wait=false: the query runs on a continuous 1s trigger, so the ETL
-- returns immediately and the caller owns the query lifecycle
-- target=func.execute_streaming_inserts(false)
