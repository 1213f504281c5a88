-- backend: spark
-- Warehouse maintenance pipeline: the round-4 write-path features
-- composed as one ETL — SCD2 dimension loading, CDC-batch upsert with
-- schema evolution, bloom-filtered fact output, then small-file
-- compaction of the append-fragmented table.
-- (tests/test_examples.py keeps it green on the sf0.001 tables.)

-- prepare-sql: drop database if exists maint cascade
-- prepare-sql: create database maint

-- ---------------------------------------------------------------- SCD2 dim
-- target=variables
select true as __create_output_table__, 'scd2' as __save_mode__,
       'c_custkey' as __merge_keys__, 'load_ts' as __scd2_ts__

-- target=output.maint.customer_dim
select c_custkey, c_name, c_mktsegment, cast(1 as int) as load_ts
from customer

-- second load: every 10th customer changes segment -> history row chains
-- target=output.maint.customer_dim
select c_custkey, c_name,
       case when c_custkey % 10 = 0 then 'MOVED' else c_mktsegment end as c_mktsegment,
       cast(2 as int) as load_ts
from customer

-- target=check.history_rows_match_changed_keys
select (select count(*) from maint.customer_dim where __is_current = false) as actual,
       (select count(*) from customer where c_custkey % 10 = 0) as expected

-- -------------------------------------------------- fact upsert + evolution
-- target=variables
select true as __create_output_table__, 'upsert' as __save_mode__,
       'o_orderkey' as __merge_keys__, true as __merge_schema__,
       'o_orderkey:200000' as __bloom_filter_cols__

-- target=output.maint.orders_fact
select o_orderkey, o_custkey, o_totalprice from orders

-- CDC batch arrives with a NEW column: schema evolves additively
-- target=output.maint.orders_fact
select o_orderkey, o_custkey, o_totalprice,
       cast('late' as string) as arrival_class
from orders where o_orderkey % 7 = 0

-- target=check.no_duplicate_orderkeys
select count(*) as actual, count(distinct o_orderkey) as expected
from maint.orders_fact

-- ------------------------------------------------------------- compaction
-- fragment the fact table with a few small appends, then compact
-- target=variables
select 'append' as __save_mode__

-- target=output.maint.orders_fact
select o_orderkey + 1000000 as o_orderkey, o_custkey, o_totalprice,
       cast('tiny1' as string) as arrival_class
from orders limit 10

-- target=output.maint.orders_fact
select o_orderkey + 2000000 as o_orderkey, o_custkey, o_totalprice,
       cast('tiny2' as string) as arrival_class
from orders limit 10

-- target=func.compact_table(maint.orders_fact, 128, 2)

-- target=log.final_counts
select (select count(*) from maint.customer_dim) as dim_rows,
       (select count(*) from maint.orders_fact) as fact_rows
