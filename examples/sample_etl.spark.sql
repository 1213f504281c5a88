-- backend: spark
-- config: easy_sql.etl_type=batch
-- prepare-sql: create database if not exists sample

-- target=variables
select true as __create_output_table__, 2 as price_factor

-- target=template.by_segment
select c_mktsegment as segment,
       count(*) as n_customers,
       cast(sum(cast(round(c_acctbal * 100) as bigint)) as double) / 100
           as total_balance
from #{source_table}
group by c_mktsegment

-- target=temp.customer_segments
@{by_segment(source_table=customer)}

-- target=check.has_all_segments
select (select count(*) from customer_segments) as actual,
       (select count(distinct c_mktsegment) from customer) as expected

-- target=log.segment_summary
select * from customer_segments order by total_balance desc

-- target=temp.enriched
select segment,
       n_customers,
       total_balance,
       total_balance * ${price_factor} as doubled_balance
from customer_segments

-- target=output.sample.segment_report
select segment, n_customers, total_balance, doubled_balance from enriched
