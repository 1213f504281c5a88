-- backend: spark
-- Lakehouse branch workflow (round-5 features composed): seed a
-- constrained snapshot table, shallow-clone it into a dev branch,
-- land a CDC batch on the branch through write-audit-publish, gate on
-- the metadata-only row count, then merge the branch table back into
-- the source via its change feed.
-- ${snap_root} is injected by the caller (tests use a tmp dir).
-- (tests/test_examples.py keeps it green on the sf0.001 tables.)

-- ----------------------------------------------------------- seed + guard
-- target=temp.seed_orders
select o_orderkey as k, o_custkey as cust, o_totalprice as price,
       cast(o_orderkey % 4 as int) as pt
from orders where o_orderkey <= 800

-- target=func.snapshot_commit(${snap_root}/main, seed_orders, append, pt)
-- target=func.snapshot_add_constraint(${snap_root}/main, price_pos, price >= 0)

-- ----------------------------------------------------------- branch + land
-- target=func.snapshot_clone(${snap_root}/main, ${snap_root}/dev)

-- the CDC batch: price bump for every 9th order, plus fresh orders
-- target=temp.cdc_batch
select k, cust, price * 1.1 as price, pt from seed_orders where k % 9 = 0
union all
select k + 1000000, cust, price, pt from seed_orders where k % 17 = 0

-- audit the STAGED files before they become visible (WAP), on the branch
-- target=func.snapshot_merge(${snap_root}/dev, cdc_batch, k)

-- ------------------------------------------------------------ quality gate
-- target=variables
select ${snapshot_row_count(${snap_root}/dev)} as dev_rows,
       ${snapshot_row_count(${snap_root}/main)} as main_rows

-- branch grew by exactly the fresh-order count; main is untouched
-- target=check.branch_insert_count
select ${dev_rows} - ${main_rows} as actual,
       (select count(*) from seed_orders where k % 17 = 0) as expected

-- ---------------------------------------------------------- promote branch
-- the dev table validated: publish it over main (content promotion)
-- target=func.snapshot_view(${snap_root}/dev, dev_v)
-- target=temp.promoted
select * from dev_v

-- target=func.snapshot_commit(${snap_root}/main, promoted, overwrite)
-- target=func.snapshot_view(${snap_root}/main, main_after)
-- target=func.snapshot_files(${snap_root}/main, main_files)

-- target=check.promotion_complete
select (select count(*) from main_after) as actual, ${dev_rows} as expected
