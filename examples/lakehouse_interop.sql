-- backend: spark
-- Open-format interop tour: land data in the snapshot layer, export it
-- as Delta, Iceberg AND Hudi (Delta/Iceberg zero copy — derived
-- metadata over the same parquet; Hudi materialized, since its layout
-- requires partition columns physically in the base files), then read
-- it back through each format's replay path and prove all four views
-- agree.  ${lake_root} injected by the caller.
-- (tests/test_examples.py keeps it green.)

-- target=temp.seed
select o_orderkey as k, o_totalprice as price,
       cast(o_orderkey % 3 as string) as pt
from orders where o_orderkey <= 600

-- target=func.snapshot_commit(${lake_root}/t, seed, append, pt)
-- target=func.snapshot_export_delta(${lake_root}/t)
-- target=func.snapshot_export_iceberg(${lake_root}/t)
-- target=func.snapshot_export_hudi(${lake_root}/t, ${lake_root}/t_hudi, true)

-- target=func.snapshot_view(${lake_root}/t, via_snapshot)
-- target=func.delta_view(${lake_root}/t, via_delta)
-- target=func.iceberg_view(${lake_root}/t, via_iceberg)
-- target=func.hudi_view(${lake_root}/t_hudi, via_hudi)

-- target=check.delta_agrees_with_snapshot
select (select count(*) from via_delta) as actual,
       (select count(*) from via_snapshot) as expected

-- target=check.iceberg_agrees_with_snapshot
select (select cast(sum(k) as bigint) from via_iceberg) as actual,
       (select cast(sum(k) as bigint) from via_snapshot) as expected

-- target=check.hudi_agrees_with_snapshot
select (select cast(sum(k) as bigint) from via_hudi) as actual,
       (select cast(sum(k) as bigint) from via_snapshot) as expected

-- every partition survived all exports
-- target=check.partitions_intact
select (select count(distinct pt) from via_iceberg) as actual, 3 as expected

-- target=check.hudi_partitions_intact
select (select count(distinct pt) from via_hudi) as actual, 3 as expected
