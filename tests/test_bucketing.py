"""Bucketed-output support: the shuffle-free fact-fact join layout.

Verifies the SCALE.md claim concretely: two tables bucketed on the same key
with the same bucket count join with NO exchange in the physical plan.
"""

import contextlib
import io

from pyspark.sql import functions as F

from easy_sql_spark.runtime.processor import SqlProcessor

ETL = """-- backend: spark
-- prepare-sql: create database if not exists bkt

-- target=variables
select '{key}' as __bucket_by__, 4 as __bucket_count__

-- target=output.bkt.{name}
select * from {src}
"""


def _plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_outputs_join_without_shuffle(spark):
    spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    ).createOrReplaceTempView("left_src")
    spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") + 7).alias("b")
    ).createOrReplaceTempView("right_src")

    for name, src in [("facts_l", "left_src"), ("facts_r", "right_src")]:
        p = SqlProcessor(
            spark,
            ETL.format(key="k", name=name, src=src),
            logger=lambda m: None,
        )
        p.run()
        p.backend.clean_temp_views()

    # disable auto-broadcast so the join would OTHERWISE shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt.facts_l").join(spark.table("bkt.facts_r"), "k")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # bucketing elided both shuffles
        assert joined.count() == 500
        total = joined.agg(F.sum(F.col("a") + F.col("b"))).first()[0]
        assert total == sum(2 * k + k + 7 for k in range(500))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("drop table if exists bkt.facts_l")
        spark.sql("drop table if exists bkt.facts_r")


ETL_PART = """-- backend: spark
-- prepare-sql: create database if not exists bkt

-- target=variables
select 'k' as __bucket_by__, 4 as __bucket_count__,
       '2024-01-01' as __partition__dt

-- target=output.bkt.facts_p
select id as k, id * 3 as v from part_src
"""


def test_bucketed_output_keeps_static_partition(spark):
    """__partition__* static values must be injected into a bucketed output
    too, not only in the plain save_table path (ADVICE r1)."""
    spark.range(20).createOrReplaceTempView("part_src")
    p = SqlProcessor(spark, ETL_PART, logger=lambda m: None)
    p.run()
    p.backend.clean_temp_views()
    try:
        df = spark.table("bkt.facts_p")
        assert "dt" in df.columns
        assert df.where(F.col("dt") == "2024-01-01").count() == 20
    finally:
        spark.sql("drop table if exists bkt.facts_p")
