"""Loading the driver's parquet testdata as DataFrames / temp views.

Tables (see /root/repo/TESTDATA.md): region nation customer supplier part
orders lineitem events documents embeddings — one parquet file per table
under ``{sf_dir}/{name}.parquet``.

Reads go through ``spark.read.parquet`` so Catalyst gets predicate pushdown,
column pruning and (on partitioned layouts) partition pruning for free.  At
cluster scale the same entry points accept directories of parquet files; no
code here assumes a single file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized reader
    # rejects; read nanos as bigint (ordering-equivalent).  Cheap runtime conf
    # set here so the driver's own session gets it too.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition a coarsely-partitioned input before a
    CPU-heavy per-row expansion (explode / heavy hashing / Pandas UDF).

    Partition sizing by bytes (AQE's REBALANCE) keeps small-but-
    expansion-heavy inputs in one task — a 5 MB scan that explodes 200× is
    CPU-bound long before it is byte-bound.  This helper only shuffles when
    the scan has fewer than half the cluster's cores worth of partitions,
    so at real scale (inputs with many splits) it is a no-op and costs
    nothing."""
    sc = df.sparkSession.sparkContext
    target = parallelism or sc.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= target:
        return df.repartition(target)
    return df


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view named after the table."""
    out = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
