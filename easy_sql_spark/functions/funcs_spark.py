"""Spark-runtime control functions: parallelism, caching, column exprs,
model scoring (reference funcs_spark.py:38-166, funcs_common.py:24-48)."""

from __future__ import annotations

MIN_SHUFFLE_PARTITIONS = 1
MAX_SHUFFLE_PARTITIONS = 2000


def build(processor):
    spark = processor.spark
    backend = processor.backend

    def repartition(table: str, n: str):
        df = spark.table(table).repartition(int(n))
        backend.create_temp_view(df, table)

    def repartition_by_column(table: str, *cols):
        df = spark.table(table).repartition(*cols)
        backend.create_temp_view(df, table)

    def coalesce(table: str, n: str):
        df = spark.table(table).coalesce(int(n))
        backend.create_temp_view(df, table)

    def set_shuffle_partitions(n: str):
        """Pins shuffle parallelism.  Unlike the reference (which disables
        AQE first, funcs_spark.py:59-61) we keep AQE on — with
        coalescePartitions AQE treats this as the upper bound, which is the
        scale-correct behavior."""
        n_int = max(MIN_SHUFFLE_PARTITIONS, min(int(n), MAX_SHUFFLE_PARTITIONS))
        spark.conf.set("spark.sql.shuffle.partitions", str(n_int))

    def unpersist(table: str):
        try:
            spark.catalog.uncacheTable(table)
        except Exception:
            pass

    def _cols(table: str) -> list[str]:
        return spark.sql(f"select * from {table} limit 0").columns

    def all_cols_without_one_expr(table: str, excluded: str) -> str:
        return ", ".join(
            f"{table}.`{c}`" for c in _cols(table) if c != excluded
        )

    def all_cols_with_exclusion_expr(table: str, *excluded) -> str:
        ex = set(excluded)
        return ", ".join(f"{table}.`{c}`" for c in _cols(table) if c not in ex)

    def all_cols_prefixed_with_exclusion_expr(
        table: str, prefix: str, *excluded
    ) -> str:
        ex = set(excluded)
        return ", ".join(
            f"{table}.`{c}` as `{prefix}{c}`"
            for c in _cols(table)
            if c not in ex
        )

    def model_predict(model_path: str, table: str, output_view: str):
        """Batch-score a saved Spark ML PipelineModel (reference
        funcs_spark.py:138-158): int feature columns cast to double first."""
        from pyspark.ml import PipelineModel
        from pyspark.sql import functions as F

        df = spark.table(table)
        for f in df.schema.fields:
            if f.dataType.simpleString() in ("int", "bigint", "smallint"):
                df = df.withColumn(f.name, F.col(f.name).cast("double"))
        model = PipelineModel.load(model_path)
        backend.create_temp_view(model.transform(df), output_view)

    def sleep(seconds: str):
        import time

        time.sleep(float(seconds))

    def call_java(class_name: str, method: str, *args):
        jvm = spark.sparkContext._jvm
        obj = jvm
        for part in class_name.split("."):
            obj = getattr(obj, part)
        return getattr(obj, method)(*args)

    return {
        k: v
        for k, v in locals().items()
        if callable(v)
        and not k.startswith("_")
        and k not in ("processor", "spark", "backend")
    }
