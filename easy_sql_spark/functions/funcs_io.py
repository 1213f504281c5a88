"""IO helper functions: CSV/JSON sinks and file moves (reference
funcs_spark.py:64-135, funcs_common.py:324-337)."""

from __future__ import annotations

import glob
import json
import os
import shutil


def build(processor):
    spark = processor.spark
    backend = processor.backend

    def write_csv(table: str, path: str):
        """Single-file CSV with header.  coalesce(1) is a deliberate
        single-writer funnel — only for small exports; large extracts should
        drop the coalesce and write a directory."""
        spark.table(table).coalesce(1).write.mode("overwrite").option(
            "header", True
        ).csv(path)

    def rename_csv_output(spark_output_dir: str, target_file: str):
        parts = glob.glob(os.path.join(spark_output_dir, "part-*.csv"))
        if len(parts) != 1:
            raise RuntimeError(
                f"expected exactly one part file in {spark_output_dir}, "
                f"found {len(parts)}"
            )
        os.makedirs(os.path.dirname(target_file) or ".", exist_ok=True)
        shutil.move(parts[0], target_file)

    def move_file(src: str, dst: str):
        os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
        shutil.move(src, dst)

    def write_json_local(table: str, path: str):
        rows = [r.asDict(recursive=True) for r in spark.table(table).collect()]
        with open(path, "w", encoding="utf-8") as f:
            json.dump(rows, f, default=str)

    def read_csv(path: str, view: str, header: str = "true"):
        """Register a CSV file/dir as a temp view (schema inferred).  At
        scale prefer an explicit schema — inference scans the data twice —
        but the step stays one line either way."""
        df = (
            spark.read.option("header", header)
            .option("inferSchema", True)
            .csv(path)
        )
        backend.create_temp_view(df, view)

    def read_json(path: str, view: str):
        backend.create_temp_view(spark.read.json(path), view)

    def read_parquet(path: str, view: str):
        backend.create_temp_view(spark.read.parquet(path), view)

    def update_json_local(attr: str, path: str):
        """Merge current vars/list-vars into one attribute of a JSON file."""
        data = {}
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                data = json.load(f)
        data[attr] = {
            "vars": dict(processor.vars_context.vars),
            "list_vars": dict(processor.vars_context.list_vars),
        }
        with open(path, "w", encoding="utf-8") as f:
            json.dump(data, f, default=str)

    return {
        k: v
        for k, v in locals().items()
        if callable(v) and not k.startswith("_") and k not in ("processor", "spark", "backend")
    }
