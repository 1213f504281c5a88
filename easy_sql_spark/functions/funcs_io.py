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

    def write_json_local(table: str, path: str, max_rows: str = "100000"):
        """Dump a table to a local JSON file (reference
        funcs_spark.py:109-115).  The reference collects unbounded; this
        is a driver-side funnel, so a default 100k-row bound refuses
        loudly instead of OOMing the driver at scale.  Pass an explicit
        larger ``max_rows`` (or ``max_rows=0`` for unbounded,
        reference-parity) to override.  ``default=str`` is a deliberate
        divergence so date/timestamp columns serialize instead of
        raising."""
        bound = int(max_rows)
        df = spark.table(table)
        if bound > 0:
            rows = [
                r.asDict(recursive=True)
                for r in df.limit(bound + 1).collect()
            ]
            if len(rows) > bound:
                raise RuntimeError(
                    f"write_json_local({table}): more than {bound} rows "
                    "would be collected to the driver; pass a larger "
                    "max_rows (or max_rows=0 for unbounded) if this is "
                    "intentional"
                )
        else:
            rows = [r.asDict(recursive=True) for r in df.collect()]
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

    def read_orc(path: str, view: str):
        backend.create_temp_view(spark.read.orc(path), view)

    def write_orc(table: str, path: str, mode: str = "overwrite"):
        """Write a view/table as ORC (the columnar format Hive warehouses
        commonly carry; same pushdown/pruning behavior as parquet)."""
        spark.table(table).write.mode(mode).orc(path)
        return True

    def read_jdbc(
        url: str,
        table: str,
        view: str,
        user: str = "",
        password: str = "",
        driver: str = "",
        partition_column: str = "",
        num_partitions: str = "",
    ):
        """Register an RDB table (or a ``(select ...) t`` pushdown query)
        as a temp view via Spark's JDBC source (reference
        funcs_rdb.py:139-148 option handling: driver/url/user/password/
        dbtable).

        Scale: without ``partition_column`` the read is a SINGLE connection
        — fine for dim tables, wrong for facts.  Passing
        ``partition_column`` + ``num_partitions`` turns it into a
        range-partitioned parallel read (lower/upper bounds probed with one
        min/max query first).
        """
        reader = spark.read.format("jdbc").option("url", url).option(
            "dbtable", table
        )
        if user:
            reader = reader.option("user", user)
        if password:
            reader = reader.option("password", password)
        if driver:
            reader = reader.option("driver", driver)
        if partition_column and num_partitions:
            bounds = (
                spark.read.format("jdbc")
                .option("url", url)
                .option(
                    "dbtable",
                    f"(select min({partition_column}) as lo, "
                    f"max({partition_column}) as hi from {table}) b",
                )
                .options(
                    **({"user": user} if user else {}),
                    **({"password": password} if password else {}),
                    **({"driver": driver} if driver else {}),
                )
                .load()
                .first()
            )
            reader = (
                reader.option("partitionColumn", partition_column)
                .option("lowerBound", str(bounds["lo"]))
                .option("upperBound", str(bounds["hi"]))
                .option("numPartitions", num_partitions)
            )
        backend.create_temp_view(reader.load(), view)

    def write_jdbc(
        table: str,
        url: str,
        dbtable: str,
        user: str = "",
        password: str = "",
        driver: str = "",
        save_mode: str = "append",
        truncate: str = "",
    ):
        """Write a temp view/table to an RDB table (reference
        funcs_rdb.py:158-168: format/mode/driver/truncate/url/user/
        password/dbtable)."""
        writer = (
            spark.table(table)
            .write.format("jdbc")
            .mode(save_mode)
            .option("url", url)
            .option("dbtable", dbtable)
        )
        if user:
            writer = writer.option("user", user)
        if password:
            writer = writer.option("password", password)
        if driver:
            writer = writer.option("driver", driver)
        if truncate:
            writer = writer.option("truncate", truncate)
        writer.save()

    def update_json_local(
        context, vars: str, list_vars: str, json_attr: str, output_file: str
    ):
        """Merge the NAMED vars and list-vars into the (dot-path)
        ``json_attr`` of a local JSON file — reference-exact signature
        and semantics (funcs_spark.py:117-135 + utils/object_utils
        ``get_attr``): the ETL passes ``${__context__}`` first exactly
        as the reference requires (its FuncRunner injects nothing —
        sql_processor.py:162 registers the live context as a var),
        missing path segments are created as dicts, unknown var names
        merge as null, output is indent-4 non-ascii-preserving JSON.
        r11: the previous 2-arg form here ((attr, path),
        dump-everything) was a parity bug — an ETL calling
        ``func.update_json_local(${__context__}, a, xs, s.r, out.json)``
        against the reference would break on this engine; caught while
        extending the e2e differential grammar to func steps."""
        vars_value = {
            v.strip(): context.vars_context.vars.get(v.strip())
            for v in vars.split(",")
            if v.strip()
        }
        list_vars_value = {
            v.strip(): context.vars_context.list_vars.get(v.strip())
            for v in list_vars.split(",")
            if v.strip()
        }
        data = {}
        if os.path.exists(output_file):
            with open(output_file, encoding="utf-8") as f:
                data = json.load(f)
        current = data
        if json_attr:
            for part in json_attr.split("."):
                if part == "":
                    raise ValueError(
                        "neither part of json_attr may be empty: "
                        f"`{json_attr}`"
                    )
                if not isinstance(current, dict):
                    raise ValueError(
                        f"json_attr `{json_attr}` conflicts with a "
                        f"non-object value already at `{part}` in "
                        f"{output_file}"
                    )
                if part not in current:
                    current[part] = {}
                current = current[part]
        if not isinstance(current, dict):
            raise ValueError(
                f"json_attr `{json_attr}` points at a non-object value "
                f"in {output_file}; cannot merge vars into it"
            )
        current.update(vars_value)
        current.update(list_vars_value)
        with open(output_file, "w", encoding="utf-8") as f:
            # no default=str: a non-JSON-serializable var value must raise
            # TypeError exactly as the reference does (funcs_spark.py:136)
            f.write(
                json.dumps(data, ensure_ascii=False, indent=4,
                           sort_keys=False)
            )

    return {
        k: v
        for k, v in locals().items()
        if callable(v) and not k.startswith("_") and k not in ("processor", "spark", "backend")
    }
