"""Data-quality and alerting functions (reference funcs_common.py:51-89,
271-321, 340-453)."""

from __future__ import annotations


def build(processor):
    spark = processor.spark

    def check_not_null_column_in_table(table: str, *columns) -> bool:
        """Count nulls per column in ONE aggregation pass (no per-column
        scans — one job regardless of column count)."""
        from pyspark.sql import functions as F

        df = spark.table(table)
        cols = list(columns) if columns else df.columns
        agg = df.agg(
            *[
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(c)
                for c in cols
            ]
        ).first()
        bad = {c: agg[c] for c in cols if agg[c]}
        if bad:
            processor.log(f"null check failed for {table}: {bad}")
            return False
        return True

    def ensure_no_null_data_in_table(table: str, *columns) -> bool:
        ok = check_not_null_column_in_table(table, *columns)
        if not ok:
            raise RuntimeError(f"null data found in {table}")
        return True

    def alert(rule_name: str, pass_condition: str, message_template: str = ""):
        """Driver-side alerting (reference funcs_common.py:271-321).
        ``pass_condition`` is a registered func call like ``equal(${a}, 1)``
        (already var-substituted by the macro layer) or a variable name;
        on failure the alert renders to the log — external senders plug in
        by overriding this function in the user funcs dict."""
        import re

        m = re.match(r"^(\w+)\((.*)\)$", pass_condition, re.DOTALL)
        if m:
            result = processor.func_runner.run_func_call(
                m.group(1), m.group(2), processor.vars_context
            )
        else:
            result = processor.vars_context.is_truthy(pass_condition)
        if not result:
            processor.log(f"ALERT[{rule_name}]: {message_template}")
        return True

    def alert_with_backend(rule_name: str, check_table: str, message: str = ""):
        """Alert variant fed by a TABLE (reference funcs_common.py:271-321):
        fires when the table is non-empty, rendering ≤10 rows into the
        message."""
        rows = spark.table(check_table).limit(10).collect()
        if rows:
            rendered = "; ".join(str(r.asDict()) for r in rows)
            processor.log(f"ALERT[{rule_name}]: {message} {rendered}")
        return True

    def alert_exception_handler(rule_name: str, *args):
        """``__exception_handler__`` target: last positional arg is the
        exception the failed step raised (reference
        funcs_common.py:309-321)."""
        exc = args[-1] if args else None
        processor.log(f"ALERT[{rule_name}]: step failed: {exc}")
        return True

    def data_profiling_report(table: str, max_count: str = "10000"):
        """Lightweight dataset profile (the reference shells out to
        ydata-profiling, funcs_common.py:340-453 — not available here, so we
        compute summary() + null counts Spark-side; sampling keeps the
        driver-side result bounded)."""
        from pyspark.sql import functions as F

        df = spark.table(table)
        n = df.count()
        cap = int(max_count)
        if n > cap:
            df = df.sample(fraction=cap / n, seed=42)
        for line in df.summary().collect():
            processor.log(f"profile[{table}]: {line.asDict()}")
        nulls = df.agg(
            *[
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(c)
                for c in df.columns
            ]
        ).first()
        processor.log(f"profile[{table}] nulls: {nulls.asDict()}")
        return True

    return {
        k: v
        for k, v in locals().items()
        if callable(v) and not k.startswith("_") and k not in ("processor", "spark")
    }
