"""Partition-info and partition-guard functions.

Reference semantics: funcs_common.py:92-268 + funcs_spark.py:169-190 —
partition values come from ``SHOW PARTITIONS`` (first partition column),
guards return bools for ``if=`` conditions.
"""

from __future__ import annotations


def build(processor):
    backend = processor.backend

    def _values(table: str) -> list[str]:
        return backend.list_partitions(table)

    def partition_exists(table: str, value: str) -> bool:
        return str(value) in _values(table)

    def partition_not_exists(table: str, value: str) -> bool:
        return not partition_exists(table, value)

    def is_first_partition(table: str, value: str) -> bool:
        vals = _values(table)
        return bool(vals) and str(value) == vals[0]

    def is_not_first_partition(table: str, value: str) -> bool:
        return not is_first_partition(table, value)

    def previous_partition_exists(table: str, value: str) -> bool:
        vals = _values(table)
        return any(v < str(value) for v in vals)

    def get_first_partition_optional(table: str) -> str | None:
        """First partition value or None (reference funcs_common.py:241-243)."""
        vals = _values(table)
        return vals[0] if vals else None

    def get_first_partition(table: str) -> str:
        vals = _values(table)
        if not vals:
            raise ValueError(f"no partitions in {table}")
        return vals[0]

    def count_partitions(table: str) -> int:
        """Partition count (reference funcs_common.py)."""
        return len(_values(table))

    def has_partition_col(table: str) -> bool:
        """Whether the table is partitioned (funcs_common.py:267-268)."""
        return len(backend.partition_columns(table)) > 0

    def get_last_partition(table: str) -> str:
        vals = _values(table)
        if not vals:
            raise ValueError(f"no partitions in {table}")
        return vals[-1]

    def get_partition_or_first_partition(table: str, value: str) -> str:
        vals = _values(table)
        if not vals:
            return str(value)
        return str(value) if str(value) in vals else vals[0]

    def get_partition_col(table: str) -> str:
        cols = backend.partition_columns(table)
        if not cols:
            raise ValueError(f"table {table} is not partitioned")
        return cols[0]

    def get_partition_cols(table: str) -> list[str]:
        return backend.partition_columns(table)

    def get_partition_values_as_joined_str(table: str) -> str:
        return ",".join(f"'{v}'" for v in _values(table))

    # guards: set the step-level skip var when the partition is absent
    def ensure_partition_exists(*args) -> bool:
        *tables, value = args
        ok = all(partition_exists(t, value) for t in tables)
        if not ok:
            processor.set_var("__skip_all__", "1")
        return ok

    def ensure_table_partition_exists(table: str, value: str) -> bool:
        return ensure_partition_exists(table, value)

    def ensure_dwd_partition_exists(*args) -> bool:
        return ensure_partition_exists(*args)

    def ensure_partition_or_first_partition_exists(*args) -> bool:
        *tables, value = args
        ok = all(
            _values(t) and (str(value) in _values(t) or _values(t)[0] <= str(value))
            for t in tables
        )
        if not ok:
            processor.set_var("__skip_all__", "1")
        return ok

    def ensure_table_partition_or_first_partition_exists(*args) -> bool:
        return ensure_partition_or_first_partition_exists(*args)

    return {
        k: v
        for k, v in locals().items()
        if callable(v) and not k.startswith("_") and k not in ("processor", "backend")
    }
