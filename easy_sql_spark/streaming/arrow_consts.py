"""Typed constant Arrow columns for executor-side streaming reads.

Shared by the streaming sources that rebuild rows with pyarrow on
executors (snapshot_cdf, delta_cdf): a constant column (partition
value, change type, commit version) must carry an EXPLICIT arrow type —
``pa.array([None]*n)`` infers ``pa.null()`` and poisons the stream's
schema when a later batch carries a typed value (ADVICE r8 #3).
"""

from __future__ import annotations


def const_array(field, raw, n):
    """n-row arrow array of the string-encoded constant ``raw`` cast to
    the SPARK field's type (hive/delta partition-value conventions:
    None stays NULL; strings parse by type name)."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type

    typ = field.dataType.simpleString()
    val: object = raw
    if raw is not None and not isinstance(raw, (int, float, bool)):
        if typ in ("int", "bigint", "smallint", "tinyint"):
            val = int(raw)
        elif typ in ("double", "float"):
            val = float(raw)
        elif typ == "boolean":
            val = str(raw).lower() == "true"
        elif typ == "date":
            import datetime as _dt

            val = _dt.date.fromisoformat(raw)
        elif typ.startswith("decimal"):
            import decimal as _dec

            val = _dec.Decimal(raw)
        elif typ != "string":
            raise NotImplementedError(
                f"constant column {field.name!r} of type {typ}"
            )
    return pa.array([val] * n, type=to_arrow_type(field.dataType))
