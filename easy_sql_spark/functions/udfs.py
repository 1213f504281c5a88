"""SQL UDF registration (reference udf/udfs.py:12-34 + spark.py:89-104).

The reference ships two Python UDFs (``remove_all_whitespaces``,
``trim_all``) and RDB-side SQL function definitions for names Spark already
has builtin (split/from_unixtime/date_format/get_json_object/sha1/translate)
— those need no registration here.  User UDFs register via the ``udfs``
dict (from ``easy_sql.udf_file_path`` in the CLI path).
"""

from __future__ import annotations

from typing import Callable


def remove_all_whitespaces(value: str | None) -> str | None:
    if value is None:
        return None
    return "".join(value.split())


def trim_all(value: str | None) -> str | None:
    """Trim whitespace AND zero-width/control junk from both ends."""
    if value is None:
        return None
    return value.strip(" \t\r\n\x00​ ")


class UDF:
    """Callable + explicit Spark return type (reference udf/check.py:10-17);
    register one to get a non-string return type."""

    def __init__(self, func: Callable, return_type) -> None:
        self.func = func
        self.return_type = return_type

    def __call__(self, *args, **kwargs):
        return self.func(*args, **kwargs)


def check_regex_func(pattern: str) -> Callable:
    """Value-or-NULL regex gate (reference udf/check.py:19-20): keeps the
    value when it matches, nulls it otherwise — the building block of the
    reference's column-check UDFs."""
    import re

    return lambda any_str: (
        any_str if any_str and re.match(pattern, any_str) else None
    )


BUILTIN_UDFS: dict[str, Callable] = {
    "remove_all_whitespaces": remove_all_whitespaces,
    "trim_all": trim_all,
}


def register_udfs(spark, extra: dict[str, Callable] | None = None) -> None:
    """Plain Python UDFs — fine here because these run on tiny dimension
    strings; bulk text paths in this engine use builtin functions or Arrow
    (pandas) UDFs instead.  Accepted values: plain callables (string
    return), :class:`UDF` wrappers (explicit return type), or
    already-decorated ``@pandas_udf``/``udf`` objects (registered as-is —
    the Arrow path for heavier per-row logic).

    Python UDTFs (Spark 4 table functions) register through the same
    dict/pyfile path: pass an ``@udtf``-decorated object, or a plain
    class with an ``eval`` generator and a ``returnType`` attribute
    (DDL string or StructType) — both land in ``spark.udtf`` and are
    callable as table functions (``SELECT * FROM my_udtf(...)`` /
    ``LATERAL my_udtf(col)``)."""
    from pyspark.sql import types as T
    from pyspark.sql.udtf import UserDefinedTableFunction

    for name, fn in {**BUILTIN_UDFS, **(extra or {})}.items():
        if isinstance(fn, UserDefinedTableFunction):
            spark.udtf.register(name, fn)
        elif isinstance(fn, type) and hasattr(fn, "eval"):
            rt = getattr(fn, "returnType", None)
            if rt is None:
                raise ValueError(
                    f"UDTF class {name!r} needs a returnType attribute "
                    "(DDL string or StructType)"
                )
            from pyspark.sql.functions import udtf as _udtf

            spark.udtf.register(name, _udtf(fn, returnType=rt))
        elif isinstance(fn, UDF):
            spark.udf.register(name, fn.func, fn.return_type)
        elif hasattr(fn, "returnType"):  # UserDefinedFunction (incl. pandas)
            spark.udf.register(name, fn)
        else:
            spark.udf.register(name, fn, T.StringType())
