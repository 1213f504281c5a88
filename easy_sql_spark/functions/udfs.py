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


BUILTIN_UDFS: dict[str, Callable] = {
    "remove_all_whitespaces": remove_all_whitespaces,
    "trim_all": trim_all,
}


def register_udfs(spark, extra: dict[str, Callable] | None = None) -> None:
    """Plain Python UDFs — fine here because these run on tiny dimension
    strings; bulk text paths in this engine use builtin functions or Arrow
    (pandas) UDFs instead."""
    from pyspark.sql import types as T

    for name, fn in {**BUILTIN_UDFS, **(extra or {})}.items():
        spark.udf.register(name, fn, T.StringType())
