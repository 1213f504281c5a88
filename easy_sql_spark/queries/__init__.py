"""Declared query registry — the correctness contract (SURVEY.md §2E + §7.2 M6).

Each query is registered with a Spark callable ``(spark, sf_dir) -> DataFrame``
and (when SQL-expressible) an equivalent DuckDB oracle SQL string over the
same parquet tables.  The driver's verify harness runs both at sf0.01 and
compares row-count + schema + order-insensitive value hash.

Parity discipline (both sides MUST follow it):
- alias every computed column identically in Spark and the oracle;
- round floating aggregates (sum/avg over doubles) so summation-order
  differences between engines can't flip the last ulp;
- cast DuckDB integer aggregates to BIGINT (DuckDB sums to HUGEINT);
- never output raw TIMESTAMP columns — format to strings (tz-stable).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a declared query, optionally with its DuckDB oracle SQL."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Importing the modules populates the registry.
from . import relational  # noqa: E402,F401
from . import llm_ops  # noqa: E402,F401
from . import advanced  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import tpch  # noqa: E402,F401  (newer modules imported last: keeps
from . import llm_ops2  # noqa: E402,F401  pre-existing queries() positions
from . import llm_ops3  # noqa: E402,F401  stable for the driver gate)
from . import llm_ops4  # noqa: E402,F401
from . import llm_ops5  # noqa: E402,F401
from . import llm_ops6  # noqa: E402,F401
