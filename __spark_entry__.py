"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()``/``oracle_sql()`` expose the declared operator inventory
(SURVEY.md §2E + LLM-pipeline extensions) with DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from easy_sql_spark.queries import QUERIES
    from easy_sql_spark.session import tune_session

    tune_session(spark)
    return QUERIES["a1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    The driver's correctness gate samples the FIRST 50 entries; rounds
    1-4 always presented registration order, so the relational block got
    a driver-side verdict every round while later additions (TPC-H,
    dedup, snapshot/merge, multimodal) only had the in-repo full-registry
    gate (tests/test_oracle_all.py, which stays authoritative over ALL
    entries).  To rotate driver coverage, present NEWEST-first this
    round: the 50-entry window lands on the round-5 queries (snapshot
    branching, URL curation, mojibake, compression ratio, MMR, Markov,
    VARIANT, Delta/Iceberg interop, PCA) and round-4 tail that never
    had a driver-side verdict."""
    from easy_sql_spark.queries import QUERIES

    return dict(reversed(list(QUERIES.items())))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query."""
    from easy_sql_spark.queries import ORACLES

    return dict(ORACLES)
