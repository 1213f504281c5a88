"""easy_sql_spark — a PySpark-native analytics/ETL engine.

A from-scratch engine with the query and data-processing capabilities of
easysql/easy_sql (the reference), re-expressed Spark-first:

- the step language (``-- target=...`` annotated SQL) is parsed driver-side
  and each step's SQL body is executed declaratively through ``spark.sql`` so
  Catalyst owns optimization (reference delegates identically:
  easy_sql/sql_processor/backend/spark.py:146-148);
- table management (temp views, cache, broadcast, partition-aware saves) maps
  onto the Spark catalog and ``INSERT OVERWRITE``/``DataFrameWriter``;
- the declared relational query surface (SURVEY.md §2E) plus LLM-data-pipeline
  operators (dedup, similarity search, text analysis) live in
  :mod:`easy_sql_spark.queries` and :mod:`easy_sql_spark.operators`.
"""

__version__ = "0.1.0"
