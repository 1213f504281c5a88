"""Structured Streaming mode for the step language.

The reference's streaming backend is Flink statement sets + connector YAML
(easy_sql/sql_processor/backend/flink.py:94-414); ours is Spark Structured
Streaming with the same step-language surface:

- ``easy_sql.etl_type=streaming`` switches the processor into streaming mode
  (config/sql_config.py:207-216);
- source tables come from a YAML/dict config → ``spark.readStream`` views
  (flink.py:227-235, 339-414);
- ``output`` steps DEFER (the statement-set analogue, flink.py:122-130):
  ``func.execute_streaming_inserts()`` starts them as one set;
- watermarks + event-time windows are exposed as an extension (the
  reference has none — SURVEY.md §2H).
"""

from .tables import StreamingTables
