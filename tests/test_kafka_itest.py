"""Kafka end-to-end streaming itest — env-gated.

No broker (and no spark-sql-kafka jar) ships in this container, so the
whole module skips unless ``KAFKA_BOOTSTRAP`` points at a reachable
broker (e.g. ``KAFKA_BOOTSTRAP=localhost:9092 pytest tests/test_kafka_itest.py``).
A broker-equipped CI then exercises the real `streaming/tables.py` kafka
source AND sink paths end-to-end: batch-produce → StreamingTables kafka
source → step-SQL transform → kafka sink → batch-consume verification.

This mirrors the reference's make-target pattern for connector itests
(reference Makefile:14-16: e2e tests run only where the backing service
exists); locally the config/DDL path stays covered by test_streaming.py.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

KAFKA = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not KAFKA,
    reason="KAFKA_BOOTSTRAP not set — kafka itest needs a reachable broker",
)

# Scala 2.13 build matching the pyspark 4.x line; CI resolves it from Maven.
_KAFKA_PKG = "org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.0"


@pytest.fixture(scope="module")
def kspark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("kafka-itest")
        .config("spark.jars.packages", _KAFKA_PKG)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield spark
    # do NOT spark.stop(): getOrCreate() returns the suite-shared local
    # session, and stopping it kills Spark for every later test file


def test_kafka_source_to_kafka_sink_roundtrip(kspark, tmp_path):
    from pyspark.sql import functions as F

    from easy_sql_spark.streaming.tables import StreamingTables

    topic_in = f"esql_in_{uuid.uuid4().hex[:8]}"
    topic_out = f"esql_out_{uuid.uuid4().hex[:8]}"

    # 1. Produce 20 JSON events with the batch kafka writer.
    rows = [(i, "click" if i % 2 else "view", float(i)) for i in range(20)]
    src = kspark.createDataFrame(rows, "event_id int, event_type string, value double")
    (
        src.select(
            F.col("event_id").cast("string").alias("key"),
            F.to_json(F.struct("event_id", "event_type", "value")).alias("value"),
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA)
        .option("topic", topic_in)
        .save()
    )

    # 2. Kafka source + kafka sink through the YAML-shaped config.
    tables = StreamingTables(
        kspark,
        {
            "sources": [
                {
                    "name": "kafka_events",
                    "format": "kafka",
                    "options": {
                        "kafka.bootstrap.servers": KAFKA,
                        "subscribe": topic_in,
                        "startingOffsets": "earliest",
                    },
                }
            ],
            "sinks": [
                {
                    "name": "kafka_out",
                    "format": "kafka",
                    "checkpoint": str(tmp_path / "ck_out"),
                    "output_mode": "append",
                    "trigger": "availableNow",
                    "options": {
                        "kafka.bootstrap.servers": KAFKA,
                        "topic": topic_out,
                    },
                }
            ],
        },
    )
    tables.register_sources()

    # 3. Step-style SQL over the registered stream view, then sink to kafka.
    parsed = kspark.sql(
        """
        SELECT CAST(get_json_object(CAST(value AS STRING), '$.event_id') AS INT)
                   AS event_id,
               get_json_object(CAST(value AS STRING), '$.event_type')
                   AS event_type,
               CAST(get_json_object(CAST(value AS STRING), '$.value') AS DOUBLE)
                   AS value
        FROM kafka_events
        """
    ).where("event_type = 'click'")
    out = parsed.select(
        parsed.event_id.cast("string").alias("key"),
        F.to_json(F.struct("event_id", "event_type", "value")).alias("value"),
    )
    q = tables.start_insert(out, "kafka_out")
    q.awaitTermination(120)

    # 4. Batch-consume the output topic and verify content.
    got = (
        kspark.read.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA)
        .option("subscribe", topic_out)
        .option("startingOffsets", "earliest")
        .load()
        .selectExpr("CAST(value AS STRING) AS v")
        .collect()
    )
    events = sorted(json.loads(r.v)["event_id"] for r in got)
    assert events == [i for i in range(20) if i % 2]  # the 10 click events


def test_kafka_source_watermarked_agg_to_memory(kspark, tmp_path):
    """Windowed aggregate over a kafka stream into the memory sink —
    the stateful path a CDC-ish consumer runs."""
    from pyspark.sql import functions as F

    from easy_sql_spark.streaming.tables import StreamingTables

    topic = f"esql_agg_{uuid.uuid4().hex[:8]}"
    rows = [(f"u{i % 3}", i) for i in range(30)]
    src = kspark.createDataFrame(rows, "user_id string, n int")
    (
        src.select(
            F.to_json(F.struct("user_id", "n")).alias("value")
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA)
        .option("topic", topic)
        .save()
    )

    tables = StreamingTables(
        kspark,
        {
            "sources": [
                {
                    "name": "kafka_agg_src",
                    "format": "kafka",
                    "options": {
                        "kafka.bootstrap.servers": KAFKA,
                        "subscribe": topic,
                        "startingOffsets": "earliest",
                    },
                }
            ],
            "sinks": [
                {
                    "name": "agg_mem",
                    "format": "memory",
                    "checkpoint": str(tmp_path / "ck_agg"),
                    "output_mode": "complete",
                    "trigger": "availableNow",
                }
            ],
        },
    )
    tables.register_sources()
    agg = kspark.sql(
        """
        SELECT get_json_object(CAST(value AS STRING), '$.user_id') AS user_id,
               SUM(CAST(get_json_object(CAST(value AS STRING), '$.n') AS INT))
                   AS total
        FROM kafka_agg_src GROUP BY 1
        """
    )
    q = tables.start_insert(agg, "agg_mem")
    q.awaitTermination(120)
    got = {r.user_id: r.total for r in kspark.sql("SELECT * FROM agg_mem").collect()}
    expect = {}
    for u, n in rows:
        expect[u] = expect.get(u, 0) + n
    assert got == expect
