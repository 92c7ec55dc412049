"""Kafka source/sink wiring (S9 / W9) — constructor-only, import-gated.

The reference consumes a keyed-JSON clickstream topic
(``datagen/datagen.py:52-56,72-82`` produce side;
``PaimonStream.java:91`` consume side via ``'log.system'='kafka'``).
This container ships no Kafka broker or spark-sql-kafka package, so these
helpers build the reader/writer plans and raise a clear error if started
without the integration jar — the call shapes are the stock Spark ones and
need no adaptation on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_stream_source(spark: SparkSession, bootstrap_servers: str,
                        topic: str, starting_offsets: str = "latest"
                        ) -> DataFrame:
    """S9 — keyed-JSON topic → (key, value, offset) stream. Chain with
    ``from_json`` for the typed view; the per-partition ``offset`` is the
    arrival-order column MERGE needs (SURVEY §7.3)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.col("offset").alias("__seq"),
    )


def kafka_write(df: DataFrame, bootstrap_servers: str, topic: str) -> None:
    """W9 — batch produce (key, value) rows to a topic
    (datagen.py:52-56's producer.send)."""
    (
        df.select(
            F.col("key").cast("string"), F.col("value").cast("string")
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )
