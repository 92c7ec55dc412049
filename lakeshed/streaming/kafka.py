"""Kafka source/sink wiring (S9 / W9) — contract-tested, broker-gated.

The reference consumes a keyed-JSON clickstream topic
(``datagen/datagen.py:52-56,72-82`` produce side;
``PaimonStream.java:91`` consume side via ``'log.system'='kafka'``).
This container ships no Kafka broker or spark-sql-kafka package, so the
stream constructors raise the standard missing-data-source error if
started — but everything AFTER the source exchange is plain DataFrame
code, factored out here so it is testable on a recorded Kafka-shaped
frame (``KAFKA_RAW_SCHEMA``): the reader option contract, the
binary→typed projection, and the value→parse→``__seq`` mapping that
makes the per-partition Kafka offset the MERGE arrival order. On a real
cluster only the broker address changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeshed.streaming.changelog import parse_changelog

# The stock spark-sql-kafka source schema (Spark docs, "Structured
# Streaming + Kafka Integration"): recorded test frames must match it.
KAFKA_RAW_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)


def kafka_reader_options(
    bootstrap_servers: str, topic: str, starting_offsets: str = "latest"
) -> dict[str, str]:
    """The exact option set handed to ``readStream.format('kafka')`` —
    a pure function so the contract is assertable without a broker."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def kafka_typed_view(raw: DataFrame) -> DataFrame:
    """Binary (key, value) → strings; per-partition ``offset`` → ``__seq``
    (the arrival-order column MERGE needs, SURVEY §7.3). Works on the
    live stream and on recorded ``KAFKA_RAW_SCHEMA`` frames alike —
    and is IDEMPOTENT on an already-typed view (r11 review wave 12:
    ``kafka_changelog(kafka_stream_source(...))`` — the composition the
    S9 docstring recommends — re-applied this mapping and failed on the
    already-dropped ``offset`` column)."""
    if "__seq" in raw.columns and "offset" not in raw.columns:
        return raw.select("key", "value", "__seq")
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.col("offset").alias("__seq"),
    )


def kafka_changelog(raw: DataFrame) -> DataFrame:
    """The full consume-side mapping of ``PaimonStream.java:91``: kafka
    record → line-protocol parse (malformed dropped) with the kafka
    offset carried through as ``__seq`` — so replaying a topic yields the
    same deterministic upsert order as the live stream."""
    return parse_changelog(kafka_typed_view(raw), seq="__seq")


def kafka_stream_source(spark: SparkSession, bootstrap_servers: str,
                        topic: str, starting_offsets: str = "latest"
                        ) -> DataFrame:
    """S9 — keyed-JSON topic → (key, value, __seq) stream. Chain with
    ``from_json`` for the typed view or :func:`kafka_changelog` for the
    line protocol."""
    raw = (
        spark.readStream.format("kafka")
        .options(**kafka_reader_options(bootstrap_servers, topic,
                                        starting_offsets))
        .load()
    )
    return kafka_typed_view(raw)


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
