"""Deterministic clickstream fixture generator (S11).

The reference's ``datagen/datagen.py:28-68`` produces a Kafka JSON
clickstream: 10 users emitting one of 7 event kinds every 1-5 s with
``{timestamp, event, user_id, site_id, url, on_site_seconds,
viewed_percent}``. This generator reproduces that row shape Spark-natively
(``spark.range`` + column exprs — distributed, seedable, no Python loop)
for tests and demos; the Kafka produce leg (W9) lives in
lakeshed.streaming.kafka.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_KINDS = (
    "view", "click", "scroll", "hover", "purchase", "signup", "logout",
)


def clickstream(spark: SparkSession, rows: int = 1000, users: int = 10,
                sites: int = 5, seed: int = 42,
                start_ts: str = "2024-01-01 00:00:00") -> DataFrame:
    """Deterministic clickstream events matching datagen.py:43-51's schema.

    Everything derives from the row id through hashes, so any slice is
    reproducible on any cluster size (no RNG state to coordinate)."""
    kinds = F.array(*[F.lit(k) for k in EVENT_KINDS])
    h = lambda salt: F.abs(F.xxhash64(F.col("id") + F.lit(seed), F.lit(salt)))  # noqa: E731
    return spark.range(rows).select(
        (
            F.to_timestamp(F.lit(start_ts))
            + F.make_interval(secs=(h(1) % 5 + 1))
            + F.make_interval(secs=F.col("id") * 3)
        ).alias("timestamp"),
        F.element_at(kinds, (h(2) % len(EVENT_KINDS) + 1).cast("int"))
        .alias("event"),
        (h(3) % users).cast("int").alias("user_id"),
        (h(4) % sites).cast("int").alias("site_id"),
        F.concat(F.lit("/page/"), (h(5) % 100).cast("string")).alias("url"),
        (h(6) % 100).cast("int").alias("on_site_seconds"),
        (h(7) % 100).cast("int").alias("viewed_percent"),
    )


def clickstream_json_lines(spark: SparkSession, rows: int = 1000,
                           **kw) -> DataFrame:
    """The Kafka-message form: one JSON string per event keyed by user_id
    (datagen.py:52-56) — feed to a file/socket/kafka sink as-is."""
    ev = clickstream(spark, rows, **kw)
    return ev.select(
        F.col("user_id").cast("string").alias("key"),
        F.to_json(F.struct(*ev.columns)).alias("value"),
    )
