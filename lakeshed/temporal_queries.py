"""Temporal-join CORRECTNESS queries (see lakeshed/temporal.py).

Both oracles are native DuckDB constructs (``ASOF JOIN``, inequality
join), so the gate value-checks the full operator semantics — including
the no-match null rows and inclusive bounds — not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeshed.io import load_star
from lakeshed.queries import qdef
from lakeshed.temporal import asof_join, range_join


@qdef(
    "temporal_asof_join",
    """
    WITH p AS (
      SELECT user_id, ts, max(event_id) AS purchase_id
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id, p.purchase_id
    FROM events e ASOF LEFT JOIN p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
    "asof-join",
)
def temporal_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event joined to the same user's most recent purchase at or
    before it (classic point-in-time enrichment). Spark side: cogrouped
    applyInPandas merge_asof; oracle: DuckDB's native ASOF LEFT JOIN.
    Events before a user's first purchase carry a null purchase_id."""
    ev = load_star(spark, sf_dir, "events")["events"]
    left = ev.select("event_id", "user_id", "ts")
    right = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
    )
    return asof_join(left, right, on="ts", by="user_id").select(
        "event_id", "user_id", "purchase_id"
    )


@qdef(
    "temporal_range_join",
    """
    WITH s AS (
      SELECT event_id AS window_id,
             ts - INTERVAL 1 HOUR AS w_start,
             ts + INTERVAL 1 HOUR AS w_end
      FROM events WHERE value > 250
    )
    SELECT s.window_id, count(*) AS cnt
    FROM s JOIN events e ON e.ts BETWEEN s.w_start AND s.w_end
    GROUP BY s.window_id
    """,
    "range-join",
)
def temporal_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events counted inside ±1 h windows around value spikes. Spark side:
    bin-explode equi-join (1 h bins → each window covers ≤3 bins) — a
    hash join, never a cross/nested-loop join; oracle: the plain
    inequality join DuckDB can afford at gate scale."""
    ev = load_star(spark, sf_dir, "events")["events"]
    spikes = ev.where(F.col("value") > 250).select(
        F.col("event_id").alias("window_id"),
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("w_end"),
    )
    joined = range_join(
        ev.select(F.col("ts")),
        spikes,
        point_ts="ts",
        start_col="w_start",
        end_col="w_end",
        bin_seconds=3600,
    )
    return joined.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@qdef(
    "temporal_asof_join_sql",
    """
    WITH p AS (
      SELECT user_id, ts, max(event_id) AS purchase_id
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id, p.purchase_id
    FROM events e ASOF LEFT JOIN p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
    "asof-join-catalyst",
)
def temporal_asof_join_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as-of semantics as ``temporal_asof_join`` through the
    pure-Catalyst union+window form (one shuffle, no Python) — both
    variants hash-match the same DuckDB ASOF oracle."""
    from lakeshed.temporal import asof_join_union

    ev = load_star(spark, sf_dir, "events")["events"]
    left = ev.select("event_id", "user_id", "ts")
    right = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
    )
    return asof_join_union(left, right, on="ts", by="user_id").select(
        "event_id", "user_id", "purchase_id"
    )


@qdef(
    "multi_grain_rollup",
    """
    SELECT date_trunc('hour', ts) AS bucket_hour,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
           event_type, count(*) AS cnt
    FROM events
    GROUP BY GROUPING SETS ((date_trunc('hour', ts), event_type),
                            (date_trunc('day', ts), event_type))
    """,
    "hypertable-rollup",
)
def multi_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour+day event rollups in one GROUPING SETS pass (single scan and
    shuffle for every grain) — the hypertable continuous-aggregate shape."""
    from lakeshed.temporal import time_rollup

    ev = load_star(spark, sf_dir, "events")["events"]
    return time_rollup(ev, ts_col="ts", key_cols=("event_type",),
                       grains=("hour", "day"))
