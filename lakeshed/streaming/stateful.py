"""Custom stateful streaming operator: gap-based sessionization.

The reference's only streaming state is the keyed upsert table itself
(SURVEY §2.9: "the only state is the keyed table"); the clickstream
datagen (``datagen/datagen.py:28-68``) is, however, explicitly a
session-shaped workload (per-user event streams with think-time gaps), and
a training-data/analytics pipeline needs the canonical custom-state
operator Spark provides for it: ``applyInPandasWithState``.

Two implementations with identical semantics, verified against each other:

- :func:`sessionize_batch` — pure Catalyst (lag → gap flag → running sum →
  group), the batch/oracle form. Two window passes + one agg, all
  JVM-side; shuffles once on ``user_id``.
- :func:`sessionize_stream` — Structured Streaming
  ``applyInPandasWithState`` keeping ONE open session per user in state
  (three longs — O(users) state, not O(events)); each closed session emits
  exactly once. Arrow-batched; events within a batch are sorted per group,
  cross-batch order is the file/source order (event-time order must be
  provided upstream, same contract as Flink keyed processing time order).

Determinism for the CORRECTNESS gate: a far-future sentinel row per user
closes every real session inside the bounded run (the sentinel's own
1-event session stays in state, never emitted), so the streaming result at
rest equals the batch answer exactly.

Scale: state is 24 bytes/user; the shuffle is one hash partition on the
group key — the same plan shape at 100 TB. Session output is append-mode,
so downstream sinks commit sessions exactly once per micro-batch.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id int, session_start timestamp, session_end timestamp, "
    "n_events bigint"
)
# one open session per user: (start, end, count) in epoch-µs / count
_STATE_SCHEMA = "open_start long, open_end long, open_cnt long"

#: sentinel far beyond any fixture event — closes every real session
FLUSH_TS = "2100-01-01 00:00:00"


def sessionize_batch(
    events: DataFrame,
    gap_minutes: int = 720,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Batch sessionization: a new session starts where the gap to the
    previous event of the same user exceeds ``gap_minutes``. Returns one
    row per (user, session) with start/end (second-truncated) and count."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.lag(ts_col).over(w)
    # µs precision — a seconds cast would disagree with the µs/ns oracle
    # on exact-boundary gaps
    new_s = F.when(
        gap.isNull()
        | (
            F.unix_micros(F.col(ts_col)) - F.unix_micros(gap)
            > gap_minutes * 60 * 1_000_000
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy(user_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        events.where(F.col(ts_col).isNotNull())
        .withColumn("__new", new_s)
        .withColumn("__sid", F.sum("__new").over(run))
        .groupBy(
            F.col(user_col).cast("int").alias("user_id"), F.col("__sid")
        )
        .agg(
            F.date_trunc("second", F.min(ts_col)).alias("session_start"),
            F.date_trunc("second", F.max(ts_col)).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("__sid")
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 720,
    ts_col: str = "ts",
    user_col: str = "user_id",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming sessionization over ``applyInPandasWithState``.

    State per user = the one open session (start, end, count). A batch's
    events are sorted by event time inside the group (Arrow batch →
    pandas sort — the sanctioned Python crossing: pure per-group math on
    narrow columns); sessions closed by a later event emit immediately,
    the trailing open session waits in state for the next batch.

    ``idle_timeout_ms`` is the production flush path: with it set, the
    operator runs under ``GroupStateTimeout.ProcessingTimeTimeout`` — a
    user whose state sees no new events for that long has their open
    session emitted and state cleared on the next trigger, so idle users
    flush WITHOUT the bounded-run sentinel (:func:`with_flush_sentinels`
    remains for deterministic oracle runs, where wall-clock timing would
    race the comparison). Note the engine semantics: with processing-time
    timeouts registered, Structured Streaming keeps scheduling
    timeout-service micro-batches even after an ``availableNow`` run
    drains its input, so such a query never self-terminates — use a
    continuous trigger in production, or poll-and-stop in bounded runs."""
    gap_us = gap_minutes * 60 * 1_000_000

    def _emit_one(start: int, end: int, cnt: int) -> pd.DataFrame:
        us_floor = (pd.Series([start, end], dtype="int64")
                    // 1_000_000) * 1_000_000
        t = pd.to_datetime(us_floor, unit="us")
        return pd.DataFrame(
            {
                "user_id": pd.Series([0], dtype="int64"),  # overwritten
                "session_start": [t.iloc[0]],
                "session_end": [t.iloc[1]],
                "n_events": pd.Series([cnt], dtype="int64"),
            }
        )

    def _key_val(key: tuple):
        # a NULL group key arrives as None/NaN — int() on it killed the
        # whole query (r11 review wave 12); emit a null-user row like
        # sessionize_batch does
        k = key[0]
        if k is None or (isinstance(k, float) and k != k):
            return None
        return int(k)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if idle_timeout_ms is not None and state.hasTimedOut:
            # idle-user flush: no new events, deadline passed — emit the
            # open session exactly once and drop the state
            if state.exists:
                open_start, open_end, open_cnt = state.get
                state.remove()
                out = _emit_one(open_start, open_end, open_cnt)
                out["user_id"] = _key_val(key)
                yield out
            return
        if state.exists:
            open_start, open_end, open_cnt = state.get
        else:
            open_start, open_end, open_cnt = None, 0, 0
        ts = pd.concat([pdf[ts_col] for pdf in pdfs]).dropna().sort_values()
        us = ts.astype("datetime64[us]").astype("int64")
        starts: list[int] = []
        ends: list[int] = []
        cnts: list[int] = []
        for t in us:
            if open_start is None:
                open_start, open_end, open_cnt = t, t, 1
            elif t - open_end > gap_us:
                starts.append(open_start)
                ends.append(open_end)
                cnts.append(open_cnt)
                open_start, open_end, open_cnt = t, t, 1
            else:
                # a cross-batch LATE event (t below the stored open_end;
                # within a batch ts is sorted) must not REGRESS the open
                # session's bounds (r11 review wave 12: open_end = t
                # shrank session_end below events already counted and
                # corrupted later gap decisions)
                open_start = min(open_start, t)
                open_end, open_cnt = max(open_end, t), open_cnt + 1
        if open_start is not None:
            state.update((int(open_start), int(open_end), int(open_cnt)))
            if idle_timeout_ms is not None:
                state.setTimeoutDuration(idle_timeout_ms)
        if starts:
            def trunc(vals: list[int]) -> pd.Series:
                # floor to whole seconds in integer µs, then to datetime
                us_floor = (pd.Series(vals, dtype="int64")
                            // 1_000_000) * 1_000_000
                return pd.to_datetime(us_floor, unit="us")

            kv = _key_val(key)
            yield pd.DataFrame(
                {
                    "user_id": pd.Series(
                        [kv] * len(starts),
                        dtype="int64" if kv is not None else "object"),
                    "session_start": trunc(starts),
                    "session_end": trunc(ends),
                    "n_events": pd.Series(cnts, dtype="int64"),
                }
            )

    return events.groupBy(
        F.col(user_col).cast("int").alias("user_id")
    ).applyInPandasWithState(
        fn, SESSION_SCHEMA, _STATE_SCHEMA, "append",
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout,
    )


def with_flush_sentinels(
    events: DataFrame, ts_col: str = "ts", user_col: str = "user_id"
) -> DataFrame:
    """Append one far-future row per user so a bounded streaming run closes
    every real session (the sentinel's own session is the only state left
    behind). Production streams don't need this — sessions close as live
    events arrive; use a ProcessingTimeTimeout to flush idle users."""
    sentinels = (
        events.select(user_col).distinct()
        .withColumn(ts_col, F.lit(FLUSH_TS).cast("timestamp"))
    )
    return events.select(user_col, ts_col).unionByName(sentinels)
