"""Temporal-join operator tests (asof_join / range_join semantics)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakeshed.temporal import asof_join, range_join


def _ts(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    for name, typ in [(f.name, f.dataType.simpleString())
                      for f in df.schema.fields]:
        if name.startswith("t"):
            df = df.withColumn(name, F.col(name).cast("timestamp"))
    return df


@pytest.fixture()
def frames(spark):
    left = _ts(spark, [
        (1, 10, "2024-01-01 00:00:05"),
        (2, 10, "2024-01-01 00:01:00"),
        (3, 10, "2024-01-01 00:00:10"),   # exact match with right ts
        (4, 11, "2024-01-01 00:00:30"),   # key with no right rows
    ], "event_id bigint, user_id bigint, ts string")
    right = _ts(spark, [
        (10, "2024-01-01 00:00:10", 100),
        (10, "2024-01-01 00:00:50", 101),
        (12, "2024-01-01 00:00:00", 200),  # right-only key
    ], "user_id bigint, ts string, purchase_id bigint")
    return left, right


def test_asof_backward_inclusive(spark, frames):
    left, right = frames
    got = {r.event_id: r.purchase_id
           for r in asof_join(left, right).collect()}
    assert got == {
        1: None,   # before any purchase
        2: 101,    # latest at-or-before 00:01:00
        3: 100,    # exact timestamp matches (inclusive)
        4: None,   # user 11 has no purchases
    }


def test_asof_forward(spark, frames):
    left, right = frames
    got = {r.event_id: r.purchase_id
           for r in asof_join(left, right, direction="forward").collect()}
    assert got == {1: 100, 2: None, 3: 100, 4: None}


def test_asof_rejects_column_clash(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("purchase_id", "event_id"))


def test_range_join_inclusive_bounds_and_key(spark):
    pts = _ts(spark, [
        (1, 10, "2024-01-01 01:00:00"),   # == w_start (inclusive)
        (2, 10, "2024-01-01 02:00:00"),   # == w_end (inclusive)
        (3, 10, "2024-01-01 02:00:01"),   # just outside
        (4, 11, "2024-01-01 01:30:00"),   # inside but wrong key
    ], "pid bigint, user_id bigint, tp string")
    iv = _ts(spark, [
        (7, 10, "2024-01-01 01:00:00", "2024-01-01 02:00:00"),
    ], "wid bigint, user_id bigint, t_start string, t_end string")
    got = sorted(
        r.pid for r in range_join(
            pts, iv, point_ts="tp", start_col="t_start", end_col="t_end",
            bin_seconds=600, key="user_id",
        ).collect()
    )
    assert got == [1, 2]


def test_range_join_is_hash_join_not_nested_loop(spark):
    """The bin trick must compile to an equi-join — a naive inequality
    join would be BroadcastNestedLoop/Cartesian, which dies at scale."""
    pts = _ts(spark, [(1, "2024-01-01 01:00:00")], "pid bigint, tp string")
    iv = _ts(spark, [(7, "2024-01-01 00:30:00", "2024-01-01 03:00:00")],
             "wid bigint, t_start string, t_end string")
    df = range_join(pts, iv, point_ts="tp", start_col="t_start",
                    end_col="t_end", bin_seconds=3600)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # multi-bin interval still yields exactly one match per pair
    assert [r.pid for r in df.collect()] == [1]


def test_asof_union_matches_pandas_variant(spark, frames):
    from lakeshed.temporal import asof_join_union

    left, right = frames
    pandas_out = sorted(
        (r.event_id, r.purchase_id) for r in asof_join(left, right).collect()
    )
    catalyst_out = sorted(
        (r.event_id, r.purchase_id)
        for r in asof_join_union(left, right).collect()
    )
    assert pandas_out == catalyst_out


def test_asof_union_null_right_values_row_atomic(spark):
    """A matched right row whose value column is legitimately NULL must
    yield NULL (not resurrect an older non-null value), and multiple value
    columns must come from the SAME right row — the struct-carry
    semantics, identical to merge_asof."""
    from lakeshed.temporal import asof_join_union

    left = _ts(spark, [
        (1, 10, "2024-01-01 00:00:20"),   # after the NULL-valued right row
        (2, 10, "2024-01-01 00:00:07"),   # after the first right row only
    ], "event_id bigint, user_id bigint, ts string")
    right = spark.createDataFrame([
        (10, "2024-01-01 00:00:05", 100, "a"),
        (10, "2024-01-01 00:00:15", None, "b"),  # NULL value, later row
    ], "user_id bigint, ts string, purchase_id bigint, tag string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.event_id: (r.purchase_id, r.tag)
           for r in asof_join_union(left, right).collect()}
    # event 1 matches the later right row: NULL purchase_id stays NULL and
    # both value columns come from that same row
    assert got == {1: (None, "b"), 2: (100, "a")}
    # parity with the cogrouped merge_asof implementation
    from lakeshed.temporal import asof_join
    pandas_got = {r.event_id: (r.purchase_id, r.tag)
                  for r in asof_join(left, right).collect()}
    assert pandas_got == got


def test_wave15_null_keys_and_timestamps(spark):
    """r11 review wave 15: NULL on/by rows must not crash merge_asof or
    be carried as phantom matches. Null-ts/key right rows can never be
    an ASOF match; null left rows are kept with null right values."""
    from lakeshed.temporal import asof_join_union

    left = _ts(spark, [
        (1, 10, "2024-01-01 00:00:05"),
        (2, 10, None),                       # null ts: kept, no match
        (3, None, "2024-01-01 00:00:30"),    # null key: kept, no match
    ], "event_id bigint, user_id bigint, ts string")
    right = _ts(spark, [
        (10, "2024-01-01 00:00:01", 100),
        (10, None, 999),                     # null ts: never a match
        (None, "2024-01-01 00:00:00", 888),  # null key: never a match
    ], "user_id bigint, ts string, purchase_id bigint")

    for impl in (asof_join, asof_join_union):
        got = {r.event_id: r.purchase_id
               for r in impl(left, right).collect()}
        assert got == {1: 100, 2: None, 3: None}, (impl.__name__, got)


def test_wave15_range_join_outer_guard_and_rollup_value_aggs(spark):
    from lakeshed.temporal import time_rollup

    points = _ts(spark, [(1, "2024-01-01 00:30:00")],
                 "pid bigint, tp string")
    ivals = _ts(spark, [(7, "2024-01-01 00:00:00", "2024-01-01 05:00:00")],
                "iid bigint, t_start string, t_end string")
    with pytest.raises(ValueError, match="cannot express"):
        range_join(points, ivals, "tp", "t_start", "t_end", how="full")

    # caller-supplied aggs over VALUE columns resolve (wave 15: the
    # projection used to drop every non-bucket/key column)
    ev = _ts(spark, [
        ("a", "2024-01-01 00:10:00", 5.0),
        ("a", "2024-01-01 00:40:00", 7.0),
        ("b", "2024-01-02 03:00:00", 1.0),
    ], "event_type string, ts string, value double")
    out = time_rollup(
        ev, aggs=[F.count(F.lit(1)).alias("cnt"),
                  F.round(F.sum("value"), 2).alias("total")])
    hour_a = [r for r in out.collect()
              if r.event_type == "a" and r.bucket_hour is not None]
    assert {(str(r.bucket_hour), r.cnt, r.total) for r in hour_a} == {
        ("2024-01-01 00:00:00", 2, 12.0)}
