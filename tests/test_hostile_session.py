"""Hostile-session regression gate (round-2 VERDICT item 2).

The correctness harness builds its OWN SparkSession — no lakeshed
builder defaults, Spark 4 defaults in force (``spark.sql.ansi.enabled=
true``, no ``nanosAsLong``). Round 2 lost 13 gate queries to code that
only worked under ``lakeshed.session.get_spark()`` defaults. This module
runs EVERY registered gate query end-to-end (full collect, like the
harness) on a session forced back to that hostile state, so any new
dependency on builder conf fails here first.
"""

from __future__ import annotations

import pytest

from lakeshed.queries import spark_queries

# Conf the lakeshed builder sets that the driver's session does NOT.
# Re-forced before every query because load_star legitimately flips
# nanosAsLong at runtime — each query must survive from the cold state.
_HOSTILE_CONF = {
    "spark.sql.ansi.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "false",
    # keep UTC + Arrow: value semantics, not crash-surface; the driver's
    # container runs UTC and the oracle compare assumes it
    "spark.sql.session.timeZone": "UTC",
}


@pytest.fixture(scope="module")
def hostile(spark):
    """A sibling session sharing the SparkContext but with its own SQLConf.

    ``newSession()`` still inherits builder-time conf via SparkConf, so the
    hostile values are forced explicitly (and re-forced per test below).
    """
    return spark.newSession()


@pytest.mark.parametrize("name", sorted(spark_queries()))
def test_gate_query_runs_on_vanilla_session(hostile, sf_dir, name):
    for k, v in _HOSTILE_CONF.items():
        hostile.conf.set(k, v)
    df = spark_queries()[name](hostile, sf_dir)
    # Full collect — limit/count would let Catalyst prune the very
    # expressions (ANSI casts, divisions) this gate exists to exercise.
    rows = df.collect()
    assert rows is not None
