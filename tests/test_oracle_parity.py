"""Local replica of the driver's t2 correctness gate (SURVEY §5.2).

For every query in ``__spark_entry__.queries()`` with an oracle, run the
Spark plan AND the DuckDB SQL on the same parquet and compare row count,
column names, and an order-insensitive value multiset — the same contract
the driver's CORRECTNESS_r{N}.json records. Catches drift before the driver
does. Runs at sf0.001 by default for speed (driver uses sf0.01; set
LAKESHED_TEST_SF to match).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from lakeshed.io import STAR_TABLES

SF = os.environ.get("LAKESHED_TEST_SF", "/root/testdata/sf0.001")


def _canon(v):
    """Canonicalize a cell value for multiset comparison."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _rows_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in idx) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in STAR_TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(ORACLES[name])
    duck_cols = rel.columns
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rowcount spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    sm = _rows_to_multiset(spark_cols, spark_rows)
    dm = _rows_to_multiset(duck_cols, duck_rows)
    if sm != dm:
        diffs = [(a, b) for a, b in zip(sm, dm) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0 and df.columns


# --------------------------------------------------------------------------
# Entries past the driver's 50-row cap: the harness records at most 50
# CORRECTNESS entries (dict order), so the SELF_VERIFIED_TAIL queries get
# no driver row. This runs the SAME differential contract for them at the
# DRIVER's scale (sf0.01, not the fast default above) so their correctness
# evidence is equivalent.
# --------------------------------------------------------------------------

DRIVER_SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck_driver_sf():
    con = duckdb.connect()
    for t in STAR_TABLES:
        p = os.path.join(DRIVER_SF, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def _tail_names():
    from lakeshed.queries import SELF_VERIFIED_TAIL

    return [n for n in SELF_VERIFIED_TAIL if n in ORACLES]


@pytest.mark.parametrize("name", _tail_names())
def test_tail_query_matches_oracle_at_driver_sf(spark, duck_driver_sf, name):
    sdf = QUERIES[name](spark, DRIVER_SF)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    rel = duck_driver_sf.sql(ORACLES[name])
    duck_cols = rel.columns
    duck_rows = rel.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    assert _rows_to_multiset(spark_cols, spark_rows) == _rows_to_multiset(
        duck_cols, duck_rows
    )


def test_gated_head_is_exactly_fifty():
    """The driver records the FIRST 50 registry entries; everything else
    must be explicitly listed in SELF_VERIFIED_TAIL (and covered by the
    driver-sf tail test above). A new qdef that lands in the head would
    silently push an existing gate past the cap — fail here instead."""
    names = list(QUERIES)
    from lakeshed.queries import SELF_VERIFIED_TAIL

    assert len(names) - len(SELF_VERIFIED_TAIL) == 50, (
        f"{len(names)} registered, tail={len(SELF_VERIFIED_TAIL)}: "
        "add new entries to SELF_VERIFIED_TAIL or rebalance the gated 50"
    )
    assert names[50:] == list(SELF_VERIFIED_TAIL)
