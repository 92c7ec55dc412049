"""Client/result operators (SURVEY §2.10): C2 toLocalIterator, C3
Arrow/pandas handoff, S12 pushdown-scan-to-pandas — the PyIceberg client
path collapsed onto one engine (PyIceberg - Getting Started.ipynb:151-180,
WAP...ipynb:436).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF = os.environ.get("LAKESHED_TEST_SF", "/root/testdata/sf0.001")


def test_pushdown_scan_to_pandas(spark):
    """S12+C3 — filter → toPandas: the predicate must reach the parquet
    scan (PushedFilters), and the Arrow transfer must deliver a pandas
    frame (PyIceberg...ipynb:168,180)."""
    df = (
        spark.read.parquet(os.path.join(SF, "customer.parquet"))
        .where(F.col("c_acctbal") >= 5000.0)
        .select("c_custkey", "c_acctbal")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "c_acctbal" in plan.split(
        "PushedFilters"
    )[1][:200], f"filter did not reach the scan:\n{plan[:500]}"
    pdf = df.toPandas()
    assert (pdf["c_acctbal"] >= 5000.0).all()
    assert len(pdf) == df.count()


def test_to_local_iterator(spark):
    """C2 — toLocalIterator streams partitions without materializing the
    whole result on the driver (WAP...ipynb:436)."""
    df = (
        spark.read.parquet(os.path.join(SF, "nation.parquet"))
        .select("n_name")
        .distinct()
    )
    seen = {r["n_name"] for r in df.toLocalIterator()}
    assert seen == {r["n_name"] for r in df.collect()}
    assert len(seen) > 0


def test_broadcast_join_plan_shape(spark):
    """The 3-way dim join must broadcast the dims (zero shuffle for the
    join itself) — the plan the engine promises at 100×."""
    from lakeshed.queries import join_3way_rollup

    df = join_3way_rollup(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan