"""Client/result operators (SURVEY §2.10): C2 toLocalIterator, C3
Arrow/pandas handoff, S12 pushdown-scan-to-pandas — the PyIceberg client
path collapsed onto one engine (PyIceberg - Getting Started.ipynb:151-180,
WAP...ipynb:436).
"""

from __future__ import annotations

import os

import pytest
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


def test_sql_cell_magic(spark, tmp_path):
    """C5 — the %%sql magic routes cells through Catalog.sql with --limit
    and --var (spark/ipython/startup/00-prettytables.py:56-81 behavior)."""
    pytest.importorskip("IPython")
    from IPython.core.interactiveshell import InteractiveShell

    from lakeshed.catalog import Catalog
    from lakeshed.magic import register_magics

    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_database("nyc")
    cat.create_table(
        "nyc.n", spark.read.parquet(os.path.join(SF, "nation.parquet"))
    )
    shell = InteractiveShell.instance()
    register_magics(cat)
    pdf = shell.run_cell_magic(
        "sql", "--limit 3 --var out",
        "SELECT n_nationkey FROM nyc.n ORDER BY n_nationkey",
    )
    assert len(pdf) == 3 and list(pdf["n_nationkey"]) == [0, 1, 2]
    assert shell.user_ns["out"].count() > 3  # full frame captured
    assert shell.run_cell_magic(
        "sql", "", "DELETE FROM nyc.n WHERE n_nationkey >= 20"
    ) is None
    assert cat.table("nyc.n").read().count() == 20


def test_broadcast_join_plan_shape(spark):
    """The 3-way dim join must broadcast the dims (zero shuffle for the
    join itself) — the plan the engine promises at 100×."""
    from lakeshed.queries import join_3way_rollup

    df = join_3way_rollup(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

def test_to_arrow_client_scan_no_jvm(spark, tmp_path):
    """§3.4 — the PyIceberg client path: plan files from the commit log,
    read them with DuckDB, return Arrow — provably WITHOUT the JVM (the
    table's Spark handle is removed for the duration of the call)."""
    from lakeshed.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "whar"))
    src = spark.createDataFrame(
        [(i, ["red", "green", "blue"][i % 3], float(i)) for i in range(90)],
        "id bigint, color string, v double",
    )
    t = cat.create_table("default.arr", src, partition_by=("color",))

    expected = {(r.id, r.color, r.v)
                for r in src.where("v >= 30 AND color = 'red'").collect()}
    t.spark = None  # any JVM touch now raises
    try:
        at = t.to_arrow(where="v >= 30 AND color = 'red'")
    finally:
        t.spark = spark
    got = {(r["id"], r["color"], r["v"])
           for _, r in at.to_pandas().iterrows()}
    assert got == expected and got
    assert at.column_names == ["id", "color", "v"]

    # column projection + version pin (time travel without a cluster)
    v0 = t.head()
    t.delete("color = 'red'")
    t.spark = None
    try:
        old = t.to_arrow(columns=["id"], version=v0)
        new = t.to_arrow(columns=["id"])
        none = t.to_arrow(where="v < 0")
    finally:
        t.spark = spark
    assert old.num_rows == 90 and new.num_rows == 60
    assert none.num_rows == 0 and none.column_names == ["id", "color", "v"]


def test_to_arrow_applies_schema_evolution(spark, tmp_path):
    """Old file groups are projected to the current schema by field id —
    rename, widen, and NULL-fill — exactly like the Spark read path."""
    from lakeshed.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "whev"))
    t = cat.create_table(
        "default.evo",
        spark.createDataFrame([(1, "a", 7)], "k int, v string, r int"),
    )
    t.rename_column("v", "name")
    t.alter_column("r", type="double")
    t.add_column("w", "int")
    t.append(spark.createDataFrame(
        [(2, "b", 8.5, 20)], "k int, name string, r double, w int"))

    t.spark = None
    try:
        at = t.to_arrow()
    finally:
        t.spark = spark
    rows = {tuple(r) for r in at.to_pandas().itertuples(index=False)}
    assert at.column_names == ["k", "name", "r", "w"]
    got = {(k, n, r, (None if w != w else w)) for k, n, r, w in rows}
    assert got == {(1, "a", 7.0, None), (2, "b", 8.5, 20)}
    # equals the Spark read of the same table
    sp = {(r.k, r.name, r.r, r.w) for r in t.read().collect()}
    assert got == sp


def test_to_arrow_partition_nulls_types_and_dialect_guard(spark, tmp_path):
    """Hive-dir recovery edge cases: a NULL partition value reads back as
    NULL (not the sentinel string), an int partition column keeps its
    schema width, and Spark-dialect predicates are rejected instead of
    silently diverging in DuckDB."""
    import pyarrow as pa
    import pytest

    from lakeshed.catalog import Catalog
    from lakeshed.table import TableError

    cat = Catalog(spark, str(tmp_path / "whpn"))
    t = cat.create_table(
        "default.pn",
        spark.createDataFrame(
            [(1, 7, "x"), (2, None, "y"), (3, 7, "z")],
            "id bigint, grp int, v string",
        ),
        partition_by=("grp",),
    )
    at = t.to_arrow()
    assert at.schema.field("grp").type == pa.int32()  # schema width kept
    got = {(r["id"], None if r["grp"] != r["grp"] or r["grp"] is None
            else int(r["grp"]))
           for _, r in at.to_pandas().iterrows()}
    assert got == {(1, 7), (2, None), (3, 7)}
    sp = {(r.id, r.grp) for r in t.read().collect()}
    assert {(i, g) for i, g in got} == sp
    # backticked identifiers normalize through the parser and work
    assert t.to_arrow(where="`grp` = 7").num_rows == 2
    # engine functions are outside the portable grammar → explicit error
    with pytest.raises(TableError, match="portable"):
        t.to_arrow(where="substr(v, 1, 1) = 'x'")
