"""Table-layer CORRECTNESS queries — materialize, mutate, and read back.

Each entry creates a real commit-log table under a fresh temp dir, applies
the notebook's mutation sequence (UPDATE Getting Started.ipynb:204, DELETE
:247, MERGE IcebergStream.java:116-120, time travel :424, schema evolution
:123-183), and returns the resulting DataFrame. The DuckDB oracle expresses
the same post-mutation state as a single SELECT over the source views —
the driver hash-compares both at sf0.01.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeshed.catalog import Catalog
from lakeshed.io import load_star
from lakeshed.queries import qdef


def _cat(spark: SparkSession) -> Catalog:
    return Catalog(spark, tempfile.mkdtemp(prefix="lakeshed-q-"))


@qdef(
    "table_update_delete",
    """
    SELECT o_orderstatus,
           count(*) AS cnt,
           round(sum(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN o_totalprice * 1.1 ELSE o_totalprice END), 2)
               AS total
    FROM orders
    WHERE NOT (o_orderstatus = 'F')
    GROUP BY o_orderstatus
    """,
    "W1", "D10", "D11",
)
def table_update_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+D10+D11 — saveAsTable → UPDATE SET expr WHERE → DELETE WHERE →
    read back (Getting Started.ipynb:77→204→247). Copy-on-write rewrites
    only files containing matching rows."""
    orders = load_star(spark, sf_dir, "orders")["orders"]
    t = _cat(spark).create_table("default.orders_mut", orders)
    t.update({"o_totalprice": "o_totalprice * 1.1"},
             where="o_orderpriority = '1-URGENT'")
    t.delete("o_orderstatus = 'F'")
    return (
        t.read()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@qdef(
    "table_merge_upsert",
    """
    WITH tgt AS (
      SELECT user_id, value FROM (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_id <= 5000
      ) WHERE rn = 1
    ), src AS (
      SELECT user_id, value,
             CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'I' END AS op
      FROM (
        SELECT user_id, value, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_id > 5000
      ) WHERE rn = 1
    )
    SELECT coalesce(s.user_id, t.user_id)          AS user_id,
           round(coalesce(s.value, t.value), 3)    AS value
    FROM tgt t FULL JOIN src s ON t.user_id = s.user_id
    WHERE coalesce(s.op, 'keep') <> 'D'
    """,
    "J2", "W5", "W6",
)
def table_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/W5/W6 — the Flink changelog upsert replayed on the table layer:
    target = latest state per user up to a watermark; source = later events
    as an I/D changelog (last-wins per key by event_id, the within-batch
    ordering of SURVEY §7.3); MERGE applies equality-delete semantics
    (IcebergStream.java:116-120)."""
    ev = load_star(spark, sf_dir, "events")["events"]
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    tgt = (
        ev.where(F.col("event_id") <= 5000)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "value")
    )
    t = _cat(spark).create_table("default.user_state", tgt)
    src = (
        ev.where(F.col("event_id") > 5000)
        .select(
            "user_id", "value", "event_id",
            F.when(F.col("event_id") % 10 == 0, "D").otherwise("I").alias("op"),
        )
    )
    t.merge(
        src,
        on="user_id",
        when_matched_update={"value": "s.value"},
        when_matched_delete="s.op = 'D'",
        when_not_matched_insert="op <> 'D'",
        source_order="event_id",
    )
    return t.read().select(
        "user_id", F.round("value", 3).alias("value")
    )


@qdef(
    "table_time_travel",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "S5", "D15", "S7",
)
def table_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5+D15 — snapshot-pinned read restores pre-mutation state
    (Integrated Audits...ipynb:314; rollback Getting Started.ipynb:424):
    create (v0) → delete half (v1) → read v0 == original."""
    nation = load_star(spark, sf_dir, "nation")["nation"]
    t = _cat(spark).create_table("default.nation_tt", nation)
    v0 = t.head()
    t.delete("n_nationkey % 2 = 0")
    return t.read(version=v0).select("n_nationkey", "n_name", "n_regionkey")


@qdef(
    "table_time_travel_ts",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "S5", "D15",
)
def table_time_travel_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMP AS OF time travel — a wall-clock timestamp resolved
    against the commit log's ``timestamp_ms`` (Iceberg SQL surface;
    snapshot-id form is ``table_time_travel``): create (v0) → delete half
    (v1) → SQL read pinned at v0's commit time == original. The clock is
    spun past v0's millisecond before mutating so the two commits can't
    share a timestamp (resolution is ms-granular)."""
    import time

    nation = load_star(spark, sf_dir, "nation")["nation"]
    cat = _cat(spark)
    t = cat.create_table("default.nation_ts", nation)
    ts0 = t.committed_at_ms()
    while int(time.time() * 1000) <= ts0:
        time.sleep(0.002)
    t.delete("n_nationkey % 2 = 0")
    return cat.sql(
        "SELECT n_nationkey, n_name, n_regionkey "
        f"FROM default.nation_ts TIMESTAMP AS OF {ts0}"
    )


@qdef(
    "table_schema_evolution",
    """
    SELECT n_nationkey,
           upper(n_name)                   AS nation_name,
           CAST(n_regionkey AS DOUBLE)     AS region_key
    FROM nation
    """,
    "D6", "D7", "D8", "D10",
)
def table_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6-D8 — rename → widen → add, then an UPDATE through the evolved
    schema (Getting Started.ipynb:123-183→204). Old files are re-mapped by
    field id at read; no data rewrite for the evolution itself."""
    nation = load_star(spark, sf_dir, "nation")["nation"]
    t = _cat(spark).create_table("default.nation_evo_q", nation)
    t.rename_column("n_name", "nation_name")
    t.rename_column("n_regionkey", "region_key")
    t.alter_column("region_key", type="double")
    t.update({"nation_name": "upper(nation_name)"})
    return t.read().select("n_nationkey", "nation_name", "region_key")


@qdef(
    "table_pruned_scan",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice >= 400000
    """,
    "S12", "S13", "S14",
)
def table_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12/S14 — manifest-style pruned scan: range-cluster orders by
    o_totalprice into 8 files, then scan with a bounds predicate — the
    commit log's per-file min/max prove most files can't match, so they
    never reach the Spark plan (the PyIceberg client-scan path,
    PyIceberg...ipynb:151,168). Residual filter keeps results exact."""
    orders = load_star(spark, sf_dir, "orders")["orders"]
    t = _cat(spark).create_table(
        "default.orders_pruned",
        orders.repartitionByRange(8, "o_totalprice"),
    )
    planned = t.plan_files("o_totalprice >= 400000")
    assert len(planned) < len(t.plan_files()), "stats pruning had no effect"
    return t.scan(
        "o_totalprice >= 400000", columns=("o_orderkey", "o_totalprice")
    )


@qdef(
    "table_snapshot_summary_map",
    """
    SELECT 'create' AS operation, count(*) AS added FROM nation
    UNION ALL
    SELECT 'append' AS operation, count(*) AS added FROM region
    """,
    "P8", "S7",
)
def table_snapshot_summary_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 in its REAL reference shape — a MapType subscript on the
    snapshots metadata table (``summary['wap.id']``, Integrated
    Audits...ipynb:280): create + append, then read each commit's
    ``summary['added-records']`` back out of the metadata relation."""
    t_ = load_star(spark, sf_dir, "nation", "region")
    t = _cat(spark).create_table("default.summap", t_["nation"])
    t.append(t_["region"].select(
        F.col("r_regionkey").alias("n_nationkey"),
        F.col("r_name").alias("n_name"),
        F.col("r_regionkey").alias("n_regionkey"),
    ))
    return t.snapshots().select(
        "operation",
        F.col("summary")["added-records"].cast("bigint").alias("added"),
    )


@qdef(
    "table_wap_publish",
    """
    SELECT count(*) AS cnt FROM region
    """,
    "D13", "D14", "D16",
)
def table_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D13/D16 — WAP: stage an append on a branch, audit it, cherry-pick to
    main (WAP...ipynb:166→544). Returns the published row count: original
    region + the 0-row staged-but-audited-away branch → after publishing a
    VALID stage the count doubles... here the audit REJECTS (duplicate keys)
    so main stays at the original count — the negative WAP path."""
    region = load_star(spark, sf_dir, "region")["region"]
    t = _cat(spark).create_table("default.region_wap", region)
    t.create_branch("etl_stage")
    t.append(region, branch="etl_stage")  # would double-count: audit must fail
    staged = t.read(branch="etl_stage")
    dupes = (
        staged.groupBy("r_regionkey").count().where(F.col("count") > 1).count()
    )
    if dupes > 0:
        t.drop_branch("etl_stage")  # audit failed → drop, main untouched
    else:  # pragma: no cover - audit passes only if fixture changes
        t.fast_forward("etl_stage")
    return t.read().agg(F.count(F.lit(1)).alias("cnt"))


@qdef(
    "table_maintenance_compact",
    """
    SELECT o_orderstatus, count(*) AS cnt,
           round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY o_orderstatus
    """,
    "D17", "D18", "D19", "W2",
)
def table_maintenance_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D17/D18/D19 — four small appends → rewrite_data_files compaction →
    rewrite_manifests → expire_snapshots(retain_last=1)
    (Table Maintenance...ipynb:119,157,189). The data must survive the
    whole maintenance cycle byte-identical; the file-count drop and
    old-version unreadability are asserted in tests/test_table.py."""
    orders = load_star(spark, sf_dir, "orders")["orders"]
    t = _cat(spark).create_table(
        "default.orders_maint", orders.where(F.col("o_orderkey") % 4 == 0)
    )
    for i in (1, 2, 3):
        t.append(orders.where(F.col("o_orderkey") % 4 == i))
    t.compact()
    t.rewrite_manifests()
    t.expire_snapshots(retain_last=1)
    return (
        t.read()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )
