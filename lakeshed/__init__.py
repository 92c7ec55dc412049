"""lakeshed — a PySpark-native lakehouse analytics engine.

From-scratch rebuild of the query/data-processing surface of
``dragonkid/lakehouse-examples`` (see SURVEY.md), designed Spark-first:
DataFrame/SQL + Catalyst + Structured Streaming over a versioned-Parquet
ACID table format with a tiny commit log (Iceberg/Delta-style snapshots,
branches, time travel, metadata tables, maintenance).

Public surface:

- :func:`lakeshed.session.get_spark` — tuned SparkSession builder.
- :class:`lakeshed.catalog.Catalog` — namespace/table facade (SURVEY §2.8).
- :class:`lakeshed.table.LakeTable` — ACID table: append/overwrite/delete/
  update/merge, time travel, branches (SURVEY §1.1, §2.2, §2.8).
- :mod:`lakeshed.ops` — relational helpers (SURVEY §2.3-2.6).
- :mod:`lakeshed.streaming` — changelog ingestion (SURVEY §2.9, §3.3).
- :mod:`lakeshed.llm` — dedup / similarity / text-analysis extensions.
"""

from lakeshed.session import get_spark

__version__ = "0.2.0"

__all__ = ["get_spark", "__version__"]
