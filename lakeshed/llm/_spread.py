"""Conditional parallelism spread for kernel inputs (r14 optimization).

Several LLM kernels repartitioned their input to
``defaultParallelism`` unconditionally. The repartition exists for ONE
case: a corpus that arrives in fewer splits than the session has task
slots (the single-parquet-file test corpora — without the spread, the
signature/bucketing math serializes onto one core). At 100 TB the scan
already arrives in thousands of splits, and the unconditional
repartition is a full shuffle of the corpus payload (text or embedding
vectors) that buys nothing — and the keyless form additionally pays
Spark's sort-before-repartition local sort (SPARK-23207) over every
row. ``spread`` keeps the local-mode behavior and skips the shuffle
exactly when the input is already at least session-parallel.

The partition count is read off the compiled RDD lineage — driver-only
plan work at the scan/filter nodes these call sites pass (no exchanges
below, so nothing materializes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition ``df`` to the session's task parallelism ONLY when it
    has fewer partitions than that; hash-partition by ``cols`` when
    given, round-robin otherwise. Row-wise kernels downstream are
    partitioning-independent, so skipping the shuffle never changes
    results."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        have = df.rdd.getNumPartitions()
    except Exception:
        have = 0  # unknown lineage: keep the historical spread behavior
    if have >= target:
        return df
    if cols:
        from pyspark.sql import functions as F

        return df.repartition(target, *[F.col(c) for c in cols])
    return df.repartition(target)
