"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Neither appears in the reference surface (SURVEY §2.4: its analytics are
single-table), but both are staples of the event/time-series workloads the
clickstream fixture models, and the brief's extension mandate names them
as the canonical "operator Spark lacks" cases. Each follows the decision
ladder: composition of DataFrame ops where semantics allow (range join →
bin-explode equi-join; backward as-of → :func:`asof_join_union`'s
union+window form, one shuffle, pure JVM), `applyInPandas` where they
don't (forward/nearest/tolerance as-of → per-key ordered merge).

Scale design:

- :func:`asof_join` — cogrouped ``applyInPandas``: ONE shuffle of each
  side on the key, then per-key `pd.merge_asof` (two sorted pointers,
  O(n+m) per key) inside Arrow batches. No global sort, no broadcast of
  either side; skew bounded by the largest single key's history.
- :func:`range_join` — the bin trick: intervals explode to the time bins
  they cover, points compute their bin, the join is a plain hash
  equi-join on (bin [, key]) with the BETWEEN as residual filter — never
  a cross join / BroadcastNestedLoop (which is what naive inequality
  joins compile to). Bin width trades explode factor against bucket
  selectivity: pick ≈ median interval length, so each interval lands in
  ~2 bins. Each (point, interval) pair meets exactly once because a
  point owns exactly one bin — no post-join dedup.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, IntegerType, ShortType, StructField, StructType

_INTEGRAL = (LongType, IntegerType, ShortType)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: for every left row, attach the right row of the
    same ``by`` key whose ``on`` value is the closest at-or-before
    (``backward``, inclusive — matches DuckDB ``ASOF JOIN ... ON l.ts >=
    r.ts``), at-or-after (``forward``), or nearest.

    Right value columns must not collide with left column names. Rows
    with no match carry nulls (left-join semantics). Right side should be
    unique per (by, on) — dedupe upstream, or the last row in sort order
    wins (pandas ``merge_asof`` semantics). ``by`` keys must be non-null.

    Cardinality note (measured): pyspark's cogroup costs ~5 ms of fixed
    overhead PER GROUP (Arrow stream + frame construction per group), so
    cogrouping directly on a high-cardinality key melts down — 5k keys
    ≈ 30 s regardless of row count. The cogroup key here is therefore a
    BOUNDED hash bucket of ``by`` (2× parallelism), and ``merge_asof``'s
    vectorized ``by=`` handles the per-key semantics inside each bucket:
    group count stays constant no matter how many keys the data has.
    """
    # re-alias right so its attributes get fresh ids: when both inputs
    # derive from the same source (self-cogroup), shared attribute ids
    # make Catalyst prune right columns it deems duplicates of left's
    right = right.select(*[F.col(c).alias(c) for c in right.columns])
    rvals = [f for f in right.schema.fields if f.name not in (on, by)]
    clash = {f.name for f in rvals} & set(left.columns)
    if clash:
        raise ValueError(f"right value columns collide with left: {clash}")
    out_schema = StructType(
        list(left.schema.fields)
        + [StructField(f.name, f.dataType, True) for f in rvals]
    )
    lcols = list(left.columns)
    rnames = [f.name for f in rvals]
    int_cols = [f.name for f in rvals if isinstance(f.dataType, _INTEGRAL)]

    def fn(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.drop(columns="__b")
        rpdf = rpdf.drop(columns="__b")
        if lpdf.empty:  # right-only bucket: contributes nothing (left join)
            out = lpdf.copy()
            for c in rnames:
                out[c] = pd.Series(dtype="object")
            return out[lcols + rnames]
        # NULL on/by rows (r11 review wave 15): merge_asof raises on NaT
        # keys. A null right row can never match (l.ts >= NULL is NULL)
        # — drop it; a null left row matches nothing but is KEPT with
        # null right values (left-join semantics, same as a too-early ts)
        lnull = lpdf[lpdf[on].isna() | lpdf[by].isna()]
        lpdf = lpdf[lpdf[on].notna() & lpdf[by].notna()]
        rpdf = rpdf[rpdf[on].notna() & rpdf[by].notna()]
        lsort = lpdf.sort_values(on, kind="mergesort")
        if rpdf.empty:
            out = lsort.copy()
            for c in rnames:
                out[c] = None
        else:
            rsort = rpdf.sort_values(on, kind="mergesort")[[by, on] + rnames]
            out = pd.merge_asof(
                lsort, rsort, on=on, by=by, direction=direction
            )
        if len(lnull):
            lnull = lnull.copy()
            for c in rnames:
                lnull[c] = None
            out = pd.concat([out, lnull], ignore_index=True)
        for c in int_cols:  # nullable ints survive the Arrow crossing
            out[c] = out[c].astype("Int64")
        return out[lcols + rnames]

    nb = left.sparkSession.sparkContext.defaultParallelism * 2
    bucket = F.pmod(F.xxhash64(F.col(by)), F.lit(nb)).alias("__b")
    return (
        left.withColumn("__b", bucket)
        .groupBy("__b")
        .cogroup(right.withColumn("__b", bucket).groupBy("__b"))
        .applyInPandas(fn, out_schema)
    )


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
) -> DataFrame:
    """Backward-inclusive as-of join in PURE Catalyst: union both sides,
    one window pass per key carrying the right values forward
    (``last_value(..., ignorenulls)``), keep the left rows.

    ONE shuffle total (the window partition) and fully JVM-side — per the
    build ladder this is the preferred form when the semantics fit;
    :func:`asof_join` (cogrouped merge_asof) remains for forward/nearest
    and tolerance variants pandas expresses directly. Equal timestamps:
    the right row sorts before the left row, so an exact-ts match is
    visible (inclusive, same as DuckDB ASOF and merge_asof).

    The right value columns are carried as ONE struct so the match is
    row-atomic: a matched right row whose value column is legitimately
    NULL stays NULL (the struct itself is non-null), and multiple value
    columns always come from the same right row — identical to
    merge_asof, even with NULLs in right values."""
    rvals = [f.name for f in right.schema.fields if f.name not in (on, by)]
    clash = set(rvals) & set(left.columns)
    if clash:
        raise ValueError(f"right value columns collide with left: {clash}")
    rv_type = StructType(
        [f for f in right.schema.fields if f.name in rvals]
    )
    lcols = list(left.columns)
    l2 = left.withColumn("__is_left", F.lit(1)).withColumn(
        "__rv", F.lit(None).cast(rv_type)
    )
    # NULL-key/-ts right rows can never be an ASOF match (l.ts >= NULL
    # and l.by = NULL are both NULL) — but Spark sorts NULL ts FIRST and
    # windows group NULL keys together, so unfiltered they'd be carried
    # into every later left row (r11 review wave 15)
    r2 = right.where(
        F.col(on).isNotNull() & F.col(by).isNotNull()
    ).withColumn("__is_left", F.lit(0)).withColumn(
        "__rv", F.struct(*[F.col(c) for c in rvals])
    )
    for c in lcols:
        if c not in (on, by) and c not in r2.columns:
            r2 = r2.withColumn(c, F.lit(None))
    u = l2.select(*lcols, "__rv", "__is_left").unionByName(
        r2.select(*lcols, "__rv", "__is_left")
    )
    # right rows (0) sort before left rows (1) at equal ts → inclusive
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__rv", ignorenulls=True).over(w)
    out = u.select(
        *lcols, "__is_left",
        *[carried.getField(c).alias(c) for c in rvals],
    )
    return out.where(F.col("__is_left") == 1).select(*lcols, *rvals)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 3600,
    key: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join as a hash equi-join on time bins.

    ``points`` rows join every ``intervals`` row whose
    ``[start_col, end_col]`` (inclusive) contains ``point_ts`` (and whose
    ``key`` matches, when given). Column names must be disjoint across the
    two inputs apart from ``key``."""
    shared = (set(points.columns) & set(intervals.columns)) - {key}
    if shared:
        raise ValueError(f"ambiguous columns across inputs: {shared}")
    if how.replace("_", "").lower() in (
            "right", "rightouter", "full", "outer", "fullouter"):
        # an unmatched interval was exploded into one row PER BIN — an
        # interval-preserving outer join would emit every copy (r11
        # review wave 15); express those as a left join from intervals
        raise ValueError(
            f"range_join cannot express {how!r}: unmatched intervals "
            "appear once per exploded time bin")
    bin_us = bin_seconds * 1_000_000
    # INTEGER floor-div (r11 review wave 15): float division + floor
    # mis-bins timestamps whose quotient rounds up across a bin edge
    # beyond 2^53 µs — same hazard io.py's nanos conversion avoids
    p = points.withColumn(
        "__bin", F.expr(f"unix_micros({point_ts}) div {bin_us}")
    ).alias("p")
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros({start_col}) div {bin_us}"),
                F.expr(f"unix_micros({end_col}) div {bin_us}"),
            )
        ),
    ).alias("i")
    cond = (
        (F.col("p.__bin") == F.col("i.__bin"))
        & (F.col(f"p.{point_ts}") >= F.col(f"i.{start_col}"))
        & (F.col(f"p.{point_ts}") <= F.col(f"i.{end_col}"))
    )
    if key is not None:
        cond = cond & (F.col(f"p.{key}") == F.col(f"i.{key}"))
    out_cols = [F.col(f"p.{c}") for c in points.columns] + [
        F.col(f"i.{c}") for c in intervals.columns if c != key
    ]
    return p.join(i, cond, how).select(*out_cols)


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    grains: tuple[str, ...] = ("hour", "day"),
    aggs: list | None = None,
) -> DataFrame:
    """Hypertable-style continuous aggregate: the same keyed aggregation at
    several time granularities in ONE pass — GROUPING SETS expands the
    grain combinations map-side, so the corpus is scanned and shuffled
    once instead of once per grain. Each output row carries one non-null
    ``bucket_<grain>`` column (the others are null, standard grouping-sets
    encoding). At scale this materialization IS the rollup table you'd
    refresh incrementally per partition."""
    aggs = aggs or [F.count(F.lit(1)).alias("cnt")]
    # carry the VALUE columns through the projection — projecting only
    # buckets+keys made every caller-supplied agg over a data column
    # fail to resolve (r11 review wave 15); Catalyst prunes the unused
    # ones right back out, so the default count path costs nothing extra
    passthrough = [c for c in df.columns
                   if c != ts_col and c not in key_cols]
    proj = df.select(
        *[
            F.date_trunc(g, F.col(ts_col)).alias(f"bucket_{g}")
            for g in grains
        ],
        *key_cols,
        *passthrough,
    )
    sets = [
        [F.col(f"bucket_{g}"), *[F.col(k) for k in key_cols]]
        for g in grains
    ]
    gcols = [F.col(f"bucket_{g}") for g in grains] + [
        F.col(k) for k in key_cols
    ]
    return proj.groupingSets(sets, *gcols).agg(*aggs)
