"""Planted hot-span scaling probe for substring dedup (r13, VERDICT r12 #1+#8).

r12's `duplicate_spans` marked duplicates with window functions over
``partitionBy("h")`` — every occurrence of one span hash lands on ONE
task, with no partial aggregation and no AQE mitigation (AQE splits
skewed JOINS, not window partitions). The r12 scaling ladder could not
see this: its per-copy token bijection makes every cross-copy window
DISTINCT, so no hot key ever forms. Real corpora are the opposite — a
licence/boilerplate line recurring in a few percent of documents is the
exact redundancy substring dedup exists for (Lee et al. 2022).

This probe builds the adversarial fixture the ladder lacked: salted
copies of the sf0.1 documents table (the r12 bijection, so organic
windows stay linear) with ONE CONSTANT 16-token line appended to every
document — a single span hash whose multiplicity equals n_docs. Ladder
1→64 copies (64x reaches past the fixed-overhead regime, VERDICT r12
#8; multiplicity 320k at the top rung). Per rung it times, bench-method
(untimed warmup of both plan shapes once, min-of-2 per timed point,
canary-bracketed):

  - ``group_t``: the ENGINE plan (groupBy(h) partial agg + rejoin) —
    map-side combine collapses the hot hash to one row per task before
    the shuffle;
  - ``window_t``: an inline replica of the r12 window plan on the same
    fixture (A/B witness — the replica is frozen here so the regression
    stays measurable after the engine moved on);
  - ``hot_mult``: max(occurrences) — proves the hot key exists and
    scales with n_docs;
  - ``occ_rows``: duplicated-occurrence row count (linearity witness).

The appended-line fixture keeps organic text dominant (the hot key is
~1.3x the median h-partition at every rung — real but mild skew), so a
second, boilerplate-DOMINANT fixture drives the mitigation story:
SKEW_DOCS documents that are nothing but one unique token + the hot
line (the wall-to-wall-boilerplate corpus substring dedup's own paper
motivates). There the hot key is ~half of ALL occurrence rows, and the
probe records (a) CONCENTRATION SENSITIVITY — each plan timed on the
1-hot-key fixture vs a control with identical row count but 32 spread
hot keys; the window plan's delta is the irreducible single-task cost
of the hot partition, the groupBy plan must be ~insensitive (salt +
partial agg) — and (b) HOW the rejoin materializes under
AQE: session defaults may broadcast the duplicates-only agg side (ONE
row here); with broadcast disabled and skew thresholds at fixture
scale, the sort-merge rejoin must show AQE's ``skew=true`` split
markers. That marker is only reachable BECAUSE of the engine's salt
(r13): without it the agg side's final aggregate sits between its
exchange and the join, a shape OptimizeSkewedJoin never matches (this
probe measured exactly that before the salt landed — no split at any
threshold), and the salt ALSO pre-splits the hot key skew_fanout ways
deterministically, so the claim does not rest on AQE at all. Window
partitions can get neither mitigation; that asymmetry IS the fix.

Appends a section to SCALING.md.
Run:  python scripts/hot_span_probe.py
Env:  HOT_COPIES=1,2,4,8,16,32,64  HOT_SF_DIR=/root/testdata/sf0.1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from lakeshed.io import load_star
from lakeshed.llm import dedup, release_persisted
from lakeshed.session import get_spark

SF_DIR = os.environ.get("HOT_SF_DIR", "/root/testdata/sf0.1")
COPIES = [int(x) for x in
          os.environ.get("HOT_COPIES", "1,2,4,8,16,32,64").split(",")]
SKEW_DOCS = int(os.environ.get("SKEW_DOCS", "2000000"))
# 16 tokens no organic document can contain (the fixture vocabulary is
# plain words; '⟂' never appears)
HOT_LINE = " ".join(f"⟂hot{i}" for i in range(16))


def _docs_at(spark, c: int):
    """c bijection-salted copies of documents (scaling_probe.py's
    construction) with the constant HOT_LINE appended to every doc —
    one window hash of multiplicity n_docs, everything else linear."""
    docs = load_star(spark, SF_DIR, "documents")["documents"] \
        .select("doc_id", "text")
    parts = []
    for i in range(c):
        salted = F.array_join(
            F.transform(F.split(F.col("text"), " "),
                        lambda t: F.concat(t, F.lit(f"§c{i}"))),
            " ",
        ) if i else F.col("text")
        parts.append(docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.concat(salted, F.lit(" " + HOT_LINE)).alias("text"),
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.repartition(32).persist()


def _window_spans(df):
    """Frozen replica of the r12 window-based marking plan (the A/B
    baseline): count + min-struct over partitionBy(h) — all rows of a
    span hash on one task, no partial aggregation."""
    from pyspark.sql import Window as W

    from lakeshed.llm.text import ngrams

    toks = F.split(F.col("text"), " ")
    base = df.select(F.col("doc_id"), toks.alias("__t")) \
        .where(F.size("__t") >= 16)
    hashes = F.transform(ngrams(F.col("__t"), 16), lambda g: F.xxhash64(g))
    occ = base.select("doc_id", F.posexplode(hashes).alias("pos", "h"))
    w = W.partitionBy("h")
    return (
        occ.withColumn("occurrences", F.count(F.lit(1)).over(w))
        .withColumn("__first",
                    F.min(F.struct(F.col("doc_id"), F.col("pos"))).over(w))
        .where(F.col("occurrences") > 1)
        .select("doc_id", "pos", "occurrences")
    )


def _slope(a, b, key):
    """log-log slope of metric ``key`` between ladder rungs a → b.

    r13 ADVICE: a single-rung ladder (``HOT_COPIES=64`` for a
    one-point re-measure, which the env var invites) has no doubling
    to take a slope over, and equal ``n_docs`` across rungs would
    divide by zero — emit n/a instead of crashing AFTER the (long)
    measurement already ran."""
    if a is b or a["n_docs"] == b["n_docs"]:
        return "n/a (single rung)"
    return round(np.log(b[key] / a[key]) /
                 np.log(b["n_docs"] / a["n_docs"]), 2)


def _join_shape(df) -> str:
    """Materialize df and report the AQE-final join strategy of the
    rejoin ('broadcast', 'smj skew=true', or 'smj'). Must collect()
    through the DataFrame's OWN QueryExecution — a noop write spawns a
    separate one and leaves this plan at isFinalPlan=false."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, "AQE final plan not materialized"
    if "BroadcastHashJoin" in plan:
        return "broadcast"
    return "smj skew=true" if "skew=true" in plan else "smj"


def main() -> None:
    spark = get_spark("hot-span-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from bench import _canary, _min2

    warm = load_star(spark, SF_DIR, "documents")["documents"] \
        .select("doc_id", "text").limit(500)
    dedup.duplicate_spans(warm, window=16).count()
    _window_spans(warm).count()
    release_persisted()

    rows = []
    for c in COPIES:
        docs = _docs_at(spark, c)
        n_docs = docs.count()
        can = _canary(spark)
        spans = dedup.duplicate_spans(docs, window=16)
        group_t = _min2(spans.count)
        occ_rows = spans.count()
        hot_mult = spans.agg(F.max("occurrences")).first()[0]
        window_t = _min2(_window_spans(docs).count)
        rows.append(dict(c=c, n_docs=n_docs, occ_rows=occ_rows,
                         hot_mult=hot_mult, group_t=group_t,
                         window_t=window_t, canary=round(can, 3)))
        print(json.dumps(rows[-1]), file=sys.stderr)
        docs.unpersist()
        release_persisted()

    # ---- boilerplate-dominant fixture: the hot key is ~half of ALL
    # occurrence rows (each doc = one unique token + the hot line →
    # exactly 2 windows per doc, one unique, one THE hot value)
    skew_docs = spark.range(SKEW_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(F.concat(F.lit("u"), F.col("id").cast("string")),
                 F.lit(" " + HOT_LINE)).alias("text"),
    ).repartition(32).persist()
    skew_docs.count()
    # concentration control: SAME row count and duplicate structure,
    # but 32 distinct hot lines assigned round-robin — multiplicity
    # n/32 per key, so no single partition is hot. The delta between
    # the two fixtures isolates pure KEY-CONCENTRATION cost: the
    # window plan's hot partition is an irreducible single task (wall
    # tracks multiplicity of the hottest key), the groupBy plan's
    # per-task work is bounded by the salt regardless of concentration.
    spread_docs = spark.range(SKEW_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.concat(F.lit("u"), F.col("id").cast("string")),
            F.concat(F.lit(" "), F.array_join(F.transform(
                F.split(F.lit(HOT_LINE), " "),
                lambda t: F.concat(t, (F.col("id") % 32).cast("string"))),
                " ")),
        ).alias("text"),
    ).repartition(32).persist()
    spread_docs.count()
    skew_can = _canary(spark)
    skew_group_t = _min2(dedup.duplicate_spans(skew_docs, window=16).count)
    skew_window_t = _min2(_window_spans(skew_docs).count)
    spread_group_t = _min2(
        dedup.duplicate_spans(spread_docs, window=16).count)
    spread_window_t = _min2(_window_spans(spread_docs).count)
    spread_docs.unpersist()

    # (a) session defaults: what does AQE make of the rejoin?
    default_shape = _join_shape(dedup.duplicate_spans(skew_docs, window=16))
    # (b) force the sort-merge path at fixture scale and check the
    # skewed hot partition actually splits
    saved = {k: spark.conf.get(k, None) for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    )}
    # thresholds sized to the salted fixture: the salt already splits
    # the hot key skew_fanout ways, so each hot sub-partition is
    # ~SKEW_DOCS/32 rows — the threshold must sit below THAT for the
    # second-line AQE split to be observable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # factor 1.0: the salted hot sub-partitions are ~2x the median in
    # ROWS but the constant h/pos values compress better than the
    # unique-window rows, leaving the byte ratio borderline at the
    # default factor — at fixture scale the decisive row-count skew is
    # what the demo is about
    spark.conf.set("spark.sql.adaptive.skewJoin."
                   "skewedPartitionThresholdInBytes", "64k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                   "1.0")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")
    try:
        forced_shape = _join_shape(dedup.duplicate_spans(skew_docs, window=16))
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    skew_docs.unpersist()
    release_persisted()

    def marginal(key):
        return _slope(rows[-2] if len(rows) > 1 else rows[-1],
                      rows[-1], key)

    def full(key):
        return _slope(rows[0], rows[-1], key)

    lines = [
        "",
        "## Planted hot-span probe (r13, VERDICT r12 #1 + #8 — "
        "`scripts/hot_span_probe.py`)",
        "",
        "The r12 ladder's bijection fixture can't form a hot key; this "
        "one appends ONE constant 16-token line to every document "
        f"(ladder to {COPIES[-1]}x ≈ {rows[-1]['n_docs']} docs → hot-"
        f"span multiplicity {rows[-1]['hot_mult']}). A/B: the engine's "
        "groupBy(h)-partial-agg+rejoin plan vs a frozen replica of the "
        "r12 partitionBy(h) window plan, bench method (warm shapes, "
        "min-of-2), canary-bracketed.",
        "",
        "| copies | docs | dup-occ rows | hot multiplicity | "
        "groupBy t (s) | window t (s) | canary (s) |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['c']} | {r['n_docs']} | {r['occ_rows']} | "
            f"{r['hot_mult']} | {r['group_t']} | {r['window_t']} | "
            f"{r['canary']} |")
    lines += [
        "",
        f"- groupBy-plan wall slope vs n_docs: first→last "
        f"**{full('group_t')}**, marginal over the last doubling "
        f"(past the overhead regime, {COPIES[-2]}x→{COPIES[-1]}x): "
        f"**{marginal('group_t')}** — the ≤1.1 linearity target with a "
        "hot key planted.",
        f"- window-plan wall slope: first→last **{full('window_t')}**, "
        f"marginal **{marginal('window_t')}** (single-box local[32] "
        "absorbs a lot of window skew — the hot partition is one sort "
        "among 32 threads; on a 1000-executor cluster the same plan "
        "serializes the hottest span's billions of rows on one task, "
        "which no config can split).",
        f"- occurrence rows stay linear with the hot line planted "
        f"(slope **{full('occ_rows')}**); hot multiplicity tracks "
        f"n_docs exactly ({rows[0]['hot_mult']}→{rows[-1]['hot_mult']}).",
        "",
        f"Boilerplate-DOMINANT fixture ({SKEW_DOCS} docs of nothing but "
        "a unique token + the hot line — the hot key is ~half of all "
        "occurrence rows), plus a CONCENTRATION CONTROL with identical "
        "row count but 32 distinct hot lines (multiplicity n/32 each; "
        f"canary {round(skew_can, 3)} s):",
        "",
        f"- window plan: **{skew_window_t} s** at 1 hot key vs "
        f"**{spread_window_t} s** at 32 spread keys — the delta is "
        "pure key-concentration cost, the single hot-partition task "
        "no thread count or config can split; it scales with the "
        "hottest key's multiplicity (billions of rows at 100 TB for "
        "a licence header), so on a large cluster it IS the wall "
        "time.",
        f"- groupBy plan: **{skew_group_t} s** at 1 hot key vs "
        f"**{spread_group_t} s** at 32 — concentration-insensitive by "
        "design (salt pre-splits the hot key; partial agg collapses "
        "it map-side). Its higher absolute local cost (the occurrence "
        "frame is computed for both the agg and probe branches, plus "
        "two extra exchanges) is a parallelizable constant factor; "
        "the window plan's concentration term is serial and "
        "unbounded.",
        f"- Rejoin materialization: session defaults → "
        f"**{default_shape}**; broadcast disabled + skew thresholds at "
        f"fixture scale → **{forced_shape}**. The engine's "
        "salt-replicated rejoin (r13; per-hash widths since r14 — "
        "least(ceil(occurrences/salt_row_target), skew_fanout), "
        "scripts/salt_volume_probe.py) pre-splits the hot key "
        "deterministically AND restores the "
        "Sort-over-shuffle-stage shape OptimizeSkewedJoin requires "
        "(without the salt, the agg side's final aggregate blocks the "
        "rule — measured here pre-salt: no split at any threshold). "
        "A window partition can get neither mitigation — that "
        "asymmetry is why r13 moved the marking off window functions.",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALING.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print(json.dumps({"rows": rows, "default_shape": default_shape,
                      "forced_shape": forced_shape,
                      "group_marginal": marginal("group_t"),
                      "window_marginal": marginal("window_t")}))


if __name__ == "__main__":
    main()
