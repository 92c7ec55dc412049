"""Streaming micro-batch overhead probe (VERDICT r9 #7).

The ``stream_*`` bench rows (~1-2.4 s each at sf0.1) are
harness-dominated: every gate builds a checkpointed Structured
Streaming query (availableNow), and the fixed cost of that machinery —
stream init, offset log, commit log, state-store setup, query
termination — is paid regardless of data volume. This probe measures
that fixed cost directly so the bench rows can be read as
``harness floor + per-batch work``:

  (1) ``floor_noop``  — 1-line text file stream → foreachBatch(no-op),
      fresh checkpoint each rep: the minimum any availableNow
      foreachBatch query costs on this box.
  (2) ``floor_agg``   — same source → watermarked groupBy count →
      memory sink: the minimum any stateful-agg query costs (adds
      state-store setup per partition).
  (3) ``floor_merge`` — the changelog-upsert harness end to end with a
      5-line input and a 5-row target: stream + parse + foreachBatch
      MERGE against a LakeTable, i.e. the fixed cost of the most
      expensive gate shape minus its data.

Each floor is min-of-3 with a FRESH checkpoint/table per rep (warm JVM,
cold query — matching how bench.py times gates after its untimed
warmup). Appends the numbers + the resulting decomposition of the r-
latest BENCH_DETAIL stream rows to SCALING.md.

Run: python scripts/streaming_overhead_probe.py
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _min3(fn) -> float:
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    from pyspark.sql import functions as F

    from lakeshed.catalog import Catalog
    from lakeshed.session import get_spark
    from lakeshed.streaming.changelog import changelog_upsert, \
        parse_changelog

    spark = get_spark("stream-overhead-probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="lakeshed-stream-probe-")

    src_dir = os.path.join(root, "src")
    spark.createDataFrame([("I,1,p1",)], "value string") \
        .coalesce(1).write.mode("overwrite").text(src_dir)

    def noop_rep():
        ck = os.path.join(root, "ck-" + uuid.uuid4().hex)
        q = (spark.readStream.format("text").load(src_dir)
             .writeStream.foreachBatch(lambda df, bid: None)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    def agg_rep():
        ck = os.path.join(root, "ck-" + uuid.uuid4().hex)
        q = (spark.readStream.format("text").load(src_dir)
             .withColumn("ts", F.current_timestamp())
             .withWatermark("ts", "1 minute")
             .groupBy("value").count()
             .writeStream.outputMode("complete")
             .format("memory").queryName("m" + uuid.uuid4().hex[:8])
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    lines5 = spark.createDataFrame(
        [(f"I,{i},p{i}",) for i in range(5)], "value string")
    src5 = os.path.join(root, "src5")
    lines5.coalesce(1).write.mode("overwrite").text(src5)

    def merge_rep():
        wh = os.path.join(root, "wh-" + uuid.uuid4().hex)
        t = Catalog(spark, wh).create_table(
            "default.s",
            spark.createDataFrame(
                [(i, f"q{i}") for i in range(5)],
                "block_number int, hash string"),
        )
        parsed = parse_changelog(
            spark.readStream.format("text").load(src5)
        ).withColumn(
            "__seq",
            F.regexp_extract("hash", r"p(\d+)", 1).try_cast("long"))
        q = changelog_upsert(
            parsed, t,
            checkpoint=os.path.join(root, "ck-" + uuid.uuid4().hex),
            trigger={"availableNow": True})
        q.awaitTermination()

    # one untimed warmup each (codegen/classloading), like bench.py
    noop_rep(), agg_rep(), merge_rep()
    floors = {
        "floor_noop_s": _min3(noop_rep),
        "floor_agg_s": _min3(agg_rep),
        "floor_merge_s": _min3(merge_rep),
    }
    print(json.dumps(floors), file=sys.stderr)
    shutil.rmtree(root, ignore_errors=True)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    details = sorted(glob.glob(os.path.join(repo, "BENCH_DETAIL_r*.json")))
    rows = []
    if details:
        with open(details[-1]) as fh:
            d = json.load(fh)
        for name, sec in sorted(d["queries"].items()):
            if name.startswith("stream_"):
                rows.append((name, sec))

    lines = [
        "",
        "## Streaming micro-batch overhead (r10, VERDICT r9 #7)",
        "",
        "Fixed harness cost of an availableNow Structured Streaming",
        "query on this box (warm JVM, cold query — bench methodology),",
        "min-of-3 with a fresh checkpoint per rep:",
        "",
        f"- foreachBatch no-op on a 1-line stream: "
        f"**{floors['floor_noop_s']} s**",
        f"- watermarked stateful agg → memory sink: "
        f"**{floors['floor_agg_s']} s**",
        f"- changelog parse → foreachBatch MERGE into a LakeTable "
        f"(5 lines): **{floors['floor_merge_s']} s**",
        "",
    ]
    if rows:
        src = os.path.basename(details[-1])
        shape = {
            "stream_changelog_upsert": "floor_merge_s",
            # cdc_diff is batch DML + snapshot diff — no streaming query,
            # no floor
            "stream_cdc_diff": None,
            # stateless append (broadcast enrich) — closest to the no-op
            # foreachBatch floor
            "stream_static_enrich": "floor_noop_s",
        }
        lines += [
            f"Decomposition of the {src} stream rows against the "
            f"matching floor (rollup/sessionization/join/dedup are "
            f"stateful-agg-shaped; static_enrich is a stateless append; "
            f"changelog_upsert is merge-shaped; cdc_diff runs NO "
            f"streaming query — it is batch DML + snapshot diff):",
            "",
            "| gate | bench s | floor s | data-dependent s |",
            "|---|---|---|---|",
        ]
        for name, sec in rows:
            key = shape.get(name, "floor_agg_s")
            if key is None:
                lines.append(f"| {name} | {sec} | — | {sec} |")
                continue
            fl = floors[key]
            lines.append(
                f"| {name} | {sec} | {fl} | {round(sec - fl, 3)} |")
        lines += [
            "",
            "Reading: the stream gates' cross-round deltas move mostly",
            "with the FLOOR (scheduler/checkpoint filesystem latency),",
            "not with per-row work — a residual within ±0.15 s of zero",
            "means the gate is pure harness at sf0.1; treat drifts of",
            "that size on stream rows as noise. stream_changelog_upsert",
            "additionally runs a real TCP server + two-path fallback",
            "harness on top of the merge floor. The floor is fixed cost",
            "per QUERY, not per row: at production volumes (minutes-long",
            "micro-batches at 100 TB ingest) it amortizes to noise —",
            "it dominates only at bench scale.",
        ]
    with open(os.path.join(repo, "SCALING.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("appended to SCALING.md", file=sys.stderr)


if __name__ == "__main__":
    main()
