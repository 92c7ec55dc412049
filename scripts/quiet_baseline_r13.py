"""Quiet reference curve for the r13/r14 plans (r13 VERDICT #3).

The committed yardstick (``scripts/attribution_r12.json``) predates
the salted substring rejoin, the ``persist_occurrences`` knob, the
r13 null guards, and r14's hot-only salting — several bands moved and
were patched piecemeal in ``bench.py`` BENCH_NOTES. This re-runs the
5-pass canary-bracketed protocol (``quiet_baseline_r12.py``,
unchanged: full suite × QB_RUNS with bench.py's exact per-query
method, bands over QUIET passes only, refuse-if-none-quiet) over the
CURRENT suite and writes ``scripts/attribution_r13.json`` so the next
round regresses against one curve again.

Two riders, measured in the same session under the same canaries:

- ``variants``: the substring family with ``persist_occurrences=False``
  (r13 VERDICT #6) — the gates opt INTO persist, but False is the
  documented 100 TB default (recompute is CPU-linear, never spills),
  and it had no committed band of its own.
- ``isolated``: ``llm_minhash_neardup`` timed standalone after the
  suite passes (r13 VERDICT #4) — quiet r13 drifted +0.26 s vs its
  r12 band with no covering note; in-suite band vs isolated band
  separates a real plan regression from suite-ordering/persist
  interaction.

Run:  python scripts/quiet_baseline_r13.py   (keep the box idle)
Env:  SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), QB_RUNS=5
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _band(samples: list[float], quiet: list[bool]) -> dict:
    qs = [s for s, ok in zip(samples, quiet) if ok]
    return {
        "runs_sec": samples,
        "quiet_min": min(qs),
        "quiet_median": round(statistics.median(qs), 3),
        "quiet_max": max(qs),
    }


def main() -> None:
    import bench
    from bench import (
        CANARY_QUIET_AFTER_MAX,
        CANARY_QUIET_BEFORE_MAX,
        SKIP,
        _canary,
        _time_query,
    )
    from lakeshed import queries as q
    from lakeshed.io import load_star
    from lakeshed.llm import dedup
    from lakeshed.session import get_spark
    from pyspark.sql import functions as F

    n_runs = int(os.environ.get("QB_RUNS", "5"))
    spark = get_spark("lakeshed-quiet-baseline-r13")
    spark.sparkContext.setLogLevel("ERROR")
    reg = {n: f for n, f in q.spark_queries().items() if n not in SKIP}

    def substring_dedup_nopersist(spark, sf_dir):
        docs = load_star(spark, sf_dir, "documents")["documents"]
        spans = dedup.duplicate_spans(docs, window=16,
                                      persist_occurrences=False)
        per_doc = spans.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("__dup"),
            F.sum((~F.col("is_canonical")).cast("long")).alias("__rm"),
        )
        return per_doc

    def substring_removed_nopersist(spark, sf_dir):
        docs = load_star(spark, sf_dir, "documents")["documents"]
        cleaned = dedup.remove_duplicate_spans(
            docs, window=16, persist_occurrences=False)
        return cleaned.select(
            "doc_id", F.md5(F.col("text")).alias("cleaned_md5"))

    variants = {
        "llm_substring_dedup[persist=False]": substring_dedup_nopersist,
        "llm_substring_removed[persist=False]":
            substring_removed_nopersist,
    }

    print("warmup pass (untimed)...", file=sys.stderr)
    for f in reg.values():
        _time_query(spark, f)
    for f in variants.values():
        _time_query(spark, f)

    passes: list[dict] = []
    for i in range(n_runs):
        before = _canary(spark)
        timings = {n: round(_time_query(spark, f), 3)
                   for n, f in reg.items()}
        var_timings = {n: round(_time_query(spark, f), 3)
                       for n, f in variants.items()}
        after = _canary(spark)
        quiet = (before <= CANARY_QUIET_BEFORE_MAX
                 and after <= CANARY_QUIET_AFTER_MAX)
        passes.append({
            "total_sec": round(sum(timings.values()), 3),
            "canary_before": before,
            "canary_after": after,
            "quiet": quiet,
            "queries": timings,
            "variants": var_timings,
        })
        print(f"pass {i + 1}/{n_runs}: total {passes[-1]['total_sec']}s "
              f"canary {before}/{after} quiet={quiet}", file=sys.stderr)

    if not any(p["quiet"] for p in passes):
        raise SystemExit(
            "no quiet pass observed (canaries: %s) — refusing to write "
            "contended numbers as the quiet baseline; re-run on a quiet "
            "box" % [
                (p["canary_before"], p["canary_after"]) for p in passes]
        )
    quiet_passes = [p for p in passes if p["quiet"]]
    quiet_flags = [p["quiet"] for p in passes]

    # VERDICT #4 rider: llm_minhash_neardup isolated (suite-free) —
    # same method, bracketed by its own canaries
    iso_runs, iso_quiet = [], []
    for _ in range(n_runs):
        b = _canary(spark)
        t = round(_time_query(spark, reg["llm_minhash_neardup"]), 3)
        a = _canary(spark)
        iso_runs.append(t)
        iso_quiet.append(b <= CANARY_QUIET_BEFORE_MAX
                         and a <= CANARY_QUIET_AFTER_MAX)
        print(f"isolated minhash: {t}s canary {b}/{a}", file=sys.stderr)

    per_query = {
        name: _band([p["queries"][name] for p in passes], quiet_flags)
        for name in reg
    }
    per_variant = {
        name: _band([p["variants"][name] for p in passes], quiet_flags)
        for name in variants
    }

    out = {
        "protocol": (
            "full-suite x%d at %s, bench.py per-query method (warmup + "
            "min-of-2 noop-sink, release_persisted per timed run), "
            "canary-bracketed; 8g driver heap. Bands are over QUIET "
            "passes only (canary before<=%.2f / after<=%.2f). "
            "'variants' = persist_occurrences=False substring family "
            "(VERDICT r13 #6); 'isolated' = llm_minhash_neardup timed "
            "suite-free (VERDICT r13 #4)." % (
                n_runs, bench.SF_DIR,
                CANARY_QUIET_BEFORE_MAX, CANARY_QUIET_AFTER_MAX)
        ),
        "sf_dir": bench.SF_DIR,
        "n_passes": n_runs,
        "n_quiet_passes": len(quiet_passes),
        "pass_summaries": [
            {k: p[k] for k in
             ("total_sec", "canary_before", "canary_after", "quiet")}
            for p in passes
        ],
        "quiet_total_band_sec": [
            min(p["total_sec"] for p in quiet_passes),
            max(p["total_sec"] for p in quiet_passes),
        ],
        "queries": per_query,
        "variants": per_variant,
        "isolated": {"llm_minhash_neardup":
                     _band(iso_runs, iso_quiet) if any(iso_quiet)
                     else {"runs_sec": iso_runs,
                           "note": "no quiet isolated run"}},
    }
    dest = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "attribution_r13.json")
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
