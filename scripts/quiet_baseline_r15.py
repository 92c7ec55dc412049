"""Quiet reference curve for the early-r15 plans (VERDICT r14 #2).

The r14 round could not commit a trustworthy curve for its own plans —
its session's box ran ~1.45x slow with host-steal waves
(OPTIMIZATION_r14.md "Not yet" #4) — so the r14 driver samples
(llm_dedup_clusters 4.92 s, llm_semantic_dedup 4.61 s,
stream_stream_join 3.06 s) had no band to land in. This re-runs the
5-pass canary-bracketed protocol (quiet_baseline_r12/r13.py, unchanged:
full suite x QB_RUNS with bench.py's exact per-query method, bands over
QUIET passes only, refuse-if-none-quiet) and writes
``scripts/attribution_r15.json``.

Code state at measurement: the r14 plans PLUS the first r15 changes
that precede it chronologically — CC checkpoints scoped to snappy
(dedup.py _Ckpt.put; worth ~-0.2 s on llm_dedup_clusters per the
interleaved codec A/B) and the stats-first spread() (plan-neutral on
the fixtures). Everything else is byte-identical to the r14 plans, so
r14 driver samples compare directly except llm_dedup_clusters, which
compares with the ~0.2 s codec allowance.

Keeps the r13 riders: the persist_occurrences=False substring variants
(the documented 100 TB default) and the isolated llm_minhash_neardup
band.

Run:  python scripts/quiet_baseline_r15.py   (keep the box idle)
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
    spark = get_spark("lakeshed-quiet-baseline-r15")
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

    # isolated llm_minhash_neardup (suite-free) — same method, bracketed
    # by its own canaries (r13 VERDICT #4 rider, kept for continuity)
    iso_runs, iso_quiet = [], []
    for _ in range(n_runs):
        b = _canary(spark)
        t = round(_time_query(spark, reg["llm_minhash_neardup"]), 3)
        a = _canary(spark)
        iso_runs.append(t)
        iso_quiet.append(b <= CANARY_QUIET_BEFORE_MAX
                         and a <= CANARY_QUIET_AFTER_MAX)
        print(f"isolated minhash: {t}s canary {b}/{a}", file=sys.stderr)

    out = {
        "protocol": (
            "5 full-suite passes, bench.py per-query method (untimed "
            "warmup + min-of-2 noop-sink, release_persisted per timed "
            "run), canary-bracketed; bands over quiet passes only "
            f"(before <= {CANARY_QUIET_BEFORE_MAX}, after <= "
            f"{CANARY_QUIET_AFTER_MAX})"
        ),
        "code_state": (
            "early r15: r14 plans + CC checkpoints scoped to snappy "
            "(_Ckpt.put) + stats-first spread(); pre-dates the rest of "
            "the r15 optimization changes"
        ),
        "sf_dir": os.environ.get("SPARK_GRAFT_SF_DIR",
                                 "/root/testdata/sf0.1"),
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
        "queries": {
            n: _band([p["queries"][n] for p in passes], quiet_flags)
            for n in reg
        },
        "variants": {
            n: _band([p["variants"][n] for p in passes], quiet_flags)
            for n in variants
        },
        "isolated": {
            "llm_minhash_neardup": {
                "runs_sec": iso_runs,
                "quiet": iso_quiet,
                **({"quiet_min": min(t for t, okq in
                                     zip(iso_runs, iso_quiet) if okq),
                    "quiet_max": max(t for t, okq in
                                     zip(iso_runs, iso_quiet) if okq)}
                   if any(iso_quiet) else {}),
            }
        },
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "attribution_r15.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
