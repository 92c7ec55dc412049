"""Post-heap-fix quiet bench baseline (r12, VERDICT r11 #3).

Every bench number before r11 was measured on a silently-1 GB driver
heap (the py4j gateway launched before ``spark.driver.memory`` could
apply; fixed via ``extraJavaOptions`` in r11 wave 15), and r11's own
headline run was contended (canary 0.211 s > 0.19 quiet band). This
script establishes the clean reference curve: the FULL bench suite run
``QB_RUNS`` times (default 5) at the bench sf with bench.py's exact
per-query method (untimed warmup + min-of-2 timed noop-sink executions,
release_persisted() before each), a canary bracketing every pass so
contended passes are marked rather than argued about.

Output: ``scripts/attribution_r12.json`` — per-query {runs, min,
median, max, band over QUIET passes only} + per-pass canaries/totals.
Future rounds regress against the quiet-pass band here instead of the
mixed 1g/8g lineage.

Run:  python scripts/quiet_baseline_r12.py
Env:  SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), QB_RUNS=5
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    from lakeshed.session import get_spark

    n_runs = int(os.environ.get("QB_RUNS", "5"))
    spark = get_spark("lakeshed-quiet-baseline")
    spark.sparkContext.setLogLevel("ERROR")
    reg = {n: f for n, f in q.spark_queries().items() if n not in SKIP}

    # one UNTIMED full warmup pass: the per-query warmup inside
    # _time_query covers that query's codegen, but the FIRST suite pass
    # additionally pays suite-wide first-touch (fixture caches, parquet
    # footers, JIT tiering — ~+6 s total observed) despite quiet
    # canaries, which would inflate quiet_max and make future band
    # checks under-detect (r12 review). Burn it before recording.
    print("warmup pass (untimed)...", file=sys.stderr)
    for f in reg.values():
        _time_query(spark, f)

    passes: list[dict] = []
    for i in range(n_runs):
        before = _canary(spark)
        timings = {n: round(_time_query(spark, f), 3)
                   for n, f in reg.items()}
        after = _canary(spark)
        quiet = (before <= CANARY_QUIET_BEFORE_MAX
                 and after <= CANARY_QUIET_AFTER_MAX)
        passes.append({
            "total_sec": round(sum(timings.values()), 3),
            "canary_before": before,
            "canary_after": after,
            "quiet": quiet,
            "queries": timings,
        })
        print(f"pass {i + 1}/{n_runs}: total {passes[-1]['total_sec']}s "
              f"canary {before}/{after} quiet={quiet}", file=sys.stderr)

    quiet_passes = [p for p in passes if p["quiet"]]
    if not quiet_passes:
        # r12 review: silently falling back to contended passes would
        # ship bands labeled 'quiet_*' that are contention-inflated — a
        # future round regressing against them under-detects. Refuse;
        # the operator re-runs when the box calms down.
        raise SystemExit(
            "no quiet pass observed (canaries: %s) — refusing to write "
            "contended numbers as the quiet baseline; re-run on a quiet "
            "box" % [
                (p["canary_before"], p["canary_after"]) for p in passes]
        )
    per_query = {}
    for name in reg:
        runs = [p["queries"][name] for p in passes]
        quiet_runs = [p["queries"][name] for p in quiet_passes]
        per_query[name] = {
            "runs_sec": runs,
            "quiet_min": min(quiet_runs),
            "quiet_median": round(statistics.median(quiet_runs), 3),
            "quiet_max": max(quiet_runs),
        }

    out = {
        "protocol": (
            "full-suite x%d at %s, bench.py per-query method (warmup + "
            "min-of-2 noop-sink, release_persisted per timed run), "
            "canary-bracketed; 8g driver heap (post r11 wave-15 fix). "
            "Bands are over QUIET passes only (canary before<=%.2f / "
            "after<=%.2f)." % (
                n_runs, bench.SF_DIR,
                CANARY_QUIET_BEFORE_MAX, CANARY_QUIET_AFTER_MAX)
        ),
        "sf_dir": bench.SF_DIR,
        "n_passes": n_runs,
        "n_quiet_passes": len([p for p in passes if p["quiet"]]),
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
    }
    dest = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "attribution_r12.json")
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
