"""5-quiet-run attribution for the two unattributed r9 bench deltas
(VERDICT r9 #1): ``llm_dedup_clusters`` 3.44→4.36 s (+27%) and
``stream_changelog_upsert`` 1.99→2.44 s (+23%) had no BENCH_DETAIL note.

Protocol (identical to r9's r8-attributions): for each query, 5
independent runs at the bench sf (default sf0.1), each run = untimed
warmup + min-of-2 timed noop-sink executions with release_persisted()
before every timed execution — exactly bench.py's per-query method. A
canary (bench.py's fixed 20M-row hash-sum) brackets every run so
contended samples are visible instead of argued about.

Reading: if the 5-run band contains the r8 number, the r9 delta was box
contention (note it); if the band sits at the r9 number, the regression
is real (bisect the r9 review-wave commits).

Run:  python scripts/attribute_r10.py [query ...]
Env:  SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), ATTR_RUNS=5
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["llm_dedup_clusters", "stream_changelog_upsert"]


def main() -> None:
    from bench import _canary
    from lakeshed import queries as q
    from lakeshed.llm import release_persisted
    from lakeshed.session import get_spark

    names = sys.argv[1:] or QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("ATTR_RUNS", "5"))

    spark = get_spark("lakeshed-attr")
    spark.sparkContext.setLogLevel("ERROR")
    reg = q.spark_queries()

    out: dict[str, dict] = {}
    for name in names:
        fn = reg[name]
        runs, canaries = [], []
        for i in range(n_runs):
            canaries.append(_canary(spark))
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = None
            for _ in range(2):
                release_persisted()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format(
                    "noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            release_persisted()
            runs.append(round(best, 3))
            print(f"  {name} run {i + 1}/{n_runs}: {best:.3f}s "
                  f"(canary {canaries[-1]:.3f}s)", file=sys.stderr)
        canaries.append(_canary(spark))
        out[name] = {
            "runs_sec": runs,
            "min": min(runs),
            "max": max(runs),
            "canaries_sec": canaries,
        }

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
