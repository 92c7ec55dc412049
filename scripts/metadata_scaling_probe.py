"""Commit-log metadata scaling probe (VERDICT r9 #4).

The one scale dimension still design-argued rather than measured:
continuous streaming at a 5 s trigger lands ~17k commits/day, so the
metadata layer itself must not be O(n_commits) on the hot paths. This
probe builds a 5,000-commit table with streaming-shaped tiny appends
and times, on a doubling curve (N = 312..5000):

  (a) cold read planning (``_state(head)`` — the commit-chain replay
      every read pays) WITH the auto-checkpoint every 20 commits, and
      the counterfactual WITHOUT (checkpoint files moved aside) — the
      before/after ``rewrite_manifests`` contrast;
  (b) ``TIMESTAMP AS OF`` resolution to the newest commit (cheap) and
      to the OLDEST commit (worst case: raw-lineage walk, O(n) file
      opens by design — quantified here);
  (c) ``history()`` driver-side construction (O(n) by definition —
      quantified);
  (d) one ``expire_snapshots(retain_last=10)`` at N=5000 (destructive,
      so measured once at the end): keep-walks + in-flight checks +
      GC of ~4990 commits.

Commit fabrication: one tiny real parquet file per commit written with
pyarrow + ``LakeTable._commit`` with honest AddFile stats — the Spark
write path is not what is being measured (bench.py covers it); the
commit-log layer is. Appends run through the real commit protocol
(exclusive create, sibling guard, ref CAS, periodic checkpoint).

Appends a section to SCALING.md. Run: python scripts/metadata_scaling_probe.py
Env: META_COMMITS=5000
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq


def _fabricate_commits(t, n: int) -> None:
    from lakeshed.table import AddFile

    sv = t._read_commit(t.head()).schema_version
    for i in range(n):
        base_rel = os.path.join("data", f"fab{i:06d}")
        os.makedirs(os.path.join(t.path, base_rel), exist_ok=True)
        rel = os.path.join(base_rel, "part-0.parquet")
        abs_p = os.path.join(t.path, rel)
        pq.write_table(pa.table({"k": pa.array([i], pa.int32())}), abs_p)
        t._commit(
            "append",
            [AddFile(path=rel, base=base_rel, rows=1,
                     bytes=os.path.getsize(abs_p), schema_version=sv,
                     lower_bounds={"k": str(i)}, upper_bounds={"k": str(i)},
                     null_counts={"k": 0})],
            [],
        )


def _time(fn, reps: int = 3) -> float:
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    from lakeshed.session import get_spark
    from lakeshed.table import LakeTable

    spark = get_spark("meta-probe")
    spark.sparkContext.setLogLevel("ERROR")

    total = int(os.environ.get("META_COMMITS", "5000"))
    root = "/tmp/lakeshed-meta-probe"
    shutil.rmtree(root, ignore_errors=True)
    t = LakeTable(spark, os.path.join(root, "t"))
    t.create(spark.createDataFrame([(0,)], "k int"))

    points = []
    targets = [total // 16, total // 8, total // 4, total // 2, total]
    built = 1
    for n in targets:
        t0 = time.perf_counter()
        _fabricate_commits(t, n - built)
        commit_ms = (time.perf_counter() - t0) / max(n - built, 1) * 1e3
        built = n
        head = t.head()
        # (a) planning with checkpoints (the shipping path)
        plan_cp = _time(lambda: t._state(head))
        # (a') counterfactual: move checkpoints aside -> raw chain replay
        cps = glob.glob(os.path.join(t.log_dir, "*.checkpoint.json"))
        for p in cps:
            os.rename(p, p + ".aside")
        plan_raw = _time(lambda: t._state(head), reps=1)
        for p in cps:
            os.rename(p + ".aside", p)
        # (b) TIMESTAMP AS OF: head ts (newest) vs oldest commit ts
        ts_new = t.committed_at_ms(head)
        ts_old = t._read_commit(0).timestamp_ms
        asof_new = _time(lambda: t.snapshot_as_of(ts_new))
        asof_old = _time(lambda: t.snapshot_as_of(ts_old))
        # (c) history() driver-side build (collect 1 row to force it)
        hist = _time(lambda: t.history().limit(1).collect(), reps=1)
        points.append({
            "commits": n,
            "plan_checkpointed_ms": round(plan_cp * 1e3, 2),
            "plan_raw_chain_ms": round(plan_raw * 1e3, 2),
            "asof_newest_ms": round(asof_new * 1e3, 2),
            "asof_oldest_ms": round(asof_old * 1e3, 2),
            "history_s": round(hist, 3),
            "commit_ms": round(commit_ms, 2),
        })
        print(json.dumps(points[-1]), file=sys.stderr)

    t0 = time.perf_counter()
    expired = t.expire_snapshots(retain_last=10)
    expire_s = time.perf_counter() - t0
    post = {
        "expired_count": len(expired),
        "expire_s": round(expire_s, 2),
        "plan_after_expire_ms": round(_time(lambda: t._state(t.head()))
                                      * 1e3, 2),
    }
    # compaction collapses the live-file count the checkpointed plan
    # parses — the proof that plan cost tracks files, not history
    t0 = time.perf_counter()
    t.compact()
    post["compact_s"] = round(time.perf_counter() - t0, 2)
    post["live_files_after_compact"] = len(t.plan_files())
    post["plan_after_compact_ms"] = round(
        _time(lambda: t._state(t.head())) * 1e3, 2)
    print(json.dumps(post), file=sys.stderr)

    # log-log slope between first and last point, per metric
    import math

    def slope(key: str) -> float:
        a, b = points[0], points[-1]
        return round(
            math.log(max(b[key], 1e-9) / max(a[key], 1e-9))
            / math.log(b["commits"] / a["commits"]), 2)

    lines = [
        "",
        "## Commit-log metadata scaling",
        "",
        f"Streaming-shaped table: {total} single-file appends through the",
        "real commit protocol (exclusive create, sibling guard, ref CAS,",
        "auto-checkpoint every 20 commits). Times are min-of-3 on the",
        "driver; `plan` = `_state(head)` (the per-read chain replay).",
        "",
        "| commits | commit ms | plan (ckpt) ms | plan (raw) ms | "
        "AS OF newest ms | AS OF oldest ms | history s |",
        "|---|---|---|---|---|---|---|",
    ]
    for p in points:
        lines.append(
            f"| {p['commits']} | {p['commit_ms']} | "
            f"{p['plan_checkpointed_ms']} | "
            f"{p['plan_raw_chain_ms']} | {p['asof_newest_ms']} | "
            f"{p['asof_oldest_ms']} | {p['history_s']} |")
    lines += [
        "",
        f"Log-log slopes (first→last point): plan-with-checkpoints "
        f"{slope('plan_checkpointed_ms')} — this tracks LIVE FILE count, "
        f"not history length (the fixture appends one file per commit and "
        f"never compacts, so files == commits; the checkpointed plan "
        f"parses ONE full-state file list instead of replaying the chain "
        f"— see the raw/checkpointed ratio per row, and the "
        f"post-compaction figure below for the same table with the file "
        f"count collapsed); raw-chain plan {slope('plan_raw_chain_ms')} "
        f"(the O(n_commits) curve `rewrite_manifests`/auto-checkpointing "
        f"removes), AS-OF-newest {slope('asof_newest_ms')}, AS-OF-oldest "
        f"{slope('asof_oldest_ms')} (raw-lineage walk, O(n) by design — "
        f"one ~100-byte json open per hop; see reading below), history "
        f"{slope('history_s')}, per-commit latency {slope('commit_ms')} "
        f"(r11, VERDICT r10 #5: version allocation reads the persistent "
        f"head-hint file and the sibling guard walks the ref lineage "
        f"down to the shared parent — zero directory listings on the "
        f"linear fast path; the residual growth is the auto-checkpoint "
        f"every 20 commits, whose full-state write is O(live files) "
        f"amortized /20 and collapses with compaction like planning "
        f"does).",
        "",
        f"One `expire_snapshots(retain_last=10)` at {total} commits: "
        f"expired {post['expired_count']} in {post['expire_s']} s "
        f"(keep-walks + in-flight mtime checks + file GC — a maintenance "
        f"op, amortized over the {total} commits it cleans); planning "
        f"after expiry: {post['plan_after_expire_ms']} ms. `compact()` "
        f"then rewrites the {total}-file live set into "
        f"{post['live_files_after_compact']} file(s) in "
        f"{post['compact_s']} s, after which planning costs "
        f"{post['plan_after_compact_ms']} ms — plan cost follows the "
        f"file count, exactly as it must.",
        "",
        "Reading: the HOT path (every read's planning) replays ≤20",
        "commits because `_commit` auto-checkpoints every 20 — 17k",
        "commits/day at a 5 s trigger costs each reader one checkpoint",
        "parse (O(live files), irreducible: planning must enumerate what",
        "to read) plus ≤20 json opens regardless of table age.",
        "`TIMESTAMP AS OF` to a point deep in history and",
        "`history()` walk raw commits by design (they must see true",
        "per-commit timestamps); both are human-initiated metadata",
        "queries, and `expire_snapshots` keeps n_live bounded in",
        "production (the post-expiry planning figure shows the recovered",
        "cost).",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALING.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("appended to SCALING.md", file=sys.stderr)


if __name__ == "__main__":
    main()
