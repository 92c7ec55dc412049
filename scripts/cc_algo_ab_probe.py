"""Interleaved A/B: connected-components algorithm for the
llm_dedup_clusters gate shape (r15). ``label`` (min-label propagation,
O(diameter) rounds — the path the gate's ``auto`` takes on this
fixture) vs ``star`` (alternating large-star/small-star, O(log n)
rounds, heavier rounds). Both produce IDENTICAL clusters (min id per
component) by construction — value-checked here — so the gate is free
to run whichever measures faster without changing what it computes.

Usage: python scripts/cc_algo_ab_probe.py [N]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from lakeshed.io import load_star
from lakeshed.llm import dedup


def _shape(algorithm):
    def fn(spark, sf_dir):
        docs = load_star(spark, sf_dir, "documents")["documents"]
        pairs = dedup.minhash_lsh_pairs(
            docs, threshold=0.7, num_hashes=128, bands=32, shingle=3
        )
        return dedup.dedup_clusters(
            pairs, docs.select("doc_id"), id_col="doc_id",
            shuffle_partitions=8, algorithm=algorithm,
        )
    return fn


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from lakeshed.session import get_spark

    spark = get_spark("lakeshed-cc-algo-ab")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    shapes = {"label": _shape("label"), "star": _shape("star")}
    a = {tuple(r) for r in shapes["label"](spark, sf).collect()}
    b = {tuple(r) for r in shapes["star"](spark, sf).collect()}
    from lakeshed.llm import release_persisted
    release_persisted()
    print(f"labels_identical={a == b} n={len(a)}", flush=True)
    print(f"canary_before={bench._canary(spark)}", flush=True)
    samples = {"label": [], "star": []}
    for i in range(n):
        order = ("label", "star") if i % 2 == 0 else ("star", "label")
        for name in order:
            samples[name].append(
                round(bench._time_query(spark, shapes[name]), 3))
    print(f"canary_after={bench._canary(spark)}", flush=True)
    print(json.dumps({
        **samples,
        "min_label": min(samples["label"]),
        "min_star": min(samples["star"]),
        "star_over_label_min": round(min(samples["star"]) /
                                     min(samples["label"]), 3),
    }, indent=1))


if __name__ == "__main__":
    main()
