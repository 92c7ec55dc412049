"""Isolated A/B for the llm_lm_score shared-gram-frame change (VERDICT
r14 #8): OLD shape (train + score legs each tokenize+explode the corpus)
vs NEW shape (one persisted doc_bigrams frame feeds both legs).
Both shapes run in ONE session, interleaved per repetition, with
bench.py's exact per-query method — the within-session A/B this host
requires (host-steal waves).

Usage: python scripts/lm_grams_ab_probe.py [N]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from lakeshed.io import load_star
from lakeshed.llm import text
from lakeshed.llm._persist import scoped_persist


def old_shape(spark, sf_dir):
    docs = load_star(spark, sf_dir, "documents")["documents"]
    lm = text.bigram_lm(docs)
    return text.lm_score(docs, lm)


def new_shape(spark, sf_dir):
    docs = load_star(spark, sf_dir, "documents")["documents"]
    g = scoped_persist("lm_grams_ab", text.doc_bigrams(docs))
    lm = text.bigram_lm(docs, grams=g)
    return text.lm_score(docs, lm, grams=g)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from lakeshed.session import get_spark

    spark = get_spark("lakeshed-lm-grams-ab")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"canary_before={bench._canary(spark)}", flush=True)
    samples = {"old": [], "new": []}
    for i in range(n):
        order = ("old", "new") if i % 2 == 0 else ("new", "old")
        for shape in order:
            fn = old_shape if shape == "old" else new_shape
            samples[shape].append(round(bench._time_query(spark, fn), 3))
    # value-identity: both shapes must produce the same rows
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    a = {tuple(r) for r in old_shape(spark, sf).collect()}
    b = {tuple(r) for r in new_shape(spark, sf).collect()}
    print(f"canary_after={bench._canary(spark)}", flush=True)
    print(json.dumps({
        **samples,
        "min_old": min(samples["old"]),
        "min_new": min(samples["new"]),
        "new_over_old_min": round(min(samples["new"]) /
                                  min(samples["old"]), 3),
        "rows_identical": a == b,
        "n_rows": len(a),
    }, indent=1))


if __name__ == "__main__":
    main()
