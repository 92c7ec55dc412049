"""Unit tests for the LLM-pipeline operators not covered by SQL oracles:
SimHash determinism, ANN recall vs brute force, multimodal stub kernel,
and the LSH-vs-brute-force equivalence of the near-dup paths.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lakeshed.llm import dedup, multimodal, similarity

SF = os.environ.get("LAKESHED_TEST_SF", "/root/testdata/sf0.001")


def _docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet"))


def _emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet"))


def test_minhash_lsh_equals_brute_force(spark):
    """The banded-LSH near-dup output must equal the all-pairs truth at the
    configured threshold (recall ≈ 1 by banding math)."""
    docs = _docs(spark)
    lsh = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.minhash_lsh_pairs(
            docs, threshold=0.7, shingle=3
        ).collect()
    }
    brute = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs_brute(
            docs, threshold=0.7, shingle=3
        ).collect()
    }
    assert lsh == brute
    assert brute, "fixture should contain planted near-dup pairs"


def test_simhash_deterministic_and_finds_neardups(spark):
    docs = _docs(spark)
    a = sorted(
        (r.id_a, r.id_b)
        for r in dedup.simhash_pairs(docs, max_hamming=8).collect()
    )
    b = sorted(
        (r.id_a, r.id_b)
        for r in dedup.simhash_pairs(docs, max_hamming=8).collect()
    )
    assert a == b  # deterministic across runs
    # near-dup texts (high 3-gram jaccard) should also be simhash-close
    true_pairs = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs_brute(
            docs, threshold=0.9, shingle=3
        ).collect()
    }
    if true_pairs:
        assert true_pairs & set(a), "simhash should catch strong near-dups"


def test_ann_recall_vs_brute_force(spark):
    emb = _emb(spark)
    qv = list(emb.where(F.col("vec_id") == 0).first()["embedding"])
    rest = emb.where(F.col("vec_id") != 0)
    exact = [r.vec_id for r in similarity.cosine_topk(rest, qv, k=10).collect()]
    approx = [
        r.vec_id
        for r in similarity.ann_topk_lsh(
            rest, qv, k=10, bits=4, tables=32
        ).collect()
    ]
    # (4 bits × 32 tables) on weakly-correlated random vectors: expect most
    # of the true top-10 recalled (tight clusters in real corpora do better)
    assert len(set(exact) & set(approx)) >= 5


def test_multimodal_feature_kernel(spark):
    docs = _docs(spark).limit(20)
    feats = multimodal.extract_features(
        multimodal.attach_binary_payload(docs)
    ).collect()
    assert len(feats) == 20
    for r in feats:
        assert r.n_bytes > 0
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 0.01  # normalized histogram
        assert r.mime == "application/octet-stream"


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other text")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r.dup_count for r in dedup.exact_dedup(df).collect()}
    assert out == {1: 2, 3: 1}
