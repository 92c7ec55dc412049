"""Round-6 query extensions: sketch aggregates, quality screen, shard
assignment, stream-static enrichment — the invariants the SQL oracle can't
(or doesn't) express."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lakeshed.io import load_star
from lakeshed.llm import sampling, text
from lakeshed.queries import spark_queries

SF = os.environ.get("LAKESHED_TEST_SF", "/root/testdata/sf0.001")
SF_DRIVER = os.environ.get("LAKESHED_ORACLE_SF", "/root/testdata/sf0.01")


def test_approx_sketches_within_declared_bounds(spark):
    """The gated approx_distinct_quantiles hash-checks exact twins +
    error-bound flags (raw sketch values are engine-specific and
    excluded from the compared output); the RAW estimates are pinned
    HERE against their exact twins, at both the local and the driver's
    scale factor."""
    from lakeshed.queries import _approx_sketch_frame

    for sf in (SF, SF_DRIVER):
        rows = _approx_sketch_frame(spark, sf).collect()
        assert rows
        assert all(r.hll_in_bound for r in rows), sf
        assert all(r.quantile_in_bound for r in rows), sf
        # the sketch columns must be genuine estimates of the exact twins
        for r in rows:
            assert abs(r.approx_users - r.exact_users) <= r.exact_users
    # the gated projection drops the raw estimates and keeps the flags
    gated = spark_queries()["approx_distinct_quantiles"](spark, SF)
    assert set(gated.columns) == {
        "event_type", "exact_users", "exact_p50",
        "hll_in_bound", "quantile_in_bound",
    }


def test_quality_rules_discriminate_and_conjoin(spark):
    """The Gopher screen must actually split the corpus (a rule that is
    all-true or all-false tests nothing) and `keep` must equal the rule
    conjunction row by row."""
    docs = load_star(spark, SF_DRIVER, "documents")["documents"]
    rows = text.quality_rules(docs).collect()
    kept = [r for r in rows if r.keep]
    assert 0 < len(kept) < len(rows)
    for r in rows:
        assert r.keep == (r.r_words and r.r_word_len and r.r_symbol
                          and r.r_stop)
    # at least two rules individually discriminate on this corpus
    discriminating = sum(
        1 for flag in ("r_words", "r_word_len", "r_symbol", "r_stop")
        if 0 < sum(getattr(r, flag) for r in rows) < len(rows)
    )
    assert discriminating >= 2


def test_shard_assign_is_layout_independent_and_dense(spark):
    """Shards must be a partition of the corpus with contiguous 1..n
    positions, and identical regardless of the input's partitioning —
    that reproducibility is the whole point of a deterministic shuffle."""
    docs = load_star(spark, SF, "documents")["documents"]
    a = sampling.shard_assign(docs, n_shards=4)
    b = sampling.shard_assign(docs.repartition(13), n_shards=4)
    ra = {(r.doc_id, r.shard, r.pos) for r in a.collect()}
    assert ra == {(r.doc_id, r.shard, r.pos) for r in b.collect()}
    assert len(ra) == docs.count()
    # positions dense per shard
    per = {}
    for _, s, p in ra:
        per.setdefault(s, []).append(p)
    for s, ps in per.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), s
    # every shard non-empty at this corpus size
    assert set(per) == {0, 1, 2, 3}


def test_stream_static_enrich_is_stateless_broadcast(spark):
    """The enrichment join must be a broadcast hash join on the stream
    side (stateless — no state-store rows), not a shuffled join."""
    import lakeshed.streaming.queries as sq

    df = sq.stream_static_enrich(spark, SF)
    rows = {(r.segment, r.event_type): (r.cnt, r.total_value)
            for r in df.collect()}
    assert rows
    # batch equivalence
    ev = load_star(spark, SF, "events")["events"]
    dim = load_star(spark, SF, "customer")["customer"]
    exp = {
        (r.segment, r.event_type): (r.cnt, r.total_value)
        for r in ev.join(dim, ev.user_id == dim.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .collect()
    }
    assert rows == exp


def test_lm_score_orders_fluent_above_shuffled(spark):
    """The bigram LM score must rank in-distribution text above
    out-of-distribution token soup — the property the CCNet-style filter
    relies on. Score a real doc's text vs the same tokens reversed
    (destroys bigram statistics, keeps unigrams identical)."""
    from pyspark.sql import Row

    docs = load_star(spark, SF, "documents")["documents"]
    lm = text.bigram_lm(docs)
    sample = docs.orderBy("doc_id").limit(20).collect()
    probes = []
    for r in sample:
        toks = r.text.split()
        probes.append(Row(doc_id=r.doc_id, text=r.text, kind="orig"))
        probes.append(Row(doc_id=r.doc_id + 10_000_000,
                          text=" ".join(reversed(toks)), kind="rev"))
    pdf = spark.createDataFrame(probes)
    scored = {r.doc_id: r.avg_logp
              for r in text.lm_score(pdf, lm).collect()}
    orig = [scored[r.doc_id] for r in sample if r.doc_id in scored]
    rev = [scored[r.doc_id + 10_000_000] for r in sample
           if r.doc_id + 10_000_000 in scored]
    assert orig and rev
    assert sum(orig) / len(orig) > sum(rev) / len(rev)
