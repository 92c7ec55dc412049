"""Property tests for the LLM text-op arithmetic (r11).

The chunking / n-gram / packing ops carry the kind of off-by-one
arithmetic (integer ceils, shifted slices, cumulative offsets) that
example tests under-cover and the DuckDB oracle gates only probe at the
fixture's shapes. Each op is compared against a plain-Python reference
over Hypothesis-generated inputs — one generated BATCH of documents per
example so few examples still cover many docs, the same economy
``test_merge_property`` uses.

Input texts are generated pre-normalized (lowercase words, single
spaces), so the Python reference tokenization is exactly
``text.split(" ")`` — including the Spark quirk that an empty string
splits to ``[""]`` (one empty token), which Python matches.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakeshed.llm import text as T
from lakeshed.llm import sampling as S

WORD = st.text(alphabet="abcde", min_size=1, max_size=4)
DOC = st.lists(WORD, min_size=0, max_size=60)
SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _toks(joined: str) -> list[str]:
    return joined.split(" ")  # "" -> [""], matching Spark's split


def _ref_ngrams(toks: list[str], n: int) -> list[str]:
    cnt = max(len(toks) - n + 1, 1)
    return [" ".join(toks[j:j + n]) for j in range(cnt)]


@settings(**SETTINGS)
@given(docs=st.lists(DOC, min_size=1, max_size=12),
       window=st.integers(min_value=1, max_value=9),
       stride=st.integers(min_value=1, max_value=9))
def test_chunk_documents_matches_reference(spark, docs, window, stride):
    stride = min(stride, window)  # stride > window raises (r11 wave 13)
    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id int, text string")
    got = {
        (r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk_digest)
        for r in T.chunk_documents(
            df, window=window, stride=stride).collect()
    }
    want = {}
    for i, d in enumerate(docs):
        toks = _toks(" ".join(d))
        extra = max(len(toks) - window, 0)
        nch = (extra + stride - 1) // stride + 1
        for ci in range(nch):
            ch = toks[ci * stride:ci * stride + window]
            want[(i, ci)] = (
                len(ch),
                hashlib.md5(" ".join(ch).encode()).hexdigest(),
            )
    assert got == want


@settings(**SETTINGS)
@given(docs=st.lists(DOC, min_size=1, max_size=12),
       n=st.integers(min_value=1, max_value=4))
def test_ngrams_matches_reference(spark, docs, n):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id int, text string")
    got = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", T.ngrams(T.tokens("text"), n).alias("g")).collect()
    }
    want = {i: _ref_ngrams(_toks(" ".join(d)), n)
            for i, d in enumerate(docs)}
    assert got == want

    # fingerprint rides the same grams: min md5 over full n-grams, or
    # md5 of the whole text for docs shorter than n tokens
    fps = {
        r.doc_id: r.fp
        for r in df.select(
            "doc_id", T.fingerprint("text", ngram=n).alias("fp")).collect()
    }
    for i, d in enumerate(docs):
        toks = _toks(" ".join(d))
        if len(toks) >= n:
            exp = min(hashlib.md5(g.encode()).hexdigest()
                      for g in _ref_ngrams(toks, n))
        else:
            exp = hashlib.md5(" ".join(d).encode()).hexdigest()
        assert fps[i] == exp, (i, d)


@settings(**SETTINGS)
@given(docs=st.lists(
    st.tuples(st.sampled_from(["en", "fr"]), DOC),
    min_size=1, max_size=16),
    budget=st.integers(min_value=1, max_value=40))
def test_pack_tokens_matches_reference(spark, docs, budget):
    df = spark.createDataFrame(
        [(i, lang, " ".join(d)) for i, (lang, d) in enumerate(docs)],
        "doc_id int, lang string, text string")
    got = {
        r.doc_id: (r.n_tokens, r.start_offset, r.pack_id, r.pack_offset)
        for r in S.pack_tokens(df, budget=budget).collect()
    }
    want = {}
    for lang in {x for x, _ in docs}:
        cum = 0
        for i, (lg, d) in enumerate(docs):  # doc_id order == index order
            if lg != lang:
                continue
            n = len(_toks(" ".join(d)))
            want[i] = (n, cum, cum // budget, cum % budget)
            cum += n
    assert got == want


def test_shard_assign_structural_invariants(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(257)], "doc_id int")
    a = sorted(
        (r.doc_id, r.shard, r.pos)
        for r in S.shard_assign(df, n_shards=8).collect())
    b = sorted(
        (r.doc_id, r.shard, r.pos)
        for r in S.shard_assign(df, n_shards=8).collect())
    assert a == b  # deterministic
    assert len(a) == 257  # every doc assigned exactly once
    by_shard: dict[int, list[int]] = {}
    for _, shard, pos in a:
        by_shard.setdefault(shard, []).append(pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


@settings(**SETTINGS)
@given(docs=st.lists(
    st.text(alphabet="ab \t\n\x0b\f\rC'", min_size=0, max_size=40),
    min_size=1, max_size=12))
def test_normalize_and_tokens_match_reference_on_messy_whitespace(
        spark, docs):
    """r11 review wave 13 pin: normalize is collapse-then-trim over the
    EXPLICIT Java-\\s class, so leading/trailing tabs/newlines/vertical
    tabs never leave a phantom empty token, and Spark agrees with a
    plain-Python reference (which DuckDB's oracle _NORM mirrors)."""
    import re

    from pyspark.sql import functions as F

    def ref_norm(t: str) -> str:
        return re.sub("[ \t\n\x0b\f\r]+", " ", t.lower()).strip()

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id int, text string")
    got = {
        r.doc_id: (r.n, r.tk)
        for r in df.select(
            "doc_id",
            T.normalize("text").alias("n"),
            T.tokens("text").alias("tk")).collect()
    }
    for i, d in enumerate(docs):
        n = ref_norm(d)
        assert got[i] == (n, n.split(" ")), (i, repr(d))
        # no phantom empty tokens unless the text is entirely whitespace
        if n:
            assert "" not in got[i][1], repr(d)


def test_wave13_parameter_guards(spark):
    import pytest

    docs = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="must not exceed window"):
        T.chunk_documents(docs, window=2, stride=5)
    with pytest.raises(ValueError, match="budget must be positive"):
        S.pack_tokens(docs, budget=0)
    with pytest.raises(ValueError, match="n_shards must be positive"):
        S.shard_assign(docs, n_shards=0)
    with pytest.raises(ValueError, match="non-negative"):
        S.leakage_safe_split(
            spark.createDataFrame([(1, 1)], "doc_id long, cluster long"),
            {"test": -0.1, "train": 1.0, "val": 0.1})

    from lakeshed.llm import multimodal as M

    bins = M.attach_binary_payload(docs)
    with pytest.raises(ValueError, match="target_bytes must be positive"):
        M.resize_payloads(bins, target_bytes=0)
    with pytest.raises(ValueError, match="must be positive"):
        M.sample_frames(bins, every_nth=0)

    # NULL payloads: null features / no frames, never a dead job
    null_bins = spark.createDataFrame(
        [(9, None, None)],
        "doc_id bigint, payload binary, "
        "meta struct<mime:string, byte_len:int>")
    feats = M.extract_features(null_bins).collect()
    assert len(feats) == 1 and feats[0].n_bytes is None
    assert M.sample_frames(null_bins).count() == 0
    resized = M.resize_payloads(null_bins).collect()
    assert len(resized) == 1 and resized[0].payload is None


@settings(**SETTINGS)
@given(docs=st.lists(DOC, min_size=1, max_size=10),
       window=st.integers(min_value=2, max_value=6))
def test_duplicate_spans_and_removal_match_reference(spark, docs, window):
    """Substring dedup (r12): duplicate_spans' (pos, occurrences,
    is_canonical) rows and remove_duplicate_spans' cleaned text both
    equal a plain-Python replay over generated corpora — the tiny
    'abcde' word alphabet forces heavy genuine window collisions, the
    regime where canonical selection and overlap composition actually
    matter."""
    from lakeshed.llm import dedup as D

    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    # python reference: occurrences per window VALUE across the corpus
    occ: dict = {}
    toks = {i: _toks(t) for i, t in rows}
    for i in sorted(toks):
        t = toks[i]
        for p in range(len(t) - window + 1):
            occ.setdefault(tuple(t[p:p + window]), []).append((i, p))
    want_spans = {}
    rm: dict = {i: set() for i in toks}
    for lst in occ.values():
        if len(lst) > 1:
            canon = min(lst)
            for d, p in lst:
                want_spans[(d, p)] = (len(lst), (d, p) == canon)
            for d, p in lst:
                if (d, p) != canon:
                    rm[d].update(range(p, p + window))
    want_text = {
        i: " ".join(tok for j, tok in enumerate(t) if j not in rm[i])
        for i, t in toks.items()
    }

    got_spans = {
        (r.doc_id, r.pos): (r.occurrences, r.is_canonical)
        for r in D.duplicate_spans(df, window=window).collect()
    }
    assert got_spans == want_spans
    got_text = {
        r.doc_id: r.text
        for r in D.remove_duplicate_spans(df, window=window).collect()
    }
    assert got_text == want_text


@settings(**SETTINGS)
@given(docs=st.lists(DOC, min_size=1, max_size=10),
       window=st.integers(min_value=2, max_value=6),
       fanout=st.sampled_from([1, 2, 32]),
       target=st.sampled_from([1, 2, 1_000_000]),
       hot=st.booleans())
def test_duplicate_and_remove_spans_match_reference(
        spark, docs, window, fanout, target, hot):
    """duplicate_spans + remove_duplicate_spans vs a plain-Python replay
    over generated corpora (r13: the salted skew_fanout rejoin must be
    a pure implementation detail — identical output at fanout 1/2/32;
    r14 wave 30: crossed with ``salt_row_target`` 1/2/1M, which sweeps
    the per-hash width regimes — 1 puts EVERY duplicated hash on the
    broadcast hot list at full width, 2 mixes widths by occurrence
    count, 1M keeps the hot list empty — so hypothesis owns the whole
    (fanout × target) parameter plane, not the three points the
    example test pins). ``hot`` appends one shared ``window``-token
    line to every doc, the boilerplate profile the salt exists for, so
    the canonical-minimum tie-break is exercised on a key whose
    multiplicity equals the corpus size."""
    from pyspark.sql import functions as F

    from lakeshed.llm import dedup

    if hot:
        run = " ".join(f"zz{j}" for j in range(window))
        docs = [d + [run] for d in docs]  # token lists; joined below
        docs = [" ".join(w for tok in d for w in tok.split(" "))
                for d in docs]
    else:
        docs = [" ".join(d) for d in docs]
    rows = [(i, t) for i, t in enumerate(docs)]

    # python reference: window -> [(doc, pos)...]; dup if >1 occurrence;
    # canonical = (doc, pos) minimum; removal cuts covered tokens
    occ: dict = {}
    toks = {d: t.split(" ") for d, t in rows}
    for d in sorted(toks):
        t = toks[d]
        for p in range(len(t) - window + 1):
            occ.setdefault(tuple(t[p:p + window]), []).append((d, p))
    want_spans = {}
    rm = {d: set() for d in toks}
    for lst in occ.values():
        if len(lst) > 1:
            first = min(lst)
            for d, p in lst:
                want_spans[(d, p)] = (len(lst), (d, p) == first)
            for d, p in sorted(lst)[1:]:
                rm[d].update(range(p, p + window))
    want_clean = {
        d: " ".join(tok for j, tok in enumerate(t) if j not in rm[d])
        for d, t in toks.items()
    }

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got_spans = {
        (r.doc_id, r.pos): (r.occurrences, r.is_canonical)
        for r in dedup.duplicate_spans(
            df, window=window, skew_fanout=fanout,
            salt_row_target=target).collect()
    }
    assert got_spans == want_spans
    got_clean = {
        r.doc_id: r.text
        for r in dedup.remove_duplicate_spans(
            df, window=window, skew_fanout=fanout,
            salt_row_target=target).collect()
    }
    assert got_clean == want_clean
    if hot and len(docs) > 1:
        # the planted line is duplicated corpus-wide (needs ≥2 docs —
        # hypothesis found the single-doc corpus where it occurs once):
        # at least one canonical occurrence is marked somewhere
        assert sum(1 for v in got_spans.values() if v[1]) >= 1
