"""Engine contract for the shared PII patterns (VERDICT r05 #7).

``llm_pii_scan`` claims Spark (Java ``java.util.regex``) and the DuckDB
oracle (RE2) "provably run the same scan" because both compile the same
``PII_PATTERNS`` constants. Sharing the source string is necessary but
not sufficient — the two engines differ on lookarounds, backreferences,
possessive quantifiers, and (configurably) the unicode-ness of ``\\d`` /
``\\b``, so a pattern edit could silently diverge and surface only as a
driver hash mismatch. This test pins the contract where it's cheap to
debug: both engines extract the SAME match sequences and produce the SAME
redacted text over an adversarial corpus chosen to poke exactly the
divergence-prone corners (nested emails-in-URLs, ``+1-`` phone prefixes,
trailing-dot URLs, unicode digits/letters around matches, greedy-vs-
leftmost alternation)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from lakeshed.llm.text import (
    PII_MATCH_GROUP,
    PII_PATTERNS,
    PII_REDACTION_PASSES,
)

# Each string targets a known Java-vs-RE2 divergence risk or a
# leftmost-longest ambiguity; several contain matches of multiple
# categories so redaction ORDER matters too.
ADVERSARIAL_CORPUS = [
    # email nested inside a URL: the URL pattern ([^\s]+) swallows it, the
    # email pattern still finds it — both engines must agree on both
    "login at https://host.example.com/reset?user=a.b+tag@example.co.uk now",
    # trailing-dot / trailing-punctuation URLs ([^\s]+ is greedy in both)
    "see https://example.org/path. and (https://example.org/p(a)ren) done",
    # +1- phone prefix: \b between '-' and '5' still matches in both
    "call +1-555-123-4567 or 555.1234.0000, fax 555-12-3456789",
    # digit runs longer than the pattern: \b must refuse 4155512340000
    "id 4155512340000 vs real 415-555-1234 end",
    # unicode letters/digits adjacent to matches: Java \w vs RE2 \w are
    # both ASCII by default, so boundaries must agree across ٣ and é
    "é555-123-4567٣ and caféowner@crème.fr plus ٣٣@x.com",
    # consecutive dots, leading/trailing dots, % and + in local part
    "a..b@x.com .start@x.com end.@x.com a%b+c@sub.domain.museum",
    # scheme casing and bare host (no scheme → no URL match)
    "HTTPS://UPPER.example.COM/path www.no-scheme.example.com",
    # email at string start and end, no surrounding whitespace
    "first@edge.io middle text last@edge.io",
    # empty-ish and no-PII strings keep both engines honest on zero matches
    "",
    "no pii here, just 12345 and at-sign-free text @ alone . com",
    # two phones separated by ONE non-digit: the first match's consuming
    # suffix guard eats the comma, so single-pass extraction sees only the
    # first — but the SECOND redaction pass must tag the neighbor too
    "pair 555-123-4567,555-987-6543 tail",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(PII_PATTERNS))
def test_extraction_sequences_identical(spark, duck, name):
    pat = PII_PATTERNS[name]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ADVERSARIAL_CORPUS)], "i int, s string"
    )
    via_spark = {
        r.i: r.m
        for r in df.select(
            "i",
            F.regexp_extract_all(
                "s", F.lit(pat), F.lit(PII_MATCH_GROUP)
            ).alias("m"),
        ).collect()
    }
    via_duck = {
        i: m
        for i, m in duck.execute(
            "SELECT i, regexp_extract_all(s, ?, ?) FROM (SELECT "
            "unnest(range(len(?::varchar[]))) AS i, "
            "unnest(?::varchar[]) AS s)",
            [pat, PII_MATCH_GROUP, ADVERSARIAL_CORPUS, ADVERSARIAL_CORPUS],
        ).fetchall()
    }
    assert via_spark == via_duck, f"pattern {name!r} diverged between engines"
    # the corpus must actually exercise the pattern (guards a dead test)
    assert any(via_spark.values())


def test_redacted_text_identical(spark, duck):
    """Full redaction pipeline — same replacement PASSES as pii_features
    and the llm_pii_scan oracle (emails, urls, phones, phones-again),
    compared on the raw redacted text so a divergence is readable, not a
    hash."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ADVERSARIAL_CORPUS)], "i int, s string"
    )
    red = F.col("s")
    for name, pat in PII_REDACTION_PASSES:
        red = F.regexp_replace(red, pat, f"$1<{name[:-1].upper()}>$3")
    via_spark = {r.i: r.r for r in df.select("i", red.alias("r")).collect()}

    sql_red = "s"
    for name, pat in PII_REDACTION_PASSES:
        tag = f"\\1<{name[:-1].upper()}>\\3"
        sql_red = f"regexp_replace({sql_red}, '{pat}', '{tag}', 'g')"
    via_duck = {
        i: r
        for i, r in duck.execute(
            f"SELECT i, {sql_red} FROM (SELECT "
            "unnest(range(len(?::varchar[]))) AS i, "
            "unnest(?::varchar[]) AS s)",
            [ADVERSARIAL_CORPUS, ADVERSARIAL_CORPUS],
        ).fetchall()
    }
    assert via_spark == via_duck
    # sanity: redaction actually fired on the planted matches (item 0's
    # email sits INSIDE the URL, so the later URL pass swallows its tag —
    # in both engines; standalone matches keep theirs)
    assert "<URL>" in via_spark[0] and "<EMAIL>" not in via_spark[0]
    assert "<PHONE>" in via_spark[2]
    assert via_spark[7] == "<EMAIL> middle text <EMAIL>"
    # the double phone pass tags BOTH adjacent phones (single-pass
    # extraction still counts only the first — pinned just below)
    assert via_spark[10] == "pair <PHONE>,<PHONE> tail"


def test_adjacent_phone_counts_stay_single_pass(spark):
    """pii_features' documented count semantics: the guard-consumed
    neighbor is NOT counted, even though redaction (double pass) tags it."""
    from lakeshed.llm.text import pii_features

    df = spark.createDataFrame(
        [(1, "pair 555-123-4567,555-987-6543 tail")], "doc_id int, text string"
    )
    row = pii_features(df).collect()[0]
    assert row.n_phones == 1
