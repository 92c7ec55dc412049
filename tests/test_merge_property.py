"""Property-based MERGE test (SURVEY §5 pyramid; VERDICT r1 item 3).

Random changelog batches — arbitrary I/D sequences with repeated keys,
including I-then-D and D-then-I inside one batch — applied through
LakeTable.merge must equal a plain-Python replay of the reference
semantics (last change per key wins within a batch; D removes the key;
D of an absent key is a no-op: IcebergStream.java:116-120 equality
deletes + Paimon dedup, PaimonStream.java:90-91).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakeshed.catalog import Catalog

KEYS = st.integers(min_value=0, max_value=6)
EVENTS = st.lists(
    st.tuples(st.sampled_from(["I", "D"]), KEYS,
              st.text(alphabet="abcxyz", min_size=1, max_size=4)),
    min_size=1,
    max_size=25,
)


def replay(initial: dict[int, str], events) -> dict[int, str]:
    state = dict(initial)
    # last event per key wins (dedup by arrival seq), applied atomically
    last = {}
    for seq, (op, key, val) in enumerate(events):
        last[key] = (op, val)
    for key, (op, val) in last.items():
        if op == "D":
            state.pop(key, None)
        else:
            state[key] = val
    return state


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(initial=st.dictionaries(KEYS, st.text("mn", min_size=1, max_size=3),
                               max_size=5),
       events=EVENTS)
def test_merge_equals_python_replay(spark, tmp_path_factory, initial, events):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("wh")))
    t = cat.create_table(
        "default.prop",
        spark.createDataFrame(
            list(initial.items()) or [(None, None)],
            "k int, v string",
        ).where("k IS NOT NULL"),
    )
    batch = spark.createDataFrame(
        [(k, v, op, seq) for seq, (op, k, v) in enumerate(events)],
        "k int, v string, op string, seq int",
    )
    t.merge(
        batch,
        on="k",
        when_matched_update={"v": "s.v"},
        when_matched_delete="s.op = 'D'",
        when_not_matched_insert="op <> 'D'",
        source_order="seq",
    )
    got = {r.k: r.v for r in t.read().collect()}
    assert got == replay(initial, events)
    t.drop()