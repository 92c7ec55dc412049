"""Model-based property test for the commit-log lineage state machine
(VERDICT r9 #2).

Thirteen hand-driven review waves in r9 each found real expiry/squash/
rollback/branch bugs — strong evidence hand inspection does not saturate
this state space. This module drives seeded-random operation sequences
(append / write-on-branch / overwrite / create+drop branch / rollback /
cherrypick / fast_forward / compact / delete / rewrite_manifests /
expire with random retain_last, including immediate re-expiry) against
a plain-Python reference model and asserts
after EVERY op that the implementation and the model agree on:

- ref state (``branches()``/``head``),
- the live version set (``_versions()``),
- the squash-aware lineage of every live version — THE central spec:
  ``[c.version for c in t._lineage(v)]`` must equal the model's true
  ancestry of ``v`` filtered to non-expired versions, in descending
  order, for every live ``v`` (this is exactly the invariant the r9
  waves kept re-breaking: expiry must delete *resolvability*, never
  *ancestry answers* for surviving versions),
- ``snapshot_as_of`` (TIMESTAMP AS OF) resolution at every commit's
  timestamp ± epsilon on every ref,
- commit parent pointers as recorded at commit time,
- fast_forward accept/reject decisions (CommitConflictError exactly
  when main is not an ancestor of the branch head),
- VERSION AS OF on expired versions raising TableError,
- and (every few steps + at the end) the actual table CONTENT of
  sampled live versions via ``read(version=)`` — which catches
  squash-rewrite and GC bugs (a wrongly deleted data file fails the
  read; wrongly squashed state fails the value compare).

The model is the SPEC, not a re-implementation: it stores true parent
pointers and an expired set, and derives every answer from those — no
squash hops, no checkpoint files, no ``squashed-kept-parent`` mechanics.
If the implementation's hop machinery diverges from "ancestry minus
expired", this test fails.

Two drivers share the machinery (VERDICT r10 #3 closed the second's
scope gap):

- the ORIGINAL driver pins ``older_than_ms`` far-future so only
  ``retain_last`` drives decisions, and the 10-minute in-flight grace
  window is always ACTIVE (every commit is seconds old) — the model's
  protection rule: a live-but-unkept commit survives expiry iff its own
  branch ref exists below it, and (transitively) every non-expired
  ancestor of a surviving commit survives with it;
- the WALL-CLOCK driver injects a fake clock through the
  ``LakeTable._now_ms`` seam (commit timestamps, expiry cutoffs and
  grace ages all read it) and re-stamps every live commit file's mtime
  to its model-recorded creation time before each expiry (squash
  rewrites move real mtimes; mtime is the harness-CONTROLLED input the
  grace rule reads). It drives random ``older_than_ms`` cutoffs
  (far-future, default-now, and past windows) and clock advances that
  put commits on BOTH sides of the grace window, so timestamp-keeps,
  grace activation AND deactivation all steer real expiry decisions.

Bug-catching power (demonstrated during r10 development): reverting the
r9 stale-hop refresh (the ``stale_hop`` branch of expire_snapshots'
squash rewrite, commit 88776d1) makes seeds fail the lineage-equality
assertion after a re-expiry; the transitive in-flight protection in
expire_snapshots (added in r10 BECAUSE this test found protected
commits dangling over expired parents) fails the same assertion when
removed.
"""

from __future__ import annotations

import os
import random

import pytest

from lakeshed.catalog import Catalog
from lakeshed.table import (
    MAIN,
    CommitConflictError,
    LakeTable,
    TableError,
)

FAR_FUTURE_MS = 10**15
GRACE_MS = 10 * 60 * 1000  # expire_snapshots' in-flight grace window


class FakeClock:
    """Deterministic epoch-ms clock injected via LakeTable._now_ms."""

    def __init__(self, start_ms: int) -> None:
        self.ms = start_ms

    def advance(self, delta_ms: int) -> None:
        self.ms += delta_ms


class Model:
    """Pure-Python spec of the commit log's lineage semantics."""

    def __init__(self) -> None:
        self.parent: dict[int, int | None] = {}
        self.ts: dict[int, int] = {}
        self.mtime: dict[int, int] = {}  # file creation time (== ts)
        self.branch_of: dict[int, str] = {}
        self.content: dict[int, frozenset[int]] = {}
        self.batch: dict[int, int] = {}
        self.optype: dict[int, str] = {}
        self.squashed: set[int] = set()  # file rewritten as full-state root
        self.expired: set[int] = set()
        self.refs: dict[str, int] = {}

    # -- bookkeeping -------------------------------------------------------

    def live(self) -> list[int]:
        return sorted(v for v in self.parent if v not in self.expired)

    def record_commit(self, version: int, *, parent: int | None, ts: int,
                      branch: str, content: frozenset[int], batch: int,
                      optype: str) -> None:
        # a previously-expired version NUMBER can be reused by a new
        # commit (the impl allocates max(live)+1); the old entry is gone
        self.expired.discard(version)
        self.squashed.discard(version)
        self.parent[version] = parent
        self.ts[version] = ts
        self.mtime[version] = ts
        self.branch_of[version] = branch
        self.content[version] = content
        self.batch[version] = batch
        self.optype[version] = optype

    # -- derived answers (the spec) ----------------------------------------

    def ancestry(self, v: int) -> list[int]:
        """True ancestry of v (inclusive, newest first) — never forgets."""
        out = []
        w: int | None = v
        while w is not None:
            out.append(w)
            w = self.parent[w]
        return out

    def kept_ancestry(self, v: int) -> list[int]:
        return [a for a in self.ancestry(v) if a not in self.expired]

    def snapshot_as_of(self, ts_ms: int, branch: str) -> int | None:
        for a in self.kept_ancestry(self.refs[branch]):
            if self.ts[a] <= ts_ms:
                return a
        return None

    def can_fast_forward(self, branch: str) -> bool:
        return self.refs[MAIN] in self.kept_ancestry(self.refs[branch])

    def cherrypick_delta(self, v: int) -> frozenset[int]:
        """File delta cherrypick re-applies: a squash-rewritten commit
        carries its FULL live state as adds; an untouched append carries
        just its own batch."""
        if v in self.squashed:
            return self.content[v]
        return frozenset({self.batch[v]})

    def expire(self, retain_last: int, *, now: int | None = None,
               cutoff: int | None = None) -> list[int]:
        """``now=None`` is the original driver's regime: grace always
        active, no timestamp-keeps. With ``now``/``cutoff`` the rules
        are the full spec: every ref-reachable commit newer than the
        cutoff is kept, and the in-flight grace only protects commits
        whose file is younger than GRACE_MS."""
        keep: set[int] = set()
        for head in self.refs.values():
            for i, a in enumerate(self.kept_ancestry(head)):
                if i < retain_last or (cutoff is not None
                                       and self.ts[a] >= cutoff):
                    keep.add(a)
        candidates = [v for v in self.live() if v not in keep]
        # in-flight grace: a RECENT commit above its own branch ref is
        # mid-protocol — protected (with now=None every commit counts
        # as recent, matching the original driver's timescale)
        protected = {
            v for v in candidates
            if (now is None or now - self.mtime[v] < GRACE_MS)
            and self.refs.get(self.branch_of[v]) is not None
            and self.refs[self.branch_of[v]] < v
        }
        # transitive: a surviving commit's non-expired ancestors must
        # survive with it, or the survivor dangles over deleted history
        for v in sorted(protected, reverse=True):
            for a in self.kept_ancestry(v):
                if a in candidates and a not in protected:
                    protected.add(a)
        expired_now = sorted(set(candidates) - protected - keep)
        # squash bookkeeping (drives cherrypick_delta only): a surviving
        # commit whose CURRENT file parent just expired is rewritten as
        # a full-state root. Current file parent = true parent unless
        # already squashed (then the walk pointer, not the file parent,
        # is what hops). Only KEPT commits are rewritten by the impl;
        # protected survivors keep their file untouched (their parents
        # are transitively protected, so no dangle).
        expired_set = set(expired_now)
        for v in sorted(keep):
            if v in self.squashed:
                continue
            p = self.parent[v]
            if p is not None and p in expired_set:
                self.squashed.add(v)
        self.expired.update(expired_now)
        return expired_now


def _read_content(t, version: int) -> frozenset[int]:
    return frozenset(r.k for r in t.read(version=version).collect())


def _check(t, m: Model, rng: random.Random, *, deep: bool) -> None:
    # refs + live version set
    assert t.branches() == m.refs
    live = m.live()
    assert t._versions() == live
    # THE lineage spec, for every live version
    for v in live:
        impl = [c.version for c in t._lineage(v)]
        assert impl == m.kept_ancestry(v), (
            f"lineage({v}): impl {impl} != model {m.kept_ancestry(v)}"
        )
    # commit metadata survives squash rewrites
    for v in rng.sample(live, min(4, len(live))):
        c = t._read_commit(v)
        assert c.timestamp_ms == m.ts[v]
        assert c.branch == m.branch_of[v]
    # TIMESTAMP AS OF at every commit ts (and just before the oldest)
    for branch in m.refs:
        ts_points = sorted({m.ts[v] for v in live}) or []
        for T in rng.sample(ts_points, min(4, len(ts_points))):
            want = m.snapshot_as_of(T, branch)
            if want is None:
                with pytest.raises(TableError):
                    t.snapshot_as_of(T, branch)
            else:
                assert t.snapshot_as_of(T, branch) == want, (
                    f"as_of({T}, {branch})"
                )
        oldest = min((m.ts[a] for a in m.kept_ancestry(m.refs[branch])),
                     default=None)
        if oldest is not None:
            with pytest.raises(TableError):
                t.snapshot_as_of(oldest - 1, branch)
    # expired versions are unreadable, typed (record_commit discards
    # reused version numbers from m.expired, so everything here is gone)
    gone = sorted(m.expired)
    for v in rng.sample(gone, min(2, len(gone))):
        with pytest.raises(TableError):
            t.read(version=v).collect()
    if deep:
        # content of sampled live versions — catches squash/GC bugs
        for v in rng.sample(live, min(3, len(live))):
            assert _read_content(t, v) == m.content[v], f"content({v})"


def _drive(spark, tmp_path, seed: int, n_ops: int = 45,
           clock: FakeClock | None = None) -> None:
    rng = random.Random(seed)
    cat = Catalog(spark, str(tmp_path / f"wh{seed}"))
    cat.create_database("db")
    next_batch = [0]

    def fresh_df():
        b = next_batch[0]
        next_batch[0] += 1
        return b, spark.createDataFrame([(b,)], "k int")

    b0, df0 = fresh_df()
    t = cat.create_table("db.m", df0)
    m = Model()
    c0 = t._read_commit(t.head())
    m.record_commit(c0.version, parent=None, ts=c0.timestamp_ms,
                    branch=MAIN, content=frozenset({b0}), batch=b0,
                    optype="append")
    m.refs = {MAIN: c0.version}

    last_was_expire = False
    for step in range(n_ops):
        if clock is not None:
            # advances straddle the 10-min grace window: 0 (same-ts
            # commits), seconds, a few minutes (commits stay in grace
            # across several ops) and 12 min (everything older ages out)
            clock.advance(rng.choice(
                [0, 5_000, 90_000, 4 * 60_000, 12 * 60_000]))
        branches = [b for b in m.refs if b != MAIN]
        ops = ["append_main"] * 4 + ["create_branch"] * 2 + ["expire"] * 2
        ops += ["compact", "rewrite_manifests"]
        if m.content[m.refs[MAIN]]:
            ops += ["delete"]
        if branches:
            ops += ["append_branch"] * 3 + ["fast_forward"] * 2 + [
                "drop_branch"]
        if len(m.live()) > 1:
            ops += ["rollback"] * 2 + ["overwrite"]
        appends = [v for v in m.live() if m.optype[v] == "append"]
        if appends:
            ops += ["cherrypick"]
        if last_was_expire and rng.random() < 0.4:
            op = "expire"  # bias: immediate re-expiry stresses stale hops
        else:
            op = rng.choice(ops)
        last_was_expire = op == "expire"

        if op in ("append_main", "append_branch"):
            branch = MAIN if op == "append_main" else rng.choice(branches)
            b, df = fresh_df()
            want_parent = m.refs[branch]
            c = t.append(df, branch=branch)
            assert c.parent == want_parent and c.branch == branch
            m.record_commit(
                c.version, parent=want_parent, ts=c.timestamp_ms,
                branch=branch,
                content=m.content[want_parent] | {b}, batch=b,
                optype="append")
            m.refs[branch] = c.version
        elif op == "overwrite":
            branch = rng.choice(list(m.refs))
            b, df = fresh_df()
            want_parent = m.refs[branch]
            c = t.overwrite(df, branch=branch)
            assert c.parent == want_parent
            m.record_commit(c.version, parent=want_parent,
                            ts=c.timestamp_ms, branch=branch,
                            content=frozenset({b}), batch=b,
                            optype="overwrite")
            m.refs[branch] = c.version
        elif op == "create_branch":
            name = f"b{step}"
            at = t.create_branch(name)
            assert at == m.refs[MAIN]
            m.refs[name] = m.refs[MAIN]
        elif op == "drop_branch":
            name = rng.choice(branches)
            t.drop_branch(name)
            del m.refs[name]
        elif op == "rollback":
            target = rng.choice(m.live())
            t.rollback_to_snapshot(target)
            m.refs[MAIN] = target
        elif op == "fast_forward":
            name = rng.choice(branches)
            if m.can_fast_forward(name):
                t.fast_forward(name)
                m.refs[MAIN] = m.refs[name]
            else:
                with pytest.raises(CommitConflictError):
                    t.fast_forward(name)
        elif op == "cherrypick":
            v = rng.choice(appends)
            want_parent = m.refs[MAIN]
            delta = m.cherrypick_delta(v)
            c = t.cherrypick_snapshot(v)
            assert c.parent == want_parent
            m.record_commit(
                c.version, parent=want_parent, ts=c.timestamp_ms,
                branch=MAIN, content=m.content[want_parent] | delta,
                batch=m.batch[v], optype="cherrypick")
            m.refs[MAIN] = c.version
        elif op == "compact":
            want_parent = m.refs[MAIN]
            c = t.compact()
            assert c.parent == want_parent
            m.record_commit(c.version, parent=want_parent,
                            ts=c.timestamp_ms, branch=MAIN,
                            content=m.content[want_parent], batch=-1,
                            optype="compact")
            m.refs[MAIN] = c.version
        elif op == "rewrite_manifests":
            head_before = m.refs[MAIN]
            assert t.rewrite_manifests() == head_before
            assert t.head() == head_before  # checkpoint, no commit
        elif op == "delete":
            b = rng.choice(sorted(m.content[m.refs[MAIN]]))
            want_parent = m.refs[MAIN]
            c = t.delete(f"k = {b}")
            assert c.parent == want_parent
            m.record_commit(c.version, parent=want_parent,
                            ts=c.timestamp_ms, branch=MAIN,
                            content=m.content[want_parent] - {b},
                            batch=-1, optype="delete")
            m.refs[MAIN] = c.version
        elif op == "expire":
            r = rng.randint(1, 3)
            if clock is None:
                want = m.expire(r)
                got = sorted(t.expire_snapshots(
                    older_than_ms=FAR_FUTURE_MS, retain_last=r))
            else:
                # mtime is the INPUT the grace rule reads: re-stamp
                # every live commit file to its model creation time
                # (squash rewrites move real mtimes; the harness owns
                # the clock, so it owns the mtimes too)
                for v in m.live():
                    os.utime(t._commit_path(v),
                             (m.mtime[v] / 1000,) * 2)
                cut = rng.choice([
                    FAR_FUTURE_MS,           # retain_last-only
                    None,                    # impl default: cutoff=now
                    clock.ms - rng.randint(0, 40) * 60_000,  # past window
                ])
                want = m.expire(
                    r, now=clock.ms,
                    cutoff=clock.ms if cut is None else cut)
                got = sorted(t.expire_snapshots(
                    older_than_ms=cut, retain_last=r))
            assert got == want, (
                f"step {step}: expire(retain_last={r}) impl {got} != "
                f"model {want}; refs={m.refs} "
                f"parents={ {v: m.parent[v] for v in sorted(m.parent)} } "
                f"branch_of={ {v: m.branch_of[v] for v in sorted(m.parent)} } "
                f"optype={ {v: m.optype[v] for v in sorted(m.parent)} } "
                f"already_expired={sorted(m.expired)}"
            )
        _check(t, m, rng, deep=(step % 9 == 0))

    _check(t, m, rng, deep=True)
    # final full content sweep over every live version
    for v in m.live():
        assert _read_content(t, v) == m.content[v], f"final content({v})"


@pytest.mark.parametrize("seed", [11, 23, 37, 59, 71])
def test_lineage_state_machine_matches_model(spark, tmp_path, seed):
    _drive(spark, tmp_path, seed)


@pytest.mark.parametrize("seed", [13, 29, 47, 83])
def test_lineage_state_machine_matches_model_wallclock(
        spark, tmp_path, seed, monkeypatch):
    """VERDICT r10 #3: the same random driver with an injected clock —
    older_than_ms cutoffs, timestamp-keeps and grace-window expiry all
    steer decisions. Mutation check (run during development, r11):
    inverting the grace comparison in expire_snapshots' _in_flight
    (``age >= grace_ms`` → ``age < grace_ms``) fails seeds 29 and 83
    (the ones whose sequences expire an aged-out above-ref commit),
    while the original five seeds — grace always active — cannot see
    that mutation."""
    clock = FakeClock(1_700_000_000_000 + seed * 1_000_000)
    monkeypatch.setattr(LakeTable, "_now_ms",
                        staticmethod(lambda: clock.ms))
    _drive(spark, tmp_path, seed, clock=clock)


def test_lineage_model_scripted_stale_hop_reexpiry(spark, tmp_path):
    """Deterministic companion to the random driver: the exact sequence
    the r9 stale-hop fix (88776d1) exists for, driven through the same
    Model + _check machinery. Squash v4 over a surviving below-branch
    ancestor (skp -> v1), drop that branch, re-expire so the skp target
    itself expires (the hop must be re-resolved, not left dangling),
    then expire a third time — the keep walk is STRICT, so a dangling
    skp left by the reverted code raises TableError here. Reverting the
    ``stale_hop`` branch of expire_snapshots makes this test fail."""
    rng = random.Random(0)
    cat = Catalog(spark, str(tmp_path / "whs"))
    cat.create_database("db")
    t = cat.create_table("db.s", spark.createDataFrame([(0,)], "k int"))
    m = Model()
    c0 = t._read_commit(t.head())
    m.record_commit(c0.version, parent=None, ts=c0.timestamp_ms,
                    branch=MAIN, content=frozenset({0}), batch=0,
                    optype="append")
    m.refs = {MAIN: c0.version}

    def ap(b):
        want_parent = m.refs[MAIN]
        c = t.append(spark.createDataFrame([(b,)], "k int"))
        m.record_commit(c.version, parent=want_parent, ts=c.timestamp_ms,
                        branch=MAIN,
                        content=m.content[want_parent] | {b}, batch=b,
                        optype="append")
        m.refs[MAIN] = c.version

    def exp(r):
        want = m.expire(r)
        got = sorted(t.expire_snapshots(
            older_than_ms=FAR_FUTURE_MS, retain_last=r))
        assert got == want
        _check(t, m, rng, deep=True)

    ap(1)
    t.create_branch("audit")
    m.refs["audit"] = m.refs[MAIN]
    ap(2), ap(3), ap(4)
    exp(1)          # squashes v4; skp -> v1 (the branch keeps v1 alive)
    assert [c.version for c in t._lineage(m.refs[MAIN])] == [4, 1]
    t.drop_branch("audit")
    del m.refs["audit"]
    exp(1)          # v1 expires; v4's stale skp must be re-resolved
    exp(1)          # STRICT keep walk — a dangling skp raises here


def test_wallclock_debris_sweep_honors_grace(spark, tmp_path, monkeypatch):
    """VERDICT r10 #3: the r10 debris sweep driven by the injected
    clock — a crashed writer's *.tmp is left alone while inside the
    grace window and removed once the clock ages it out. Runs even when
    nothing is eligible for expiry (the sweep precedes the early
    return)."""
    clock = FakeClock(1_700_000_000_000)
    monkeypatch.setattr(LakeTable, "_now_ms",
                        staticmethod(lambda: clock.ms))
    cat = Catalog(spark, str(tmp_path / "whd"))
    cat.create_database("db")
    t = cat.create_table("db.d", spark.createDataFrame([(0,)], "k int"))
    old_tmp = os.path.join(t.log_dir, "00000007.json.deadbeef.tmp")
    young_tmp = os.path.join(t.log_dir, ".cp.00000001.cafe.tmp")
    for p, age_ms in ((old_tmp, GRACE_MS + 60_000), (young_tmp, 120_000)):
        with open(p, "w") as fh:
            fh.write("{ torn")
        os.utime(p, ((clock.ms - age_ms) / 1000,) * 2)

    assert t.expire_snapshots(retain_last=1) == []  # nothing expirable
    assert not os.path.exists(old_tmp)      # aged out: swept
    assert os.path.exists(young_tmp)        # in grace: untouched

    clock.advance(GRACE_MS)                 # the young one ages out
    assert t.expire_snapshots(retain_last=1) == []
    assert not os.path.exists(young_tmp)


def test_wallclock_torn_inflight_ages_into_debris(
        spark, tmp_path, monkeypatch):
    """VERDICT r10 #3: the fail-closed GC pause driven end-to-end by the
    injected clock. A torn above-ref commit inside its grace pauses the
    WHOLE expiry (r10 behavior, previously only example-tested with real
    time); once the clock ages it past the grace window the same expiry
    proceeds, expires it as debris, and removes the unreadable file so
    later runs never re-trip on it."""
    clock = FakeClock(1_700_000_000_000)
    monkeypatch.setattr(LakeTable, "_now_ms",
                        staticmethod(lambda: clock.ms))
    cat = Catalog(spark, str(tmp_path / "wht"))
    cat.create_database("db")
    t = cat.create_table("db.t", spark.createDataFrame([(0,)], "k int"))
    for i in (1, 2, 3):
        clock.advance(30_000)
        t.append(spark.createDataFrame([(i,)], "k int"))
    t.create_branch("z", at=0)
    t.rollback_to_snapshot(2)       # v3 becomes an in-flight survivor
    p3 = t._commit_path(3)
    with open(p3, "w") as fh:
        fh.write("{ torn mid-dump")
    for v in (0, 1, 2, 3):          # harness owns the mtimes
        os.utime(t._commit_path(v), (clock.ms / 1000,) * 2)

    # inside grace: unvouchable chain -> pause, nothing deleted
    with pytest.warns(RuntimeWarning, match="paused"):
        assert t.expire_snapshots(
            older_than_ms=FAR_FUTURE_MS, retain_last=1) == []
    assert t._versions() == [0, 1, 2, 3]

    clock.advance(GRACE_MS + 1)     # v3 ages out of its grace window
    got = sorted(t.expire_snapshots(
        older_than_ms=FAR_FUTURE_MS, retain_last=1))
    # keep = {2 (main head), 0 (z head)}; v1 is BELOW its ref (not
    # in-flight) and v3 is aged-out debris: both expire
    assert got == [1, 3]
    assert t._versions() == [0, 2]
    assert not os.path.exists(p3)   # the torn file itself is gone
    # the table remains fully readable afterwards
    assert sorted(r.k for r in t.read().collect()) == [0, 1, 2]
