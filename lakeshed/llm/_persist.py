"""Scoped tracking for the LSH signature persists (round-2 ADVICE).

``minhash_lsh_pairs`` / ``simhash_pairs`` / ``ann_pairs_lsh`` persist a
narrow signature frame so the banded self-join and verify legs reuse one
signature computation. Those frames are read by the LAZY DataFrame the
function returns, so the function itself cannot unpersist them — but
never unpersisting leaks storage blocks for the life of the executors
(disk blocks are not evicted by memory pressure).

The contract here: every such persist registers under the owning
function's name; callers that invoke pair functions repeatedly (bench
loops, notebook sessions, multi-corpus pipelines) call
:func:`release_persisted` once the returned frame has been materialized.
``bench.py`` does this between queries. Identical re-invocations are
cheap either way — Spark's CacheManager dedupes cache entries by logical
plan, so re-persisting the same plan reuses the existing blocks.

At 100 TB the right call is different: materialize the signature frame
to a table (``dedup.build_signature_table``) instead of executor memory,
and let incremental dedup read it back.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_LIVE: dict[str, list[DataFrame]] = {}


def scoped_persist(
    scope: str,
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Persist ``df`` and register it for later :func:`release_persisted`."""
    df.persist(level)
    _LIVE.setdefault(scope, []).append(df)
    return df


def release_persisted(scope: str | None = None) -> None:
    """Unpersist every tracked frame (of one scope, or all).

    Non-blocking: blocks are dropped asynchronously. A caller that still
    holds a DataFrame returned before the release can keep using it —
    the plan recomputes instead of reading cache (correct, just colder).
    """
    scopes = [scope] if scope is not None else list(_LIVE)
    for s in scopes:
        for df in _LIVE.pop(s, []):
            try:
                df.unpersist(blocking=False)
            except Exception:
                pass  # session already stopped — nothing to release
