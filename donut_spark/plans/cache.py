"""Cache-handle contract for operators that persist intermediates.

Several pair-discovery operators (``dedup.minhash_lsh_pairs``,
``dedup.simhash_pairs``, ``similarity.srp_candidate_pairs`` and its
consumers) persist their banded signature frame so the self-join doesn't
re-run the signature UDF on both sides (measured 2 ArrowEvalPython nodes
→ 1). The cache must OUTLIVE the call — the returned DataFrame is lazy,
so unpersisting before the caller consumes it would silently recompute —
which means a long-lived session calling these operators repeatedly
accumulates cached blocks until eviction pressure.

The contract: each such operator attaches its persisted intermediates to
the returned DataFrame (:func:`attach_persisted`); after the caller has
fully consumed the result (collected, written, or persisted it further),
:func:`release_persisted` frees the blocks. Not calling it is safe —
MEMORY_AND_DISK blocks are evicted LRU — just not free.

HAND-OFF DISCIPLINE (important): the handle rides as a Python attribute
on the *returned DataFrame object*, so any caller-side transformation
(``result.filter(...)``, ``select``, ``repartition``) produces a NEW
DataFrame without the handle. Keep a reference to the operator's return
value and call ``release_persisted`` on THAT object — releasing the
transformed frame is a silent no-op and the blocks linger until LRU
eviction. (``submit/run_dedup.py`` shows the intended shape: consume →
release on the original handle-bearing frame.)

Two handle kinds ride the attribute:

* persisted DataFrames (``df.persist()``) — releasing early is merely
  slow (the plan recomputes);
* :class:`CheckpointBlocksHandle` (``localCheckpoint`` block ids, from
  ``dedup.connected_components``) — releasing early is an ERROR on next
  use: checkpoint blocks are the only copy, there is no lineage left to
  recompute from. Release strictly after the result is written/collected.
"""

from __future__ import annotations

from typing import Iterable, NamedTuple

from pyspark.sql import DataFrame

__all__ = [
    "attach_persisted",
    "release_persisted",
    "capture",
    "PersistedResult",
    "CheckpointBlocksHandle",
    "persistent_rdd_ids",
]

_ATTR = "_donut_persisted"


class CheckpointBlocksHandle:
    """Releasable handle over ``localCheckpoint`` storage blocks, by RDD
    id (the DataFrame API never exposes the checkpointed RDD itself).
    Duck-types ``unpersist(blocking)`` so :func:`release_persisted`
    treats it like any persisted frame. Unpersisting is terminal: a
    checkpointed plan has no lineage, so the owning DataFrame must be
    fully consumed first."""

    def __init__(self, sc, rdd_ids: Iterable[int]):
        self._sc = sc
        self._ids = [int(i) for i in rdd_ids]

    def unpersist(self, blocking: bool = False) -> None:
        jmap = self._sc._jsc.getPersistentRDDs()
        for rid in self._ids:
            jrdd = jmap.get(rid)
            if jrdd is not None:
                jrdd.unpersist(blocking)
        self._ids = []


def persistent_rdd_ids(sc) -> set:
    """Ids of currently persisted RDDs (cached frames + localCheckpoint
    blocks) — the leak-audit primitive ``submit`` jobs assert on."""
    return {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}


def attach_persisted(result: DataFrame, frames: Iterable[DataFrame]) -> DataFrame:
    """Record ``frames`` (persisted intermediates) on ``result`` so the
    caller can release them once the result is consumed."""
    setattr(result, _ATTR, list(getattr(result, _ATTR, ())) + list(frames))
    return result


class PersistedResult(NamedTuple):
    """Misuse-proof hand-off for operator results with persisted
    intermediates (round-4 verdict item 3): the handles live in the
    tuple, not on the DataFrame object, so caller-side transformations
    (``res.frame.filter(...)``) can't shed them — ``res.release()``
    always frees exactly the operator's blocks no matter what the
    caller derived from ``frame``. Same consumption rule as
    :func:`release_persisted`: release strictly AFTER the result is
    written/collected (checkpoint handles have no lineage to recompute
    from)."""

    frame: DataFrame
    handles: tuple

    def release(self, blocking: bool = False) -> int:
        """Unpersist every handle; returns how many were released.
        Idempotent per handle kind (re-releasing a released frame is a
        JVM no-op; :class:`CheckpointBlocksHandle` empties its id
        list)."""
        for h in self.handles:
            h.unpersist(blocking)
        return len(self.handles)


def capture(df: DataFrame) -> PersistedResult:
    """Convert an attribute-style operator return (``attach_persisted``)
    into a :class:`PersistedResult`, popping the handles off the frame so
    exactly one owner exists. New call sites should wrap every
    handle-bearing operator call::

        res = capture(minhash_lsh_pairs(...))
        res.frame.filter(...).write.parquet(out)   # transform freely
        res.release()                              # after consumption

    The attribute hand-off stays for existing call sites (back-compat);
    this wrapper is the shape that makes the silent-shed failure mode
    (plans/cache.py HAND-OFF DISCIPLINE note) impossible."""
    handles = tuple(getattr(df, _ATTR, ()))
    if hasattr(df, _ATTR):
        setattr(df, _ATTR, [])
    return PersistedResult(frame=df, handles=handles)


def release_persisted(df: DataFrame, blocking: bool = False) -> int:
    """Unpersist every intermediate an operator attached to ``df``;
    returns how many were released. Call AFTER consuming ``df`` —
    releasing first would recompute the self-join sides it de-duplicated."""
    frames = list(getattr(df, _ATTR, ()))
    for frame in frames:
        frame.unpersist(blocking)
    setattr(df, _ATTR, [])
    return len(frames)
