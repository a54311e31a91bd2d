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

from typing import Iterable

from pyspark.sql import DataFrame

__all__ = [
    "attach_persisted",
    "release_persisted",
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


def release_persisted(df: DataFrame, blocking: bool = False) -> int:
    """Unpersist every intermediate an operator attached to ``df``;
    returns how many were released. Call AFTER consuming ``df`` —
    releasing first would recompute the self-join sides it de-duplicated."""
    frames = list(getattr(df, _ATTR, ()))
    for frame in frames:
        frame.unpersist(blocking)
    setattr(df, _ATTR, [])
    return len(frames)
