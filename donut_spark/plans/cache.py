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
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame

__all__ = ["attach_persisted", "release_persisted"]

_ATTR = "_donut_persisted"


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
