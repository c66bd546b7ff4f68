"""Bounded persist cache for skew-guard counts.

Pair-generating ops (minhash_lsh_pairs, fingerprint_overlap_pairs) run
a COUNT action over their grouped buckets to log how many oversized
buckets the max_bucket guard drops.  Without a persist, that action
re-evaluates the whole upstream pipeline (shingle→minhash aggregation /
winnowing window) once for the log line and again for the real pair
explosion.  This helper persists the grouped DataFrame and keeps at
most ONE live cache entry per guard site — each call releases the
previous call's, so repeated bench/validator invocations don't
accumulate cached tables for the session lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_CACHES: dict = {}


def guard_persist(site: str, df: DataFrame) -> DataFrame:
    """Persist `df`, releasing the previous persist for `site`."""
    prev = _CACHES.get(site)
    if prev is not None:
        try:
            prev.unpersist(blocking=False)
        except Exception:
            pass
    df = df.persist()
    _CACHES[site] = df
    return df
