"""Scoped persist: tie cached self-join inputs to the result plan's lifetime.

The dedup/similarity pair operators persist() the shared subtree of a
self-join (computing signatures once, not twice — measured 10x on jaccard).
A bare persist() leaks: every invocation leaves cached blocks behind for the
session's lifetime, so a long-lived driver calling these operators repeatedly
accumulates storage until eviction pressure hurts everything else.

`release_on_gc` scopes the cache to the RETURNED plan instead: while the
caller holds the result DataFrame the cache stays warm (re-execution reuses
it); once the result is garbage-collected the inputs unpersist automatically.
Callers that want the blocks back sooner call `result.release_cached_inputs()`
(idempotent — the finalizer runs at most once). Unpersisting never breaks the
plan: a later re-execution just recomputes instead of reading cache.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame


def _unpersist_all(cached: list[DataFrame]) -> None:
    for d in cached:
        try:
            d.unpersist(blocking=True)
        except Exception:
            pass  # session stopped / JVM gone — nothing left to free


def release_on_gc(result: DataFrame, *cached: DataFrame) -> DataFrame:
    fin = weakref.finalize(result, _unpersist_all, list(cached))
    fin.atexit = False  # at interpreter shutdown the JVM may already be gone
    result.release_cached_inputs = fin
    return result
