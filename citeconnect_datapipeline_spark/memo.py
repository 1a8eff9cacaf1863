"""Process-level materialized-intermediate cache.

Several query families consume the same expensive derived artifact —
the near-dup CC label table, the learned BPE merge table, the k-means
centroids, the classifier's cached training table. A production
deployment materializes these at ingest (exactly as
``build_ivf_index`` does on disk); recomputing them per consuming
query benchmarks an anti-pattern. This module is the ONE
implementation of the share-per-process pattern:

- keyed by ``SparkContext.applicationId`` (unique per context,
  including a stopped-and-restarted context in the same process —
  ``id(sc)`` is NOT safe, CPython reuses addresses after GC) plus a
  caller-supplied name and key parts;
- per-KEY locking: the first consumer builds while later consumers
  of the SAME key wait; unrelated keys build concurrently;
- entries live for the process (the lake is immutable per
  TESTDATA.md and every cached build is deterministic, so entries
  cannot go stale); ``invalidate()`` exists for tests.
"""

from __future__ import annotations

import threading
from typing import Any, Callable

_CACHE: dict = {}
_LOCKS: dict = {}
_GLOBAL = threading.Lock()


def shared_intermediate(
    spark, name: str, key_parts: tuple, build: Callable[[], Any]
) -> Any:
    """Return the cached artifact for (app, name, *key_parts),
    building it exactly once per process via ``build()``."""
    key = (spark.sparkContext.applicationId, name, *key_parts)
    if key in _CACHE:
        return _CACHE[key]
    with _GLOBAL:
        lock = _LOCKS.setdefault(key, threading.Lock())
    with lock:
        if key not in _CACHE:
            _CACHE[key] = build()
    return _CACHE[key]


def _unpersist_artifact(obj: Any) -> None:
    """Release executor storage held by an evicted artifact: cached
    DataFrames / localCheckpointed RDD-backed frames respond to
    ``unpersist``; tuples/lists of them are walked; everything else
    (driver-side plain data: merge tables, centroid arrays) has no
    pinned storage to free."""
    if isinstance(obj, (tuple, list)):
        for member in obj:
            _unpersist_artifact(member)
        return
    unpersist = getattr(obj, "unpersist", None)
    if callable(unpersist):
        try:
            unpersist()
        except Exception:
            pass  # a stopped SparkContext: storage is already gone
    # localCheckpoint-backed frames: DataFrame.unpersist only clears
    # CacheManager entries and is a no-op for the checkpoint's RDD
    # blocks — free those too by unpersisting the LogicalRDD's
    # backing RDD (r12 ADVICE #4), else invalidate() leaves the old
    # edge-list blocks pinned until the ContextCleaner finds them.
    jdf = getattr(obj, "_jdf", None)
    if jdf is not None:
        try:
            plan = jdf.queryExecution().analyzed()
            if plan.getClass().getSimpleName() == "LogicalRDD":
                plan.rdd().unpersist(False)
        except Exception:
            pass


def invalidate(name: str | None = None) -> None:
    """Drop cached entries (all, or those matching ``name``),
    unpersisting any DataFrame-typed artifacts so the eviction frees
    executor storage too, not just the dict slot (r4 ADVICE)."""
    with _GLOBAL:
        for k in [
            k for k in _CACHE if name is None or k[1] == name
        ]:
            _unpersist_artifact(_CACHE.pop(k, None))
            _LOCKS.pop(k, None)
