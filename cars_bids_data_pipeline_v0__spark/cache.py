"""Build-scoped persist tracking — deterministic cache release.

Query builders legitimately ``persist()`` subframes that feed two or more
downstream branches (a shingle table reused by candidate generation AND
exact verification, a token table feeding marginals and totals).  The
result DataFrame is returned lazily, so the builder itself can never
unpersist — the blocks must outlive the build call and die only after the
consumer has materialized the result.

The reference has no equivalent (each pandas step owns its memory and
Python GC reclaims it); on Spark, leaked storage blocks accumulate across
a 210-query sweep and evict each other at random, which is both a memory
hazard and a benchmark distorter.

Contract:

* builders/operators call :func:`track_persist` instead of raw
  ``DataFrame.persist()``;
* the consumer (harness, test, application) calls
  :func:`release_build_caches` once it has materialized whatever it needed
  — only the tracked frames are unpersisted, so user-owned caches in the
  same session are untouched (unlike ``spark.catalog.clearCache()``,
  which nukes everything).

Thread-safety: tracking is a plain list guarded by a lock — concurrent
builds in one session release collectively, which matches how the
harnesses drive the registry (sequentially).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_TRACKED: list[DataFrame] = []


def track_persist(df: DataFrame, level=None) -> DataFrame:
    """``df.persist()`` that registers the frame for collective release.

    Returns the same DataFrame so call sites stay chainable:
    ``sh = track_persist(shingle_table(...))``.
    """
    if level is None:
        df = df.persist()
    else:
        df = df.persist(level)
    with _LOCK:
        _TRACKED.append(df)
    return df


def track(df: DataFrame) -> DataFrame:
    """Register an ALREADY-persisted frame for collective release.

    For fluent chains that end in ``.persist()`` — ``track(df)`` avoids
    the double-persist warning ``track_persist`` would log there.
    """
    with _LOCK:
        _TRACKED.append(df)
    return df


def release_build_caches() -> int:
    """Unpersist every tracked frame; returns how many were released.

    ``blocking=False`` (the default) — release is an async metadata drop;
    the next build must not wait on executor block deletion.
    """
    with _LOCK:
        frames, _TRACKED[:] = _TRACKED[:], []
    n = 0
    for df in frames:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n


def tracked_count() -> int:
    with _LOCK:
        return len(_TRACKED)
