"""cache — persist-lifetime discipline for multi-consumer plans.

Any DataFrame referenced 2+ times in a plan (LSH signatures, shingles,
simhash chunks, curation stages) must be persisted or the whole subtree
recomputes per consumer; but bare ``.persist()`` without a matching
``unpersist`` leaks executor storage across pipelines. This module
gives operators one primitive:

- :func:`tracked_persist` — persist, and if a tracking scope is active,
  register the frame for release;
- :func:`persist_scope` — context manager collecting every
  tracked_persist made underneath it (across nested operator calls —
  it's a contextvar, no plumbing through signatures) and unpersisting
  them all on exit.

Outside any scope, tracked_persist behaves exactly like persist() —
callers that manage cache lifetime themselves (bench's clearCache, the
driver contract's memoized extraction) are unaffected.
"""

from __future__ import annotations

import contextvars
from contextlib import contextmanager

from pyspark.sql import DataFrame

_TRACK: contextvars.ContextVar[list | None] = contextvars.ContextVar(
    "mindocr_persist_track", default=None
)


def tracked_persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    lst = _TRACK.get()
    if lst is not None:
        lst.append(df)
    return df


@contextmanager
def persist_scope():
    """``with persist_scope():`` — every tracked_persist created inside
    (including by nested operator calls) is unpersisted on exit."""
    lst: list[DataFrame] = []
    token = _TRACK.set(lst)
    try:
        yield lst
    finally:
        _TRACK.reset(token)
        for df in lst:
            df.unpersist()


def release_local_checkpoint(df: DataFrame) -> None:
    """Free the executor RDD blocks behind a ``localCheckpoint()``-ed
    DataFrame NOW instead of waiting for the JVM ContextCleaner.
    localCheckpoint blocks live outside the SQL CacheManager, so
    neither ``unpersist()`` nor ``spark.catalog.clearCache()`` touches
    them. The frame is UNUSABLE afterwards — lineage was truncated, the
    blocks are the only copy — so only release frames that nothing
    downstream will read again. Idempotent; swallows API drift (worst
    case the blocks wait for garbage collection, the old behavior)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


class _CheckpointRelease:
    """Adapter so a localCheckpoint frame can sit in a persist_scope
    track list (scope exit calls .unpersist())."""

    def __init__(self, df: DataFrame):
        self._df = df

    def unpersist(self) -> None:
        release_local_checkpoint(self._df)


def tracked_local_checkpoint(df: DataFrame) -> DataFrame:
    """``localCheckpoint()`` + register the blocks for release when the
    ambient :func:`persist_scope` exits. ONLY for frames consumed
    strictly inside the scope (release destroys the data — see
    :func:`release_local_checkpoint`); a frame returned to the caller
    must use a bare ``localCheckpoint()`` and rely on the
    ContextCleaner."""
    out = df.localCheckpoint()
    lst = _TRACK.get()
    if lst is not None:
        lst.append(_CheckpointRelease(out))
    return out


@contextmanager
def _collect_into(track: list):
    """Internal: route tracked_persists into a caller-owned list without
    unpersisting on exit (the caller owns release)."""
    token = _TRACK.set(track)
    try:
        yield
    finally:
        _TRACK.reset(token)
