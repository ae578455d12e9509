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


@contextmanager
def _collect_into(track: list):
    """Internal: route tracked_persists into a caller-owned list without
    unpersisting on exit (the caller owns release)."""
    token = _TRACK.set(track)
    try:
        yield
    finally:
        _TRACK.reset(token)
