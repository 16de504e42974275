"""Session-scoped registry for the library's internal ``persist()``
calls, so long-lived sessions can release them.

Several corpus-scale operators persist a small intermediate frame that
multiple branches of one plan re-read (LSH group tables in
:mod:`.dedup`, the lane table in the frame/window rollup of
:mod:`.multimodal`).  Spark's ``CacheManager`` holds those entries
until an explicit ``unpersist`` — they are NOT garbage-collected with
the Python ``DataFrame`` — so a long-lived session running many corpus
passes accumulates cached blocks until the storage pool thrashes
(measured as pass-to-pass bench spikes before ``bench.py`` started
clearing the cache between queries).

Library callers get the same cleanup here: every internal persist is
routed through :func:`tracked_persist`, and :func:`release_caches`
unpersists everything still registered.  Call it between corpus
passes::

    from pincette_json_streams_spark.functions import release_caches
    pairs = video_near_pairs(videos).collect()
    release_caches()          # drop the lane-table cache blocks

``unpersist`` is always correctness-safe — a released frame that is
re-used simply recomputes.  ``spark.catalog.clearCache()`` remains the
blunt alternative (it also drops caches the *caller* created).
"""

from __future__ import annotations

import threading

_LOCK = threading.Lock()
# STRONG references, deliberately: the CacheManager entry outlives the
# Python DataFrame (that is the leak), so a weakref would lose the
# unpersist handle exactly when it is needed.  The held object is a
# thin wrapper over a JVM Dataset handle — bytes, not cached blocks.
_PERSISTED: list = []


def tracked_persist(df):
    """``df.persist()`` + register the frame for :func:`release_caches`."""
    df = df.persist()
    with _LOCK:
        _PERSISTED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every internally-persisted frame registered so far.

    Returns the number of frames unpersisted.  Safe to call at any
    time: plans that still reference a released frame recompute it.
    """
    with _LOCK:
        frames, _PERSISTED[:] = _PERSISTED[:], []
    released = 0
    for df in frames:
        try:
            df.unpersist()
            released += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return released
