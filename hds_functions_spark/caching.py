"""Session-scoped tracking of operator-internal persisted DataFrames.

Several operators persist an intermediate that multiple plan branches
consume (MinHash signatures, hyperplane signatures, the range-partitioned
frame behind dense ID assignment). The handle is internal to the operator,
so without tracking, every call leaks one persisted table for the life of
the session — harmless in a one-query job, but a long-lived session (a
bench suite, a notebook, a driver loop) accumulates them until executor
storage memory is all dead cache.

Operators call :func:`tracked_persist` instead of ``df.persist()``; any
point that knows the downstream plans have been materialised (a bench
harness after its no-op write, a pipeline between stages) calls
:func:`release_operator_caches`. Releasing is always SAFE — an unpersisted
DataFrame recomputes on next use — it only costs recompute time if called
mid-consumption.

The session-shared clusters table (``registry_ext._shared_clusters``) is
deliberately NOT tracked here: it is a cross-query cache with its own
keyed lifecycle and explicit ``reset_shared_clusters`` API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

__all__ = ["tracked_persist", "release_operator_caches", "tracked_count"]

_TRACKED: list[DataFrame] = []


def tracked_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """``df.persist(level)`` + registration for later bulk release.

    A frame that is ALREADY persisted is returned unchanged and NOT
    tracked: its lifecycle belongs to whoever persisted it first.
    Re-persisting would be a no-op, but tracking the handle would hand
    :func:`release_operator_caches` the power to unpersist a
    cross-query shared cache (e.g. the session-shared winnowing
    fingerprint table) behind its owner's back — the owner's cache
    dict still holds the handle, so every later consumer silently
    recomputes the upstream on EVERY scan. That was the r10
    winnowing-family bench anomaly: the shared fps table was tracked
    via its first consumer, released between bench repeats, and
    'warm' runs then re-ran the whole fingerprint extraction 2-3x per
    query (root-caused r11; see BASELINE.md)."""
    if df.storageLevel != StorageLevel.NONE:
        return df  # caller-managed persistence — do not adopt ownership
    df = df.persist(level)
    _TRACKED.append(df)
    return df


def tracked_count() -> int:
    """Number of currently-tracked (not yet released) persisted frames."""
    return len(_TRACKED)


def release_operator_caches() -> int:
    """Unpersist every tracked frame (non-blocking); returns how many."""
    n = 0
    for df in _TRACKED:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    _TRACKED.clear()
    return n
