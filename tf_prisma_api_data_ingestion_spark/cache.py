"""Bounded lifetime for persist() barriers.

Several operators persist intermediates as LOAD-BEARING recompute
barriers (projection collapse would otherwise re-run shingling /
signature work per consumer — measured 6.5s -> 47s without the barrier,
SCALING.md). The frames are consumed lazily by the CALLER's action, so
the operator itself can never unpersist safely; without cleanup,
repeated invocations (bench loops, selfcheck sweeps, long-lived
sessions) accumulate cache entries until executor storage churns under
eviction pressure.

``tracked_persist`` registers every such frame in a process-local list;
harnesses call ``release_all()`` after the action that consumed the
query (bench.py per query, selfcheck per key, conftest per test module)
to drop the cache without touching operator logic. Entries are held
weakly-by-intent: releasing twice is a no-op, and releasing frames whose
session is already stopped is swallowed.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame,
                    level: StorageLevel | None = None) -> DataFrame:
    """persist() + register for later ``release_all()``."""
    out = df.persist(level) if level is not None else df.persist()
    _TRACKED.append(out)
    return out


def release_all(blocking: bool = False) -> int:
    """Unpersist every tracked frame; returns how many were released."""
    return _release_from(0, blocking)


def _release_from(mark: int, blocking: bool) -> int:
    n = 0
    while len(_TRACKED) > mark:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n


@contextmanager
def scope(blocking: bool = False):
    """Release every frame tracked_persist()ed inside the block on exit —
    the per-query hygiene hook for library callers:

        with cache.scope():
            result = minhash_lsh_dedup(docs).collect()

    Frames tracked BEFORE the scope opened are untouched, so scopes nest
    (inner scopes release only their own persists)."""
    mark = len(_TRACKED)
    try:
        yield
    finally:
        _release_from(mark, blocking)
