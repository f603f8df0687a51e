"""Session-scoped DataFrame memoization for the query packs.

A correctness or benchmark run executes dozens of queries back-to-back
over the same synthetic corpus; the base frames (extraction results,
facts, exploded side tables) are persisted once per (SparkSession,
scale-factor) and shared. Entries belonging to OTHER sessions are evicted
on access (their persisted blocks die with their session; dropping the
references lets a long-lived test process that restarts SparkSessions
reclaim driver memory instead of accumulating dead handles).
"""

from __future__ import annotations

from collections.abc import Callable


def get_or_persist(cache: dict, spark, key, builder: Callable):
    """``cache[(app_id, *key)]`` with lazy build + persist; evicts entries
    from dead sessions first."""
    app = spark.sparkContext.applicationId
    for k in [k for k in cache if k[0] != app]:
        df = cache.pop(k)
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — its session is gone; nothing to free
            pass
    full = (app, *key) if isinstance(key, tuple) else (app, key)
    df = cache.get(full)
    if df is None:
        df = builder().persist()
        cache[full] = df
    return df
