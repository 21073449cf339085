"""Materialized shared intermediates — the "signature store".

A 100 TB dedup pipeline does not recompute document signatures
(winnow fingerprints, MinHash signatures, SimHash fingerprints) for
every consumer: it materializes them ONCE — a signature table written
next to the corpus — and every downstream job (near-dup pair
generation, cluster assignment, keep-best selection, graph BFS,
triangle counting, edit-distance verification) reads that table.
Recomputing a signature set is a full corpus scan + tokenize + hash;
reading it back is a scan of (id, hash) rows, orders of magnitude
smaller than the documents themselves.

This module models that design in-process with ``persist()``: the
first consumer computes and caches the frame; later consumers — and
self-join branches WITHIN one query, which Spark does not
common-subexpression-eliminate across a join — read the cache. On a
real cluster the same call sites would read/write a parquet signature
table; the store keys and builder closures translate directly.

Keys include the SparkContext ``applicationId`` and the ``sf_dir`` so
a restarted session or a different scale factor can never observe a
stale frame. Storage level MEMORY_AND_DISK: eviction degrades to
recompute, never to wrong results. Cached frames are signature-sized
(one short row per document / per fingerprint), never document bodies.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession

# app_id -> {(sf_dir, name, *params) -> DataFrame}. Keyed by application
# so entries for ended Spark applications can be dropped wholesale
# instead of accumulating for the process lifetime.
_CACHE: dict[str, dict[tuple, DataFrame]] = {}
_LOCK = threading.Lock()


def _app_alive(probe: DataFrame | None) -> bool:
    """Whether the application owning ``probe`` is still running,
    probed through that frame's session. FAIL-OPEN: a probe exception
    is treated as ALIVE — a transient py4j hiccup must not delete a
    live application's only handles to its persisted frames (which
    would leak the storage until app exit). A genuinely stopped
    local-mode context answers ``isStopped() == True`` without
    raising, so dead apps still evict on the next successful probe.
    Only an EMPTY cache (``probe is None``) is unconditionally dead
    (nothing to keep). The caller snapshots the probe frame UNDER the
    lock: iterating another live application's cache dict here raced
    concurrent shared()/clear() mutations of that dict
    (RuntimeError: dictionary changed size during iteration)."""
    if probe is None:
        return False
    try:
        return not probe.sparkSession.sparkContext._jsc.sc().isStopped()
    except Exception:  # noqa: BLE001 — transient: keep, retry later
        return True


def shared(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[], DataFrame],
    *params: object,
) -> DataFrame:
    """Return the materialized frame for ``(sf_dir, name, params)``,
    building and persisting it on first use in this application."""
    app_id = spark.sparkContext.applicationId
    key = (sf_dir, name, *params)
    # Evict DEAD applications only: their DataFrame handles are
    # unusable (the backing context is gone) and would otherwise leak.
    # Another application that is still running keeps its entries — the
    # same guarantee clear(spark) documents. Probed OUTSIDE the lock:
    # the liveness check is a py4j round-trip and must not serialize
    # every cache reader behind it.
    with _LOCK:
        others = [
            (a, next(iter(c.values()), None))
            for a, c in _CACHE.items()
            if a != app_id
        ]
    dead = [a for a, probe in others if not _app_alive(probe)]
    with _LOCK:
        for a in dead:
            _CACHE.pop(a, None)
        app_cache = _CACHE.setdefault(app_id, {})
        df = app_cache.get(key)
        if df is not None:
            return df
    # Build outside the lock — builders run Spark jobs and may be slow.
    # A concurrent first-use race can double-build; the loser unpersists
    # its copy so exactly one persisted frame survives.
    df = build().persist(StorageLevel.MEMORY_AND_DISK)
    with _LOCK:
        winner = _CACHE.setdefault(app_id, {}).setdefault(key, df)
    if winner is not df:
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
    return winner


def clear(spark: SparkSession | None = None) -> None:
    """Unpersist and forget cached frames (test isolation hook).

    With ``spark`` given, only that application's entries are dropped —
    other live sessions' persisted frames are left alone. Without it,
    everything goes (end-of-process cleanup).
    """
    with _LOCK:
        if spark is not None:
            apps = {spark.sparkContext.applicationId: _CACHE.pop(
                spark.sparkContext.applicationId, {})}
        else:
            apps = dict(_CACHE)
            _CACHE.clear()
    for app_cache in apps.values():
        for df in app_cache.values():
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001 — session may already be gone
                pass
