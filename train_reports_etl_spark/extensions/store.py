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

from collections.abc import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, DataFrame] = {}


def shared(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[], DataFrame],
    *params: object,
) -> DataFrame:
    """Return the materialized frame for ``(sf_dir, name, params)``,
    building and persisting it on first use in this application."""
    key = (spark.sparkContext.applicationId, sf_dir, name, *params)
    df = _CACHE.get(key)
    if df is None:
        df = build().persist(StorageLevel.MEMORY_AND_DISK)
        _CACHE[key] = df
    return df


def clear() -> None:
    """Unpersist and forget everything (test isolation hook)."""
    for df in _CACHE.values():
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
    _CACHE.clear()
