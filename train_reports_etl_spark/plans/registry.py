"""Registry of declared queries and their DuckDB oracle SQL.

Every operator claimed in SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible)
an ANSI-SQL oracle string the driver runs in DuckDB over the same
parquet. Column names are aliased identically on both sides — the
driver's compare hashes values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Throughput twins that are NOT part of the driver's correctness gate:
# same pipeline as an oracle-checked query but with a cheaper,
# engine-specific hash (e.g. xxhash64, which DuckDB lacks). bench.py
# times these alongside QUERIES so the production path stays measured.
BENCH_ONLY: dict[str, QueryFn] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks a non-SQL-expressible op
    (driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def bench_query(name: str) -> Callable[[QueryFn], QueryFn]:
    """Register a bench-only throughput twin (excluded from the
    correctness gate; an oracle-checked twin must cover its logic)."""

    def deco(fn: QueryFn) -> QueryFn:
        BENCH_ONLY[name] = fn
        return fn

    return deco
