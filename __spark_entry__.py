"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` maps
every implemented SURVEY.md §2 operator to a (spark, sf_dir) →
DataFrame callable; ``oracle_sql()`` gives the DuckDB oracle for each
SQL-expressible query. Implementations live in
``train_reports_etl_spark/plans/`` and ``.../extensions/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Importing the query modules populates the registry.
from train_reports_etl_spark.plans import registry  # noqa: E402
from train_reports_etl_spark.plans import star_queries  # noqa: E402,F401

# Extension queries (dedup / similarity / text / windows / corpus /
# graph / sketches). Import failures must be LOUD: a silent except here
# would drop ~60 queries from the driver's registry and shrink the
# correctness gate without anyone noticing.
from train_reports_etl_spark.extensions import ext_queries  # noqa: E402,F401
from train_reports_etl_spark.extensions import eval_queries  # noqa: E402,F401

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["flagship_latest_order"](spark, SF0001)


def _verification_priority(here: str | None = None) -> dict[str, tuple[int, int]]:
    """Sort key per query from the driver's recorded correctness rows.

    The driver's correctness gate records roughly the first 50 entries
    of ``queries()`` in iteration order, so we surface the riskiest
    queries first, in three tiers:

    1. never driver-checked at all (no recorded row in any round),
    2. last driver attempt FAILED (a fix has shipped but the driver has
       never re-confirmed it — e.g. ``w4_rolling_hour_window`` after its
       r03 NTZ crash),
    3. green, stalest round first.

    A row counts as green when its value hash matched, or — for
    queries that declare no SQL oracle — when the rows-only check
    completed without error. Reads the committed ``CORRECTNESS_r*.json``
    artifacts next to this file; any read failure degrades to registry
    insertion order.
    """
    import glob
    import json
    import re

    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    last_green: dict[str, int] = {}
    last_attempt: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, rec in rows.items():
            if not isinstance(rec, dict):
                continue
            last_attempt[name] = max(last_attempt.get(name, -1), rnd)
            strong_ok = rec.get("hash_match") and rec.get("err") is None
            rows_only_ok = (
                rec.get("err") == "no_oracle" and rec.get("spark_rows") is not None
            )
            if strong_ok or rows_only_ok:
                last_green[name] = max(last_green.get(name, -1), rnd)
    keys: dict[str, tuple[int, int]] = {}
    for name, attempted in last_attempt.items():
        green = last_green.get(name, -1)
        if attempted > green:
            keys[name] = (1, green)  # last attempt failed: right after never-checked
        else:
            keys[name] = (2, green)  # green: stalest first
    return keys


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered least-recently-driver-verified first (see
    :func:`_verification_priority`) so the driver's ~50-query
    correctness window always covers the stalest — riskiest — queries.
    """
    try:
        prio = _verification_priority()
    except Exception:  # noqa: BLE001 — ordering is best-effort, never fatal
        return dict(registry.QUERIES)
    never = (0, -1)  # queries with no driver row ever lead the window
    order = list(registry.QUERIES)
    order.sort(key=lambda n: prio.get(n, never))  # stable: ties keep registry order
    return {name: registry.QUERIES[name] for name in order}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted → rows-only check)."""
    return dict(registry.ORACLES)
