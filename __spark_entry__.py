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

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["flagship_latest_order"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted → rows-only check)."""
    return dict(registry.ORACLES)
