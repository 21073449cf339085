"""Query plans: the operator-inventory query registry and the three
report pipelines re-expressed Spark-first."""

from train_reports_etl_spark.plans.registry import QUERIES, ORACLES, query

__all__ = ["QUERIES", "ORACLES", "query"]
