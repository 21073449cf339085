"""Relational operator building blocks (SURVEY.md §2.2–§2.7)."""

from train_reports_etl_spark.operators.dedup import keep_last_dedup
from train_reports_etl_spark.operators.islands import consecutive_date_ranges
from train_reports_etl_spark.operators.joins import (
    join_aggregated,
    lookup_join,
    missing_keys,
    semi_join,
)
from train_reports_etl_spark.operators.quality import check_table
from train_reports_etl_spark.operators.split import null_split, prune_columns
from train_reports_etl_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
    validity_intervals,
)
from train_reports_etl_spark.operators.union import union_all

__all__ = [
    "keep_last_dedup",
    "consecutive_date_ranges",
    "lookup_join",
    "missing_keys",
    "join_aggregated",
    "semi_join",
    "null_split",
    "prune_columns",
    "union_all",
    "check_table",
    "asof_join",
    "range_join_bucketed",
    "validity_intervals",
]
