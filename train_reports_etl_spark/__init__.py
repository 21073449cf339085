"""train_reports_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference ETL
(`jfitam/train-reports-etl`, surveyed in SURVEY.md) as an idiomatic
PySpark engine: lazy DataFrame pipelines, Catalyst-optimized, designed
for multi-executor scale (broadcast joins for small dims, dynamic
partition overwrite for idempotent loads, window-based dedup).

Package layout:
- ``session``    — SparkSession builder with pinned semantics (UTC, ANSI off).
- ``functions``  — scalar layer: coercing casts, datetime, string cleaning.
- ``operators``  — relational building blocks: null-split, keep-last dedup,
                   gaps-and-islands, guarded broadcast joins, unions.
- ``plans``      — full report pipelines (train_list / bpd / occupancy).
- ``sources``    — header-sniffing readers, parquet/csv/excel ingestion.
- ``sinks``      — quarantine, idempotent partitioned writer, audit, JDBC.
- ``streaming``  — event-time windows (tumbling/sliding/session), watermarks.
- ``extensions`` — training-data-pipeline ops: dedup (exact/minhash/simhash/
                   jaccard/embedding), similarity search, text analysis,
                   multimodal column plumbing.
"""

from train_reports_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
