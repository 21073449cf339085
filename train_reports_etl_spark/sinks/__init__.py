"""Output sinks: quarantine side-outputs, idempotent partitioned table
writes, audit trail, and an optional Postgres COPY path."""

from train_reports_etl_spark.sinks.audit import append_audit
from train_reports_etl_spark.sinks.partitioned import idempotent_overwrite
from train_reports_etl_spark.sinks.quarantine import write_quarantine

__all__ = ["append_audit", "idempotent_overwrite", "write_quarantine"]
