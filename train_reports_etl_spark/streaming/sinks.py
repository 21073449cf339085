"""Streaming → table sinks (E5/S11 bridge): land a stream in the
date-partitioned parquet table with exactly-once *effect*.

No reference citation — streaming scope beyond SURVEY.md §2.10; the
batch half IS the reference's idempotent load (S11,
sinks/partitioned.py).

Structured Streaming's file sink is append-only — replaying a failed
micro-batch duplicates rows. ``foreachBatch`` + dynamic partition
overwrite gives the upsert the reference's DELETE+COPY wanted:

- each micro-batch overwrites exactly the partitions it touches, so
  **replaying batch N is a no-op** (same input → same partitions →
  same bytes) — at-least-once delivery collapses to exactly-once
  table state whenever batches are partition-aligned (the normal case
  for event-time-partitioned loads with a watermark: late data lands
  in a batch that rewrites that day's partition from state anyway);
- the checkpoint tracks the last committed batch id, so a restart
  resumes, re-runs at most the one uncommitted batch, and the
  overwrite absorbs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from train_reports_etl_spark.sinks.partitioned import idempotent_overwrite

__all__ = ["stream_to_partitioned_table"]


def stream_to_partitioned_table(
    stream: DataFrame,
    path: str,
    partition_cols: list[str],
    checkpoint_dir: str,
    query_name: str = "partitioned_load",
    available_now: bool = False,
):
    """Start the stream into a partitioned parquet table via
    foreachBatch + dynamic partition overwrite. Returns the running
    StreamingQuery (caller owns ``processAllAvailable``/``stop``).

    ``available_now=True`` sets Trigger.AvailableNow — process the
    whole backlog in rate-limited batches, then stop on its own: the
    scheduled-batch-job shape (nightly catch-up loads on a cron,
    streaming exactly-once semantics, no always-on cluster). The query
    terminates itself; use ``awaitTermination`` instead of
    ``processAllAvailable``."""

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            idempotent_overwrite(batch_df, path, partition_cols)

    writer = (
        stream.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
