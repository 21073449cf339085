"""Bucketed table storage for co-located (shuffle-free) joins.

The reference re-reads and re-joins its lookup tables on every run
(`reports_exporter_v0.83.py:613-618,686-696`); at 100 TB the analogous
repeated fact-to-fact joins (orders ⟖ lineitem on orderkey, document
joins on doc_id) pay a full shuffle of both sides every query. Writing
both sides bucketed by the join key pre-materializes that shuffle ONCE
at load time:

- ``bucketBy(n, key)`` hash-partitions rows into ``n`` files per
  partition by the same hash Spark's Exchange would use;
- a join of two tables bucketed by the join key with the same bucket
  count plans as SortMergeJoin with NO Exchange on either side
  (asserted in tests/test_sources_sinks.py);
- aggregations keyed by the bucket key likewise skip their Exchange.

Bucket count sizing at 100 TB: target file sizes of 128 MiB–1 GiB per
bucket per partition — e.g. 100 TB date-partitioned over ~1000 days →
~100 GB/day → 256–1024 buckets. Too few buckets caps join/scan
parallelism; too many makes small files.

Bucketed writes require the table catalog (``saveAsTable``) — bucket
metadata lives in the metastore, not the parquet footer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by the join key.

    ``sortBy`` within buckets additionally removes the per-task Sort
    from downstream sort-merge joins — scan-ready runs on disk.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)
