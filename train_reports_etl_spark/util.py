"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def repartition_if_coarse(df, min_partitions: int | None = None):
    """Repartition ``df`` up to cluster parallelism when the scan's
    EFFECTIVE parallelism — not its planned split count — is coarser
    than the cluster.

    Split count lies for parquet: a single-row-group file plans as N
    byte-range splits, but every row materializes in the ONE split that
    contains the row-group offset, so ``getNumPartitions()`` reports 32
    while one task does 100% of the work (and any explode/aggregate
    fused into the scan stage runs serially — measured 55 s vs 2 s on a
    150k-doc trigram explode). Parquet's unit of scan parallelism is
    the row group, so the honest check is the footer metadata:

    1. If planned partitions < target → repartition (the cheap case the
       old guard caught: a dim table read as 2-3 splits).
    2. If the scan has ≥ target input files, each file is at least one
       independent task → leave it alone.
    3. Few files but many planned splits: read the parquet FOOTERS
       driver-side (pyarrow, metadata-only — the same reads Spark's own
       scheduler does) and sum row groups, short-circuiting once ≥
       target. Only local ``file:`` URIs are stat-able here; on a
       remote FS (where a 100 TB input has thousands of files and never
       reaches this branch anyway) we trust the planner and back off.

    At 100 TB this is metadata-only and O(target) footer reads in the
    worst case; the repartition itself only ever fires on inputs small
    enough to live in few single-row-group files, where shuffling the
    raw rows is trivially cheap next to serializing the whole pipeline
    onto one core.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files or len(files) >= target:
        return df
    try:
        from urllib.parse import unquote, urlparse

        import pyarrow.parquet as pq

        row_groups = 0
        for uri in files:
            parsed = urlparse(uri)
            if parsed.scheme not in ("file", ""):
                return df
            if not parsed.path.endswith(".parquet"):
                return df
            row_groups += pq.ParquetFile(unquote(parsed.path)).metadata.num_row_groups
            if row_groups >= target:
                return df
        return df.repartition(target)
    except Exception:
        return df


def safe_col(name: str) -> Column:
    """Column reference for raw, untrusted column names.

    Report headers contain '.', '(', '+' (e.g. "Passengers Inc.
    Infants"); unquoted references go through the multipart-identifier
    parser and split on dots. Backtick-quoting (with embedded backticks
    doubled) resolves the name literally. NB: ``df[name]`` does NOT
    escape this in Spark 4.x — it parses too.
    """
    return F.col(f"`{name.replace('`', '``')}`")
