"""Range-sorted parquet writes for data skipping (table layout).

Reference linkage: none — layout scope the reference never hits; at
100 TB it decides whether a time-range query reads 100 TB or 100 GB.

Parquet footers carry per-row-group min/max statistics, and Spark's
parquet reader prunes row groups whose [min, max] can't satisfy a
pushed-down predicate. That pruning is only effective if the layout
CLUSTERS values: after a hash shuffle every file spans the whole value
range and nothing skips. ``write_range_sorted`` makes the stats sharp:

- ``repartitionByRange(cols)`` → files own disjoint value ranges
  (range exchange samples the distribution, so skew splits evenly);
- ``sortWithinPartitions(cols)`` → row groups inside each file own
  disjoint sub-ranges.

A predicate on the sort prefix then skips whole files by footer alone.
The test proves the property directly from pyarrow row-group stats:
sorted layout ⇒ non-overlapping [min, max] intervals; hash layout ⇒
full-range overlap everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["write_range_sorted"]


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    mode: str = "errorifexists",
) -> None:
    """Write ``df`` as parquet range-clustered and sorted on
    ``sort_cols``. ``n_files`` fixes the file count (default: let the
    range exchange decide from ``spark.sql.shuffle.partitions``)."""
    parted = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files
        else df.repartitionByRange(*sort_cols)
    )
    parted.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)
