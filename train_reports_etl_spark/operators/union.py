"""Set operators (U1/U2).

The reference accumulates sheets of one report type with ``pd.concat``
(`reports_exporter_v0.83.py:1740`). Spark form: ``unionByName`` so
column order never matters, folded over the batch — a zero-shuffle
narrow op.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from functools import reduce

from pyspark.sql import DataFrame


def union_all(dfs: Iterable[DataFrame], allow_missing_columns: bool = False) -> DataFrame:
    """U1 — schema-aligned UNION ALL over any number of frames."""
    frames = list(dfs)
    if not frames:
        raise ValueError("union_all: no frames")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing_columns),
        frames,
    )


def required_columns(all_columns: Sequence[str], nullable: Iterable[str]) -> list[str]:
    """U2 — required = all − nullable (`reports_exporter_v0.83.py:968,973`);
    preserves the frame's column order (metadata-only)."""
    nullable_set = set(nullable)
    return [c for c in all_columns if c not in nullable_set]
