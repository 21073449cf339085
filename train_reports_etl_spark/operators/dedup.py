"""Keep-last dedup with quarantined duplicates (W1).

The reference sorts the whole frame and drops duplicates keeping the
last occurrence (`reports_exporter_v0.83.py:1752-1787`); duplicates are
quarantined first. A global sort is O(n log n) shuffle-all — at 100 TB
that is the wrong plan. ``row_number`` over a hash-partitioned window
shuffles once on the dedup key only, and AQE splits skewed keys.

pandas ``keep='last'`` resolves ties by physical row order (input-file
order); Spark has no physical order, so callers must pass a total order
— append a deterministic tiebreaker column (e.g. a source row id from
``monotonically_increasing_id`` captured at read time) when the sort
keys can tie (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__rn"


def keep_last_dedup(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column | str],
) -> tuple[DataFrame, DataFrame]:
    """W1 — one row per ``keys`` group: the *last* under ``order_by``
    ascending (i.e. the max). Returns ``(kept, duplicates)``.

    Implemented as ``row_number`` over ``order_by`` DESC — rank 1 is the
    keep-last winner; ranks ≥2 are the quarantined duplicates
    (`reports_exporter_v0.83.py:1774-1787`).
    """
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*[c.desc_nulls_last() for c in order_cols])
    ranked = df.withColumn(_RN, F.row_number().over(w))
    kept = ranked.filter(F.col(_RN) == 1).drop(_RN)
    dups = ranked.filter(F.col(_RN) > 1).drop(_RN)
    return kept, dups
