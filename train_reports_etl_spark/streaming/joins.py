"""Stream-stream joins (E5): correlate two live event streams inside
a bounded event-time window.

No reference citation — streaming scope beyond SURVEY.md §2.10. The
canonical shape: purchases joined to the same user's views in the
preceding minutes, both sides unbounded. Spark buffers both sides in
state keyed by the equi-key; the **time-range predicate + watermarks
are what make state finite** — once the watermark passes ``p.ts``,
buffered views older than ``p.ts − window`` can never match a future
purchase and are evicted. Without the range condition the state grows
forever (Spark refuses the plan in append mode for exactly that
reason).

Inner-join rows emit as soon as both sides have arrived — emission is
not watermark-gated (unlike append-mode aggregates), so a single-batch
source yields exactly the batch join's result, which is how the
declared query strong-oracle-checks the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_interval_join"]


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    lookback: str = "10 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` rows to ``right`` rows with the same ``key`` whose
    timestamp falls in ``[left.ts − lookback, left.ts]``.

    Returns (l_event_id, r_event_id, l_ts, r_ts, key). Both inputs
    must carry (event_id, key, ts_col).

    ``how="left_outer"`` additionally emits unmatched left rows with
    NULL right columns — but only once the watermark proves no future
    right row can match (future rows have ts ≥ watermark and the
    condition needs r.ts ≤ l.ts, so a left row is decided when
    l.ts < watermark). The operative watermark is the MIN across both
    streams' watermark nodes, so null results wait for event-time
    progress on BOTH sides and flush in a later micro-batch — a
    function of batch arrival, not of the data alone. The outer
    variant is therefore deliberately NOT in the oracle-checked query
    set (same contract stance as the sessionizer timeout path);
    tests/test_streaming.py drives it across two batches instead.
    """
    l = (
        left.select(
            F.col("event_id").alias("l_event_id"),
            F.col(key).alias("l_key"),
            F.col(ts_col).alias("l_ts"),
        ).withWatermark("l_ts", watermark)
    )
    r = (
        right.select(
            F.col("event_id").alias("r_event_id"),
            F.col(key).alias("r_key"),
            F.col(ts_col).alias("r_ts"),
        ).withWatermark("r_ts", watermark)
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("r_ts") <= F.col("l_ts"))
    )
    return l.join(r, cond, how).select(
        F.col("l_key").alias(key), "l_event_id", "r_event_id", "l_ts", "r_ts"
    )
