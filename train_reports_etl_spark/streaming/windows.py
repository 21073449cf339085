"""Event-time windows (E5): tumbling / sliding / session.

The batch forms are canonical (oracle-checked); the streaming variants
are the same expressions over ``readStream`` inputs with a watermark —
Structured Streaming's incremental execution of the identical logical
plan is exactly why we express windows declaratively (SURVEY.md §2.11).

The reference has no streaming at all (SURVEY.md §2.10); its closest
analogue is the idempotent re-run model, which maps to exactly-once
sinks + watermarked state here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_windows(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    agg_cols: dict[str, str] | None = None,
) -> DataFrame:
    """E5 — tumbling window aggregate: one bucket per ``duration``.

    Output: (window_start, window_end, n_events, sum_value-style aggs).
    Hash-aggregate keyed by the window bucket — map-side partial aggs
    collapse each partition to one row per bucket before the shuffle.
    """
    # Default: exact integer cents (value is 2-dp exact; integer sums
    # are order-stable on every engine, unlike round(sum(double), 2)).
    agg_cols = agg_cols or {
        "sum_value_cents": "sum(cast(round(value * 100) as long))"
    }
    aggs = [F.count("*").cast("long").alias("n_events")]
    aggs += [F.expr(expr).alias(name) for name, expr in agg_cols.items()]
    w = F.window(F.col(ts_col), duration)
    out = events.groupBy(w.alias("w")).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "n_events",
        *agg_cols.keys(),
    )


def sliding_windows(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    """E5 — sliding windows: each event lands in duration/slide buckets
    (``window`` with a slide emits one row per covering window)."""
    w = F.window(F.col(ts_col), duration, slide)
    return (
        events.groupBy(w.alias("w"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value_cents",
        )
    )


def session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """E5 — session windows: per-key activity runs closed by ``gap`` of
    silence. ``session_window`` end = last event + gap (Spark-native
    stateful session merging; in streaming mode the same expression
    runs with watermark-driven state eviction).
    """
    sw = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(F.col(key_col), sw.alias("sw"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
        )
        .select(
            F.col(key_col),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value_cents",
        )
    )


def streaming_tumbling_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """E5 streaming variant — same tumbling aggregate over a streaming
    DataFrame with a watermark bounding late data (and state size).

    Usage::

        q = (streaming_tumbling_counts(readstream_df)
             .writeStream.outputMode("append").format("memory")
             .queryName("t").start())
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), duration).alias("w"))
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), "n_events")
    )


def streaming_sliding_sums(
    stream: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """E5 streaming variant — sliding windows over a watermarked stream
    in APPEND mode: a window row is emitted exactly once, when the
    watermark (max seen event time in ms, minus the delay) passes its
    ``window_end``. State holds only open windows — duration/slide rows
    per active grid slot — and is evicted at emission, so the store is
    bounded by the watermark horizon regardless of stream length.
    """
    w = F.window(F.col(ts_col), duration, slide)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value_cents",
        )
    )


def streaming_session_sums(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """E5 streaming variant — built-in ``session_window`` in APPEND
    mode: per-key sessions merge in the state store as events arrive
    and emit exactly once, when the watermark passes the session's end
    (= last event + gap: at that point no admissible event can extend
    it, so the row is final and state is evicted). Complements the
    custom ``applyInPandasWithState`` sessionizer — same semantics,
    engine-managed state."""
    sw = F.session_window(F.col(ts_col), gap)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), sw.alias("sw"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
        )
        .select(
            F.col(key_col),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value_cents",
        )
    )
