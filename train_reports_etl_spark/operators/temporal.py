"""Temporal join operators Spark lacks natively: as-of join and
range join (beyond-reference scope; the reference has only equi-joins,
SURVEY.md §2.3).

Both are expressed as compositions of built-in DataFrame ops — no
Python row path — using the two standard distributed formulations:

- **As-of join** (:func:`asof_join`): union both sides, one shuffle by
  the equality key, one sort by (ts, side-marker), and a running
  ``last(..., ignorenulls)`` window carries the most recent right row
  forward onto each left row. This is the merge-scan form: cost is one
  shuffle + sort of |L|+|R| rows, never |L|×|R| pairs. (Pandas calls
  this ``merge_asof``; Flink "temporal join"; kdb ``aj``.)
- **Range join** (:func:`range_join_bucketed`): when there is no
  equality key, a naive theta-join is a cross product. Bucketize time
  into fixed-width bins, explode each left interval to the bins it
  covers, equi-join on the bin, then apply the exact range predicate.
  Shuffle volume is rows × (interval/bucket_width) instead of |L|×|R|;
  bucket width trades fan-out against bucket selectivity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    strict: bool = True,
) -> DataFrame:
    """For each left row, attach the latest right row of the same
    ``on`` key with ``right_ts < left_ts`` (``<=`` when
    ``strict=False``); left rows with no prior right row keep nulls
    (left-outer as-of semantics).

    Output: all left columns + ``matched_ts`` + the requested
    ``right_cols`` (prefixed ``matched_``).

    Tie handling: multiple right rows on the same (key, ts) must be
    pre-aggregated by the caller if a deterministic match is required —
    the window picks the last one in sort order, which is otherwise
    unspecified within equal keys.
    """
    lcols = left.columns
    l = left.withColumn("__m", F.lit(1)).withColumn("__rts", F.lit(None).cast("timestamp"))
    for c in right_cols:
        l = l.withColumn(f"__r_{c}", F.lit(None).cast(right.schema[c].dataType))
    r = right.select(
        F.col(on),
        F.col(right_ts).alias(left_ts),
        F.lit(0).alias("__m"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    for c in lcols:
        if c not in (on, left_ts):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l.select(*lcols, "__m", "__rts", *[f"__r_{c}" for c in right_cols]).unionByName(
        r.select(*lcols, "__m", "__rts", *[f"__r_{c}" for c in right_cols])
    )
    # strict (<): right rows at ts == left ts sort AFTER the left row
    # (marker 1 > 0 ... left __m=1, right __m=0 → right first). For
    # strict inequality the right row must NOT be visible at equal ts,
    # so order right rows after left ones; for <= order them before.
    marker_order = F.col("__m").asc() if not strict else F.col("__m").desc()
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(left_ts).asc(), marker_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *lcols,
        "__m",
        F.last("__rts", ignorenulls=True).over(w).alias("matched_ts"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"matched_{c}")
            for c in right_cols
        ],
    )
    return carried.filter(F.col("__m") == 1).drop("__m")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_lo: Column,
    left_hi: Column,
    right_ts: str = "ts",
    bucket_width_s: int = 60,
) -> DataFrame:
    """Candidate pairs (left row, right row) with ``right_ts`` in
    [left_lo, left_hi] — no equality key required.

    The left interval explodes to the epoch buckets it covers; the
    right side keys by its single bucket; the equi-join on bucket
    bounds the pair space, then the exact BETWEEN filter applies.
    Choose ``bucket_width_s`` ≈ the typical interval length: fan-out
    stays ~2 rows per left interval while each bucket holds only
    temporally-local right rows.

    Output: all left columns + right columns suffixed ``_r``. Exact —
    bucketing generates candidates, the final predicate decides.
    """
    lo_s = F.unix_timestamp(left_lo)
    hi_s = F.unix_timestamp(left_hi)
    l = left.select(
        "*",
        left_lo.alias("__lo"),
        left_hi.alias("__hi"),
        F.explode(
            F.sequence(
                F.floor(lo_s / bucket_width_s).cast("long"),
                F.floor(hi_s / bucket_width_s).cast("long"),
            )
        ).alias("__bucket"),
    )
    r = right.select(
        *[F.col(c).alias(f"{c}_r") for c in right.columns],
        F.floor(F.unix_timestamp(F.col(right_ts)) / bucket_width_s)
        .cast("long")
        .alias("__bucket"),
    )
    rts = F.col(f"{right_ts}_r")
    return (
        l.join(r, "__bucket")
        .filter((rts >= F.col("__lo")) & (rts <= F.col("__hi")))
        .drop("__bucket", "__lo", "__hi")
    )


def validity_intervals(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    tiebreak_cols: list[str] | None = None,
    attr_cols: list[str] | None = None,
) -> DataFrame:
    """SCD2-style validity intervals: each row becomes effective at its
    own timestamp and expires when the key's next row arrives
    (``valid_to`` NULL ⇒ current version).

    One ``lead()`` window per key — a single shuffle keyed by
    ``key_cols``; within a key the sort is local to the partition.
    Deterministic under timestamp ties via ``tiebreak_cols``.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    keep = attr_cols if attr_cols is not None else [
        c for c in df.columns if c not in key_cols and c != ts_col
    ]
    return df.select(
        *key_cols,
        *keep,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())
