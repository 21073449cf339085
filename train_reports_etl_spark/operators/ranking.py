"""Distributed total-order ranking (O5).

``row_number() OVER (ORDER BY ...)`` with an empty PARTITION BY is the
classic single-partition scale-killer: Spark funnels every row through
one task. This module computes the same global rank with bounded
per-task work, the way ``orderBy`` itself scales (range partitioning)
plus the rank stitch that a global window cannot do distributed:

1. sample cut points for the leading sort column (driver-side, tiny);
2. assign each row a range bucket by comparing against the literal
   cuts — equal keys always land in the same bucket, so cross-bucket
   ties are impossible;
3. count rows per bucket (one cheap aggregate, ≤ n_buckets rows to the
   driver) and turn the counts into cumulative offsets;
4. rank = bucket offset + ``row_number`` within the bucket (each
   bucket is one ordinary window partition, sized ~n/n_buckets).

At 100 TB: n_buckets scales with the executor count, each bucket sort
spills independently, and the only driver traffic is the cut points
and the per-bucket counts. No single task ever sees the full dataset.

Reference parity: the reference's largest sort is a whole-frame
``sort_values`` before dedup (`reports_exporter_v0.83.py:1774-1786`)
— single-process by construction; this is its scale-out form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def distributed_rank(
    df: DataFrame,
    bucket_col: str,
    order_cols: list[str],
    n_buckets: int = 32,
    rank_name: str = "rnk",
) -> DataFrame:
    """Global 1-based rank over ``order_cols`` (ascending, first column
    must be ``bucket_col``) without a single-partition window.

    ``bucket_col`` must be numeric (cut-point sampling uses
    ``approxQuantile``). Ties on the full ``order_cols`` tuple should
    be broken by a unique key for a deterministic rank.
    """
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = sorted(set(df.stat.approxQuantile(bucket_col, qs, 0.001)))
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + (F.col(bucket_col) > F.lit(c)).cast("int")
    with_bucket = df.withColumn("__bucket", bucket)
    # One aggregate job for the histogram; ≤ n_buckets rows collected.
    counts = dict(
        (r["__bucket"], r["n"])
        for r in with_bucket.groupBy("__bucket").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = {}, 0
    for b in range(len(cuts) + 1):
        offsets[b] = acc
        acc += counts.get(b, 0)
    omap = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("__bucket").orderBy(*[F.col(c).asc() for c in order_cols])
    return (
        with_bucket.withColumn(
            rank_name,
            (omap[F.col("__bucket")] + F.row_number().over(w)).cast("long"),
        )
        .drop("__bucket")
    )


def distributed_prefix_sum(
    df: DataFrame,
    order_col: str,
    val_col: str,
    n_buckets: int = 32,
    sum_name: str = "cum",
    cuts: list | None = None,
) -> DataFrame:
    """Global INCLUSIVE running sum of ``val_col`` over ``order_col``
    ascending — the prefix-sum twin of :func:`distributed_rank`, with
    the same shape: range-bucket by sampled cut points, one aggregate
    for the ≤ n_buckets per-bucket sums, driver-side prefix of those
    sums into offsets, then an ordinary within-bucket running-sum
    window. ``order_col`` must be numeric and UNIQUE per row (callers
    pass distinct-key aggregates, e.g. a per-value count table); with
    duplicate keys the within-bucket ordering — and hence the partial
    sums — would be nondeterministic, so uniqueness is ENFORCED at
    runtime inside the existing histogram aggregate (count vs
    count_distinct per bucket — no extra pass over the data).

    At 100 TB: identical scaling story to distributed_rank — no single
    task ever holds more than ~n/n_buckets rows, driver traffic is the
    cut points plus n_buckets partial sums. Pass precomputed ``cuts``
    when chaining several passes over the same table — each quantile
    sample is a full job, and callers like W1 run three passes.
    """
    if cuts is None:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        cuts = sorted(set(df.stat.approxQuantile(order_col, qs, 0.001)))
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + (F.col(order_col) > F.lit(c)).cast("int")
    with_bucket = df.withColumn("__bucket", bucket)
    agg_rows = (
        with_bucket.groupBy("__bucket")
        .agg(
            F.sum(val_col).cast("long").alias("s"),
            F.count("*").alias("n"),
            F.count_distinct(F.col(order_col)).alias("nd"),
        )
        .collect()
    )
    dup = [r["__bucket"] for r in agg_rows if r["n"] != r["nd"]]
    if dup:
        raise ValueError(
            f"distributed_prefix_sum: duplicate {order_col!r} keys detected "
            f"(buckets {dup[:5]}); the running sum requires one row per key "
            "— pre-aggregate to a distinct-key table first"
        )
    sums = dict((r["__bucket"], r["s"]) for r in agg_rows)
    offsets, acc = {}, 0
    for b in range(len(cuts) + 1):
        offsets[b] = acc
        acc += sums.get(b, 0)
    omap = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = (
        Window.partitionBy("__bucket")
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return with_bucket.withColumn(
        sum_name,
        (omap[F.col("__bucket")] + F.sum(val_col).over(w)).cast("long"),
    ).drop("__bucket")


def distributed_lead(
    df: DataFrame,
    order_col: str,
    n_buckets: int = 32,
    lead_name: str = "next_val",
    cuts: list | None = None,
) -> DataFrame:
    """Global LEAD of ``order_col`` over itself ascending (the next
    distinct key; NULL for the global maximum) — the neighbor-gap twin
    of :func:`distributed_prefix_sum`, same shape: range-bucket by
    sampled cut points, one tiny aggregate (per-bucket minima, ≤
    n_buckets rows to the driver) to stitch bucket boundaries, then an
    ordinary within-bucket ``lead`` window whose last row coalesces to
    the next non-empty bucket's minimum.

    Like the prefix sum, ``order_col`` must be numeric and unique per
    row (callers pass distinct-key aggregates); ``cuts`` as in
    :func:`distributed_prefix_sum`. At 100 TB: no single task holds
    more than ~n/n_buckets rows; driver traffic is cut points plus
    per-bucket minima."""
    if cuts is None:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        cuts = sorted(set(df.stat.approxQuantile(order_col, qs, 0.001)))
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + (F.col(order_col) > F.lit(c)).cast("int")
    with_bucket = df.withColumn("__bucket", bucket)
    mins = sorted(
        (r["__bucket"], r["m"])
        for r in with_bucket.groupBy("__bucket")
        .agg(F.min(order_col).alias("m"))
        .collect()
    )
    next_min: dict[int, object] = {}
    for i, (b, _) in enumerate(mins):
        next_min[b] = mins[i + 1][1] if i + 1 < len(mins) else None
    nmap = F.create_map(
        *[
            F.lit(x)
            for b, m in next_min.items()
            for x in (b, m)
            if m is not None
        ]
    )
    w = Window.partitionBy("__bucket").orderBy(F.col(order_col).asc())
    return with_bucket.withColumn(
        lead_name,
        F.coalesce(
            F.lead(order_col).over(w), nmap[F.col("__bucket")]
        ).cast("long"),
    ).drop("__bucket")
