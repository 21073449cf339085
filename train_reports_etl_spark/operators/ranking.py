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
3. count rows per bucket (one cheap aggregate, ≤ n_buckets rows) and
   prefix-sum the counts into per-bucket offsets — IN-PLAN, on the
   bucket-level table (a single-partition window over ≤ n_buckets
   rows), broadcast-joined back to the rows. Round-10 optimization
   (guide §1.2 — remove passes): this used to be a ``collect()`` +
   literal map, costing one extra driver ACTION per pass; the suite
   runs ~20 such passes, each paying the full job floor. Folding the
   offsets into the plan makes each primitive a one-action operator
   again (the quantile sample job remains, shareable via ``cuts``).
4. rank = bucket offset + ``row_number`` within the bucket (each
   bucket is one ordinary window partition, sized ~n/n_buckets).

At 100 TB: n_buckets scales with the executor count, each bucket sort
spills independently, and the only driver traffic is the cut points;
the bucket histogram stays in the cluster (broadcast of ≤ n_buckets
rows). No single task ever sees the full dataset. NB: like the
collect() form before it, the bucket-aggregate subtree re-executes the
input lineage once more (broadcast build side) — callers chaining
passes persist the input table first (the r10c discipline).

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
    cuts: list | None = None,
) -> DataFrame:
    """Global 1-based rank over ``order_cols`` (ascending, first column
    must be ``bucket_col``) without a single-partition window.

    ``bucket_col`` must be numeric (cut-point sampling uses
    ``approxQuantile``). Ties on the full ``order_cols`` tuple should
    be broken by a unique key for a deterministic rank.

    ``cuts`` (r11, mirrors :func:`distributed_prefix_sums`): precomputed
    cut points skip the quantile-sample ACTION — callers that already
    run an aggregate over the input can fold the sampling into it
    (e.g. ``percentile_approx`` next to a count). Any cut list yields
    the same ranks; cuts only balance the bucket sizes.
    """
    if cuts is None:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        cuts = df.stat.approxQuantile(bucket_col, qs, 0.001)
    cuts = sorted(set(cuts))
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + (F.col(bucket_col) > F.lit(c)).cast("int")
    with_bucket = df.withColumn("__bucket", bucket)
    # Bucket histogram → offsets, all in-plan: single-partition window
    # over ≤ n_buckets aggregate rows, broadcast back. Empty buckets
    # contribute 0 to every later offset, so summing over only the
    # PRESENT lower buckets equals the old dense cumulative map.
    # NULL order keys (r11, ADVICE r10): a NULL ``bucket_col`` yields a
    # NULL ``__bucket``; those rows are EXCLUDED from the histogram (so
    # real buckets' offsets are not inflated) and kept through a LEFT
    # join with a NULL rank — the pre-r10 collect()-form contract. The
    # r10 inner join silently dropped them and shifted every rank.
    counts = (
        with_bucket.where(F.col("__bucket").isNotNull())
        .groupBy("__bucket")
        .agg(F.count("*").alias("__n"))
    )
    woff = (
        Window.orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.select(
        "__bucket",
        F.coalesce(F.sum("__n").over(woff), F.lit(0)).cast("long").alias("__off"),
    )
    w = Window.partitionBy("__bucket").orderBy(*[F.col(c).asc() for c in order_cols])
    return (
        with_bucket.join(F.broadcast(offs), "__bucket", "left")
        .withColumn(
            rank_name,
            (F.col("__off") + F.row_number().over(w)).cast("long"),
        )
        .drop("__bucket", "__off")
    )


def distributed_prefix_sums(
    df: DataFrame,
    order_col: str,
    val_cols: list[str],
    n_buckets: int = 32,
    sum_names: list[str] | None = None,
    cuts: list | None = None,
    lead_name: str | None = None,
) -> DataFrame:
    """Several global prefix sums (and optionally the global LEAD of
    ``order_col``) in ONE range-bucketed pass: bucket once, one bucket
    aggregate, one broadcast of the ≤ n_buckets offset rows, one
    within-bucket sort shared by every running sum and the lead.

    Round-10 optimization (guide §2.4 — share the exchange/sort):
    operators like the KS statistic and 1-Wasserstein chained two or
    three single-column passes over the same table with the same cuts;
    each chained pass re-sorted the data and, worse, re-executed the
    upstream passes' windows inside its own bucket-aggregate branch.
    Merged, the plan has exactly one Exchange + one sort for the whole
    prefix/lead stage (e128: 3 chained passes → 1; measured 3.1 → 1.9 s
    isolated at sf0.1 with identical output).

    Semantics per column are exactly :func:`distributed_prefix_sum`
    (inclusive running sum, unique-key guard in the bucket aggregate);
    ``lead_name`` adds :func:`distributed_lead`'s next-distinct-value
    column for free (same sort)."""
    if sum_names is None:
        sum_names = [f"cum_{c}" for c in val_cols]
    if cuts is None:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        cuts = sorted(set(df.stat.approxQuantile(order_col, qs, 0.001)))
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + (F.col(order_col) > F.lit(c)).cast("int")
    with_bucket = df.withColumn("__bucket", bucket)
    aggs = [
        F.sum(c).cast("long").alias(f"__s_{i}") for i, c in enumerate(val_cols)
    ]
    if val_cols:
        aggs += [
            F.count("*").alias("__n"),
            F.count_distinct(F.col(order_col)).alias("__nd"),
        ]
    if lead_name is not None:
        aggs.append(F.min(order_col).alias("__m"))
    # NULL order keys (r11, ADVICE r10): excluded from the histogram
    # (a NULL ``order_col`` yields a NULL ``__bucket``), kept through
    # the LEFT join below with NULL running sums / NULL lead — the
    # distributed_rank NULL-rank contract; they are exempt from the
    # uniqueness guard (count_distinct never saw them anyway).
    agg = (
        with_bucket.where(F.col("__bucket").isNotNull())
        .groupBy("__bucket")
        .agg(*aggs)
    )
    woff = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    if val_cols:
        # Uniqueness guard, in-plan: assert_true evaluates while
        # building the offset rows (NULL when clean, raises on a
        # duplicate key) — same aggregate pass, no extra job. Attached
        # to the JOIN KEY itself (+0 when clean), not to one output
        # column (ADVICE r10): the join always evaluates its key, so
        # Catalyst pruning of any subset of the ``__off_i`` outputs can
        # never optimize the check away.
        guard = F.assert_true(
            F.col("__n") == F.col("__nd"),
            F.concat(
                F.lit(
                    f"distributed_prefix_sum: duplicate {order_col!r} "
                    "keys detected (bucket "
                ),
                F.col("__bucket").cast("string"),
                F.lit(
                    "); the running sum requires one row per key — "
                    "pre-aggregate to a distinct-key table first"
                ),
            ),
        )
        key = (F.col("__bucket") + F.coalesce(guard.cast("int"), F.lit(0))).alias(
            "__bucket"
        )
    else:
        key = F.col("__bucket")
    sel = [key]
    for i in range(len(val_cols)):
        off = F.coalesce(F.sum(f"__s_{i}").over(woff), F.lit(0))
        sel.append(off.cast("long").alias(f"__off_{i}"))
    if lead_name is not None:
        sel.append(
            F.lead("__m").over(Window.orderBy("__bucket")).alias("__next_min")
        )
    offs = agg.select(*sel)
    w = Window.partitionBy("__bucket").orderBy(F.col(order_col).asc())
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = with_bucket.join(F.broadcast(offs), "__bucket", "left")
    for i, (c, nm) in enumerate(zip(val_cols, sum_names)):
        out = out.withColumn(
            nm, (F.col(f"__off_{i}") + F.sum(c).over(wsum)).cast("long")
        )
    if lead_name is not None:
        out = out.withColumn(
            lead_name,
            F.coalesce(F.lead(order_col).over(w), F.col("__next_min")).cast(
                "long"
            ),
        )
    drops = ["__bucket"] + [f"__off_{i}" for i in range(len(val_cols))]
    if lead_name is not None:
        drops.append("__next_min")
    return out.drop(*drops)


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
    count_distinct per bucket — no extra pass over the data). Since the
    r10 in-plan fold the violation surfaces at ACTION time as a Spark
    ``assert_true`` failure carrying the same "duplicate ... keys"
    message (previously an eager ``ValueError`` from the collect pass).

    At 100 TB: identical scaling story to distributed_rank — no single
    task ever holds more than ~n/n_buckets rows, driver traffic is the
    cut points plus n_buckets partial sums. Pass precomputed ``cuts``
    when chaining several passes over the same table — each quantile
    sample is a full job, and callers like W1 run three passes.
    """
    return distributed_prefix_sums(
        df, order_col, [val_col], n_buckets, [sum_name], cuts
    )


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
    return distributed_prefix_sums(
        df, order_col, [], n_buckets, [], cuts, lead_name=lead_name
    )
