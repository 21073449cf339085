"""KMV sketch tests: accuracy, exact-below-k, and the merge law."""

from __future__ import annotations

from pyspark.sql import functions as F

from train_reports_etl_spark.extensions.sketches import (
    estimate_from_sketch,
    kmv_bottom_k,
    kmv_estimate,
)


def _values(spark, n, group="g"):
    return spark.range(n).select(
        F.lit(group).alias("grp"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )


def test_exact_when_distinct_below_k(spark):
    out = kmv_estimate(_values(spark, 50), ["grp"], "v", k=128).collect()[0]
    assert out.n_kept == 50
    assert out.kmv_estimate == 50.0


def test_estimate_within_tolerance_above_k(spark):
    # 5000 distinct values, k=256: KMV std error ~ 1/sqrt(k-2) ≈ 6.3%
    out = kmv_estimate(_values(spark, 5000), ["grp"], "v", k=256).collect()[0]
    assert out.n_kept == 256
    assert abs(out.kmv_estimate - 5000) / 5000 < 0.25


def test_merge_law_union_of_sketches_equals_sketch_of_union(spark):
    """Bottom-k of (sketch(A) ∪ sketch(B)) == bottom-k of (A ∪ B) —
    the property that lets per-shard sketches roll up without
    rescanning the data."""
    k = 64
    a = _values(spark, 3000)
    b = spark.range(2000, 6000).select(
        F.lit("g").alias("grp"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    sk_a = kmv_bottom_k(a, ["grp"], "v", k)
    sk_b = kmv_bottom_k(b, ["grp"], "v", k)
    merged_rows = sk_a.union(sk_b).distinct()
    from pyspark.sql.window import Window

    w = Window.partitionBy("grp").orderBy("h")
    merged = (
        merged_rows.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("grp", "h")
    )
    direct = kmv_bottom_k(a.union(b), ["grp"], "v", k)
    assert merged.subtract(direct).count() == 0
    assert direct.subtract(merged).count() == 0
    est_m = estimate_from_sketch(merged, ["grp"], k).collect()[0].kmv_estimate
    est_d = estimate_from_sketch(direct, ["grp"], k).collect()[0].kmv_estimate
    assert est_m == est_d


def test_groups_are_independent(spark):
    df = _values(spark, 300).union(_values(spark, 40, group="h").withColumn("grp", F.lit("h")))
    out = {r.grp: r for r in kmv_estimate(df, ["grp"], "v", k=128).collect()}
    assert out["h"].kmv_estimate == 40.0
    assert out["g"].n_kept == 128
