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


def test_bloom_no_false_negatives_and_mergeable(spark):
    from pyspark.sql import functions as F

    from train_reports_etl_spark.extensions.sketches import bloom_build, bloom_probe

    members = spark.createDataFrame([(i,) for i in range(0, 500, 2)], ["k"])
    probe = spark.createDataFrame([(i,) for i in range(500)], ["k"])
    bits = bloom_build(members, "CAST(k AS STRING)")
    out = {r.k: r.predicted_member for r in bloom_probe(probe, bits, "CAST(k AS STRING)", "k").collect()}
    # Bloom guarantee: every true member predicted present
    assert all(out[i] for i in range(0, 500, 2))
    # merge = union+distinct equals build over the union of key sets
    m1 = spark.createDataFrame([(i,) for i in range(100)], ["k"])
    m2 = spark.createDataFrame([(i,) for i in range(50, 200)], ["k"])
    merged = bloom_build(m1, "CAST(k AS STRING)").union(
        bloom_build(m2, "CAST(k AS STRING)")
    ).distinct()
    direct = bloom_build(m1.union(m2), "CAST(k AS STRING)")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    # all positions in range
    mx = bits.agg(F.max("bit_pos"), F.min("bit_pos")).collect()[0]
    assert 0 <= mx[1] and mx[0] < (1 << 16)


def test_hll_registers_mergeable_and_estimate_sane(spark):
    from train_reports_etl_spark.extensions.sketches import (
        HLL_M,
        hll_distinct,
        hll_estimate_from_registers,
        hll_registers,
    )

    a = spark.range(0, 4000).selectExpr("CAST(id AS STRING) AS k")
    b = spark.range(2000, 8000).selectExpr("CAST(id AS STRING) AS k")
    # merge = union register tables + groupBy max == sketch of union
    ra, rb = hll_registers(a, "k"), hll_registers(b, "k")
    from pyspark.sql import functions as F

    merged = ra.union(rb).groupBy("bucket").agg(F.max("rho").alias("rho"))
    direct = hll_registers(a.union(b), "k")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    est = hll_estimate_from_registers(merged).collect()[0]
    assert est.m == HLL_M and est.n_registers_set <= HLL_M
    # 8000 true distinct; m=256 -> se ~6.5%; allow 4 sigma
    assert abs(est.hll_estimate - 8000) / 8000 < 0.26
    one = hll_distinct(a, "k").collect()[0]
    assert abs(one.hll_estimate - 4000) / 4000 < 0.26


def test_hll_register_table_bounded(spark):
    from train_reports_etl_spark.extensions.sketches import HLL_M, hll_registers

    big = spark.range(0, 50000).selectExpr("CAST(id AS STRING) AS k")
    regs = hll_registers(big, "k").collect()
    assert len(regs) <= HLL_M
    assert all(1 <= r.rho <= 53 and 0 <= r.bucket < HLL_M for r in regs)


def test_histogram_sketch_mergeable_and_quantiles(spark):
    from pyspark.sql import functions as F

    from train_reports_etl_spark.extensions.sketches import (
        histogram_quantiles,
        histogram_sketch,
        quantiles_from_histogram,
    )

    a = spark.range(0, 500).select(F.lit("g").alias("g"), F.col("id").cast("double").alias("v"))
    b = spark.range(500, 1000).select(F.lit("g").alias("g"), F.col("id").cast("double").alias("v"))
    # merge = union + groupBy sum == sketch of the union
    ha, hb = histogram_sketch(a, ["g"], "v", 0.0, 1000.0), histogram_sketch(b, ["g"], "v", 0.0, 1000.0)
    merged = ha.union(hb).groupBy("g", "bin").agg(F.sum("n").alias("n"))
    direct = histogram_sketch(a.union(b), ["g"], "v", 0.0, 1000.0)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    # uniform 0..999 over [0,1000) in 256 bins: median bin edge within one bin of 500
    q = {r.q: r for r in quantiles_from_histogram(merged, ["g"], [0.5, 0.99], 0.0, 1000.0).collect()}
    assert q[0.5].n_rows == 1000
    assert abs(q[0.5].est_value - 500.0) <= 1000.0 / 256 + 1e-9
    assert q[0.99].est_value >= 980.0 - 1000.0 / 256
    # out-of-range values clamp, never dropped
    c = spark.createDataFrame([("g", -50.0), ("g", 5000.0)], ["g", "v"])
    hc = histogram_sketch(c, ["g"], "v", 0.0, 1000.0)
    rows = {r.bin: r.n for r in hc.collect()}
    assert rows == {0: 1, 255: 1}
    one = histogram_quantiles(a, ["g"], "v", [0.25], 0.0, 1000.0)
    assert abs(one.collect()[0].est_value - 125.0) <= 1000.0 / 256 + 1e-9


def test_hll_rollup_merge_equals_direct(spark):
    """The merge law: union+max of per-shard register tables equals the
    sketch of the unioned data — proven exactly, not approximately."""
    from train_reports_etl_spark.extensions.sketches import (
        hll_estimate_from_registers,
        hll_merge_registers,
        hll_registers,
        hll_registers_by,
    )

    df = spark.range(0, 5000).selectExpr(
        "CAST(id % 7 AS STRING) AS shard", "CAST(id % 1300 AS STRING) AS v"
    )
    merged = hll_merge_registers(hll_registers_by(df, ["shard"], "v"))
    direct = hll_registers(df, "v")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    em = hll_estimate_from_registers(merged).head()
    ed = hll_estimate_from_registers(direct).head()
    assert em.z_sum == ed.z_sum and em.hll_estimate == ed.hll_estimate
    # sanity: estimate lands within ~3 sigma of 1300 (6.5% per sigma)
    assert abs(em.hll_estimate - 1300) / 1300 < 0.2
