"""estimate_pairs() vs reality (VERDICT r09 #7): the dry-run cost API
claims its ``candidate_pairs`` is EXACT for the candidate join's
shuffle fan-out (cost.py module doc). Nothing previously proved the
estimates track what the joins actually materialize — these tests
compute the REAL per-bucket self-join count for every family on the
sf fixture tables and assert exact equality (stronger than the
"within 2x" bar: Σ C(m,2) over bucket sizes IS the a<b join count
when each id appears at most once per bucket, which every family's
keying guarantees)."""

from __future__ import annotations

from pyspark.sql import functions as F

from train_reports_etl_spark.extensions.cost import estimate_pairs


def _join_count(keyed, keys, id_col):
    """Actual candidate-pair count: the a<b self-join on the bucket
    keys, NOT deduplicated across buckets — the shuffle fan-out."""
    a = keyed.select(*keys, F.col(id_col).alias("__a"))
    b = keyed.select(*keys, F.col(id_col).alias("__b"))
    return a.join(b, keys).filter(F.col("__a") < F.col("__b")).count()


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_simhash_estimate_is_exact(spark, sf_dir):
    from train_reports_etl_spark.extensions.text import simhash_table

    fps = simhash_table(_docs(spark, sf_dir)).persist()
    try:
        est = estimate_pairs("simhash", fingerprints=fps)
        chunks = fps.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).alias("chunk"),
                            F.shiftright("simhash", 4 * k)
                            .bitwiseAND(F.lit(0xF))
                            .alias("cv"),
                        )
                        for k in range(4)
                    ]
                )
            ).alias("cc"),
        ).select("doc_id", "cc.chunk", "cc.cv")
        actual = _join_count(chunks, ["chunk", "cv"], "doc_id")
        assert est["candidate_pairs"] == actual
        assert est["rows"] == chunks.count()
        assert not est["would_saturate"]
    finally:
        fps.unpersist()


def test_minhash_lsh_estimate_is_exact(spark, sf_dir):
    from train_reports_etl_spark.extensions.dedup import (
        _band_explode,
        minhash_signatures,
    )

    sigs = minhash_signatures(_docs(spark, sf_dir), 32, portable=True).persist()
    try:
        est = estimate_pairs(
            "minhash_lsh", signatures=sigs, num_perm=32, bands=8, portable=True
        )
        banded = _band_explode(sigs, 8, 4, True)  # id column is "id"
        actual = _join_count(banded, ["band", "bh"], "id")
        assert est["candidate_pairs"] == actual
    finally:
        sigs.unpersist()


def test_rp_lsh_estimate_is_exact(spark, sf_dir):
    from train_reports_etl_spark.extensions.similarity import (
        random_hyperplanes,
        rp_lsh_buckets,
    )

    embs = _embs(spark, sf_dir)
    est = estimate_pairs("rp_lsh", df=embs, n_bits=16, band_bits=4)
    dim = len(embs.select("embedding").first()[0])
    buckets = rp_lsh_buckets(embs, random_hyperplanes(dim, 16), 4)
    actual = _join_count(buckets, ["band", "bucket"], "id")
    assert est["candidate_pairs"] == actual


def test_blocked_cosine_estimate_is_exact(spark, sf_dir):
    embs = _embs(spark, sf_dir)
    est = estimate_pairs("blocked_cosine", df=embs, block_col="label")
    actual = _join_count(
        embs.select("vec_id", F.col("label").alias("blk")), ["blk"], "vec_id"
    )
    assert est["candidate_pairs"] == actual
    # block_col=None is the quadratic warning case: C(n, 2) exactly
    n = embs.count()
    whole = estimate_pairs("blocked_cosine", df=embs, block_col=None, max_pairs=10)
    assert whole["candidate_pairs"] == n * (n - 1) // 2
    assert whole["would_saturate"] and whole["degraded_output_rows"] <= 10 * 64


def test_blocking_estimate_is_exact_and_saturation_geometry(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    est = estimate_pairs("blocking", df=cust, block_cols=["c_nationkey"])
    actual = _join_count(
        cust.select("c_custkey", "c_nationkey"), ["c_nationkey"], "c_custkey"
    )
    assert est["candidate_pairs"] == actual
    # force saturation: the degrade geometry must mirror the operators'
    # width formula (budget spread over keyed rows, capped at 64)
    tight = estimate_pairs(
        "blocking", df=cust, block_cols=["c_nationkey"], max_pairs=100
    )
    assert tight["would_saturate"]
    width = max(1, min(64, 100 // max(1, tight["rows"])))
    assert tight["degrade_width"] == width
    assert tight["degraded_output_rows"] == tight["rows"] * width
