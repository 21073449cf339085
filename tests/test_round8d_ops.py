"""Round-8d ops: k-center diversity selection (E90) and successors."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from train_reports_etl_spark.extensions.clustering import (
    kcenter_assign,
    kcenter_select_portable,
    quantize_vectors,
)
from train_reports_etl_spark.extensions.ext_queries import e90_kcenter_diversity
from train_reports_etl_spark.sources.registry import load_table

K = 8


@pytest.fixture(scope="module")
def kcenter_inputs(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_vectors(emb)
    rows = q.collect()
    vecs = {r.vec_id: [int(x) for x in r.vq] for r in rows}
    centers, _ = kcenter_select_portable(emb, k=K)
    return vecs, centers


def _d2(a: list[int], b: list[int]) -> int:
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def test_kcenter_matches_pure_python_replay(kcenter_inputs):
    """Independent recomputation: plain-Python farthest-first over the
    same quantized vectors must pick the identical center sequence
    (ids AND selection distances) — pins the distributed argmax, the
    hash-order seed, and the lowest-id tie-break."""
    vecs, centers = kcenter_inputs
    seed = min(
        vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )
    chosen = [seed]
    expect = [(0, seed, None)]
    for r in range(1, K):
        best_id, best_ms = None, -1
        for i in sorted(vecs):
            ms = min(_d2(vecs[i], vecs[c]) for c in chosen)
            if ms > best_ms:
                best_id, best_ms = i, ms
        chosen.append(best_id)
        expect.append((r, best_id, best_ms))
    got = [(c[0], c[1], c[3]) for c in centers]
    assert got == expect


def test_kcenter_selection_distance_is_non_increasing(kcenter_inputs):
    """Adding a center can only shrink every point's min distance, so
    the max-min (= each round's selection distance) is monotone."""
    _, centers = kcenter_inputs
    ds = [c[3] for c in centers if c[3] is not None]
    assert all(a >= b for a, b in zip(ds, ds[1:]))
    assert all(d > 0 for d in ds)  # 500 distinct vectors, k=8


def test_kcenter_assignment_covers_all_and_centers_self_assign(
    spark, sf_dir, kcenter_inputs
):
    vecs, centers = kcenter_inputs
    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_vectors(emb)
    assigned = kcenter_assign(q, centers).cache()
    try:
        assert assigned.count() == len(vecs)
        center_rows = assigned.filter(
            F.col("vec_id").isin([c[1] for c in centers])
        ).collect()
        assert all(r.d2 == 0 for r in center_rows)
        # coverage radius after all k centers <= the last selection's
        # max-min distance (monotone contraction)
        max_d2 = assigned.agg(F.max("d2")).collect()[0][0]
        assert max_d2 <= centers[-1][3]
    finally:
        assigned.unpersist()


def test_kcenter_gate_row_shape(spark, sf_dir):
    out = e90_kcenter_diversity(spark, sf_dir)
    rows = out.collect()
    assert [r.center_rank for r in rows] == list(range(K))
    assert rows[0].sel_d2 is None
    assert sum(r.n_assigned for r in rows) == 500
    assert all(r.max_d2 >= 0 for r in rows)


# ----------------------------------------------------------- E91

def test_softdedup_cluster_weight_budget(spark, sf_dir):
    """Each cluster's summed weight is <= 1e6 (floor loss only) with
    equality exactly for singletons; weights are positive integers."""
    from train_reports_etl_spark.extensions.dedup import softdedup_weights
    from train_reports_etl_spark.extensions.ext_queries import (
        _shared_winnow_clusters,
    )

    w = softdedup_weights(_shared_winnow_clusters(spark, sf_dir)).cache()
    try:
        assert w.filter((F.col("weight_ppm") <= 0)).count() == 0
        tot = (
            w.groupBy("cluster_rep")
            .agg(
                F.sum("weight_ppm").alias("tw"),
                F.max("cluster_size").alias("sz"),
            )
        )
        assert tot.filter(F.col("tw") > 1000000).count() == 0
        assert (
            tot.filter((F.col("sz") == 1) & (F.col("tw") != 1000000)).count()
            == 0
        )
    finally:
        w.unpersist()


def test_softdedup_rollup_invariants(spark, sf_dir):
    from train_reports_etl_spark.extensions.ext_queries import (
        e91_softdedup_weights,
    )
    from train_reports_etl_spark.sources.registry import load_table

    out = e91_softdedup_weights(spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in out) == n_total
    for r in out:
        # clusters can span sources, but a source never touches more
        # clusters than it has docs, and weights respect the budget
        assert 0 < r.n_clusters <= r.n_docs
        assert 0 < r.sum_weight_ppm <= r.n_docs * 1000000
        assert 0 < r.effective_ppm <= 1000000


# ----------------------------------------------------------- E92

def test_domain_similarity_bounds_and_pair_count(spark, sf_dir):
    from train_reports_etl_spark.extensions.ext_queries import (
        e92_domain_similarity,
    )
    from train_reports_etl_spark.sources.registry import load_table

    rows = e92_domain_similarity(spark, sf_dir).collect()
    n_src = (
        load_table(spark, sf_dir, "documents")
        .select("source")
        .distinct()
        .count()
    )
    # every source shares the global top-vocab head, so all pairs emit
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert r.src_a < r.src_b
        assert r.dot >= 0
        # cosine in [0, 1e6]; the sqrt(x)*sqrt(x) ulp wobble can only
        # shave, never exceed
        assert 0 <= r.cos_ppm <= 1000000


def test_domain_similarity_identical_distribution_is_unit_cosine(spark, sf_dir):
    """Two sources with the same relative token frequencies must score
    ~1e6 (exactly up to one sqrt ulp); the synthetic corpus draws all
    sources from one vocabulary distribution, so the MAX observed pair
    should sit at the top of the scale."""
    from train_reports_etl_spark.extensions.ext_queries import (
        e92_domain_similarity,
    )

    rows = e92_domain_similarity(spark, sf_dir).collect()
    top = max(r.cos_ppm for r in rows)
    assert top > 900000  # same-distribution sources score near 1


# ----------------------------------------------------------- E93

def test_t_closeness_catches_the_skewness_attack(spark):
    """Both nations hold 2 distinct segments (l-diverse at l=2), but
    their proportions are 90/10 against a 50/50 global — the exact
    case l-diversity passes and t-closeness exists to catch.
    Hand-computed: TVD = 0.4 -> 400000 ppm exactly."""
    from train_reports_etl_spark.extensions.privacy import t_closeness_audit

    rows = [(i, "x", 0, 100.0, "A") for i in range(9)]
    rows += [(9, "x", 0, 100.0, "B")]
    rows += [(10, "x", 1, 100.0, "A")]
    rows += [(11 + i, "x", 1, 100.0, "B") for i in range(9)]
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string",
    )
    out = {r.level: r for r in t_closeness_audit(df, t_ppm=200_000).collect()}
    # level 1 = (nation): both classes at exactly 400000 ppm, all rows violate
    assert out[1].max_tvd_ppm == 400000
    assert out[1].violating_rows == 20
    assert not out[1].t_close
    # root: the global distribution vs itself -> identically 0
    assert out[2].max_tvd_ppm == 0 and out[2].violating_rows == 0
    assert out[2].t_close


def test_t_closeness_gate_row_shape(spark, sf_dir):
    from train_reports_etl_spark.extensions.ext_queries import (
        e93_t_closeness_audit,
    )

    out = sorted(
        e93_t_closeness_audit(spark, sf_dir).collect(), key=lambda r: r.level
    )
    assert [r.level for r in out] == [0, 1, 2]
    for r in out:
        assert 0 <= r.max_tvd_ppm <= 1000000
        assert 0 <= r.violating_rows
        assert r.t_close == (r.max_tvd_ppm <= 200_000)
    # the fully-generalized root is the global distribution itself
    assert out[2].max_tvd_ppm == 0
