"""Round-11 optimization-round pins.

The ranking primitives' NULL-key contract (ADVICE r10, medium): a NULL
order key must neither inflate real buckets' offsets nor be silently
dropped — NULL rows survive with NULL rank/sums, non-null rows rank
1..n exactly as if the NULLs were absent. Plus the duplicate-key
guard's pruning resistance (ADVICE r10, low): projecting away any
output column must not let Catalyst eliminate the uniqueness check.
"""

from __future__ import annotations

import pytest


def test_distributed_rank_null_keys_keep_null_rank(spark):
    """NULL order keys: kept with NULL rank, non-null rows rank 1..n
    (the pre-r10 collect()-form contract — the r10 inner join dropped
    the NULL rows AND shifted every surviving rank by the NULL count)."""
    from train_reports_etl_spark.operators.ranking import distributed_rank

    df = spark.createDataFrame(
        [(None, 1), (10, 2), (None, 3), (30, 4), (20, 5)],
        "v int, id int",
    )
    rows = distributed_rank(df, "v", ["v", "id"], n_buckets=4).collect()
    assert len(rows) == 5  # nothing dropped
    got = {r.id: r.rnk for r in rows}
    assert got[2] == 1 and got[5] == 2 and got[4] == 3
    assert got[1] is None and got[3] is None


def test_distributed_prefix_sums_null_keys(spark):
    """NULL order keys in the merged prefix/lead pass: NULL running
    sums and NULL lead, with non-null rows' sums exactly as if the
    NULL rows were absent (and no spurious duplicate-key raise from
    the NULL group, whose count_distinct is always 0)."""
    from train_reports_etl_spark.operators.ranking import (
        distributed_prefix_sums,
    )

    df = spark.createDataFrame(
        [(None, 100), (1, 1), (None, 200), (2, 2), (3, 3)],
        "k int, v int",
    )
    rows = distributed_prefix_sums(
        df, "k", ["v"], n_buckets=2, sum_names=["cum"], lead_name="nxt"
    ).collect()
    assert len(rows) == 5
    nn = {r.k: (r.cum, r.nxt) for r in rows if r.k is not None}
    assert nn == {1: (1, 2), 2: (3, 3), 3: (6, None)}
    nulls = [r for r in rows if r.k is None]
    assert all(r.cum is None and r.nxt is None for r in nulls)


def test_prefix_sums_guard_survives_column_pruning(spark):
    """The duplicate-key guard rides the JOIN KEY, so pruning the
    first (or any) sum column from the output cannot optimize the
    assert_true away (ADVICE r10: it was attached only to __off_0)."""
    from train_reports_etl_spark.operators.ranking import (
        distributed_prefix_sums,
    )

    dup = spark.createDataFrame(
        [(1, 5, 1), (1, 6, 1), (2, 7, 1)], "k long, v long, w long"
    )
    out = distributed_prefix_sums(dup, "k", ["v", "w"], sum_names=["cv", "cw"])
    with pytest.raises(Exception, match="duplicate"):
        out.select("cw").collect()  # cv (the old guard carrier) pruned


def _zipfish_docs(spark, n=160, seed=7):
    """Deterministic mixed-vocabulary corpus with planted near-dups:
    enough shared 3-gram shingles that both the jaccard and the
    containment joins emit pairs, plus exact-duplicate planted rows."""
    import random as _random

    rng = _random.Random(seed)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    for i in range(n):
        toks = [vocab[min(59, int(rng.expovariate(0.12)))] for _ in range(rng.randint(3, 30))]
        rows.append((i, " ".join(toks)))
        if i % 5 == 0:  # planted near-dup: copy with a 1-token edit
            mut = list(toks)
            mut[rng.randrange(len(mut))] = vocab[rng.randrange(60)]
            rows.append((10_000 + i, " ".join(mut)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_jaccard_containment_digest_equals_string_keys(spark):
    """r11 digest-keys property (guide §8: shuffle keys, not payloads):
    joining the posting self-joins on xxhash64(shingle) must reproduce
    the string-keyed result EXACTLY — on a corpus where both paths emit
    a non-trivial pair set — for jaccard (both prefix paths) and
    containment."""
    from train_reports_etl_spark.extensions.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    docs = _zipfish_docs(spark)
    for pf in (False, True):
        s = {
            (r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in jaccard_pairs(
                docs, 0.5, prefix_filter=pf, digest_keys=False
            ).collect()
        }
        d = {
            (r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in jaccard_pairs(
                docs, 0.5, prefix_filter=pf, digest_keys=True
            ).collect()
        }
        assert s and s == d, f"prefix_filter={pf}"
    cs = {
        (r.doc_a, r.doc_b, r.containment_ppm)
        for r in containment_pairs(docs, 800_000, digest_keys=False).collect()
    }
    cd = {
        (r.doc_a, r.doc_b, r.containment_ppm)
        for r in containment_pairs(docs, 800_000, digest_keys=True).collect()
    }
    assert cs and cs == cd


def test_shingle_digest_collision_free_on_committed_corpora(spark):
    """xxhash64 injectivity over the committed corpora's distinct
    shingles — the exactness precondition of the digest join (the
    docstring's D²/2⁶⁵ bound made checkable): distinct digest count
    equals distinct shingle count at sf0.001 AND sf0.01."""
    from pyspark.sql import functions as F

    from train_reports_etl_spark.extensions.text import shingle_posting

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        posting = shingle_posting(docs).select("sh").distinct()
        row = posting.agg(
            F.count("*").alias("n_sh"),
            F.countDistinct(F.xxhash64("sh")).alias("n_digest"),
        ).collect()[0]
        assert row.n_sh > 0 and row.n_sh == row.n_digest, sf


def test_conformal_threshold_empty_test_split(spark):
    """ADVICE r10 (low): a non-empty calibration split with an EMPTY
    test split must still return one row carrying n_cal and the
    computed q̂ (test-side columns NULL/0), matching the pre-r10
    scalar-collect form — the r10 crossJoin aggregate dropped it."""
    from train_reports_etl_spark.extensions.evaluation import (
        conformal_threshold,
    )

    # only even event_ids -> everything lands in the calibration split
    rows = [(2 * i, (i % 100) / 1.0, "purchase") for i in range(50)]
    ev = spark.createDataFrame(
        rows, "event_id long, value double, event_type string"
    )
    out = conformal_threshold(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_cal == 50 and r.qhat_ppm is not None
    assert r.n_test == 0 and r.n_test_pos is None
    assert r.coverage_ppm is None and r.flagged_ppm is None


def test_conformal_threshold_empty_calibration(spark):
    """Empty calibration split still yields an empty frame (the
    documented r10 contract, re-pinned across the r11 restructure)."""
    from train_reports_etl_spark.extensions.evaluation import (
        conformal_threshold,
    )

    # only odd event_ids -> calibration (even parity) is empty
    rows = [(2 * i + 1, (i % 100) / 1.0, "purchase") for i in range(10)]
    ev = spark.createDataFrame(
        rows, "event_id long, value double, event_type string"
    )
    assert conformal_threshold(ev).count() == 0
