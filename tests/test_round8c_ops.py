"""Round-8c ops: record linkage (E73) and successors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from train_reports_etl_spark.extensions.linkage import (
    MATCH_MILLIBITS,
    POSSIBLE_MILLIBITS,
    blocked_pairs,
    link_customers,
    perturbed_customers,
    _clean_side,
)
from train_reports_etl_spark.sources.registry import load_table

# True-pair weights are DETERMINISTIC per perturbation class (see
# linkage.WEIGHTS): clean / clean+blank-seg / case-flip / flip+blank /
# char-drop / drop+blank — hyphen swaps score like case-flip.
TRUE_CLASS_WEIGHTS = {14260, 13260, 9260, 8260, 3160, 2160}


@pytest.fixture(scope="module")
def scored(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    return link_customers(cust).cache()


def test_linkage_full_recall_above_review_band(scored):
    """Every replica's true partner is (a) generated as a candidate by
    at least one blocking pass and (b) scored at or above the review
    threshold — the property the threshold tuning comment claims."""
    true_pairs = scored.filter(F.col("b") - 1000000 == F.col("a"))
    total = true_pairs.count()
    assert total > 0
    below = true_pairs.filter(F.col("weight_mb") < POSSIBLE_MILLIBITS).count()
    assert below == 0


def test_linkage_true_pair_weights_are_the_class_constants(scored):
    got = {r.weight_mb for r in
           scored.filter(F.col("b") - 1000000 == F.col("a"))
           .select("weight_mb").distinct().collect()}
    assert got <= TRUE_CLASS_WEIGHTS


def test_linkage_recall_counts_match_population(spark, sf_dir, scored):
    n = load_table(spark, sf_dir, "customer").count()
    true_found = scored.filter(F.col("b") - 1000000 == F.col("a")).count()
    assert true_found == n  # both blocking passes net every true pair


def test_linkage_blocking_is_not_a_cross_join(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    left = _clean_side(cust)
    right = perturbed_customers(cust)
    n = cust.count()
    pairs = blocked_pairs(left, right).count()
    assert pairs < n * n / 4  # nation blocks bound the pair space


def test_linkage_decision_boundaries(scored):
    bad = scored.filter(
        ((F.col("weight_mb") >= MATCH_MILLIBITS) & (F.col("decision") != "match"))
        | (
            (F.col("weight_mb") >= POSSIBLE_MILLIBITS)
            & (F.col("weight_mb") < MATCH_MILLIBITS)
            & (F.col("decision") != "possible")
        )
        | ((F.col("weight_mb") < POSSIBLE_MILLIBITS) & (F.col("decision") != "non_match"))
    ).count()
    assert bad == 0


def test_linkage_pattern_is_six_agreement_bits(scored):
    bad = scored.filter(~F.col("pattern").rlike("^[01]{6}$")).count()
    assert bad == 0


def test_linkage_deterministic_rerun(spark, sf_dir, scored):
    again = link_customers(load_table(spark, sf_dir, "customer"))
    a = scored.orderBy("a", "b").collect()
    b = again.orderBy("a", "b").collect()
    assert a == b


# ----------------------------------------------------------- E74

def test_novelty_first_doc_fully_novel(spark, sf_dir):
    from train_reports_etl_spark.extensions.corpus import novelty_metrics

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    nm = novelty_metrics(docs)
    min_id = docs.agg(F.min("doc_id")).first()[0]
    row = nm.filter(F.col("doc_id") == min_id).first()
    assert row.novelty_ppm == 1000000 and row.n_novel == row.n_grams


def test_novelty_sums_to_corpus_vocabulary(spark, sf_dir):
    from train_reports_etl_spark.extensions.corpus import novelty_metrics
    from train_reports_etl_spark.extensions.text import shingle_posting

    docs = load_table(spark, sf_dir, "documents")
    nm = novelty_metrics(docs)
    total_novel = nm.agg(F.sum("n_novel")).first()[0]
    vocab = shingle_posting(docs).select("sh").distinct().count()
    assert total_novel == vocab  # every gram is novel exactly once


def test_novelty_exact_duplicate_scores_zero(spark, sf_dir):
    from train_reports_etl_spark.extensions.corpus import novelty_metrics

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 31)
    dup = docs.limit(1).select(
        (F.col("doc_id") + 10**9).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    nm = novelty_metrics(docs.unionByName(dup))
    row = nm.filter(F.col("doc_id") >= 10**9).first()
    assert row.novelty_ppm == 0 and row.n_novel == 0


def test_accretion_curve_monotone_and_complete(spark, sf_dir):
    from train_reports_etl_spark.extensions.corpus import accretion_curve
    from train_reports_etl_spark.extensions.text import shingle_posting

    docs = load_table(spark, sf_dir, "documents")
    curve = accretion_curve(docs, buckets=10).orderBy("bucket").collect()
    assert [r.bucket for r in curve] == sorted(r.bucket for r in curve)
    cums = [r.cum_grams for r in curve]
    assert cums == sorted(cums)
    assert curve[-1].cum_ppm == 1000000
    vocab = shingle_posting(docs).select("sh").distinct().count()
    assert curve[-1].cum_grams == vocab == sum(r.n_new_grams for r in curve)


# ----------------------------------------------------------- E75

def _lp(spark, edges, seeds, nodes, iters=3):
    from train_reports_etl_spark.extensions.graph import label_propagation

    e = spark.createDataFrame(edges or [(0, 0)], "u long, v long")
    if not edges:
        e = e.filter("u < 0")
    s = spark.createDataFrame(seeds or [(0, "x")], "node long, label string")
    if not seeds:
        s = s.filter("node < 0")
    n = spark.createDataFrame([(x,) for x in nodes], "node long")
    return {
        r.node: (r.label, r.is_seed)
        for r in label_propagation(e, s, n, iters=iters).collect()
    }


def test_label_prop_seeds_are_clamped(spark):
    # seed 1 is adjacent to two 'b'-labeled seeds: mode would flip it,
    # clamping must not
    out = _lp(spark, [(1, 2), (1, 3)], [(1, "a"), (2, "b"), (3, "b")], [1, 2, 3])
    assert out[1] == ("a", True)
    assert out[2] == ("b", True) and out[3] == ("b", True)


def test_label_prop_tie_breaks_by_label_asc(spark):
    out = _lp(spark, [(1, 2), (3, 2)], [(1, "b"), (3, "a")], [1, 2, 3], iters=1)
    assert out[2] == ("a", False)  # counts tie 1-1, 'a' < 'b'


def test_label_prop_spreads_one_hop_per_round(spark):
    # chain seed(1) - 2 - 3 - 4: after 2 rounds node 3 is labeled,
    # node 4 is not yet
    chain = [(1, 2), (2, 3), (3, 4)]
    two = _lp(spark, chain, [(1, "s")], [1, 2, 3, 4], iters=2)
    assert two[2] == ("s", False) and two[3] == ("s", False)
    assert two[4][0] is None
    three = _lp(spark, chain, [(1, "s")], [1, 2, 3, 4], iters=3)
    assert three[4] == ("s", False)


def test_label_prop_isolated_node_stays_null(spark):
    out = _lp(spark, [(1, 2)], [(1, "s")], [1, 2, 99])
    assert out[99][0] is None and out[99][1] is False


def test_label_prop_pure_synchronous_redecide(spark):
    # node 2's neighborhood changes label mass between rounds: round 1
    # gives it 'a' (only labeled neighbor), but once 3 and 4 (seeds 'b')
    # reach... construct: 2 adjacent to seed-a and to 3,4 which are
    # seeds 'b' -> mode is immediately 'b' (2 votes vs 1)
    out = _lp(spark, [(1, 2), (3, 2), (4, 2)], [(1, "a"), (3, "b"), (4, "b")], [1, 2, 3, 4], iters=1)
    assert out[2] == ("b", False)


# ----------------------------------------------------------- E76

def _iso_reference(rows):
    """Exact minimax isotonic fit in Fractions, floored to milli the
    same way both engines do (floor of 1000 * IEEE quotient)."""
    import math
    from fractions import Fraction

    Wc, Sc = [0], [0]
    for _, w, p in rows:
        Wc.append(Wc[-1] + w)
        Sc.append(Sc[-1] + p)
    out = {}
    for i in range(1, len(rows) + 1):
        best = max(
            min(
                Fraction(Sc[k] - Sc[j - 1], Wc[k] - Wc[j - 1])
                for k in range(i, len(rows) + 1)
            )
            for j in range(1, i + 1)
        )
        out[rows[i - 1][0]] = math.floor(1000 * (best.numerator / best.denominator))
    return out


def _iso_run(spark, rows, **kw):
    from train_reports_etl_spark.extensions.calibration import isotonic_calibration

    df = spark.createDataFrame(rows, "bin long, w long, pos long")
    return {r.bin: r.fitted_milli for r in isotonic_calibration(df, **kw).collect()}


def test_isotonic_matches_exact_minimax_on_random_instances(spark):
    import random

    random.seed(13)
    for _ in range(3):
        rows = []
        for b in range(random.randint(1, 30)):
            w = random.randint(1, 9)
            rows.append((b, w, random.randint(0, w)))
        assert _iso_run(spark, rows) == _iso_reference(rows)


def test_isotonic_edge_shapes(spark):
    for rows in (
        [(0, 5, 2)],                            # single bin
        [(0, 3, 0), (1, 3, 0)],                 # all zeros
        [(0, 2, 2), (1, 4, 4)],                 # all ones
        [(0, 4, 1), (1, 4, 2), (2, 4, 3)],      # already monotone
        [(0, 4, 3), (1, 4, 2), (2, 4, 1)],      # fully reversed -> one pool
    ):
        assert _iso_run(spark, rows) == _iso_reference(rows)


def test_isotonic_fit_is_monotone_nondecreasing(spark, sf_dir):
    from train_reports_etl_spark.extensions.calibration import isotonic_calibration

    ev = load_table(spark, sf_dir, "events")
    bins = ev.groupBy(F.floor("value").cast("long").alias("bin")).agg(
        F.count("*").cast("long").alias("w"),
        F.sum((F.col("event_type") == "purchase").cast("long")).cast("long").alias("pos"),
    )
    got = isotonic_calibration(bins).orderBy("bin").collect()
    fits = [r.fitted_milli for r in got]
    assert fits == sorted(fits)
    assert all(0 <= f <= 1000 for f in fits)


def test_isotonic_bucketing_invariance(spark):
    rows = [(b, 3 + b % 4, (b * 7) % 3) for b in range(40)]
    assert _iso_run(spark, rows, n_buckets=1) == _iso_run(spark, rows, n_buckets=32)


# ----------------------------------------------------------- E77

def _sketch(spark, df, k=8):
    from train_reports_etl_spark.extensions.sketches import rank_sample_sketch

    return rank_sample_sketch(df, ["g"], "v", "id", k=k)


def test_rank_sketch_is_exact_midpoint_order_statistics(spark):
    import math

    rows = [(i, "a", (i * 37) % 101) for i in range(57)] + [
        (1000 + i, "b", i * i) for i in range(23)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    k = 8
    got = {(r.g, r.i): (r.value, r.n) for r in _sketch(spark, df, k).collect()}
    by_g = {}
    for _, g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        vals.sort()
        n = len(vals)
        for i in range(1, k + 1):
            target = math.ceil((2 * i - 1) * n / (2 * k))
            assert got[(g, i)] == (vals[target - 1], n)
    assert len(got) == 2 * k


def test_rank_sketch_partitioning_invariance(spark):
    rows = [(i, "a" if i % 3 else "b", (i * 17) % 59) for i in range(80)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    one = sorted(map(tuple, _sketch(spark, df.repartition(1)).collect()))
    many = sorted(map(tuple, _sketch(spark, df.repartition(13)).collect()))
    assert one == many


def test_rank_sketch_tiny_group_repeats_values(spark):
    df = spark.createDataFrame([(1, "t", 5), (2, "t", 9)], "id long, g string, v long")
    got = _sketch(spark, df, k=8).collect()
    assert len(got) == 8  # k rows even when n < k
    assert {r.value for r in got} == {5, 9}


def test_merged_sketch_rank_error_bound(spark):
    from train_reports_etl_spark.extensions.sketches import merge_rank_sketches

    k = 16
    rows = (
        [(i, "a", (i * 37) % 501) for i in range(300)]
        + [(10_000 + i, "b", 400 + (i * 11) % 900) for i in range(150)]
        + [(20_000 + i, "c", i) for i in range(50)]
    )
    df = spark.createDataFrame(rows, "id long, g string, v long")
    sk = _sketch(spark, df, k=k)
    merged = {r.j: r.est_value for r in merge_rank_sketches(sk, ["g"], k=k).collect()}
    allv = sorted(v for _, _, v in rows)
    n_total, n_groups = len(allv), 3
    assert len(merged) == k
    for j in range(1, k + 1):
        est = merged[j]
        # true rank interval of est among all values
        lo = sum(1 for v in allv if v < est)
        hi = sum(1 for v in allv if v <= est)
        target = (2 * j - 1) * n_total / (2 * k)
        slack = n_total / k + n_groups
        assert lo - slack <= target <= hi + slack, (j, est, lo, hi, target)


# ----------------------------------------------------------- E78

def test_frequent_itemsets_match_bruteforce(spark):
    from itertools import combinations

    from train_reports_etl_spark.extensions.text import frequent_itemsets

    corpus = [
        "a b c", "a b", "a c d", "b c", "a b c d", "d e", "a b e", "c",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = {
        (r.size, tuple(r.items.split("\x1f"))): r.support
        for r in frequent_itemsets(df, min_support=3, max_size=3).collect()
    }
    sets = [set(t.split()) for t in corpus]
    exp = {}
    vocab = sorted(set().union(*sets))
    for k in (1, 2, 3):
        for combo in combinations(vocab, k):
            sup = sum(1 for s in sets if set(combo) <= s)
            if sup >= 3:
                exp[(k, combo)] = sup
    assert got == exp


def test_frequent_itemsets_downward_closure(spark, sf_dir):
    from itertools import combinations

    from train_reports_etl_spark.extensions.text import frequent_itemsets

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    rows = frequent_itemsets(docs, min_support=(7 * n) // 10, max_size=3).collect()
    sup = {tuple(r.items.split("\x1f")): r.support for r in rows}
    for items, s in sup.items():
        assert list(items) == sorted(items)  # canonical order
        for sub in combinations(items, len(items) - 1):
            if sub:
                assert sub in sup and sup[sub] >= s  # anti-monotone


# ----------------------------------------------------------- E79

def test_dsir_matches_pure_python_reference(spark):
    import hashlib
    import math

    from train_reports_etl_spark.extensions.corpus import dsir_importance

    corpus = [
        (0, "the cat sat", "en"), (1, "the dog ran", "en"),
        (2, "der hund lief", "de"), (3, "el gato corre", "es"),
        (4, "the the the", "en"), (5, "xyz qrs", "de"), (6, "", "de"),
        (7, "cat dog cat", "de"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string, lang string")
    got = {
        r.doc_id: (r.n_tokens, r.score_milli, r.selected)
        for r in dsir_importance(df, F.col("lang") == "en").collect()
    }

    def bucket(t):
        h = hashlib.md5(t.encode()).hexdigest()
        return (int(h[0], 16) * 16 + int(h[1], 16)) % 64

    import re

    toks = {i: re.findall("[a-z0-9]+", t.lower()) for i, t, _ in corpus}
    cr, ct = {}, {}
    for i, _, lang in corpus:
        for t in toks[i]:
            b = bucket(t)
            cr[b] = cr.get(b, 0) + 1
            if lang == "en":
                ct[b] = ct.get(b, 0) + 1
    w = {b: math.floor(1000 * (math.log2(ct.get(b, 0) + 1) - math.log2(c + 1)))
         for b, c in cr.items()}
    c_milli = math.floor(
        1000 * (math.log2(sum(cr.values()) + 64) - math.log2(sum(ct.values()) + 64))
    )
    scores = {
        i: sum(w[bucket(t)] for t in toks[i]) + len(toks[i]) * c_milli
        for i, _, _ in corpus
    }
    order = sorted(scores, key=lambda i: (-scores[i], i))
    quota = len(corpus) // 4
    for i, _, _ in corpus:
        assert got[i][0] == len(toks[i])
        assert got[i][1] == scores[i], (i, got[i][1], scores[i])
        assert got[i][2] == (order.index(i) < quota)


def test_dsir_target_language_scores_higher(spark, sf_dir):
    from train_reports_etl_spark.extensions.corpus import dsir_importance

    docs = load_table(spark, sf_dir, "documents")
    out = dsir_importance(docs, F.col("lang") == "en").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    means = {
        r.lang: r.m
        for r in out.groupBy("lang").agg(F.avg("score_milli").alias("m")).collect()
    }
    assert means["en"] == max(means.values())


def test_dsir_quota_and_determinism(spark, sf_dir):
    from train_reports_etl_spark.extensions.corpus import dsir_importance

    docs = load_table(spark, sf_dir, "documents")
    a = dsir_importance(docs, F.col("lang") == "en")
    n = docs.count()
    assert a.filter("selected").count() == n // 4
    b = dsir_importance(docs, F.col("lang") == "en")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ----------------------------------------------------------- E80

def test_k_anonymity_hand_corpus(spark):
    from train_reports_etl_spark.extensions.privacy import k_anonymity_ladder

    # nation 0: 6 identical rows (k-anon at every level);
    # nation 1: 2+3 rows split across segments (violations below root)
    rows = (
        [(i, "x", 0, 100.0, "AUTO") for i in range(6)]
        + [(10 + i, "x", 1, 100.0, "AUTO") for i in range(2)]
        + [(20 + i, "x", 1, 100.0, "BIKE") for i in range(3)]
    )
    df = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey long, c_acctbal double, c_mktsegment string"
    )
    out = {r.level: r for r in k_anonymity_ladder(df, k=5).collect()}
    assert out[0].n_classes == 3 and out[0].violating_rows == 5
    assert out[1].n_classes == 3 and out[1].violating_rows == 5
    assert out[2].n_classes == 2 and out[2].violating_rows == 0
    assert out[2].k_anonymous and not out[0].k_anonymous
    assert out[3].n_classes == 1 and out[3].min_class_size == 11
    assert out[3].k_anonymous


def test_k_anonymity_ladder_is_monotone(spark, sf_dir):
    from train_reports_etl_spark.extensions.privacy import k_anonymity_ladder

    cust = load_table(spark, sf_dir, "customer")
    out = sorted(k_anonymity_ladder(cust, k=5).collect(), key=lambda r: r.level)
    assert [r.level for r in out] == [0, 1, 2, 3]
    mins = [r.min_class_size for r in out]
    viol = [r.violating_rows for r in out]
    assert mins == sorted(mins)          # generalizing merges classes
    assert viol == sorted(viol, reverse=True)


# ----------------------------------------------------------- E81

def _kc(spark, edges, k=2, rounds=6):
    from train_reports_etl_spark.extensions.graph import k_core

    e = spark.createDataFrame(edges, "u long, v long")
    return {r.node: r.core_degree for r in k_core(e, k=k, rounds=rounds).collect()}


def test_k_core_triangle_with_pendant(spark):
    out = _kc(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    assert out == {1: 2, 2: 2, 3: 2}  # pendant 4 peeled, triangle survives


def test_k_core_chain_is_empty(spark):
    assert _kc(spark, [(1, 2), (2, 3), (3, 4)]) == {}


def test_k_core_cascading_peel(spark):
    # peeling 5 exposes 4, which then falls too: needs >1 round
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    assert _kc(spark, edges) == {1: 2, 2: 2, 3: 2}


def test_k_core_gate_corpus_reaches_fixed_point(spark, sf_dir):
    from train_reports_etl_spark.extensions.ext_queries import _winnow_pairs
    from train_reports_etl_spark.extensions.graph import k_core

    edges = _winnow_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    six = sorted(map(tuple, k_core(edges, k=2, rounds=6).collect()))
    seven = sorted(map(tuple, k_core(edges, k=2, rounds=7).collect()))
    assert six == seven and len(six) > 0


# ----------------------------------------------------------- E82

def test_tokenizer_fertility_hand_check(spark):
    import re

    from train_reports_etl_spark.extensions.ext_queries import e82_tokenizer_fertility
    from train_reports_etl_spark.extensions.ext_queries import _BPE_ROUND0_RE

    # fertility >= 1000 always (a piece count is >= 1 per word... only
    # true for non-empty tokens), and exact on a tiny corpus
    corpus = [(0, "the theory in", "en"), (1, "on and on", "en"), (2, "xq", "de")]
    import pandas as pd  # noqa: F401

    df = spark.createDataFrame(corpus, "doc_id long, text string, lang string")
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out = {r.lang: r for r in e82_tokenizer_fertility(spark, d).collect()}
    def pieces(tok):
        return len(re.sub(_BPE_ROUND0_RE, "x", tok))
    en_words = ["the", "theory", "in", "on", "and", "on"]
    exp_pieces = sum(pieces(t) for t in en_words)
    assert out["en"].n_words == 6
    assert out["en"].n_pieces == exp_pieces
    assert out["en"].fertility_milli == (exp_pieces * 1000) // 6
    assert out["de"].n_words == 1 and out["de"].n_docs == 1
    for r in out.values():
        assert r.fertility_milli >= 1000


# ----------------------------------------------------------- E83

def _wf(spark, rows, budget, rounds=6):
    from train_reports_etl_spark.extensions.corpus import waterfill_budget

    df = spark.createDataFrame(rows, "source string, cap long, w long")
    return {
        r.source: (r.allocated, r.capped)
        for r in waterfill_budget(df, budget=budget, rounds=rounds).collect()
    }


def test_waterfill_exact_budget_and_caps(spark):
    rows = [("a", 100, 10), ("b", 1000, 31), ("c", 50, 7), ("d", 4000, 63)]
    budget = 2000
    out = _wf(spark, rows, budget)
    caps = dict((s, c) for s, c, _ in rows)
    assert sum(a for a, _ in out.values()) == budget
    for s, (a, capped) in out.items():
        assert a <= caps[s]
        if capped:
            assert a == caps[s]


def test_waterfill_matches_fraction_reference(spark):
    from fractions import Fraction

    rows = [("a", 120, 10), ("b", 30, 9), ("c", 700, 26), ("d", 45, 6), ("e", 800, 28)]
    budget = 600
    out = _wf(spark, rows, budget)
    # exact reference: iterate capping until stable with Fraction lambda
    capped = set()
    while True:
        num = budget - sum(c for s, c, _ in rows if s in capped)
        den = sum(w for s, _, w in rows if s not in capped)
        lam = Fraction(num, den) if den else Fraction(0)
        newly = {
            s for s, c, w in rows
            if s not in capped and Fraction(c) <= lam * w
        }
        if not newly:
            break
        capped |= newly
    base, rem = {}, {}
    for s, c, w in rows:
        if s in capped:
            base[s], rem[s] = c, 0
        else:
            base[s] = (w * num) // den
            rem[s] = w * num - base[s] * den
    shortfall = min(budget, sum(c for _, c, _ in rows)) - sum(base.values())
    order = sorted((s for s, _, _ in rows), key=lambda s: (-rem[s], s))
    exp = {
        s: base[s] + (1 if s not in capped and order.index(s) < shortfall else 0)
        for s, _, _ in rows
    }
    assert {s: a for s, (a, _) in out.items()} == exp


def test_waterfill_budget_exceeds_caps(spark):
    rows = [("a", 10, 3), ("b", 20, 4)]
    out = _wf(spark, rows, budget=1000)
    assert out == {"a": (10, True), "b": (20, True)}


def test_waterfill_gate_corpus_fixed_point(spark, sf_dir):
    from train_reports_etl_spark.extensions.corpus import waterfill_budget
    from train_reports_etl_spark.extensions.text import tokens as _toks

    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.sum(F.size(_toks(F.col("text")))).cast("long").alias("cap"),
        F.floor(F.sqrt(F.sum(F.size(_toks(F.col("text")))))).cast("long").alias("w"),
    )
    budget = src.agg(F.sum("cap")).first()[0] // 4
    six = sorted(map(tuple, waterfill_budget(src, budget, rounds=6).collect()))
    seven = sorted(map(tuple, waterfill_budget(src, budget, rounds=7).collect()))
    assert six == seven
    assert sum(r[3] for r in six) == budget


def test_linkage_oversized_block_guard(spark):
    """A degenerate corpus (every row same nation + same balance) makes
    pass-1 one giant block; the guard must skip it (candidates collapse
    to the digit pass) while the digit pass keeps recall at 100%."""
    from train_reports_etl_spark.extensions.linkage import (
        _clean_side,
        blocked_pairs,
        perturbed_customers,
        score_pairs,
    )

    n = 1500
    # 550.00 sits mid-band: the ±3-cent jitter cannot straddle the
    # $100 boundary, so every row lands in ONE pass-1 block
    rows = [(i, f"Customer#{i:09d}", 7, 550.0, "AUTO") for i in range(n)]
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double,"
        " c_mktsegment string",
    )
    left, right = _clean_side(df), perturbed_customers(df)
    capped = blocked_pairs(left, right, max_block_rows=1000).count()
    uncapped = blocked_pairs(left, right, max_block_rows=None).count()
    assert uncapped >= n * n * 0.9      # the giant block really is quadratic
    assert capped < 30 * n              # guard collapses it to the digit pass
    scored = score_pairs(left, right, blocked_pairs(left, right, max_block_rows=1000))
    true_found = scored.filter(F.col("b") - 1000000 == F.col("a")).count()
    assert true_found == n              # recall intact via the digit pass


# ----------------------------------------------------------- E84

def test_rrf_fusion_self_consistency(spark, sf_dir):
    from train_reports_etl_spark.extensions.ext_queries import e84_rrf_fusion

    rows = e84_rrf_fusion(spark, sf_dir).collect()
    assert len(rows) == 10
    assert [r.fused_rank for r in rows] == list(range(1, 11))
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        exp = 0
        if r.lex_rank is not None:
            exp += 1000000000 // (60 + r.lex_rank)
        if r.den_rank is not None:
            exp += 1000000000 // (60 + r.den_rank)
        assert r.rrf_score == exp
        assert r.lex_rank is not None or r.den_rank is not None


def test_rrf_doc_in_both_lists_outranks_single_list_peers(spark, sf_dir):
    from train_reports_etl_spark.extensions.ext_queries import e84_rrf_fusion

    rows = e84_rrf_fusion(spark, sf_dir).collect()
    both = [r for r in rows if r.lex_rank is not None and r.den_rank is not None]
    single = [r for r in rows if (r.lex_rank is None) != (r.den_rank is None)]
    if both and single:
        assert max(r.rrf_score for r in both) > max(r.rrf_score for r in single)


# ----------------------------------------------------------- E85

def _hll_py(elem):
    from train_reports_etl_spark.streaming.stateful import _hll_parts_py

    return _hll_parts_py(elem)


def test_hll_python_twin_matches_sql_expression(spark):
    """_hll_parts_py must be the bit-exact twin of hll_parts_sql —
    the property the strong oracle rests on."""
    from train_reports_etl_spark.extensions.sketches import hll_parts_sql

    elems = [f"item-{i}" for i in range(40)] + ["view", "click", "purchase", ""]
    bucket, rho = hll_parts_sql("e")
    df = spark.createDataFrame([(x,) for x in elems], "e string")
    got = {r.e: (r.b, r.r) for r in df.selectExpr("e", f"{bucket} AS b", f"{rho} AS r").collect()}
    for e in elems:
        assert got[e] == _hll_py(e), e


def test_streaming_hll_windows_split_and_flush(spark, tmp_path):
    import time

    from train_reports_etl_spark.streaming.stateful import (
        streaming_hll_session_distinct,
    )

    src = str(tmp_path / "hll_in")
    rows = [
        (1, "2024-01-01 00:00:00", "a"),
        (1, "2024-01-01 00:10:00", "b"),
        # > 30 min gap: window 1 closes in-batch
        (1, "2024-01-01 01:00:00", "a"),
        (1, "2024-01-01 01:05:00", "c"),
        (2, "2024-01-01 00:00:00", "a"),
    ]
    (
        spark.createDataFrame(rows, ["key_id", "s", "e"])
        .withColumn("ts", F.to_timestamp("s")).drop("s")
        .coalesce(1).write.mode("append").parquet(src)
    )
    stream = spark.readStream.schema("key_id bigint, e string, ts timestamp").parquet(src)
    out = streaming_hll_session_distinct(
        stream, key_col="key_id", elem_col="e", ts_col="ts",
        gap_ms=1_800_000, watermark="30 minutes",
    )
    q = out.writeStream.outputMode("append").format("memory").queryName("hll_test").start()
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM hll_test").collect()
        # window 1 of key 1 closed by the in-batch gap: registers of {a, b}
        exp1 = {}
        for e in ("a", "b"):
            b, r = _hll_py(e)
            exp1[b] = max(exp1.get(b, 0), r)
        w1 = [r for r in got if r.key == 1 and str(r.session_start).startswith("2024-01-01 00:")]
        assert {(r.bucket, r.rho) for r in w1} == set(exp1.items())
        assert all(str(r.session_end) == "2024-01-01 00:10:00" for r in w1)
        # feed a far-future event: watermark advances past every
        # trailing window's timeout -> flush
        (
            spark.createDataFrame([(99, "2024-01-02 12:00:00", "z")], ["key_id", "s", "e"])
            .withColumn("ts", F.to_timestamp("s")).drop("s")
            .coalesce(1).write.mode("append").parquet(src)
        )
        time.sleep(0.1)
        q.processAllAvailable()
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM hll_test").collect()
        w2 = [r for r in got if r.key == 1 and str(r.session_start).startswith("2024-01-01 01:")]
        exp2 = {}
        for e in ("a", "c"):
            b, r = _hll_py(e)
            exp2[b] = max(exp2.get(b, 0), r)
        assert {(r.bucket, r.rho) for r in w2} == set(exp2.items())
        assert any(r.key == 2 for r in got)  # key 2's only window flushed
    finally:
        q.stop()


def test_streaming_hll_registers_merge_to_batch_sketch(spark, sf_dir):
    """Union of all emitted windows' registers, merged by max(rho),
    must equal the batch whole-stream register table for the keys
    whose every window was emitted — here checked corpus-wide against
    batch registers restricted to emitted sessions via the oracle
    contract (register merge law on real emissions)."""
    from train_reports_etl_spark.extensions.ext_queries import (
        e85_streaming_hll_sessions,
    )

    out = e85_streaming_hll_sessions(spark, sf_dir)
    merged = out.groupBy("key", "bucket").agg(F.max("rho").alias("rho"))
    # merge law sanity: rho values legal, buckets in range
    bad = merged.filter(
        (F.col("bucket") < 0) | (F.col("bucket") > 255)
        | (F.col("rho") < 1) | (F.col("rho") > 53)
    ).count()
    assert bad == 0 and merged.count() > 0


# ----------------------------------------------------------- E87

def test_l_diversity_homogeneity_attack(spark):
    from train_reports_etl_spark.extensions.privacy import l_diversity_audit

    # nation 0: 8 rows, ALL one segment — k-anonymous yet homogeneous
    # (the attack l-diversity exists to catch); nation 1: 6 rows over
    # 3 segments (diverse at every level).
    rows = (
        [(i, "x", 0, 100.0, "AUTO") for i in range(8)]
        + [(10 + i, "x", 1, 100.0, seg)
           for i, seg in enumerate(["AUTO", "AUTO", "BIKE", "BIKE",
                                    "SHIP", "SHIP"])]
    )
    df = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey long, c_acctbal double, c_mktsegment string"
    )
    out = {r.level: r for r in l_diversity_audit(df, l=3).collect()}
    # level 0/1: nation-0 class has 1 distinct segment -> 8 rows violate
    assert out[0].min_l == 1 and out[0].violating_rows == 8
    assert not out[0].l_diverse
    assert out[1].min_l == 1 and out[1].violating_rows == 8
    # root: 3 distinct segments across all 14 rows — exactly l, so
    # diverse at the >=3 boundary (inclusive)
    assert out[2].min_l == 3 and out[2].violating_rows == 0
    assert out[2].l_diverse


def test_l_diversity_monotone_up_the_ladder(spark, sf_dir):
    from train_reports_etl_spark.extensions.privacy import l_diversity_audit

    cust = load_table(spark, sf_dir, "customer")
    out = sorted(l_diversity_audit(cust, l=3).collect(), key=lambda r: r.level)
    assert [r.level for r in out] == [0, 1, 2]
    mins = [r.min_l for r in out]
    viol = [r.violating_rows for r in out]
    assert mins == sorted(mins)          # merging classes adds values
    assert viol == sorted(viol, reverse=True)


# ----------------------------------------------------------- E88

def test_ndcg_bounds_and_monotone_idcg(spark, sf_dir):
    from train_reports_etl_spark.extensions.ext_queries import (
        e88_ndcg_retrieval_eval,
    )

    out = {r.k: r for r in e88_ndcg_retrieval_eval(spark, sf_dir).collect()}
    assert sorted(out) == [5, 10, 20]
    for r in out.values():
        assert 0 <= r.dcg_micro <= r.idcg_micro      # DCG can't beat ideal
        assert 0 <= r.ndcg_ppm <= 1_000_000
        assert r.ndcg_ppm == (1_000_000 * r.dcg_micro) // r.idcg_micro
    # ideal gain accumulates with depth
    assert out[5].idcg_micro <= out[10].idcg_micro <= out[20].idcg_micro
    # the retriever targets exactly these terms - it must beat random;
    # at least something relevant sits in its top 20
    assert out[20].dcg_micro > 0


# ----------------------------------------------------------- E89

def test_hll_overlap_identity_and_bounds(spark, sf_dir):
    """Union est is bounded by the parts (max ≤ union ≤ sum since
    registers only grow under max-merge); inclusion-exclusion inter is
    clamped ≥ 0; jaccard_ppm consistent with the floats."""
    import math

    from train_reports_etl_spark.extensions.ext_queries import (
        e89_hll_source_overlap,
    )

    rows = e89_hll_source_overlap(spark, sf_dir).collect()
    n_src = (1 + math.isqrt(1 + 8 * len(rows))) // 2
    assert len(rows) == n_src * (n_src - 1) // 2 and len(rows) > 0
    for r in rows:
        assert max(r.est_a, r.est_b) <= r.est_union + 1e-9
        assert r.est_union <= r.est_a + r.est_b + 1e-9
        assert r.est_inter >= 0.0
        assert r.jaccard_ppm == math.floor(1e6 * r.est_inter / r.est_union)


def test_hll_overlap_self_merge_is_identity(spark, sf_dir):
    """Merging a source's registers with themselves changes nothing
    (max idempotence) - a pair of identical sets would estimate
    union == part. Checked via the sketch API directly."""
    from train_reports_etl_spark.extensions.sketches import (
        hll_estimate_from_registers,
        hll_merge_registers,
        hll_registers,
    )
    from train_reports_etl_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    regs = hll_registers(docs, "text")
    direct = hll_estimate_from_registers(regs).collect()[0]
    doubled = hll_estimate_from_registers(
        hll_merge_registers(regs.unionByName(regs))
    ).collect()[0]
    assert direct.z_sum == doubled.z_sum
    assert direct.hll_estimate == doubled.hll_estimate
