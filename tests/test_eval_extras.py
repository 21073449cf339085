"""E100–E106 (extensions/evaluation.py round-9 additions): AUC by
rank-sum, chi-square token-label association, Spearman ranker
agreement, Cohen's kappa, Benford audit, Gini concentration, and the
two-sample KS drift statistic — each pinned on hand-computed frames where
the statistic is known exactly, plus the distributed_prefix_sum
helper they ride on."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_distributed_prefix_sum_matches_window(spark):
    from train_reports_etl_spark.operators.ranking import (
        distributed_prefix_sum,
    )

    rows = [(int(k), int(v)) for k, v in zip(range(0, 200, 2), range(200, 0, -2))]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["cum"]
        for r in distributed_prefix_sum(df, "k", "v").collect()
    }
    acc, want = 0, {}
    for k, v in rows:
        acc += v
        want[k] = acc
    assert got == want


def test_auc_separable_and_tied(spark):
    from train_reports_etl_spark.extensions.evaluation import auc_rank_sum

    # perfectly separable: every pos score above every neg -> AUC 1
    df = spark.createDataFrame(
        [(0.01, "ok"), (0.02, "ok"), (0.03, "error"), (0.04, "error")],
        "value double, event_type string",
    )
    row = auc_rank_sum(df).collect()[0]
    assert (row["n"], row["n_pos"], row["n_neg"]) == (4, 2, 2)
    assert row["auc_ppm"] == 1_000_000

    # one tie across classes: pairs (2v1)=1 (2v2)=.5 (3v1)=1 (3v2)=1
    # -> U = 3.5 of 4 -> 875000
    df2 = spark.createDataFrame(
        [(0.01, "ok"), (0.02, "ok"), (0.02, "error"), (0.03, "error")],
        "value double, event_type string",
    )
    assert auc_rank_sum(df2).collect()[0]["auc_ppm"] == 875_000


def test_auc_null_scores_excluded(spark):
    from train_reports_etl_spark.extensions.evaluation import auc_rank_sum

    df = spark.createDataFrame(
        [(None, "error"), (0.01, "ok"), (0.02, "error")],
        "value double, event_type string",
    )
    row = auc_rank_sum(df).collect()[0]
    assert row["n"] == 2 and row["auc_ppm"] == 1_000_000


def test_chi2_perfect_separator_tops(spark):
    from train_reports_etl_spark.extensions.evaluation import chi2_token_label

    # 3 en docs all contain "zzseparator"; 3 other docs none:
    # a=3 b=0 c=0 d=3 -> chi2 = 6*(9-0)^2/81 = 6 -> 6_000_000 ppm.
    # "common" appears in EVERY doc -> c+d = 0 (degenerate 2x2, chi2
    # undefined) -> excluded by the marginal filter in both engines.
    # "shared" appears in one doc per class -> ad = bc -> chi2 = 0.
    docs = spark.createDataFrame(
        [
            (1, "en", "zzseparator common shared alpha"),
            (2, "en", "zzseparator common beta"),
            (3, "en", "zzseparator common gamma"),
            (4, "de", "common shared delta"),
            (5, "de", "common epsilon"),
            (6, "de", "common zeta"),
        ],
        "doc_id long, lang string, text string",
    )
    out = chi2_token_label(docs, min_df=2, k=5).collect()
    assert out[0]["token"] == "zzseparator"
    assert out[0]["chi2_ppm"] == 6_000_000
    by_tok = {r["token"]: r["chi2_ppm"] for r in out}
    assert "common" not in by_tok  # degenerate marginal filtered
    assert by_tok.get("shared") == 0


def test_chi2_bound_enforced(spark, monkeypatch):
    import pytest

    from train_reports_etl_spark.extensions import evaluation

    docs = spark.createDataFrame(
        [(1, "en", "a b"), (2, "de", "a c")],
        "doc_id long, lang string, text string",
    )
    monkeypatch.setattr(evaluation, "CHI2_N_BOUND", 1)
    with pytest.raises(ValueError, match="exact-integer bound"):
        evaluation.chi2_token_label(docs, min_df=1, k=3)
    monkeypatch.setattr(evaluation, "CHI2_N_BOUND", 2_000_000)
    assert evaluation.chi2_token_label(docs, min_df=1, k=3).count() > 0


def test_spearman_identical_and_reversed(spark):
    from train_reports_etl_spark.extensions.evaluation import spearman_rankers

    # identical rankers (every doc: n_types == n_toks ordering):
    same = spark.createDataFrame(
        [(1, "a"), (2, "a b"), (3, "a b c")], "doc_id long, text string"
    )
    r = spearman_rankers(same).collect()[0]
    assert r["sum_d2"] == 0 and r["rho_ppm"] == 1_000_000

    # exactly reversed rankers: toks ascending, types descending
    rev = spark.createDataFrame(
        [(1, "a b"), (2, "c c c")], "doc_id long, text string"
    )
    r2 = spearman_rankers(rev).collect()[0]
    assert r2["sum_d2"] == 2
    assert r2["discordance_ppm"] == 2_000_000
    assert r2["rho_ppm"] == -1_000_000


def test_kappa_perfect_agreement_and_empty_doc(spark):
    from train_reports_etl_spark.extensions.evaluation import (
        kappa_gate_agreement,
    )

    docs = spark.createDataFrame(
        [
            (1, "aaaa bbbb cccc"),  # 3 toks meanlen 4: A yes B yes
            (2, "dddd eeee ffff"),
            (3, "aa bb"),  # 2 toks meanlen 2: A no B no
            (4, "cc dd"),
        ],
        "doc_id long, text string",
    )
    row = kappa_gate_agreement(docs, min_tokens=3, min_mean_len_x1=3).collect()[0]
    assert (row["n"], row["a_yes"], row["b_yes"], row["agree"]) == (4, 2, 2, 4)
    assert row["po_ppm"] == 1_000_000
    assert row["pe_ppm"] == 500_000
    assert row["kappa_plus1_ppm"] == 2_000_000

    # an all-punctuation doc tokenizes empty: both raters vote no
    # (0 >= 5*0 must NOT make rater B say yes)
    docs2 = spark.createDataFrame(
        [(1, "!!! ..."), (2, "aaaa bbbb cccc")], "doc_id long, text string"
    )
    row2 = kappa_gate_agreement(docs2, min_tokens=3, min_mean_len_x1=3).collect()[0]
    assert row2["b_yes"] == 1 and row2["agree"] == 2


def test_benford_digits_and_filters(spark):
    from train_reports_etl_spark.extensions.evaluation import benford_audit

    df = spark.createDataFrame(
        [(0.01,), (0.12,), (0.20,), (None,), (-0.05,), (0.0,)],
        "value double",
    )
    rows = {r["digit"]: r for r in benford_audit(df).collect()}
    # digits: 1 cent -> 1, 12 -> 1, 20 -> 2; null/negative/zero dropped
    assert rows[1]["n"] == 2 and rows[2]["n"] == 1
    assert rows[1]["obs_ppm"] == 666_666 and rows[2]["obs_ppm"] == 333_333
    assert rows[1]["exp_ppm"] == 301_030
    assert rows[1]["dev_ppm"] == 666_666 - 301_030


def test_gini_balanced_and_extreme(spark):
    from train_reports_etl_spark.extensions.evaluation import (
        gini_concentration,
    )

    balanced = spark.createDataFrame(
        [("s1", "a b c d e"), ("s2", "f g h i j")], "source string, text string"
    )
    r = gini_concentration(balanced).collect()[0]
    assert (r["n_groups"], r["total_tokens"], r["gini_ppm"]) == (2, 10, 0)

    # one source holds everything -> G = (n-1)/n = 0.5 for n=2
    skewed = spark.createDataFrame(
        [("s1", "!!!"), ("s2", "a b c d e f g h i j")],
        "source string, text string",
    )
    r2 = gini_concentration(skewed).collect()[0]
    assert r2["gini_ppm"] == 500_000


def test_ks_disjoint_and_overlapping(spark):
    from train_reports_etl_spark.extensions.evaluation import ks_statistic

    disjoint = spark.createDataFrame(
        [(0.01, "purchase"), (0.02, "purchase"), (0.03, "view"), (0.04, "view"),
         (0.99, "click")],  # other types excluded
        "value double, event_type string",
    )
    r = ks_statistic(disjoint).collect()[0]
    assert (r["n_a"], r["n_b"], r["d_ppm"]) == (2, 2, 1_000_000)

    overlap = spark.createDataFrame(
        [(0.01, "purchase"), (0.02, "purchase"), (0.02, "view"), (0.03, "view")],
        "value double, event_type string",
    )
    r2 = ks_statistic(overlap).collect()[0]
    assert r2["d_ppm"] == 500_000


def test_distributed_prefix_sums_merged_pass(spark):
    """r10: the merged primitive (several running sums + the
    neighbor-gap lead in ONE bucket/sort pass) must equal the naive
    single-partition window on every column, including the last-key
    NULL lead, across bucket boundaries (n_buckets=4 on 50 keys)."""
    from train_reports_etl_spark.operators.ranking import (
        distributed_prefix_sums,
    )

    rows = [(int(k), int(k % 7), int((k * 3) % 5)) for k in range(1, 150, 3)]
    df = spark.createDataFrame(rows, "k long, a long, b long")
    out = {
        r["k"]: (r["cum_a"], r["cum_b"], r["nxt"])
        for r in distributed_prefix_sums(
            df, "k", ["a", "b"], n_buckets=4,
            sum_names=["cum_a", "cum_b"], lead_name="nxt",
        ).collect()
    }
    acc_a = acc_b = 0
    want = {}
    ks = [k for k, _, _ in rows]
    for i, (k, a, b) in enumerate(rows):
        acc_a += a
        acc_b += b
        nxt = ks[i + 1] if i + 1 < len(ks) else None
        want[k] = (acc_a, acc_b, nxt)
    assert out == want


def test_distributed_prefix_sums_duplicate_key_guard(spark):
    """The uniqueness guard survives the in-plan fold: duplicate order
    keys raise at action time with the documented message."""
    import pytest as _pytest

    from train_reports_etl_spark.operators.ranking import (
        distributed_prefix_sums,
    )

    dup = spark.createDataFrame([(1, 5), (1, 6), (2, 7)], "k long, v long")
    with _pytest.raises(Exception, match="duplicate"):
        distributed_prefix_sums(dup, "k", ["v"]).collect()
