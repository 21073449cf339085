"""Round-10 operators (E107–E110): unit tests against hand-computed /
independent Python models, complementing the DuckDB gate rows."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _events(spark, cents):
    return spark.createDataFrame(
        [(i, c / 100.0 if c is not None else None) for i, c in enumerate(cents)],
        "event_id long, value double",
    )


def test_trimmed_winsorized_mean_hand_computed(spark):
    from train_reports_etl_spark.extensions.evaluation import (
        trimmed_winsorized_mean,
    )

    # 10 values, trim 10% each side -> k=1: drop rank 1 (=100) and
    # rank 10 (=99900); winsorize clamps them to ranks 2 and 9.
    cents = [100, 200, 300, 400, 500, 600, 700, 800, 900, 99900]
    r = trimmed_winsorized_mean(_events(spark, cents)).collect()[0]
    assert (r.n, r.k_per_side) == (10, 1)
    assert (r.lo_cents, r.hi_cents) == (200, 900)
    trimmed = sum(cents[1:-1])
    assert r.trimmed_mean_millicents == 1000 * trimmed // 8
    assert r.winsorized_mean_millicents == 1000 * (trimmed + 200 + 900) // 10


def test_trimmed_winsorized_mean_null_and_tiny_inputs(spark):
    from train_reports_etl_spark.extensions.evaluation import (
        trimmed_winsorized_mean,
    )

    # NULLs excluded; k=0 at n=3 -> trimmed == winsorized == plain mean
    r = trimmed_winsorized_mean(
        _events(spark, [100, None, 200, 300])
    ).collect()[0]
    assert r.n == 3 and r.k_per_side == 0
    assert r.trimmed_mean_millicents == r.winsorized_mean_millicents == 200_000
    assert trimmed_winsorized_mean(_events(spark, [None])).collect() == []
    # r10: the trim-too-deep guard is an in-plan assert_true — it fires
    # at the operator's internal collect as a Spark error, same message.
    with pytest.raises(Exception, match="leaves no"):
        trimmed_winsorized_mean(_events(spark, [100, 200]), trim_ppm=500_000)


def test_effective_sample_size_formula(spark):
    from train_reports_etl_spark.extensions.evaluation import (
        effective_sample_size,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c", "s1"),        # 3 tokens
            (2, "d e", "s1"),          # 2
            (3, "f g h i j", "s2"),    # 5
        ],
        "doc_id long, text string, source string",
    )
    out = {r.scheme: r for r in effective_sample_size(docs).collect()}
    d = out["doc_tokens"]
    assert (d.n_units, d.sum_w, d.sum_w2) == (3, 10, 38)
    assert d.ess_x1000 == 1000 * 100 // 38
    assert d.ess_ratio_ppm == 1_000_000 * 100 // (38 * 3)
    s = out["source_tokens"]
    assert (s.n_units, s.sum_w, s.sum_w2) == (2, 10, 50)  # caps 5, 5
    assert s.ess_x1000 == 2000  # perfectly balanced: ESS = 2 sources


def test_brier_decomposition_against_float_model(spark):
    from train_reports_etl_spark.extensions.evaluation import brier_decomposition

    rows = [
        (i, v, "purchase" if pos else "view")
        for i, (v, pos) in enumerate(
            [(0.05, 0), (0.1, 0), (0.15, 1), (0.8, 1), (0.85, 1), (0.9, 0),
             (0.95, 1), (0.5, 0), (0.55, 1), (0.45, 0)]
        )
    ]
    ev = spark.createDataFrame(rows, "event_id long, value double, event_type string")
    r = brier_decomposition(ev).collect()[0]
    # independent float model over the same ppm-binned inputs
    binned: dict[int, list[tuple[int, int]]] = {}
    for _, v, et in rows:
        conf = min(round(v * 100), 10000) * 100
        binned.setdefault(min(conf // 100_000, 9), []).append(
            (conf, 1 if et == "purchase" else 0)
        )
    n = sum(len(b) for b in binned.values())
    pos = sum(y for b in binned.values() for _, y in b)
    brier = sum((c / 1e6 - y) ** 2 for b in binned.values() for c, y in b) / n
    rel = sum(
        len(b) * (sum(c for c, _ in b) / len(b) / 1e6 - sum(y for _, y in b) / len(b)) ** 2
        for b in binned.values()
    ) / n
    res = sum(
        len(b) * (sum(y for _, y in b) / len(b) - pos / n) ** 2
        for b in binned.values()
    ) / n
    unc = (pos / n) * (1 - pos / n)
    assert (r.n, r.pos) == (n, pos)
    # per-bin floors bound the divergence by n_bins ppm
    assert abs(r.brier_ppm - brier * 1e6) <= 2
    assert abs(r.reliability_ppm - rel * 1e6) <= len(binned) + 1
    assert abs(r.resolution_ppm - res * 1e6) <= len(binned) + 1
    assert abs(r.uncertainty_ppm - unc * 1e6) <= 2
    # Full generalized identity (Stephenson et al. 2008): BS = rel −
    # res + unc + within-bin forecast variance − 2·within-bin cov(p,y).
    # The plain Murphy identity holds only for bin-constant forecasts,
    # so assert the generalized form — it pins that the four reported
    # terms are mutually consistent, not just individually close.
    wbv = cov = 0.0
    for b in binned.values():
        pbar = sum(c for c, _ in b) / len(b) / 1e6
        ybar = sum(y for _, y in b) / len(b)
        wbv += sum((c / 1e6 - pbar) ** 2 for c, _ in b)
        cov += sum((c / 1e6 - pbar) * (y - ybar) for c, y in b)
    wbv /= n
    cov /= n
    assert abs(
        r.brier_ppm
        - (
            r.reliability_ppm
            - r.resolution_ppm
            + r.uncertainty_ppm
            + (wbv - 2 * cov) * 1e6
        )
    ) <= 2 * (len(binned) + 2)


def test_bootstrap_mean_ci_matches_python_replay(spark):
    from train_reports_etl_spark.extensions.evaluation import (
        POISSON1_THRESHOLDS_16_13,
        bootstrap_mean_ci,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (3 + i % 5))) for i in range(40)],
        "doc_id long, text string",
    )
    got = bootstrap_mean_ci(docs, n_boot=16).collect()[0]
    # Python replay of the md5-derived resamples
    ws = {str(i): 3 + i % 5 for i in range(40)}
    means = []
    for b in range(16):
        s = c = 0
        for i, w in ws.items():
            u = int(hashlib.md5(f"{i}:boot:{b}".encode()).hexdigest()[:13], 16)
            m = sum(1 for t in POISSON1_THRESHOLDS_16_13 if u >= t)
            s += m * w
            c += m
        means.append(1_000_000 * s // c)
    means.sort()
    n = len(ws)
    assert got.n_docs == n and got.n_boot == 16
    assert got.mean_tokens_ppm == 1_000_000 * sum(ws.values()) // n
    assert got.boot_lo_ppm == means[max(0, int(0.05 * 16) - 1)]
    assert got.boot_hi_ppm == means[int(0.95 * 16)]
    assert got.boot_spread_ppm == got.boot_hi_ppm - got.boot_lo_ppm


def test_poisson_thresholds_are_the_poisson1_cdf():
    """The embedded literals must BE floor(CDF·16¹³) of Poisson(1) —
    regenerate from math and compare, so a typo can't silently skew
    every resample."""
    import math

    from train_reports_etl_spark.extensions.evaluation import (
        POISSON1_THRESHOLDS_16_13,
    )

    acc, S = 0.0, 16**13
    expect = []
    for k in range(7):
        acc += math.exp(-1) / math.factorial(k)
        expect.append(int(acc * S))
    assert POISSON1_THRESHOLDS_16_13 == expect


def test_pmi_collocations_hand_computed(spark):
    import math

    from train_reports_etl_spark.extensions.text import pmi_collocations

    # "a b" appears 6 times; tokens: a x6, b x6, c x2 -> N_u=14, N_b=12
    docs = spark.createDataFrame(
        [(1, "a b a b a b c"), (2, "a b a b a b c")],
        "doc_id long, text string",
    )
    out = {r.bigram: r for r in pmi_collocations(docs, min_count=5).collect()}
    assert set(out) == {"a b"}  # "b a" x4, "b c" x2 fall under min_count
    r = out["a b"]
    assert (r.c_xy, r.c_x, r.c_y) == (6, 6, 6)
    expect = round(1000 * math.log2(6 * 14 * 14 / (12 * 6 * 6)))
    assert r.pmi_millibits == expect


def test_pmi_single_token_docs_add_no_bigrams(spark):
    from train_reports_etl_spark.extensions.text import pmi_collocations

    # sequence(1, 0) descends in Spark — a 1-token doc must contribute
    # ZERO bigrams, not two bogus ones
    docs = spark.createDataFrame(
        [(1, "solo"), (2, "a b a b a b a b a b")],
        "doc_id long, text string",
    )
    out = pmi_collocations(docs, min_count=5).collect()
    assert {r.bigram for r in out} == {"a b"}
    assert [r.c_xy for r in out] == [5]


def test_head_coverage_hand_computed(spark):
    from train_reports_etl_spark.extensions.text import head_coverage

    # counts: the x5, cat x3, sat x2, mat x1 -> total 11
    docs = spark.createDataFrame(
        [(1, "the the the the the cat cat cat sat sat mat")],
        "doc_id long, text string",
    )
    out = {r.k: r for r in head_coverage(docs, ks=(1, 2, 1000)).collect()}
    assert out[1].head_tokens == 5 and out[1].coverage_ppm == 1_000_000 * 5 // 11
    assert out[2].head_tokens == 8
    assert out[1000].n_types == 4 and out[1000].coverage_ppm == 1_000_000 * 11 // 11


def test_conformal_threshold_guarantee_shape(spark):
    from train_reports_etl_spark.extensions.evaluation import conformal_threshold

    # deterministic ramp: value v cents -> conf; purchases on high conf
    rows = [
        (i, (i % 100) / 1.0, "purchase" if i % 100 >= 50 else "view")
        for i in range(400)
    ]
    ev = spark.createDataFrame(rows, "event_id long, value double, event_type string")
    r = conformal_threshold(ev).collect()[0]
    # even ids share the parity of i%100, so calibration positives are
    # the EVEN c in 50..98, four ids each -> n_cal = 25 * 4 = 100
    assert r.n_cal == 100
    k = min(100, (101 * 90 + 99) // 100)
    # value c dollars -> conf = c*10^4 ppm; s = 1e6 - c*10^4
    ss = sorted(
        1_000_000 - c * 10_000 for c in range(50, 100, 2) for _ in range(4)
    )
    assert r.qhat_ppm == ss[k - 1]
    # split-conformal marginal guarantee on the exchangeable ramp
    assert r.coverage_ppm >= 900_000
    assert r.n_test == 200 and r.n_test_pos == 100


def test_loo_source_impact_hand_computed(spark):
    from train_reports_etl_spark.extensions.corpus import loo_source_impact

    docs = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "d", "s1"), (3, "e f g h", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in loo_source_impact(docs).collect()}
    # global: n=3, sw=8; excl s1: 4/1; excl s2: 4/2
    assert out["s1"].loo_mean_tokens_ppm == 4_000_000
    assert out["s1"].delta_vs_global_ppm == 4_000_000 - 8_000_000 // 3
    assert out["s2"].loo_mean_tokens_ppm == 2_000_000
    single = loo_source_impact(
        spark.createDataFrame([(1, "a b", "only")], "doc_id long, text string, source string")
    ).collect()[0]
    assert single.loo_mean_tokens_ppm is None  # no crash on 1 source


def test_cramers_v_extremes(spark):
    from train_reports_etl_spark.extensions.evaluation import cramers_v

    # perfectly confounded 2x2: V^2 = 1
    conf = spark.createDataFrame(
        [(i, "en" if i % 2 else "es", "s1" if i % 2 else "s2") for i in range(40)],
        "doc_id long, lang string, source string",
    )
    r = cramers_v(conf).collect()[0]
    assert (r.n, r.n_rows, r.n_cols, r.dof_min) == (40, 2, 2, 1)
    assert abs(r.v2_ppm - 1_000_000) <= 4  # per-cell floors
    # perfectly factorized: every (lang, source) cell equal -> V^2 = 0
    fact = spark.createDataFrame(
        [(i, ["en", "es"][i % 2], ["s1", "s2"][(i // 2) % 2]) for i in range(40)],
        "doc_id long, lang string, source string",
    )
    assert cramers_v(fact).collect()[0].v2_ppm == 0


def test_cramers_v_n_bound_enforced(spark):
    import train_reports_etl_spark.extensions.evaluation as ev

    docs = spark.createDataFrame(
        [(1, "en", "s1"), (2, "es", "s2")], "doc_id long, lang string, source string"
    )
    old = ev.CRAMER_N_BOUND
    ev.CRAMER_N_BOUND = 1
    try:
        with pytest.raises(ValueError, match="ceiling"):
            ev.cramers_v(docs)
    finally:
        ev.CRAMER_N_BOUND = old


def test_source_vocab_jaccard_hand_computed(spark):
    from train_reports_etl_spark.extensions.text import source_vocab_jaccard

    docs = spark.createDataFrame(
        [
            (1, "a b c", "s1"),
            (2, "b c d", "s2"),
            (3, "x y", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    out = {(r.source_a, r.source_b): r for r in source_vocab_jaccard(docs).collect()}
    r12 = out[("s1", "s2")]
    assert (r12.v_a, r12.v_b, r12.inter) == (3, 3, 2)  # {b,c} of {a,b,c,d}
    assert r12.jaccard_ppm == 1_000_000 * 2 // 4
    assert out[("s1", "s3")].inter == 0 if ("s1", "s3") in out else True
    # disjoint vocabularies produce NO pair row (inner join) — the
    # absence IS the signal, matching the oracle
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_report_rehearsal_generator_bookkeeping(tmp_path):
    """The rehearsal's exact-equality assertions depend on the
    generator counting every planted defect — pin the bookkeeping on a
    tiny layout without Spark: rows written = base + cross-copies,
    every defect class planted at least once, sheets sniffable."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import report_rehearsal as rr
    from train_reports_etl_spark.sources.report_reader import discover_reports

    expected = {
        "tl_err": 0, "tl_dup": 0, "bpd_err": 0, "bpd_clean": 0,
        "occ_err": 0, "occ_dup": 0, "copy2_tickets": [],
    }
    layout = rr.generate(str(tmp_path), 0.04, expected)
    assert expected["tl_err"] > 0 and expected["tl_dup"] > 0
    assert expected["bpd_err"] > 0 and expected["occ_dup"] > 0
    assert len(expected["copy2_tickets"]) == 20  # one odd-file twin
    assert expected["tl_total"] == expected["tl_clean"] + expected["tl_err"] + expected["tl_dup"]
    errors = []
    found = discover_reports(layout["src"], on_error=lambda p, e: errors.append(p))
    assert len(errors) == 1 and errors[0].endswith("corrupt.xlsx")
    assert set(found) == {"train_list", "booking_payment_detailed", "occupancy_list_hist"}
    assert sum(len(v) for v in found.values()) == layout["n_sheets"]


def test_psi_drift_bins_against_float_model(spark):
    import math

    from train_reports_etl_spark.extensions.evaluation import psi_drift_bins

    rows = []
    for i in range(60):
        rows.append((i, (i % 6) * 60.0, "view"))        # ref: uniform-ish
    for i in range(40):
        rows.append((100 + i, (i % 3) * 60.0, "purchase"))  # live: shifted
    rows.append((999, 10.0, "error"))  # other types excluded
    rows.append((998, None, "view"))   # NULLs excluded
    ev = spark.createDataFrame(rows, "event_id long, value double, event_type string")
    got = {r.bin: r for r in psi_drift_bins(ev).collect()}
    # model: bin = cents // 5000 capped at 9
    ref: dict[int, int] = {}
    live: dict[int, int] = {}
    for _, v, et in rows:
        if v is None or et not in ("view", "purchase"):
            continue
        b = min(round(v * 100) // 5000, 9)
        (ref if et == "view" else live)[b] = (ref if et == "view" else live).get(b, 0) + 1
    n_ref, n_live = sum(ref.values()), sum(live.values())
    for b in set(ref) | set(live):
        p = (ref.get(b, 0) + 1) / (n_ref + 10)
        q = (live.get(b, 0) + 1) / (n_live + 10)
        expect = round(1_000_000 * (p - q) * math.log(p / q))
        assert got[b].contrib_micronats == expect, b
        assert (got[b].c_ref, got[b].c_live) == (ref.get(b, 0), live.get(b, 0))
    # identical distributions -> every contribution 0
    same = spark.createDataFrame(
        [(i, 25.0 * (i % 4), t) for i in range(40) for t in ("view", "purchase")],
        "event_id long, value double, event_type string",
    )
    assert all(r.contrib_micronats == 0 for r in psi_drift_bins(same).collect())


def test_dedup_survivorship_hand_computed(spark):
    from train_reports_etl_spark.extensions.corpus import dedup_survivorship

    docs = spark.createDataFrame(
        [
            (1, "Same Text!", "s1"),   # keeper of the dup group
            (2, "same text", "s2"),    # lost to s1's copy
            (3, "unique a", "s2"),
            (4, "SAME TEXT", "s2"),    # lost to s1's copy
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in dedup_survivorship(docs).collect()}
    assert (out["s1"].n_docs, out["s1"].n_kept, out["s1"].n_lost) == (1, 1, 0)
    assert (out["s2"].n_docs, out["s2"].n_kept, out["s2"].n_lost) == (3, 1, 2)
    assert out["s2"].loss_ppm == 1_000_000 * 2 // 3


def test_source_length_percentiles_hand_computed(spark):
    from train_reports_etl_spark.extensions.corpus import (
        source_length_percentiles,
    )

    # s1: lengths 1..10 -> p50 = ceil-rank 5 -> 5; p90 -> 9; p99 -> 10
    docs = spark.createDataFrame(
        [(i, " ".join(["t"] * i), "s1") for i in range(1, 11)]
        + [(100, "a b c", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in source_length_percentiles(docs).collect()}
    s1 = out["s1"]
    assert (s1.n_docs, s1.p50_tokens, s1.p90_tokens, s1.p99_tokens) == (10, 5, 9, 10)
    s2 = out["s2"]
    assert (s2.n_docs, s2.p50_tokens, s2.p99_tokens) == (1, 3, 3)
