"""Round-10 second batch (E120–E126): unit tests against
hand-computed / independent Python float models, complementing the
DuckDB gate rows."""

from __future__ import annotations

import hashlib
import math


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _is_test(doc_id: int, modulus: int = 10, residue: int = 0) -> bool:
    """Python replica of the operator's salted-hash split."""
    h = hashlib.md5(f"{doc_id}:split".encode()).hexdigest()
    return int(h[0], 16) % modulus == residue


def test_ngram_contamination_hand_computed(spark):
    from train_reports_etl_spark.extensions.corpus import (
        cross_split_ngram_contamination,
    )

    test_ids = [i for i in range(200) if _is_test(i)]
    train_ids = [i for i in range(200) if not _is_test(i)]
    assert len(test_ids) >= 2 and len(train_ids) >= 2
    rows = [
        # test doc in s1: 2 trigram shingles, one shared with train
        (test_ids[0], "alpha beta gamma delta", "s1"),
        (train_ids[0], "alpha beta gamma zzz", "s1"),
        # test doc in s2: sub-3-token doc -> single joined shingle,
        # contaminated via an identical train doc
        (test_ids[1], "x y", "s2"),
        (train_ids[1], "x y", "s2"),
    ]
    out = {
        r.source: r
        for r in cross_split_ngram_contamination(_docs(spark, rows)).collect()
    }
    assert (out["s1"].n_test_shingles, out["s1"].n_contaminated) == (2, 1)
    assert out["s1"].contamination_ppm == 500_000
    assert (out["s2"].n_test_shingles, out["s2"].n_contaminated) == (1, 1)
    assert out["s2"].contamination_ppm == 1_000_000


def test_zipf_slope_matches_python_ols(spark):
    from train_reports_etl_spark.extensions.text import zipf_slope

    # counts: a=8, b=4, c=2, d=1 -> ranks 1..4 under (count desc, token)
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    r = zipf_slope(_docs(spark, [(1, text, "s")])).collect()[0]
    counts = [8, 4, 2, 1]
    xs = [round(1000 * math.log2(i + 1)) for i in range(4)]
    ys = [round(1000 * math.log2(c)) for c in counts]
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    assert (r.n_fit, r.sum_x_mb, r.sum_y_mb, r.sum_xy, r.sum_xx) == (
        n,
        sx,
        sy,
        sxy,
        sxx,
    )
    neg_num = sx * sy - n * sxy
    den = n * sxx - sx * sx
    assert r.neg_slope_num == neg_num and r.slope_den == den
    assert neg_num > 0  # slope is negative for this Zipf-ish corpus
    assert r.neg_slope_ppm == (1_000_000 * neg_num) // den
    assert r.intercept_millibits == (sy * den + neg_num * sx) // (n * den)
    # sanity: slope near -1.5 for this 2x-decay corpus
    assert 1_300_000 < r.neg_slope_ppm < 1_600_000


def test_token_burstiness_tf_over_df(spark):
    from train_reports_etl_spark.extensions.text import token_burstiness

    rows = [
        (1, "cat cat cat dog", "s"),
        (2, "cat dog dog", "s"),
        (3, "bird", "s"),
    ]
    out = {
        r.token: r
        for r in token_burstiness(_docs(spark, rows), min_count=2).collect()
    }
    assert (out["cat"].tf, out["cat"].df) == (4, 2)
    assert out["cat"].burst_ppm == 2_000_000
    assert (out["dog"].tf, out["dog"].df) == (3, 2)
    assert out["dog"].burst_ppm == 1_500_000
    assert "bird" not in out  # tf=1 < min_count


def test_g2_keyness_against_float_model(spark):
    from train_reports_etl_spark.extensions.text import g2_keyness

    rows = [
        (1, "spam spam spam eggs", "src0"),
        (2, "spam eggs eggs ham ham", "other"),
        (3, "ham eggs toast toast", "other"),
    ]
    out = {
        r.token: r
        for r in g2_keyness(_docs(spark, rows), min_count=2).collect()
    }
    # whole-corpus totals: na = 4 (src0 tokens), nb = 9
    na, nb = 4, 9
    cells = {"spam": (3, 1), "eggs": (1, 3), "ham": (0, 3), "toast": (0, 2)}

    def model(a, b):
        g = 0.0
        if a:
            g += a * math.log((a * (na + nb)) / (na * (a + b)))
        if b:
            g += b * math.log((b * (na + nb)) / (nb * (a + b)))
        return round(1000.0 * 2.0 * g)

    for tok, (a, b) in cells.items():
        assert (out[tok].c_a, out[tok].c_rest) == (a, b), tok
        assert out[tok].g2_millinats == model(a, b), tok
        sign = (a * nb > b * na) - (a * nb < b * na)
        assert out[tok].overuse == sign, tok
    assert out["spam"].overuse == 1 and out["ham"].overuse == -1


def test_simpson_diversity_pure_rational(spark):
    from train_reports_etl_spark.extensions.text import simpson_diversity

    rows = [
        (1, "a a b", "s1"),
        (2, "unique", "s2"),  # N=1 -> NULL ppm, not a crash
    ]
    out = {r.source: r for r in simpson_diversity(_docs(spark, rows)).collect()}
    s1 = out["s1"]
    assert (s1.n_tokens, s1.v_types) == (3, 2)
    assert s1.repeat_ppm == (1_000_000 * 2) // 6 == 333_333
    assert s1.diversity_ppm == 1_000_000 - 333_333
    s2 = out["s2"]
    assert (s2.n_tokens, s2.v_types) == (1, 1)
    assert s2.repeat_ppm is None and s2.diversity_ppm is None


def test_jsd_identical_sources_is_zero(spark):
    from train_reports_etl_spark.extensions.evaluation import jsd_source_pairs

    rows = [(1, "w x y z w", "s1"), (2, "w x y z w", "s2")]
    r = jsd_source_pairs(_docs(spark, rows)).collect()
    assert len(r) == 1
    assert r[0].jsd_micronats == 0
    assert r[0].only_a_mass_ppm == 0 and r[0].only_b_mass_ppm == 0


def test_jsd_disjoint_sources_absent_row(spark):
    from train_reports_etl_spark.extensions.evaluation import jsd_source_pairs

    rows = [(1, "aa bb", "s1"), (2, "cc dd", "s2")]
    assert jsd_source_pairs(_docs(spark, rows)).collect() == []


def test_jsd_against_float_model(spark):
    from train_reports_etl_spark.extensions.evaluation import jsd_source_pairs

    rows = [(1, "a a b c", "s1"), (2, "a b b b d", "s2")]
    r = jsd_source_pairs(_docs(spark, rows)).collect()[0]
    na, nb = 4, 5
    shared = {"a": (2, 1), "b": (1, 3)}  # token -> (ca, cb)
    contrib = 0
    for ca, cb in shared.values():
        contrib += round(
            1_000_000
            * 0.5
            * (
                (ca / na) * math.log((2.0 * ca * nb) / (ca * nb + cb * na))
                + (cb / nb) * math.log((2.0 * cb * na) / (ca * nb + cb * na))
            )
        )
    only_a, only_b = 1, 1  # 'c' mass 1/4; 'd' mass 1/5
    lump_a = round(1_000_000 * 0.5 * math.log(2.0) * (only_a / na))
    lump_b = round(1_000_000 * 0.5 * math.log(2.0) * (only_b / nb))
    assert r.n_shared_types == 2
    assert r.only_a_mass_ppm == (1_000_000 * only_a) // na
    assert r.only_b_mass_ppm == (1_000_000 * only_b) // nb
    assert r.jsd_micronats == contrib + lump_a + lump_b
    # bounded by ln 2
    assert 0 < r.jsd_micronats < 693_148


def test_daily_autocorrelation_hand_computed(spark):
    from datetime import datetime

    from train_reports_etl_spark.extensions.evaluation import (
        daily_autocorrelation,
    )

    rows = []
    eid = 0
    for day, n in [(1, 2), (2, 4), (3, 2)]:
        for _ in range(n):
            rows.append((eid, datetime(2024, 1, day, 12, 0, 0)))
            eid += 1
    events = spark.createDataFrame(rows, "event_id long, ts timestamp")
    r = daily_autocorrelation(events).collect()[0]
    # d = [2, 4, 2]: n=3, S=8, sum d^2=24, sum diff^2 = 4+4 = 8
    # DW_x1000 = 1000*3*8 // (3*24 - 64) = 24000 // 8 = 3000
    assert (r.n_days, r.total_events, r.dw_x1000) == (3, 8, 3000)


def test_daily_autocorrelation_constant_series(spark):
    from datetime import datetime

    from train_reports_etl_spark.extensions.evaluation import (
        daily_autocorrelation,
    )

    rows = [
        (i, datetime(2024, 1, 1 + i % 3, 6, 0, 0)) for i in range(6)
    ]  # 2 events each on 3 days -> zero variance -> NULL, not a crash
    events = spark.createDataFrame(rows, "event_id long, ts timestamp")
    r = daily_autocorrelation(events).collect()[0]
    assert r.n_days == 3 and r.dw_x1000 is None


def _tau_model(pairs):
    """O(n^2) reference for Kendall tau-b pair counts."""
    n = len(pairs)
    c = d = n1 = n2 = n3 = 0
    for i in range(n):
        for j in range(i + 1, n):
            xa, ya = pairs[i]
            xb, yb = pairs[j]
            tx, ty = xa == xb, ya == yb
            if tx:
                n1 += 1
            if ty:
                n2 += 1
            if tx and ty:
                n3 += 1
            if not tx and not ty:
                if (xa < xb) == (ya < yb):
                    c += 1
                else:
                    d += 1
    n0 = n * (n - 1) // 2
    tau = round(
        1_000_000 * (c - d) / math.sqrt((n0 - n1) * (n0 - n2))
    ) if (n0 - n1) and (n0 - n2) else None
    return n, n0, n1, n2, c, d, n3, tau


def test_kendall_tau_b_against_pair_model(spark):
    import random

    from train_reports_etl_spark.extensions.evaluation import kendall_tau_b

    rng = random.Random(7)
    pairs = [(rng.randrange(6), rng.randrange(8)) for _ in range(120)]
    df = spark.createDataFrame(pairs, "x long, y long")
    r = kendall_tau_b(df, "x", "y").collect()[0]
    n, n0, n1, n2, c, d, n3, tau = _tau_model(pairs)
    assert (r.n, r.pairs_total) == (n, n0)
    assert (r.ties_x, r.ties_y, r.ties_xy) == (n1, n2, n3)
    assert (r.concordant, r.discordant) == (c, d)
    assert r.tau_b_ppm == tau
    # inclusion-exclusion identity
    assert c + d == n0 - n1 - n2 + n3


def test_kendall_tau_b_perfect_and_degenerate(spark):
    from train_reports_etl_spark.extensions.evaluation import kendall_tau_b

    up = spark.createDataFrame([(i, 2 * i) for i in range(10)], "x long, y long")
    r = kendall_tau_b(up, "x", "y").collect()[0]
    assert r.tau_b_ppm == 1_000_000 and r.discordant == 0
    down = spark.createDataFrame([(i, -i) for i in range(10)], "x long, y long")
    assert kendall_tau_b(down, "x", "y").collect()[0].tau_b_ppm == -1_000_000
    const = spark.createDataFrame([(i, 5) for i in range(4)], "x long, y long")
    assert kendall_tau_b(const, "x", "y").collect()[0].tau_b_ppm is None


def _events_typed(spark, rows):
    return spark.createDataFrame(rows, "event_id long, event_type string, value double")


def test_wasserstein1_hand_computed(spark):
    from train_reports_etl_spark.extensions.evaluation import wasserstein1

    # a (purchase): cents {100, 300}; b (view): cents {200, 400}
    rows = [
        (1, "purchase", 1.0),
        (2, "purchase", 3.0),
        (3, "view", 2.0),
        (4, "view", 4.0),
        (5, "click", 9.9),  # other types excluded
        (6, "view", None),  # NULLs excluded
    ]
    r = wasserstein1(_events_typed(spark, rows)).collect()[0]
    # support {100,200,300,400}; n_a=n_b=2
    # gaps |cum_a*n_b - cum_b*n_a| at 100,200,300: |2|,|0|,|2|; dv=100
    # num = 2*100 + 0*100 + 2*100 = 400; W1 = 400/(2*2) = 100 cents
    assert (r.n_a, r.n_b, r.n_support) == (2, 2, 4)
    assert r.w1_millicents == 100_000


def test_wasserstein1_identical_and_shift(spark):
    from train_reports_etl_spark.extensions.evaluation import wasserstein1

    same = [(i, t, float(v)) for i, (t, v) in enumerate(
        [("purchase", 1), ("purchase", 2), ("view", 1), ("view", 2)]
    )]
    assert wasserstein1(_events_typed(spark, same)).collect()[0].w1_millicents == 0
    # b = a + 0.50 -> W1 = 50 cents exactly (pure translation)
    shift = [(i, "purchase", float(v)) for i, v in enumerate([1, 2, 3])] + [
        (10 + i, "view", v + 0.5) for i, v in enumerate([1.0, 2.0, 3.0])
    ]
    r = wasserstein1(_events_typed(spark, shift)).collect()[0]
    assert r.w1_millicents == 50_000


def test_distributed_lead_matches_window(spark):
    from pyspark.sql import functions as F  # noqa: F811

    from train_reports_etl_spark.operators.ranking import distributed_lead

    vals = [3, 1, 4, 1500, 9, 2, 6, 500, 35, 8]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r.v: r.next_val for r in distributed_lead(df, "v", n_buckets=4).collect()
    }
    s = sorted(vals)
    want = {v: (s[i + 1] if i + 1 < len(s) else None) for i, v in enumerate(s)}
    assert got == want


def test_transition_entropy_deterministic_flow(spark):
    from datetime import datetime

    from train_reports_etl_spark.extensions.evaluation import transition_entropy

    # one user, strict A->B->A->B...: H(next|prev)=0, U=1
    rows = [
        (i, 1, datetime(2024, 1, 1, 0, 0, i), "A" if i % 2 == 0 else "B")
        for i in range(9)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    r = transition_entropy(ev).collect()[0]
    assert r.n_transitions == 8 and r.h_cond_microbits == 0
    assert r.theil_u_ppm == 1_000_000


def test_transition_entropy_against_float_model(spark):
    import math as m
    from datetime import datetime

    from train_reports_etl_spark.extensions.evaluation import transition_entropy

    seq = ["A", "A", "B", "A", "C", "B", "B", "A", "C", "A", "B"]
    rows = [
        (i, 7, datetime(2024, 1, 1, 0, 0, i), t) for i, t in enumerate(seq)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    r = transition_entropy(ev).collect()[0]
    trans = list(zip(seq, seq[1:]))
    n = len(trans)
    from collections import Counter

    cells = Counter(trans)
    rmarg = Counter(p for p, _ in trans)
    nmarg = Counter(x for _, x in trans)
    h_cond = sum(
        round(1_000_000 * (c / n) * m.log2(rmarg[p] / c))
        for (p, _), c in cells.items()
    )
    h_next = sum(
        round(1_000_000 * (cn / n) * m.log2(n / cn)) for cn in nmarg.values()
    )
    assert r.n_transitions == n and r.n_cells == len(cells)
    assert r.h_cond_microbits == h_cond
    assert r.h_next_microbits == h_next
    assert r.mi_microbits == h_next - h_cond
    assert r.theil_u_ppm == (1_000_000 * max(h_next - h_cond, 0)) // h_next


def test_heaps_checkpoints_hand_computed(spark):
    from train_reports_etl_spark.extensions.text import heaps_law_checkpoints

    rows = [
        (1, "a b", "s"),        # rank 1: types {a,b}, w=2
        (2, "a c c", "s"),      # rank 2: +c, w=3
        (3, "d", "s"),          # rank 3: +d, w=1
        (4, "a b c d e", "s"),  # rank 4: +e, w=5
        (5, "e e", "s"),        # rank 5: -, w=2
    ]
    out = {r.k: r for r in heaps_law_checkpoints(_docs(spark, rows)).collect()}
    # n=5 -> checkpoints ranks [5, 2, 1]
    assert len(out) == 3
    assert (out[0].n_docs, out[0].n_tokens, out[0].v_types) == (5, 13, 5)
    assert (out[1].n_docs, out[1].n_tokens, out[1].v_types) == (2, 5, 3)
    assert (out[2].n_docs, out[2].n_tokens, out[2].v_types) == (1, 2, 2)


def test_heaps_checkpoints_sparse_ids(spark):
    from train_reports_etl_spark.extensions.text import heaps_law_checkpoints

    # non-dense ids: rank order is by id, not position
    rows = [(100, "x", "s"), (7, "y", "s"), (50, "x z", "s")]
    out = {r.k: r for r in heaps_law_checkpoints(_docs(spark, rows)).collect()}
    # n=3 -> ranks [3, 1]; first doc by id is 7 ("y")
    assert (out[0].n_docs, out[0].n_tokens, out[0].v_types) == (3, 4, 3)
    assert (out[1].n_docs, out[1].n_tokens, out[1].v_types) == (1, 1, 1)


def test_event_flow_trigrams_hand_computed(spark):
    from datetime import datetime

    from train_reports_etl_spark.extensions.evaluation import (
        event_flow_trigrams,
    )

    # user 1: A B A B A  -> trigrams ABA, BAB, ABA
    # user 2: A B A      -> trigram  ABA
    rows = []
    eid = 0
    for u, seq in [(1, "ABABA"), (2, "ABA")]:
        for i, t in enumerate(seq):
            rows.append((eid, u, datetime(2024, 1, 1, 0, 0, i), t))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {
        r.flow: r for r in event_flow_trigrams(ev, min_count=2).collect()
    }
    # totals: 4 trigrams; ABA x3 passes min_count, BAB x1 filtered
    assert list(out) == ["A>B>A"]
    assert out["A>B>A"].c == 3
    assert out["A>B>A"].share_ppm == (1_000_000 * 3) // 4
