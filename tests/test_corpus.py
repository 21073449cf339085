"""Corpus-construction operator tests (E7) + TF-IDF / repetition (E4)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from train_reports_etl_spark.extensions.corpus import (
    contamination_pairs,
    hash_bucket,
    pack_sequences,
    split_assign,
    stratified_sample,
)
from train_reports_etl_spark.extensions.text import repetition_metrics, tfidf_top_terms


@pytest.fixture()
def ids(spark):
    return spark.range(0, 1000).withColumnRenamed("id", "doc_id")


def test_split_assign_is_deterministic_and_partition_invariant(ids):
    a = split_assign(ids).select("doc_id", "bucket", "split")
    b = split_assign(ids.repartition(7)).select("doc_id", "bucket", "split")
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0
    rows = a.collect()
    assert all(0 <= r.bucket <= 255 for r in rows)
    frac = {s: n / 1000 for s, n in a.groupBy("split").count().rdd.map(tuple).collect()}
    # ~80/10/10 of 256 buckets; generous tolerance for hash noise at n=1000
    assert 0.70 < frac["train"] < 0.90
    assert 0.04 < frac["val"] < 0.16
    assert 0.04 < frac["test"] < 0.16


def test_split_assign_is_stable_under_corpus_growth(spark, ids):
    """Adding data must never move an existing document's split."""
    small = split_assign(ids.filter(F.col("doc_id") < 100))
    big = split_assign(ids).filter(F.col("doc_id") < 100)
    assert small.subtract(big).count() == 0


def test_stratified_sample_k_per_stratum(spark):
    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("lang")
    )
    out = stratified_sample(df, strata_col="lang", id_col="doc_id", k=5)
    per = dict(out.groupBy("lang").count().rdd.map(tuple).collect())
    assert per == {"0": 5, "1": 5, "2": 5}
    # deterministic: re-running yields the identical sample
    again = stratified_sample(df.repartition(11), strata_col="lang", id_col="doc_id", k=5)
    assert out.subtract(again).count() == 0


def test_pack_sequences_budget_cuts(spark):
    # one shard; docs of 600 tokens each, budget 1000:
    # doc 0 starts at 0 -> chunk 0; doc 1 starts at 600 -> chunk 0;
    # doc 2 starts at 1200 -> chunk 1; doc 3 at 1800 -> chunk 1; doc 4 at 2400 -> chunk 2
    rows = [(i, 0, 600) for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "shard", "n_tokens"])
    out = {
        r.chunk_id: (r.n_docs, r.chunk_tokens, r.first_doc, r.last_doc)
        for r in pack_sequences(df, budget=1000).collect()
    }
    assert out == {0: (2, 1200, 0, 1), 1: (2, 1200, 2, 3), 2: (1, 600, 4, 4)}


def test_pack_sequences_shards_are_independent(spark):
    rows = [(0, 0, 900), (1, 0, 900), (10, 1, 900), (11, 1, 900)]
    df = spark.createDataFrame(rows, ["doc_id", "shard", "n_tokens"])
    out = pack_sequences(df, budget=1000).collect()
    # each shard restarts its cumsum: second doc of each shard starts at 900 -> chunk 0
    assert {(r.shard, r.chunk_id) for r in out} == {(0, 0), (1, 0)}


def test_contamination_finds_planted_leak(spark):
    # find ids landing in train (<205) and eval (>=230) buckets
    probe = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), hash_bucket("doc_id").alias("b")
    )
    train_id = probe.filter(F.col("b") < 205).first().doc_id
    eval_id = probe.filter(F.col("b") >= 230).first().doc_id
    leak = "the stolen benchmark answer string appears verbatim here tonight"
    rows = [
        (train_id, "training text with a leak " + leak),
        (eval_id, "eval question containing " + leak),
        (train_id + 100000 if train_id < 400000 else train_id - 1, "unrelated filler words only"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = contamination_pairs(df, min_shared=1).collect()
    assert {(r.train_id, r.eval_id) for r in pairs} == {(train_id, eval_id)}


def test_tfidf_top_term_is_the_discriminative_one(spark):
    rows = [
        (0, "spark spark spark shared"),
        (1, "duckdb shared shared"),
        (2, "shared words only"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in tfidf_top_terms(df, top_n=1).collect()}
    # 'shared' has df=3 -> idf=0 -> never the top term
    assert out[0].term == "spark" and out[0].tf == 3 and out[0].df == 1
    assert out[1].term == "duckdb"
    assert out[0].score == pytest.approx(3 * math.log(3.0), abs=1e-6)


def test_repetition_metrics_hand_values(spark):
    rows = [
        (0, "a a a a"),            # top ratio 1.0; 2-grams: aa,aa,aa -> dup 2/3
        (1, "w x y z"),            # all distinct: top 1/4, dup 0
        (2, "solo"),               # single token: no 2-grams -> dup 0.0
        (3, ""),                   # zero tokens: absent
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in repetition_metrics(df).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0].top_token_ratio == 1.0
    assert out[0].dup_2gram_frac == pytest.approx(2 / 3)
    assert out[1].top_token_ratio == 0.25 and out[1].dup_2gram_frac == 0.0
    assert out[2].n_tokens == 1 and out[2].dup_2gram_frac == 0.0


def test_redact_pii_replaces_and_counts(spark):
    from train_reports_etl_spark.extensions.text import redact_pii

    rows = [
        (0, "mail a@b.com and c.d+x@e.org, ip 10.0.0.1, call 555-1234"),
        (1, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert (out[0].n_emails, out[0].n_ips, out[0].n_phones) == (2, 1, 1)
    assert out[0].redacted == "mail <EMAIL> and <EMAIL>, ip <IP>, call <PHONE>"
    assert out[1].redacted == "nothing sensitive here"
    assert (out[1].n_emails, out[1].n_ips, out[1].n_phones) == (0, 0, 0)


def test_url_hosts_extracts_every_url(spark):
    from train_reports_etl_spark.extensions.text import url_hosts

    rows = [(0, "see https://a.example.org/x and http://b.net/y?z=1"), (1, "no links")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.doc_id, r.host) for r in url_hosts(df).collect()}
    assert got == {(0, "a.example.org"), (0, "b.net")}


def test_heavy_hitters_rank_and_ties(spark):
    from train_reports_etl_spark.extensions.corpus import heavy_hitters

    rows = [(0, "b b a a c"), (1, "a b z")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = heavy_hitters(df, top_n=3).collect()
    assert [(r.rank, r.term, r.n_occurrences, r.n_docs) for r in out] == [
        (1, "a", 3, 2),
        (2, "b", 3, 2),
        (3, "c", 1, 1),
    ]


def test_weighted_sample_favors_heavy_rows_and_is_deterministic(spark):
    from train_reports_etl_spark.extensions.corpus import weighted_sample

    # 100 heavy rows (w=50) vs 400 light rows (w=1): a k=40 sample
    # should be dominated by heavy rows; zero-weight rows never appear
    df = spark.range(0, 501).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, 50)
        .when(F.col("id") == 500, 0)
        .otherwise(1)
        .cast("long")
        .alias("w"),
    )
    out = weighted_sample(df, weight_col="w", k=40)
    rows = out.collect()
    assert len(rows) == 40
    heavy = sum(1 for r in rows if r.doc_id < 100)
    assert heavy >= 30          # ~97% expected heavy; 30 is a loose floor
    assert all(r.doc_id != 500 for r in rows)
    again = weighted_sample(df.repartition(13), weight_col="w", k=40)
    assert out.subtract(again).count() == 0


def test_chunk_documents_windows_and_overlap(spark):
    from train_reports_etl_spark.extensions.corpus import chunk_documents

    mk = lambda n: " ".join(f"t{i}" for i in range(n))  # noqa: E731
    df = spark.createDataFrame(
        [(1, mk(10)), (2, mk(64)), (3, mk(65)), (4, mk(150)), (5, "")],
        ["doc_id", "text"],
    )
    out = {}
    for r in chunk_documents(df, chunk_tokens=64, overlap=16).collect():
        out.setdefault(r.doc_id, []).append((r.chunk_idx, r.start_tok, r.n_tokens))
    assert out[1] == [(0, 1, 10)]               # short doc: one partial chunk
    assert out[2] == [(0, 1, 64)]               # exact fit: one chunk
    assert out[3] == [(0, 1, 64), (1, 49, 17)]  # one token over: overlap window
    assert out[4] == [(0, 1, 64), (1, 49, 64), (2, 97, 54)]
    assert 5 not in out                          # empty doc absent
    # every token position of doc 4 is covered by some chunk
    covered = set()
    for _, start, n in out[4]:
        covered.update(range(start, start + n))
    assert covered == set(range(1, 151))


def test_pack_sequences_agrees_with_python_reference_randomized(spark):
    """Randomized cross-check against an independent driver-side
    implementation of the packing rule (seeded — reproducible)."""
    import random as _r

    rng = _r.Random(42)
    for trial in range(3):
        rows = [
            (i, rng.randrange(4), rng.randrange(1, 400))
            for i in range(rng.randrange(30, 120))
        ]
        budget = rng.choice([256, 512, 1000])
        # reference: per shard in doc_id order, chunk = floor(prev_cum / budget)
        expect = {}
        by_shard = {}
        for doc, shard, n in sorted(rows):
            start = by_shard.get(shard, 0)
            chunk = start // budget
            key = (shard, chunk)
            d = expect.setdefault(key, [0, 0, doc, doc])
            d[0] += 1
            d[1] += n
            d[3] = doc
            by_shard[shard] = start + n
        df = spark.createDataFrame(rows, ["doc_id", "shard", "n_tokens"])
        got = {
            (r.shard, r.chunk_id): [r.n_docs, r.chunk_tokens, r.first_doc, r.last_doc]
            for r in pack_sequences(df, budget=budget).collect()
        }
        assert got == expect, f"trial {trial}"


def test_chunk_documents_invariants_randomized(spark):
    from train_reports_etl_spark.extensions.corpus import chunk_documents
    import random as _r

    rng = _r.Random(9)
    chunk, overlap = 32, 8
    rows = [
        (i, " ".join(f"w{j}" for j in range(rng.randrange(1, 120))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    lens = {i: len(t.split()) for i, t in rows}
    out = {}
    for r in chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect():
        out.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in out.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        n = lens[doc_id]
        # no chunk exceeds the window; every token covered exactly
        assert all(r.n_tokens <= chunk for r in chunks)
        covered = set()
        for r in chunks:
            covered.update(range(r.start_tok, r.start_tok + r.n_tokens))
            assert len(r.chunk_text.split()) == r.n_tokens
        assert covered == set(range(1, n + 1))
        # consecutive chunks advance by exactly chunk - overlap
        for a, b in zip(chunks, chunks[1:]):
            assert b.start_tok - a.start_tok == chunk - overlap
    assert set(out) == set(lens)  # every non-empty doc chunked


def test_bm25_ranks_matching_docs_first(spark):
    from train_reports_etl_spark.extensions.text import bm25_rank

    rows = [
        (0, "spark spark spark engine"),       # heavy on query term
        (1, "spark engine"),                   # one hit, short doc
        (2, "database engine theory words"),   # no hits
        (3, "spark " + "filler " * 50),        # one hit, long doc
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bm25_rank(df, ["spark"], top_n=4).collect()
    order = [r.doc_id for r in sorted(out, key=lambda r: r.rank)]
    # tf dominates; among single-hit docs the shorter wins (length norm)
    assert order[0] == 0 and order[1] == 1 and order[2] == 3
    assert order[3] == 2                     # no-hit doc ranked last
    by_id = {r.doc_id: r for r in out}
    assert by_id[0].tf_spark == 3 and by_id[2].tf_spark == 0
    assert by_id[3].n_tokens == 51


def test_corpus_pipeline_is_deterministic_across_runs(spark):
    """The whole build (quality gate -> dedup -> split -> accounting)
    must replay identically — no rand(), no order dependence."""
    from train_reports_etl_spark.extensions.corpus import build_corpus_summary

    rows = [(i, f"text piece number {i} " + "word " * (i % 60)) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = {r.split: (r.n_docs, r.total_tokens, r.first_doc)
         for r in build_corpus_summary(df, min_tokens=20).collect()}
    b = {r.split: (r.n_docs, r.total_tokens, r.first_doc)
         for r in build_corpus_summary(df.repartition(17), min_tokens=20).collect()}
    assert a == b and set(a) <= {"train", "val", "test"}
    assert sum(n for n, _, _ in a.values()) > 0


def test_redact_pii_overlapping_spans_not_double_counted(spark):
    """An IP-shaped run inside an email local part is consumed by the
    <EMAIL> replacement; progressive counting must not also count it as
    an IP — counts equal the placeholders actually present."""
    from train_reports_etl_spark.extensions.text import redact_pii

    df = spark.createDataFrame([(0, "contact a1.2.3.4@x.com now")], ["doc_id", "text"])
    r = redact_pii(df).collect()[0]
    assert (r.n_emails, r.n_ips, r.n_phones) == (1, 0, 0)
    assert r.redacted == "contact <EMAIL> now"


def test_span_dedup_keeps_first_occurrence_and_reassembles(spark):
    from train_reports_etl_spark.extensions.corpus import span_dedup

    boiler = " ".join(f"b{i}" for i in range(4))       # shared 4-token span
    uniq_a = " ".join(f"a{i}" for i in range(4))
    uniq_b = " ".join(f"c{i}" for i in range(4))
    rows = [
        (1, f"{boiler} {uniq_a}"),    # spans: [boiler, uniq_a]
        (2, f"{boiler} {uniq_b}"),    # boiler is a repeat -> dropped
        (3, boiler),                  # entirely duplicate -> doc vanishes
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in span_dedup(df, span_tokens=4).collect()}
    assert out[1].dedup_text == f"{boiler} {uniq_a}" and out[1].n_spans_kept == 2
    assert out[2].dedup_text == uniq_b and out[2].n_spans_kept == 1
    assert 3 not in out


def test_span_dedup_span_order_preserved_within_doc(spark):
    from train_reports_etl_spark.extensions.corpus import span_dedup

    # 3 spans of 2 tokens; middle span duplicates doc 0's only span
    df = spark.createDataFrame(
        [(0, "x y"), (1, "p q x y r s")], ["doc_id", "text"]
    )
    out = {r.doc_id: r.dedup_text for r in span_dedup(df, span_tokens=2).collect()}
    assert out[0] == "x y"
    assert out[1] == "p q r s"  # kept spans rejoin in original order


def test_temperature_mix_quota_math_and_determinism(spark):
    import math

    from train_reports_etl_spark.extensions.corpus import temperature_mix

    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(25)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = temperature_mix(df, budget=100)
    sel = out.groupBy("source").count().collect()
    got = {r.source: r["count"] for r in sel}
    w_big = math.floor(math.sqrt(400) * 1e6)
    w_small = math.floor(math.sqrt(25) * 1e6)
    z = w_big + w_small
    assert got["big"] == max(1, 100 * w_big // z)    # 80
    assert got["small"] == max(1, 100 * w_small // z)  # 20
    # α=0.5 up-weights the small source vs proportional (≈6 rows)
    assert got["small"] > 25 * 100 // 425
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in temperature_mix(df.repartition(13), budget=100).collect())
    assert a == b


def test_contamination_fraction_bounds_and_pairs_consistency(spark):
    from train_reports_etl_spark.extensions.corpus import (
        contamination_fraction,
        contamination_pairs,
    )

    words = [f"w{i}" for i in range(40)]
    rows = [(i, " ".join(words[j % 40] for j in range(i, i + 30))) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    frac = {r.train_id: r for r in contamination_fraction(df).collect()}
    for r in frac.values():
        assert 0 <= r.n_contaminated <= r.n_fps
        assert abs(r.contamination_frac - r.n_contaminated / r.n_fps) < 1e-12
    tainted = {r.train_id for r in contamination_pairs(df, min_shared=1).collect()}
    for t in tainted:
        assert frac[t].n_contaminated > 0


def test_quality_gate_rules_and_reasons(spark):
    from train_reports_etl_spark.extensions.corpus import quality_gate

    good = "the cat and dog sat in a big warm house of quiet friends near town " * 2
    rows = [
        (1, good),                       # passes everything
        (2, "the of"),                   # too few words
        (3, "the " * 30),                # repetition: one token dominates
        (4, " ".join(str(100 + i) for i in range(20)) + " the of"),  # digits: alpha frac low
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in quality_gate(df).collect()}
    assert out[1].keep and out[1].reason == "ok"
    assert not out[2].keep and out[2].reason == "r_word_count"
    assert not out[3].keep and out[3].reason == "r_repetition"
    assert not out[4].keep and out[4].reason == "r_alpha"
    # empty doc: fails word count with zeroed metrics
    e = quality_gate(spark.createDataFrame([(9, "")], ["doc_id", "text"])).collect()[0]
    assert not e.keep and e.reason == "r_word_count" and e.n_words == 0


def test_ngram_counts_multiplicity_and_tiebreak(spark):
    from train_reports_etl_spark.extensions.text import ngram_counts

    rows = [
        (1, "a b c a b c"),   # 'a b c' x2, 'b c a' x1, 'c a b' x1
        (2, "a b c"),         # 'a b c' x1
        (3, "x y"),           # shorter than n: contributes nothing
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = ngram_counts(df, n=3, top_n=10).collect()
    assert [(r.ngram, r.n_occurrences, r.n_docs) for r in out] == [
        ("a b c", 3, 2),
        ("b c a", 1, 1),
        ("c a b", 1, 1),
    ]


def test_cdc_span_dedup_insertion_robust(spark):
    """An insertion at the head of a copy must NOT stop later chunks
    from deduping (the fixed-width form fails exactly this)."""
    from pyspark.sql import functions as F

    from train_reports_etl_spark.extensions.corpus import cdc_span_dedup, span_dedup
    from train_reports_etl_spark.extensions.text import token_value16

    base_words = [f"w{i}" for i in range(400)]
    base = " ".join(base_words)
    shifted = "inserted preamble goes here " + base
    df = spark.createDataFrame([(1, base), (2, shifted)], ["doc_id", "text"])
    out = {r.doc_id: r for r in cdc_span_dedup(df).collect()}
    # doc 2 keeps its novel preamble chunk(s) but sheds the shared tail:
    # most of the 400 copied words dedup away despite the shift
    kept_words = len(out[2].dedup_text.split())
    assert kept_words < 100, f"CDC failed to realign: doc2 kept {kept_words} words"
    # fixed-width spans mostly FAIL to dedup the shifted copy (alignment lost)
    fixed = {r.doc_id: r for r in span_dedup(df, span_tokens=16).collect()}
    assert len(fixed[2].dedup_text.split()) > kept_words
    # full duplicate still vanishes entirely
    df2 = spark.createDataFrame([(1, base), (2, base)], ["doc_id", "text"])
    out2 = {r.doc_id: r for r in cdc_span_dedup(df2).collect()}
    assert 2 not in out2 and out2[1].dedup_text == base


def test_bigram_rarity_flags_gibberish(spark):
    """A doc of corpus-unique bigrams flags; repeated fluent text keeps."""
    from train_reports_etl_spark.extensions.corpus import bigram_rarity

    common = "the quick brown fox jumps over the lazy dog"
    rows = [(i, common) for i in range(5)] + [(99, "zx qv wk jj pq mz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_rarity(df).collect()}
    assert out[99]["verdict"] == "flag" and out[99]["rare_ppm"] == 1_000_000
    assert out[0]["verdict"] == "keep" and out[0]["n_rare"] == 0
    # single-token doc: no bigrams, absent from output
    one = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    assert bigram_rarity(one).count() == 0
