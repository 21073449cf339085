"""Round-5 operator tests: sliding-window substring dedup (Lee et al.
shape), SemDeDup, and the hashed bag-of-words linear classifier."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from train_reports_etl_spark.extensions.corpus import substring_dup_stats
from train_reports_etl_spark.extensions.similarity import semdedup
from train_reports_etl_spark.extensions.text import (
    hashed_bow_weights,
    linear_quality_score,
)


def _doc(tokens: list[str]) -> str:
    return " ".join(tokens)


def test_substring_dup_interval_union(spark):
    """A 25-token run copied A→B marks exactly those 25 tokens in each
    doc (overlapping 20-token windows merge, not double-count)."""
    a_toks = [f"a{i}" for i in range(40)]
    # B embeds A's tokens 5..29 (25 tokens) between unique padding.
    b_toks = [f"b{i}" for i in range(10)] + a_toks[5:30] + [f"c{i}" for i in range(5)]
    df = spark.createDataFrame(
        [(1, _doc(a_toks)), (2, _doc(b_toks))], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r
        for r in substring_dup_stats(df, window_tokens=20).collect()
    }
    assert set(rows) == {1, 2}
    assert rows[1].dup_tokens == 25 and rows[1].n_tokens == 40
    assert rows[2].dup_tokens == 25 and rows[2].n_tokens == 40
    assert rows[1].dup_ppm == 25 * 1_000_000 // 40


def test_substring_dup_no_duplicates_empty(spark):
    df = spark.createDataFrame(
        [(1, _doc([f"x{i}" for i in range(30)]))], "doc_id long, text string"
    )
    assert substring_dup_stats(df, window_tokens=20).count() == 0


def test_substring_dup_counts_within_doc_repeats(spark):
    """The duplicate test is global occurrences > 1 — a window repeated
    INSIDE one document is duplicated too (Lee et al. semantics)."""
    run = [f"r{i}" for i in range(20)]
    toks = run + ["mid0", "mid1"] + run
    df = spark.createDataFrame([(7, _doc(toks))], "doc_id long, text string")
    row = substring_dup_stats(df, window_tokens=20).collect()[0]
    # Both copies of the run are duplicated windows; the middle filler
    # is not covered → 40 of 42 tokens.
    assert row.n_tokens == 42 and row.dup_tokens == 40


def _vec(*vals: float) -> list[float]:
    return [float(v) for v in vals]


def test_semdedup_drops_near_duplicate_keeps_isolated(spark):
    # ids 0..15 are the quantizer (spread unit vectors in 4-d).
    base = []
    for i in range(16):
        v = [0.0, 0.0, 0.0, 0.0]
        v[i % 4] = 1.0 if i < 8 else -1.0
        v[(i + 1) % 4] += 0.1 * (i + 1)
        base.append((i, v))
    # Diagonal direction — cosine ≤ ~0.6 with every axis-ish centroid,
    # so the only ≥0.95 neighbor relation is 16↔17.
    near_a = _vec(0.5, 0.5, 0.5, 0.5)
    near_b = _vec(0.501, 0.499, 0.5, 0.5)  # cosine ≈ 1 with near_a
    lone = _vec(0.0, 0.0, 0.0, -5.0)
    rows = base + [(16, near_a), (17, near_b), (18, lone)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    out = semdedup(df, n_centroids=16, threshold=0.95).collect()
    dropped = {r.vec_id: r for r in out}
    assert 17 in dropped
    assert dropped[17].kept_by == 16
    assert 18 not in dropped
    assert 16 not in dropped  # the keeper survives


def test_linear_quality_score_matches_reference_math(spark):
    """Independent recomputation: md5-nibble bucket + integer weights."""
    text = "The cat SAT on 42 mats"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = linear_quality_score(df).collect()[0]
    weights, bias = hashed_bow_weights()
    toks = ["the", "cat", "sat", "on", "42", "mats"]
    hexd = "0123456789abcdef"

    def bucket(t: str) -> int:
        h = hashlib.md5(t.encode()).hexdigest()
        return (hexd.index(h[0]) * 16 + hexd.index(h[1])) % 64

    expected = bias + sum(weights[bucket(t)] for t in toks)
    assert row.n_tokens == 6
    assert row.score_ppm == expected
    assert row.keep == (expected > 0)


def test_linear_quality_score_empty_doc_scores_bias(spark):
    df = spark.createDataFrame([(1, "!!!")], "doc_id long, text string")
    row = linear_quality_score(df).collect()[0]
    _, bias = hashed_bow_weights()
    assert row.n_tokens == 0 and row.score_ppm == bias


def test_linear_quality_score_is_narrow_no_shuffle(spark):
    """The scoring pass must stay map-only: no Exchange in the plan."""
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = linear_quality_score(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ----------------------------------------------------------- pHash

def _assets_df(spark, rows):
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("media_type", StringType(), True),
            StructField("payload", BinaryType(), True),
            StructField("n_bytes", LongType(), True),
        ]
    )
    data = [
        (i, "image/png", bytearray(p), len(p)) for i, p in rows
    ]
    return spark.createDataFrame(data, schema)


def test_phash_identical_payloads_distance_zero(spark):
    from train_reports_etl_spark.extensions.multimodal import phash_near_duplicates

    p = bytes(range(256)) * 4
    df = _assets_df(spark, [(1, p), (2, p), (3, b"completely different " * 40)])
    pairs = {(r.id_a, r.id_b): r.hamming for r in phash_near_duplicates(df).collect()}
    assert pairs == {(1, 2): 0}


def test_phash_small_perturbation_small_distance(spark):
    from train_reports_etl_spark.extensions.multimodal import phash_near_duplicates

    p = bytes((i * 37) % 251 for i in range(1024))
    q = bytearray(p)
    q[100] ^= 0xFF  # one corrupted byte = one pixel
    df = _assets_df(spark, [(1, p), (2, bytes(q))])
    pairs = {(r.id_a, r.id_b): r.hamming for r in phash_near_duplicates(df).collect()}
    assert (1, 2) in pairs
    assert 0 <= pairs[(1, 2)] <= 7


def test_phash_table_is_deterministic(spark):
    from train_reports_etl_spark.extensions.multimodal import phash_table

    df = _assets_df(
        spark, [(i, bytes((i * 13 + j) % 256 for j in range(300))) for i in range(20)]
    )
    h1 = {r.asset_id: r.phash for r in phash_table(df).collect()}
    h2 = {r.asset_id: r.phash for r in phash_table(df.repartition(5)).collect()}
    assert h1 == h2 and len(h1) == 20


def test_phash_matches_reference_dct(spark):
    """Independent recomputation of one hash with plain numpy."""
    import numpy as np

    from train_reports_etl_spark.extensions.multimodal import phash_table

    p = bytes((i * 7) % 256 for i in range(500))
    df = _assets_df(spark, [(1, p)])
    got = phash_table(df).collect()[0].phash

    size, keep = 32, 8
    raw = np.frombuffer(p, dtype=np.uint8)
    img = np.tile(raw, -(-size * size // len(raw)))[: size * size]
    img = img.astype(np.float64).reshape(size, size)
    k = np.arange(size)
    d = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * size))
    d *= np.sqrt(2.0 / size)
    d[0] *= np.sqrt(0.5)
    c = (d @ img @ d.T)[:keep, :keep].reshape(-1)
    bits = (c > np.median(c)).astype(np.uint64)
    expected = int(
        (bits * (np.uint64(1) << np.arange(64, dtype=np.uint64))).sum()
    )
    expected = expected - (1 << 64) if expected >= (1 << 63) else expected
    assert got == expected


# ------------------------------------------------------------- BPE

def test_bpe_encode_word_reference_cases():
    from train_reports_etl_spark.extensions.text import (
        DEFAULT_BPE_MERGES,
        bpe_encode_word,
    )

    ranks = {p: i for i, p in enumerate(DEFAULT_BPE_MERGES)}
    # "the": t+h -> th (rank 0), th+e -> the (rank 1)
    assert bpe_encode_word("the", ranks) == ["the"]
    # "there": t+h, th+e, then (r,e) rank 5 beats (the,r) rank 26
    assert bpe_encode_word("there", ranks) == ["the", "re"]
    # rank order matters: "ing" merges i+n first (rank 2), then in+g
    assert bpe_encode_word("ing", ranks) == ["ing"]
    # unknown chars stay single
    assert bpe_encode_word("xyz", ranks) == ["x", "y", "z"]
    assert bpe_encode_word("a", ranks) == ["a"]


def test_bpe_token_counts_matches_direct_encoding(spark):
    from train_reports_etl_spark.extensions.text import (
        DEFAULT_BPE_MERGES,
        bpe_encode_word,
        bpe_token_counts,
    )
    import re

    docs = [
        (1, "the thing is there and the thing is here"),
        (2, "Coding 2024 is MERGING tokens"),
        (3, "!!!"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in bpe_token_counts(df).collect()}

    ranks = {p: i for i, p in enumerate(DEFAULT_BPE_MERGES)}
    for doc_id, text in docs:
        words = re.findall(r"[a-z0-9]+", text.lower())
        if not words:
            assert doc_id not in got  # no tokens -> no row
            continue
        n_pieces = sum(len(bpe_encode_word(w, ranks)) for w in words)
        assert got[doc_id].n_words == len(words)
        assert got[doc_id].n_bpe_tokens == n_pieces


# ----------------------------------------------------------- zorder

def test_zorder_key_matches_reference_interleave(spark):
    from train_reports_etl_spark.operators.zorder import zorder_key

    def ref(x, y, bits=16):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    import random

    rng = random.Random(9)
    rows = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(50)]
    rows += [(0, 0), (65535, 65535), (1, 0), (0, 1)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
    for r in got:
        assert r.z == ref(r.x, r.y), (r.x, r.y)


def test_zorder_contiguous_ranges_bound_both_dims(spark):
    """The data-skipping property: rows in one z-cell have BOTH
    coordinates inside the cell's aligned 2^k box."""
    from train_reports_etl_spark.operators.zorder import zorder_key

    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")
    z = df.select("x", "y", zorder_key(F.col("x"), F.col("y"), bits=6).alias("z"))
    # cells of 2^6 = 64 consecutive z values = aligned 8x8 boxes
    prof = (
        z.groupBy(F.expr("z div 64").alias("cell"))
        .agg(
            F.min("x").alias("mnx"), F.max("x").alias("mxx"),
            F.min("y").alias("mny"), F.max("y").alias("mxy"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert len(prof) == 64  # 64 cells of 64 rows
    for r in prof:
        assert r.n == 64
        assert r.mxx - r.mnx == 7 and r.mnx % 8 == 0
        assert r.mxy - r.mny == 7 and r.mny % 8 == 0


# ----------------------------------------------- randomized properties

def test_substring_dup_matches_bruteforce_on_random_corpus(spark):
    """Seeded random corpus with a small alphabet (forces repeats):
    dup_tokens must equal the brute-force interval union of duplicated
    windows, computed independently in local Python."""
    import random

    rng = random.Random(41)
    w = 5
    docs = []
    for doc_id in range(30):
        n = rng.randint(0, 40)
        docs.append((doc_id, " ".join(rng.choice("abcde") for _ in range(n))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.dup_tokens)
        for r in substring_dup_stats(df, window_tokens=w).collect()
    }

    # brute force
    from collections import Counter

    toks = {d: t.split() if t else [] for d, t in docs}
    counts = Counter()
    for d, ts in toks.items():
        for i in range(len(ts) - w + 1):
            counts[tuple(ts[i : i + w])] += 1
    expected = {}
    for d, ts in toks.items():
        covered = set()
        for i in range(len(ts) - w + 1):
            if counts[tuple(ts[i : i + w])] > 1:
                covered.update(range(i, i + w))
        if covered:
            expected[d] = (len(ts), len(covered))
    assert got == expected


def test_symspell_candidates_are_lossless_for_distance_1(spark):
    """Every true edit-distance-≤1 pair in a random vocabulary must be
    found (the deletion-variant pigeonhole), compared against an
    all-pairs local Levenshtein."""
    import itertools
    import random

    def lev1(a: str, b: str) -> bool:
        if a == b:
            return False
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) == 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        # insertion: b = a with one extra char
        for i in range(lb):
            if b[:i] + b[i + 1 :] == a:
                return True
        return False

    rng = random.Random(7)
    vocab = sorted({
        "".join(rng.choice("abc") for _ in range(rng.randint(4, 6)))
        for _ in range(60)
    })
    # docs: each word once (freq 1; the injection path needs >= 20 so
    # build pairs purely from the natural vocabulary)
    docs = [(i, " ".join(vocab)) for i in range(1)]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # reuse the registered query's building blocks inline
    from train_reports_etl_spark.extensions.text import tokens as _tokens

    base = (
        df.select(F.explode(_tokens("text")).alias("w"))
        .filter(F.length("w") >= 4)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    variants = base.select(
        "w", F.explode(F.sequence(F.lit(0), F.length("w"))).alias("i")
    ).select(
        "w",
        F.when(F.col("i") == 0, F.col("w"))
        .otherwise(
            F.concat(F.expr("substring(w, 1, i - 1)"), F.expr("substring(w, i + 1)"))
        )
        .alias("v"),
    )
    a = variants.select("v", F.col("w").alias("w1"))
    b = variants.select("v", F.col("w").alias("w2"))
    got = {
        (r.w1, r.w2)
        for r in (
            a.join(b, "v")
            .filter(F.col("w1") < F.col("w2"))
            .select("w1", "w2")
            .distinct()
            .withColumn("d", F.levenshtein("w1", "w2"))
            .filter(F.col("d") <= 1)
            .collect()
        )
    }
    expected = {
        (x, y) for x, y in itertools.combinations(vocab, 2) if lev1(x, y)
    }
    assert got == expected


def test_zorder_key_roundtrip_deinterleave(spark):
    """Deinterleaving the Morton key recovers both coordinates."""
    from train_reports_etl_spark.operators.zorder import zorder_key

    rows = [(x * 37 % 1024, x * 91 % 1024) for x in range(200)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", zorder_key(F.col("x"), F.col("y"), bits=10).alias("z")).collect()
    for r in got:
        xr = sum(((r.z >> (2 * i)) & 1) << i for i in range(10))
        yr = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(10))
        assert (xr, yr) == (r.x, r.y)


def test_incremental_lsh_only_matches_new_against_corpus(spark):
    from train_reports_etl_spark.extensions.dedup import (
        incremental_minhash_near_duplicates,
    )

    body = "the quick brown fox jumps over the lazy dog again and again " * 3
    other = "completely different content about spark shuffles and joins " * 3
    new = spark.createDataFrame(
        [(10, body), (20, body)], "doc_id long, text string"
    )  # two identical NEW docs — must NOT pair with each other
    corpus = spark.createDataFrame(
        [(1, body), (2, other)], "doc_id long, text string"
    )
    pairs = {
        (r.new_doc, r.corpus_doc)
        for r in incremental_minhash_near_duplicates(new, corpus).collect()
    }
    assert pairs == {(10, 1), (20, 1)}
