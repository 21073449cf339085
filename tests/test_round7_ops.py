"""Round-7 pins: plan-shape and type-policy guarantees the round's
fixes introduced (filter-before-distinct in the hamming pair join,
decimal(38,0) wrap-proof money accumulators, the integral sessionizer
fold, and the scale-data generator's distributional fidelity)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().treeString()


def test_hamming_filter_below_distinct(spark):
    """The Hamming verify must run BEFORE the candidate dedup: the
    popcount `<= d` predicate lands in the join condition (executed as
    candidates form) and the distinct aggregate keys carry only
    (id_a, id_b, hamming) — neither 8-byte hash column rides the dedup
    exchange. Reordering distinct-first would re-grow the shuffle with
    pairs the filter is about to discard."""
    from train_reports_etl_spark.extensions.multimodal import hamming_pairs_64

    h = spark.range(200).select(
        F.col("id").alias("asset_id"), F.xxhash64("id").alias("phash")
    )
    plan = _plan(hamming_pairs_64(h, max_hamming=6))
    # the verify predicate is evaluated inside the join itself
    join_lines = [l for l in plan.splitlines() if "Join" in l]
    assert any("bit_count" in l for l in join_lines), plan
    # the dedup aggregate keys are exactly the surviving triple
    agg_lines = [l for l in plan.splitlines() if "HashAggregate(keys=" in l]
    assert agg_lines and all("ph#" not in l for l in agg_lines), plan


def test_hamming_results_unchanged_by_reorder(spark):
    """Filter-before-distinct is a pure plan improvement: results match
    a brute-force popcount over all pairs (both schemes)."""
    from train_reports_etl_spark.extensions.multimodal import hamming_pairs_64

    rows = [(i, h) for i, h in enumerate([0, 1, 3, 7, 1 << 40, (1 << 40) | 3, -1, -2])]
    df = spark.createDataFrame(rows, "asset_id long, phash long")
    expected = {
        (a, b, bin((ha ^ hb) & (2**64 - 1)).count("1"))
        for a, ha in rows
        for b, hb in rows
        if a < b and bin((ha ^ hb) & (2**64 - 1)).count("1") <= 6
    }
    for scheme in ("single", "paired", "mih"):
        got = {
            (r.id_a, r.id_b, r.hamming)
            for r in hamming_pairs_64(df, max_hamming=6, scheme=scheme).collect()
        }
        assert got == expected, scheme


def test_rev_centicents_accumulates_wide(spark):
    """The revenue helper's SUM accumulator must be decimal(38,0) —
    DuckDB sums BIGINT into HUGEINT, and a Spark long SUM would wrap
    silently at high sf. Verified on a sum whose true value exceeds
    int64: the wide sum is exact where a long sum wraps."""
    from train_reports_etl_spark.extensions.ext_queries import _rev_centicents

    df = spark.createDataFrame(
        [(99_999_999.99, 0.0)] * 3, "l_extendedprice double, l_discount double"
    )
    out = df.agg(F.sum(_rev_centicents()).alias("s")).collect()[0].s
    assert int(out) == 3 * 9_999_999_999 * 100
    # and the column's type is decimal(38,0), not long
    dt = df.select(_rev_centicents().alias("r")).schema["r"].dataType.simpleString()
    assert dt == "decimal(38,0)", dt


def test_a4_output_types_and_values(spark, tmp_path):
    """a4's widened accumulators must still emit BIGINT columns (the
    oracle casts its HUGEINTs the same way) with exact values."""
    from train_reports_etl_spark.plans.star_queries import a4_pricing_summary

    df = spark.createDataFrame(
        [("A", "F", 2.0, 100.00, 0.05, 0.08)] * 4,
        "l_returnflag string, l_linestatus string, l_quantity double,"
        " l_extendedprice double, l_discount double, l_tax double",
    )
    src = str(tmp_path / "li")
    df.write.parquet(src + "/lineitem.parquet")
    out = a4_pricing_summary(spark, src).collect()[0]
    schema = a4_pricing_summary(spark, src).schema
    for c in ("sum_base_price_cents", "sum_disc_price_cc", "sum_charge_ccm"):
        assert schema[c].dataType.simpleString() == "bigint", c
    assert out.sum_base_price_cents == 4 * 10000
    assert out.sum_disc_price_cc == 4 * 10000 * 95
    assert out.sum_charge_ccm == 4 * 10000 * 95 * 108


def test_sessionize_integral_fold_emits_long(spark, tmp_path):
    """An integral value column must fold in int64 and emit LongType
    sum_value EXACTLY — at a magnitude (4×2^54) where the old double
    fold could not represent every partial sum."""
    from train_reports_etl_spark.streaming.stateful import streaming_sessionize

    big = 1 << 54  # 2^54: not every neighborhood integer is a double
    src = str(tmp_path / "sess_long")
    spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", big),
            (1, "2024-01-01 00:01:00", big + 1),
            (1, "2024-01-01 00:02:00", big + 3),
            (1, "2024-01-01 00:03:00", big + 5),
            (1, "2024-01-01 02:00:00", 0),  # > gap: closes the session
        ],
        "key_id bigint, ts string, value_cents bigint",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("key_id bigint, ts timestamp, value_cents bigint").parquet(src)
    out = streaming_sessionize(
        stream,
        key_col="key_id",
        ts_col="ts",
        value_col="value_cents",
        gap_ms=600_000,
        watermark="10 minutes",
    )
    assert out.schema["sum_value"].dataType.simpleString() == "bigint"
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_long_pin")
        .start()
    )
    try:
        q.processAllAvailable()
        time.sleep(0.1)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sess_long_pin").collect()
        assert len(rows) == 1
        assert rows[0].n_events == 4
        assert rows[0].sum_value == 4 * big + 9  # exact: 2^56 + 9
    finally:
        q.stop()


def test_sessionize_float_fold_still_double(spark, tmp_path):
    """A float value column keeps the double fold and DoubleType
    output — the integral policy must not change existing callers."""
    from train_reports_etl_spark.streaming.stateful import streaming_sessionize

    src = str(tmp_path / "sess_float")
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.5)], "key_id bigint, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(src)
    stream = spark.readStream.schema("key_id bigint, ts timestamp, value double").parquet(src)
    out = streaming_sessionize(stream, key_col="key_id", ts_col="ts", value_col="value")
    assert out.schema["sum_value"].dataType.simpleString() == "double"


def test_gen_scaledata_matches_sf01_family(tmp_path):
    """The x1 generation must reproduce the driver's sf0.1 family:
    same vocabulary, same near-dup marker scheme (' dup' suffix docs
    that are another doc + marker), same lengths/langs/sources."""
    import numpy as np

    from tools.gen_scaledata import LANGS, VOCAB, gen_documents

    rng = np.random.default_rng(42)
    t = gen_documents(5000, rng).to_pydict()
    texts = t["text"]
    toks = set()
    for x in texts[:500]:
        toks.update(x.split())
    assert toks <= set(VOCAB) | {"dup"}
    dup_docs = [x for x in texts if x.endswith(" dup")]
    assert 200 <= len(dup_docs) <= 260  # ~5% near-dups
    bodies = set(texts)
    assert sum(1 for x in dup_docs if x[: -len(" dup")] in bodies) >= len(dup_docs) * 0.9
    assert set(t["lang"]) == set(LANGS)
    assert all(t["n_chars"][i] == len(texts[i]) for i in range(100))


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.7, 0.8])
def test_prefix_filter_result_identical_jaccard(spark, threshold):
    """The prefix-filtered exact Jaccard join (AllPairs/PPJoin) must
    return EXACTLY the plain posting join's pairs at any threshold —
    the filter is a candidate-pruning theorem, not an approximation.
    Mixed corpus: skewed word frequencies, heavy overlaps, short docs,
    exact copies — the shapes where an off-by-one prefix loses pairs."""
    import random

    from train_reports_etl_spark.extensions.dedup import jaccard_pairs

    rnd = random.Random(7)
    vocab = [f"w{i}" for i in range(60)]
    weights = [1.0 / (r + 1) ** 1.2 for r in range(60)]  # zipf-ish
    docs = []
    for i in range(120):
        ln = rnd.randint(4, 40)
        docs.append((i, " ".join(rnd.choices(vocab, weights=weights, k=ln))))
    for i in range(100, 110):  # near-copies
        docs[i] = (i, docs[i - 100][1] + " extra")
    docs[110] = (110, docs[0][1])  # exact copy
    df = spark.createDataFrame(docs, "doc_id long, text string")
    plain = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in jaccard_pairs(df, threshold=threshold, prefix_filter=False).collect()
    }
    pref = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in jaccard_pairs(df, threshold=threshold, prefix_filter=True).collect()
    }
    assert pref == plain
    assert plain  # non-vacuous: the corpus must actually produce pairs


@pytest.mark.parametrize("threshold_ppm", [500_000, 800_000, 1_000_000])
def test_prefix_filter_result_identical_containment(spark, threshold_ppm):
    """One-sided prefix filtering for containment: same directional
    (doc_a, doc_b, ppm) set as the plain join, including the
    threshold=1.0 edge (prefix length collapses to 1)."""
    import random

    from train_reports_etl_spark.extensions.dedup import containment_pairs

    rnd = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(80):
        ln = rnd.randint(4, 30)
        docs.append((i, " ".join(rnd.choices(vocab, k=ln))))
    for i in range(60, 70):  # quotes: short doc fully inside a long one
        short = docs[i - 60][1]
        docs[i] = (i, short + " " + docs[i - 30][1])
    df = spark.createDataFrame(docs, "doc_id long, text string")
    plain = {
        tuple(r)
        for r in containment_pairs(
            df, threshold_ppm=threshold_ppm, prefix_filter=False
        ).collect()
    }
    pref = {
        tuple(r)
        for r in containment_pairs(
            df, threshold_ppm=threshold_ppm, prefix_filter=True
        ).collect()
    }
    assert pref == plain
    assert plain


def test_sessionize_integral_fold_null_safe(spark, tmp_path):
    """A NULL in an integral value column must not kill the query:
    Arrow hands nullable int64 to pandas as float64-with-NaN, and a
    bare astype('int64') raises on non-finite values. Nulls count as
    zero — SQL SUM's ignore-NULLs semantics."""
    from train_reports_etl_spark.streaming.stateful import streaming_sessionize

    src = str(tmp_path / "sess_null")
    spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10),
            (1, "2024-01-01 00:01:00", None),
            (1, "2024-01-01 00:02:00", 5),
            (1, "2024-01-01 02:00:00", 0),  # > gap: closes the session
        ],
        "key_id bigint, ts string, value_cents bigint",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(src)
    stream = spark.readStream.schema(
        "key_id bigint, ts timestamp, value_cents bigint"
    ).parquet(src)
    out = streaming_sessionize(
        stream, key_col="key_id", ts_col="ts", value_col="value_cents",
        gap_ms=600_000, watermark="10 minutes",
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_null_pin")
        .start()
    )
    try:
        q.processAllAvailable()
        time.sleep(0.1)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sess_null_pin").collect()
        assert len(rows) == 1
        assert rows[0].n_events == 3
        assert rows[0].sum_value == 15  # null counted as 0, not a crash
    finally:
        q.stop()


def test_rate_curve_empty_corpus_row_parity(spark, tmp_path):
    """e1_dedup_rate_curve scores at the curve floor (0.5); the oracle
    mirrors that floor so row EXISTENCE matches too. On a corpus where
    pairs share shingles but none reaches jaccard 0.5, BOTH engines
    must emit 0 rows (an unfiltered oracle would emit 5 zero rows —
    the divergence a review caught before any corpus exposed it)."""
    import duckdb

    import train_reports_etl_spark.extensions.ext_queries  # noqa: F401 — registers queries
    from train_reports_etl_spark.plans.registry import ORACLES, QUERIES

    # two docs sharing exactly one 3-shingle: 5 shingles each,
    # 1 shared -> jaccard = 1/9 < 0.5, so the curve is empty
    docs = [
        (1, "c1 c2 c3 d1 d2 d3 d4"),
        (2, "c1 c2 c3 e1 e2 e3 e4"),
    ]
    src = str(tmp_path / "sf")
    spark.createDataFrame(docs, "doc_id bigint, text string").write.parquet(
        src + "/documents.parquet"
    )

    got_spark = QUERIES["e1_dedup_rate_curve"](spark, src).collect()
    assert got_spark == []

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{src}/documents.parquet/*.parquet'"
    )
    got_duck = con.execute(ORACLES["e1_dedup_rate_curve"]).fetchall()
    assert got_duck == []


def test_semdedup_assign_paths_identical(spark):
    """The fold and matmul assignment paths of semdedup must produce
    identical dropped sets on the committed corpus — including under
    exact-duplicate centroids (a dedup corpus's normal state), where
    both paths fall to the deterministic cid tie-break."""
    from train_reports_etl_spark.extensions.similarity import semdedup

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    # duplicate the lowest-id embedding at id-1: centroids are the k
    # LOWEST-id vectors, so the dup must land BELOW the existing ids
    # to make two centroids bit-identical and force the distance tie
    first = emb.orderBy("vec_id").limit(1).collect()[0]
    dup = spark.createDataFrame(
        [(int(first["vec_id"]) - 1, list(first["embedding"]), first["label"])],
        emb.select("vec_id", "embedding", "label").schema,
    )
    base = emb.select("vec_id", "embedding", "label").unionByName(dup)

    for k in (4, 16):
        got_fold = {
            tuple(r) for r in semdedup(base, n_centroids=k, assign="fold").collect()
        }
        got_mm = {
            tuple(r) for r in semdedup(base, n_centroids=k, assign="matmul").collect()
        }
        assert got_fold == got_mm, f"k={k}: paths diverge"
        assert got_fold, f"k={k}: empty result can't discriminate"


def test_semdedup_assign_paths_nan_and_empty(spark):
    """Review-caught matmul edge cases: a NaN centroid component must
    rank LAST on both paths (numpy argmin alone ranks NaN first and
    sends every vector to the NaN centroid), and zero centroids must
    yield an empty result on both paths instead of a numpy AxisError."""
    import math

    from train_reports_etl_spark.extensions.similarity import semdedup

    schema = "vec_id bigint, embedding array<float>, label int"
    rows = [
        (0, [float("nan"), 1.0, 0.0], 0),  # lowest id -> always a centroid
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.9, 0.1, 0.0], 0),
        (3, [0.0, 1.0, 0.0], 0),
        (4, [0.05, 0.95, 0.0], 0),
    ]
    df = spark.createDataFrame(rows, schema)
    got_fold = {tuple(r) for r in semdedup(df, n_centroids=2, assign="fold").collect()}
    got_mm = {tuple(r) for r in semdedup(df, n_centroids=2, assign="matmul").collect()}
    assert got_fold == got_mm
    assert got_fold, "NaN-centroid corpus produced no drops; test can't discriminate"
    assert not any(math.isnan(v) for r in got_fold for v in r if isinstance(v, float))

    empty = df.filter("vec_id < 0")
    assert semdedup(empty, n_centroids=4, assign="matmul").count() == 0
    assert semdedup(empty, n_centroids=4, assign="fold").count() == 0


def test_hamming_mih_lossless_at_7(spark):
    """MIH (4x16-bit pieces, radius-1 probe enumeration) must be
    LOSSLESS at max_hamming=7 — the distance where single is the only
    other valid scheme — on an adversarial set including negative
    hashes (sign bit set), distance exactly 7, and 7 bits spread 2/2/2/1
    across all four pieces (the worst pigeonhole split)."""
    from train_reports_etl_spark.extensions.multimodal import hamming_pairs_64

    def s64(x: int) -> int:  # wrap to signed int64 (Spark long)
        x &= 2**64 - 1
        return x - 2**64 if x >= 2**63 else x

    base = 0x123456789ABCDEF0
    spread7 = base ^ ((1 | 2) | ((4 | 8) << 16) | ((16 | 32) << 32) | (1 << 48))
    rows = [
        (0, base),
        (1, spread7),                      # d=7 spread 2/2/2/1 over pieces
        (2, base ^ 0x7F),                  # d=7 in one piece
        (3, s64(base ^ ((1 << 63) | 3))),  # d=3 incl. the sign bit
        (4, -1),
        (5, -2),                           # d(4,5)=1
        (6, base),                         # exact dup of 0
    ]
    df = spark.createDataFrame(rows, "asset_id long, phash long")
    expected = {
        (a, b, bin((ha ^ hb) & (2**64 - 1)).count("1"))
        for a, ha in rows
        for b, hb in rows
        if a < b and bin((ha ^ hb) & (2**64 - 1)).count("1") <= 7
    }
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_pairs_64(df, max_hamming=7, scheme="mih").collect()
    }
    assert got == expected
    assert (0, 1, 7) in got and (0, 2, 7) in got  # the d=7 cases really exist


def test_resolve_hamming_scheme_mih():
    """auto resolves paired at d<=6 and mih at 7; paired rejects d=7
    with a message pointing at mih; mih accepted across [0, 7]."""
    import pytest as _pytest

    from train_reports_etl_spark.extensions.multimodal import resolve_hamming_scheme

    assert resolve_hamming_scheme(6, "auto") == "paired"
    assert resolve_hamming_scheme(7, "auto") == "mih"
    for d in range(8):
        assert resolve_hamming_scheme(d, "mih") == "mih"
    with _pytest.raises(ValueError, match="mih"):
        resolve_hamming_scheme(7, "paired")
    with _pytest.raises(ValueError, match="unknown scheme"):
        resolve_hamming_scheme(5, "quad")


def test_sessionize_integral_exact_with_null_and_big(spark, tmp_path):
    """Review-caught combination: a batch mixing a NULL with values
    above 2^53 must still sum EXACTLY — a nullable int64 crosses Arrow
    as float64-with-NaN, so without the JVM-side coalesce the 2^54+1
    below would round to 2^54 before Python could repair it."""
    from train_reports_etl_spark.streaming.stateful import streaming_sessionize

    big = (1 << 54) + 1  # not representable after a float64 round-trip
    src = str(tmp_path / "sess_null_big")
    spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", big),
            (1, "2024-01-01 00:01:00", None),
            (1, "2024-01-01 00:02:00", big + 2),
            (1, "2024-01-01 02:00:00", 0),  # > gap: closes the session
        ],
        "key_id bigint, ts string, value_cents bigint",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(src)
    stream = spark.readStream.schema(
        "key_id bigint, ts timestamp, value_cents bigint"
    ).parquet(src)
    out = streaming_sessionize(
        stream, key_col="key_id", ts_col="ts", value_col="value_cents",
        gap_ms=600_000, watermark="10 minutes",
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_null_big_pin")
        .start()
    )
    try:
        q.processAllAvailable()
        time.sleep(0.1)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sess_null_big_pin").collect()
        assert len(rows) == 1
        assert rows[0].n_events == 3
        assert rows[0].sum_value == 2 * big + 2  # exact: 2^55 + 4
    finally:
        q.stop()


def test_semdedup_assign_paths_null_embeddings(spark):
    """ADVICE round-8: NULL embeddings (and vectors containing null
    elements) previously diverged — the fold path tolerated them while
    the matmul path crashed on the object array np.asarray builds.
    Both paths now DROP such rows up front and must return identical
    results equal to running on the pre-cleaned corpus."""
    from train_reports_etl_spark.extensions.similarity import semdedup

    schema = "vec_id bigint, embedding array<float>, label int"
    rows = [
        (0, None, 0),                        # NULL vector
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.95, 0.05, 0.0], 0),
        (3, [None, 1.0, 0.0], 0),            # null ELEMENT
        (4, [0.0, 1.0, 0.0], 0),
        (5, [0.05, 0.95, 0.0], 0),
    ]
    df = spark.createDataFrame(rows, schema)
    clean = df.filter("vec_id in (1, 2, 4, 5)")
    want = {tuple(r) for r in semdedup(clean, n_centroids=2, assign="fold").collect()}
    assert want, "clean corpus produced no drops; test can't discriminate"
    for assign in ("fold", "matmul"):
        got = {tuple(r) for r in semdedup(df, n_centroids=2, assign=assign).collect()}
        assert got == want, f"assign={assign}: null rows changed the result"
