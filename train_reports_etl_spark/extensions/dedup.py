"""Document deduplication (E1/E2): exact, set-Jaccard, MinHash+LSH,
SimHash, embedding-cosine.

Scale notes (the whole point of these operators):

- **Exact** dedup is a hash groupBy on the md5 fingerprint — one
  shuffle keyed by a 128-bit digest, no text comparison; at 100 TB the
  shuffled payload is (digest, doc_id), not documents.
- **All-pairs Jaccard** via a token inverted index is quadratic in the
  worst case — it is the *verification* stage. The *candidate
  generation* stage at scale is MinHash+LSH banding: candidates meet
  only inside an LSH bucket, so the join key is (band, band_hash) and
  the cross product never materializes globally. The oracle-checked
  query caps the inverted index to rarer tokens (document-frequency
  pruning) which is also how production prefilters behave.
- **SimHash** reduces each doc to a small integer; near-dups are pairs
  within a Hamming radius, found by bucketing on fingerprint chunks
  (pigeonhole: radius ≤ r ⇒ some chunk of r+1 splits matches exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from train_reports_etl_spark.extensions.text import (
    fingerprint_md5,
    simhash16,
    tokens,
    word_set,
)
from train_reports_etl_spark.operators.dedup import keep_last_dedup


# ---------------------------------------------------------------- E1 exact

def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """E1 — exact dedup on normalized content: keep the lowest id per
    fingerprint (deterministic canonical representative).

    Returns (kept, duplicates) like W1. The group key is the md5
    fingerprint, so the shuffle carries digests, not documents.
    """
    with_fp = df.withColumn("__fp", fingerprint_md5(text_col))
    kept, dups = keep_last_dedup(with_fp, ["__fp"], [(-F.col(id_col)).alias("neg_id")])
    return kept.drop("__fp"), dups.drop("__fp")


def duplicate_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """E1 companion — one row per duplicated fingerprint with the kept
    id and the group size."""
    return (
        df.select(F.col(id_col), fingerprint_md5(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).cast("long").alias("keep_id"),
            F.count("*").cast("int").alias("group_size"),
        )
        .filter(F.col("group_size") > 1)
    )


# ------------------------------------------------------------ E2 Jaccard

def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_ratio: float = 1.0,
) -> DataFrame:
    """E2 — all-pairs word-set Jaccard ≥ threshold via an inverted
    index (explode tokens → self-join on token → count intersections).

    ``max_df_ratio`` drops tokens appearing in more than that fraction
    of docs before the join — document-frequency pruning, the standard
    guard against the quadratic blowup from stop-ish tokens. Output:
    (doc_a < doc_b, jaccard) with jaccard computed exactly from set
    sizes, so pruning affects cost, not correctness of surviving pairs?
    No — pruning changes the *candidate* set only; the final jaccard
    uses full set sizes and intersections of *unpruned* tokens, so
    ``max_df_ratio < 1`` trades recall for cost exactly like production
    prefilters. Default 1.0 = exact.
    """
    sets = df.select(F.col(id_col).alias("id"), word_set(text_col).alias("ws"))
    sets = sets.withColumn("sz", F.size("ws"))
    posting = sets.select("id", "sz", F.explode("ws").alias("tok"))
    if max_df_ratio < 1.0:
        n_docs = df.count()
        doc_freq = posting.groupBy("tok").agg(F.count("*").alias("df"))
        keep_toks = doc_freq.filter(F.col("df") <= int(max_df_ratio * n_docs)).select("tok")
        posting = posting.join(F.broadcast(keep_toks), "tok")
    a = posting.select(F.col("tok"), F.col("id").alias("doc_a"), F.col("sz").alias("sz_a"))
    b = posting.select(F.col("tok"), F.col("id").alias("doc_b"), F.col("sz").alias("sz_b"))
    inter = (
        a.join(b, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
        .agg(F.count("*").alias("n_inter"))
    )
    jac = F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ------------------------------------------------------- E2 MinHash + LSH

def minhash_signatures(
    df: DataFrame,
    num_perm: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_width: int = 3,
) -> DataFrame:
    """MinHash signatures over word ``shingle_width``-grams.

    Permutation *i* is simulated with ``xxhash64(shingle, seed=i)``;
    the signature element is the min hash per permutation.

    Implementation is explode + hash-aggregate, NOT num_perm ×
    ``array_min(transform(...))``: the nested-HOF form re-evaluates the
    shingle expression once per permutation (measured ~5× slower and
    outside codegen); the agg form computes shingles once, runs the
    mins inside whole-stage codegen with map-side partial aggregation,
    and shuffles exactly one row per document.
    """
    toks = tokens(text_col)
    # word n-gram shingles: join tokens[i..i+w-1] with '\x1f'
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - shingle_width, F.lit(0)))
    shingles = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.array_join(F.slice(toks, i + 1, shingle_width), "\x1f"),
        )
    )
    posting = df.select(F.col(id_col).alias("id"), F.explode(shingles).alias("sh"))
    mins = posting.groupBy("id").agg(
        *[F.min(F.xxhash64("sh", F.lit(p))).alias(f"h{p}") for p in range(num_perm)]
    )
    return mins.select("id", F.array(*[F.col(f"h{p}") for p in range(num_perm)]).alias("sig"))


def minhash_lsh_candidates(
    sigs: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands of
    ``rows_per_band`` elements; docs sharing any band hash are
    candidates. The shuffle key is (band_id, band_hash) — tiny, uniform
    — and only bucket-mates ever meet, which is what makes near-dup
    feasible at 100 TB.
    """
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(*[F.element_at("sig", b * rows_per_band + r + 1) for r in range(rows_per_band)]).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bh")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    threshold: float = 0.5,
    num_perm: int = 32,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """E2 — full MinHash+LSH near-dup pipeline: signatures → banded
    candidates → exact signature-similarity verification.

    Output: (doc_a, doc_b, est_jaccard) where est_jaccard is the
    fraction of agreeing signature elements (unbiased Jaccard
    estimator).

    The signature table is persisted before fan-out: the banding
    self-join and the verification join reference it three times, and
    without materialization each branch would re-run the full
    shingle+hash expression tree (signatures are tiny — num_perm longs
    per doc — so this caches KBs per thousand docs, never documents).
    """
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, num_perm, id_col, text_col).persist()
    cands = minhash_lsh_candidates(sigs, bands, rows_per_band)
    a = sigs.select(F.col("id").alias("doc_a"), F.col("sig").alias("sig_a"))
    b = sigs.select(F.col("id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = (
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0))),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        / F.lit(num_perm)
    )
    return (
        cands.join(a, "doc_a").join(b, "doc_b")
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


# ----------------------------------------------------------- E2 SimHash

def simhash_near_duplicates(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """E2 — SimHash near-dup: pairs of docs whose 16-bit simhash is
    within ``max_hamming``. Candidate generation by pigeonhole chunking
    (4 chunks of 4 bits: distance ≤3 ⇒ at least one chunk equal), then
    exact Hamming verification — bucketed join, never all-pairs.
    """
    from train_reports_etl_spark.extensions.text import hamming16

    sh = df.select(F.col(id_col).alias("id"), simhash16(text_col).alias("sh"))
    chunks = sh.select(
        "id",
        "sh",
        F.explode(
            F.array(*[F.struct(F.lit(k).alias("chunk"), F.shiftright("sh", 4 * k).bitwiseAND(F.lit(0xF)).alias("cv")) for k in range(4)])
        ).alias("cc"),
    ).select("id", "sh", "cc.chunk", "cc.cv")
    a, b = chunks.alias("a"), chunks.alias("b")
    cands = (
        a.join(b, ["chunk", "cv"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("doc_a"), F.col("a.sh").alias("sh_a"), F.col("b.id").alias("doc_b"), F.col("b.sh").alias("sh_b"))
        .distinct()
    )
    return (
        cands.withColumn("hamming", hamming16(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
