"""Training-data evaluation & data-quality operators (E94–E99).

Reference linkage: none — new scope beyond SURVEY.md §2.11, the
eval/DQ half of an LLM-data pipeline: once a corpus is built (E1–E93),
the questions that remain are "is the scorer calibrated?", "how much
vocabulary is still unseen?", "does the retriever find the relevant
docs?", "do duplicate documents leak across CV folds?", "how much
compute does padding waste?", and "which rows are outliers under a
robust location/scale estimate?". Every operator follows the repo's
integer-exactness discipline (counts, ppm ratios by integer division,
literal constants for anything transcendental) so each is
strong-oracle-checkable.

Scale notes are per-function; the common shape is one data-sized
map-combinable aggregate followed by arithmetic on bounded rows
(bins, folds, ranks ≤ k, batches) — never a second pass over raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reliability_bins(
    events: DataFrame,
    n_bins: int = 10,
) -> DataFrame:
    """E94 — reliability diagram for a [0,1]-score against a binary
    outcome (Naeini et al. AAAI'15; Guo et al. ICML'17 popularized the
    ECE summary): bin rows by predicted confidence, compare each bin's
    mean confidence against its empirical accuracy. The score here is
    the deterministic value-proxy P(purchase) = min(value, $100)/$100
    (cents-capped — the same naive "value predicts conversion" scorer
    the isotonic fit E76 calibrates), outcome = event_type='purchase'.

    Integer-exact: confidence in ppm from exact cents, accuracy as one
    floor-div of counts, |gap| on integers. Output one row per
    non-empty bin: (bin, n, pos, conf_ppm, acc_ppm, gap_ppm).

    Scale: ONE map-combinable aggregate over ``n_bins`` keys — the
    aggregate state is the bin table; everything after runs on
    ≤ n_bins rows. Skew-immune (bins are bounded, giant bins are just
    bigger counts)."""
    conf = F.expr("least(cast(round(value * 100) as bigint), 10000) * 100")
    binned = events.select(
        conf.alias("conf_ppm"),
        (F.col("event_type") == "purchase").cast("long").alias("pos"),
    ).select(
        F.least(
            F.expr("conf_ppm div " + str(1_000_000 // n_bins)),
            F.lit(n_bins - 1),
        )
        .cast("long")
        .alias("bin"),
        "conf_ppm",
        "pos",
    )
    per = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("pos"),
        F.sum("conf_ppm").cast("long").alias("sum_conf"),
    )
    return per.select(
        "bin",
        "n",
        "pos",
        F.expr("cast(sum_conf div n as bigint)").alias("conf_ppm"),
        F.expr("cast((1000000 * pos) div n as bigint)").alias("acc_ppm"),
        F.expr(
            "cast(abs(sum_conf div n - (1000000 * pos) div n) as bigint)"
        ).alias("gap_ppm"),
    )


def expected_calibration_error(events: DataFrame, n_bins: int = 10) -> DataFrame:
    """E94 — the ECE scalar over :func:`reliability_bins`:
    ECE_ppm = Σ_b n_b·gap_b div N, plus the max-gap (MCE) and the bin
    count, as one row. Integer arithmetic end-to-end; n·gap ≤
    n·10⁶ ≲ 2^63 to ~9·10¹² rows per bin — beyond that cast the
    product to decimal(38,0) (a4 discipline)."""
    bins = reliability_bins(events, n_bins)
    return bins.agg(
        F.sum("n").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_bins_used"),
        F.expr("cast(sum(n * gap_ppm) div sum(n) as bigint)").alias("ece_ppm"),
        F.max("gap_ppm").cast("long").alias("mce_ppm"),
    )


def vocab_estimates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """E95 — unseen-vocabulary estimation per language: Good–Turing
    missing mass (Gale & Sampson 1995: the probability the NEXT token
    is a new type ≈ f1/N) and the Chao1 lower bound on total
    vocabulary size (Chao 1984: V + f1(f1−1)/(2(f2+1))), from the
    token-frequency count-of-counts. The corpus-planning question
    these answer at 100 TB: is tokenizer/vocab coverage saturating,
    or does the next shard still buy new types?

    Integer-exact: V, N, f1, f2 are counts; Chao1 reported ×1000 by
    one floor-div; coverage in ppm. Output per lang:
    (lang, n_tokens, v_observed, f1, f2, chao1_x1000, coverage_ppm).

    Scale: token explode → (lang, token) count (THE word-count
    shuffle, map-combinable) → per-lang count-of-counts fold (second
    tiny aggregate). The explode fuses into the scan, so the input
    passes through ``repartition_if_coarse`` (row-group audit
    discipline)."""
    from train_reports_etl_spark.extensions.text import tokens
    from train_reports_etl_spark.util import repartition_if_coarse

    docs = repartition_if_coarse(docs)
    cnt = (
        docs.select("lang", F.explode(tokens(text_col)).alias("t"))
        .groupBy("lang", "t")
        .agg(F.count("*").cast("long").alias("c"))
    )
    per = cnt.groupBy("lang").agg(
        F.count("*").cast("long").alias("v_observed"),
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum((F.col("c") == 1).cast("long")).cast("long").alias("f1"),
        F.sum((F.col("c") == 2).cast("long")).cast("long").alias("f2"),
    )
    return per.select(
        "lang",
        "n_tokens",
        "v_observed",
        "f1",
        "f2",
        F.expr(
            "cast(1000 * v_observed"
            " + (1000 * f1 * (f1 - 1)) div (2 * (f2 + 1)) as bigint)"
        ).alias("chao1_x1000"),
        F.expr(
            "cast(1000000 - (1000000 * f1) div n_tokens as bigint)"
        ).alias("coverage_ppm"),
    )


def retrieval_mrr_recall(
    docs: DataFrame,
    terms: list[str],
    ks: tuple[int, ...] = (5, 10, 20),
    top_n: int = 20,
) -> DataFrame:
    """E96 — MRR and recall@k of the BM25 retriever, the set-based
    counterpart of the graded nDCG (E88): a document is RELEVANT when
    it contains at least one query term; MRR_ppm = 10⁶ div (rank of
    the first relevant result, 0 if none in the top-``top_n``);
    recall@k_ppm = 10⁶·(relevant in top k) div (relevant in corpus).
    Integer-exact (ranks, counts, floor-div) — strong oracle.

    Output one row per k: (k, n_rel_corpus, hits_at_k, recall_ppm,
    mrr_ppm) — mrr is k-independent and repeated for a flat schema.

    Scale: the cost IS the retrieval being evaluated (one BM25 pass);
    the eval adds one relevance scan (map-combinable count + the
    top-``top_n`` join) and arithmetic on ≤ top_n rows."""
    from train_reports_etl_spark.extensions.text import bm25_rank, tokens

    rel = docs.select(
        "doc_id",
        (
            F.size(
                F.array_intersect(
                    F.array_distinct(tokens("text")),
                    F.array(*[F.lit(t) for t in terms]),
                )
            )
            > 0
        ).alias("is_rel"),
    )
    n_rel = rel.agg(
        F.sum(F.col("is_rel").cast("long")).cast("long").alias("nr")
    )
    got = (
        bm25_rank(docs, terms, top_n=top_n)
        .select(F.col("rank").cast("long").alias("rank"), "doc_id")
        .join(rel, "doc_id")
        .filter("is_rel")
    )
    stats = got.agg(
        F.min("rank").alias("first_rel"),
        *[
            F.sum((F.col("rank") <= k).cast("long")).cast("long").alias(f"h{k}")
            for k in ks
        ],
    )
    kdf = docs.sparkSession.createDataFrame([(k,) for k in ks], "k int")
    return (
        kdf.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(n_rel))
        .select(
            F.col("k").cast("int").alias("k"),
            F.col("nr").cast("long").alias("n_rel_corpus"),
            F.expr(
                "cast(coalesce(case "
                + " ".join(f"when k = {k} then h{k}" for k in ks)
                + " end, 0) as bigint)"
            ).alias("hits_at_k"),
            F.expr(
                "cast((1000000 * coalesce(case "
                + " ".join(f"when k = {k} then h{k}" for k in ks)
                + " end, 0)) div nr as bigint)"
            ).alias("recall_ppm"),
            F.expr(
                "cast(coalesce(1000000 div first_rel, 0) as bigint)"
            ).alias("mrr_ppm"),
        )
    )


def fold_leakage(
    docs: DataFrame,
    n_folds: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """E97 — cross-validation fold assignment with duplicate-leakage
    audit: hashing DOCUMENTS into folds puts copies of the same
    content on both sides of a train/eval split (the classic CV
    hygiene failure — for LLM corpora, eval contamination by
    near-copies); hashing GROUPS (here: exact-content fingerprint
    groups, the md5 canonical form) cannot. Both assignments are
    computed and audited side by side: for each duplicate group with
    m members split m_f per fold, the leaking pairs are
    C(m,2) − Σ_f C(m_f,2).

    The doc-level fold hashes md5(id || ':fold') — SALTED, the
    corpus-rehearsal lesson: an unsalted id hash correlates with any
    other stage that orders or buckets by the same hash. Output one
    row per method: (method, n_dup_groups, dup_pairs, leaking_pairs)
    — the group method's 0 is the pinned invariant.

    Scale: fingerprint groupBy is the E1 digest shuffle; the audit
    aggregates C(m,2) terms per group then sums — one extra tiny
    aggregate over dup groups only."""
    from train_reports_etl_spark.extensions.text import fingerprint_md5

    base = docs.select(
        F.col(id_col).alias("id"),
        fingerprint_md5(text_col).alias("fp"),
    ).withColumn(
        "doc_fold",
        F.expr(
            "(instr('0123456789abcdef', substring(md5(cast(id as string)"
            " || ':fold'), 1, 1)) - 1)"
        ).cast("long")
        % n_folds,
    )
    rep = base.groupBy("fp").agg(
        F.min("id").alias("rep_id"), F.count("*").cast("long").alias("m")
    )
    rep_fold = rep.withColumn(
        "group_fold",
        F.expr(
            "(instr('0123456789abcdef', substring(md5(cast(rep_id as string)"
            " || ':fold'), 1, 1)) - 1)"
        ).cast("long")
        % n_folds,
    )
    with_folds = base.join(
        rep_fold.select("fp", "m", "group_fold"), "fp"
    ).filter(F.col("m") > 1)

    def audit(fold_col: str, method: str) -> DataFrame:
        per_fold = with_folds.groupBy("fp", fold_col).agg(
            F.count("*").cast("long").alias("mf"),
            F.max("m").alias("m"),
        )
        per_group = per_fold.groupBy("fp").agg(
            F.max("m").alias("m"),
            F.sum(F.expr("(mf * (mf - 1)) div 2")).cast("long").alias("within"),
        )
        return per_group.agg(
            F.count("*").cast("long").alias("n_dup_groups"),
            F.coalesce(F.sum(F.expr("(m * (m - 1)) div 2")), F.lit(0))
            .cast("long")
            .alias("dup_pairs"),
            F.coalesce(
                F.sum(F.expr("(m * (m - 1)) div 2") - F.col("within")), F.lit(0)
            )
            .cast("long")
            .alias("leaking_pairs"),
        ).select(F.lit(method).alias("method"), "*")

    return audit("doc_fold", "per_document").unionByName(
        audit("group_fold", "per_group")
    )


def padding_waste(
    docs: DataFrame,
    batch_size: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """E98 — padded-batch compute waste under two batching orders:
    ARRIVAL (id order — what a naive loader does) vs LENGTH-SORTED
    (the standard bucketing fix). A batch of B sequences pads every
    member to the batch max, so its cost is B·max_len (the last,
    possibly short, batch pays rows·max_len); waste is the padding
    share of that cost in ppm. The measured gap between the two
    orders IS the business case for length bucketing in the training
    loader.

    Integer-exact throughout (token counts, products, one floor-div).
    Output per method: (method, n_batches, token_sum, padded_sum,
    waste_ppm).

    Scale: the global order comes from ``distributed_rank``
    (range-bucketed rank — no single-partition window, the O5
    discipline); per-batch max/count is a map-combinable aggregate on
    batch ids; the method summary is a 1-row fold per method."""
    from train_reports_etl_spark.extensions.text import token_count
    from train_reports_etl_spark.operators.ranking import distributed_rank
    from train_reports_etl_spark.util import repartition_if_coarse

    lens = repartition_if_coarse(docs).select(
        F.col(id_col).alias("id"), token_count(text_col).alias("len")
    )

    def cost(order_bucket: str, order_cols: list[str], method: str) -> DataFrame:
        ranked = distributed_rank(lens, order_bucket, order_cols)
        per_batch = (
            ranked.withColumn(
                "batch", F.expr(f"(rnk - 1) div {batch_size}").cast("long")
            )
            .groupBy("batch")
            .agg(
                F.count("*").cast("long").alias("rows"),
                F.max("len").cast("long").alias("max_len"),
                F.sum("len").cast("long").alias("tokens"),
            )
        )
        return per_batch.agg(
            F.count("*").cast("long").alias("n_batches"),
            F.sum("tokens").cast("long").alias("token_sum"),
            F.sum(F.col("rows") * F.col("max_len")).cast("long").alias("padded_sum"),
        ).select(
            F.lit(method).alias("method"),
            "n_batches",
            "token_sum",
            "padded_sum",
            F.expr(
                "cast((1000000 * (padded_sum - token_sum)) div padded_sum"
                " as bigint)"
            ).alias("waste_ppm"),
        )

    return cost("id", ["id"], "arrival_order").unionByName(
        cost("len", ["len", "id"], "length_sorted")
    )


def mad_outlier_gate(events: DataFrame, k: int = 3) -> DataFrame:
    """E99 — robust outlier gate by median/MAD (Hampel 1974; the
    median absolute deviation is the 50%-breakdown scale estimate —
    mean/stddev gates move with the outliers they are supposed to
    catch): flag rows with |x − median| > k·MAD, on exact integer
    cents. Medians are LOWER medians (rank ⌈N/2⌉ under a total
    order) — integer-exact and engine-portable, unlike interpolated
    medians.

    Output one row: (n, med_cents, mad_cents, n_outliers,
    outlier_ppm).

    Scale: each median is one ``distributed_rank`` (range-bucketed
    global rank, O5) + a rank-predicate filter — two passes over the
    value column, never a global single-partition sort; the gate
    itself is a broadcast-scalar comparison. At 100 TB swap the exact
    rank for the E77 rank-sample sketch if two passes are too dear —
    this operator is the exact anchor that sketch is verified
    against."""
    from train_reports_etl_spark.operators.ranking import distributed_rank

    vals = events.select(
        F.col("event_id").alias("id"),
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    n = vals.count()
    med_rank = (n + 1) // 2
    med = (
        distributed_rank(vals, "cents", ["cents", "id"])
        .filter(F.col("rnk") == med_rank)
        .collect()[0]["cents"]
    )
    dev = vals.select(
        "id", F.abs(F.col("cents") - F.lit(med)).alias("dev")
    )
    mad = (
        distributed_rank(dev, "dev", ["dev", "id"])
        .filter(F.col("rnk") == med_rank)
        .collect()[0]["dev"]
    )
    return dev.agg(
        F.count("*").cast("long").alias("n"),
        F.lit(int(med)).cast("long").alias("med_cents"),
        F.lit(int(mad)).cast("long").alias("mad_cents"),
        F.sum((F.col("dev") > k * mad).cast("long")).cast("long").alias(
            "n_outliers"
        ),
    ).select(
        "n",
        "med_cents",
        "mad_cents",
        "n_outliers",
        F.expr("cast((1000000 * n_outliers) div n as bigint)").alias(
            "outlier_ppm"
        ),
    )
