"""Oracle-checked gate queries for the evaluation/DQ operator
families (E94–E130 — evaluation.py, text.py, corpus.py). Same
portability discipline as
ext_queries: integer counts, ppm ratios via floor division on
non-negative integers (Spark ``div`` ≡ DuckDB ``//`` there), md5 for
any hashing, no float leaves a query except as an exactly-derived
integer."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from train_reports_etl_spark.plans.registry import query
from train_reports_etl_spark.sources.registry import load_table

_SQL_TOKENS = "regexp_extract_all(lower(text), '[a-z0-9]+')"

_BINS_SQL = """
    SELECT LEAST(conf_ppm // 100000, 9) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(pos) AS BIGINT) AS pos,
           CAST(SUM(conf_ppm) AS BIGINT) AS sum_conf
    FROM (
      SELECT LEAST(CAST(ROUND(value * 100) AS BIGINT), 10000) * 100
               AS conf_ppm,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events)
    GROUP BY 1
"""


@query(
    "e94_reliability_bins",
    f"""
    WITH per AS ({_BINS_SQL})
    SELECT CAST(bin AS BIGINT) AS bin, n, pos,
           CAST(sum_conf // n AS BIGINT) AS conf_ppm,
           CAST((1000000 * pos) // n AS BIGINT) AS acc_ppm,
           CAST(ABS(sum_conf // n - (1000000 * pos) // n) AS BIGINT)
             AS gap_ppm
    FROM per
    """,
)
def e94_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E94 — reliability diagram of the value-proxy purchase scorer
    (see evaluation.reliability_bins): one map-combinable aggregate
    over 10 confidence bins; per-bin accuracy vs mean confidence as
    exact integer ppm."""
    from train_reports_etl_spark.extensions.evaluation import reliability_bins

    return reliability_bins(load_table(spark, sf_dir, "events"))


@query(
    "e94_ece",
    f"""
    WITH per AS ({_BINS_SQL}),
    bins AS (
      SELECT n, ABS(sum_conf // n - (1000000 * pos) // n) AS gap_ppm
      FROM per)
    SELECT CAST(SUM(n) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_bins_used,
           CAST(SUM(n * gap_ppm) // SUM(n) AS BIGINT) AS ece_ppm,
           CAST(MAX(gap_ppm) AS BIGINT) AS mce_ppm
    FROM bins
    """,
)
def e94_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E94 — expected calibration error (Naeini et al. 2015) of the
    same scorer: Σ n_b·gap_b div N plus the max-gap (MCE), one row,
    all integer."""
    from train_reports_etl_spark.extensions.evaluation import (
        expected_calibration_error,
    )

    return expected_calibration_error(load_table(spark, sf_dir, "events"))


@query(
    "e95_vocab_estimates",
    f"""
    WITH cnt AS (
      SELECT lang, t, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT lang, UNNEST({_SQL_TOKENS}) AS t FROM documents)
      GROUP BY lang, t),
    per AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS v_observed,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
      FROM cnt GROUP BY lang)
    SELECT lang, n_tokens, v_observed, f1, f2,
           CAST(1000 * v_observed
                + (1000 * f1 * (f1 - 1)) // (2 * (f2 + 1)) AS BIGINT)
             AS chao1_x1000,
           CAST(1000000 - (1000000 * f1) // n_tokens AS BIGINT)
             AS coverage_ppm
    FROM per
    """,
)
def e95_vocab_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E95 — Good–Turing missing mass + Chao1 vocabulary lower bound
    per language (see evaluation.vocab_estimates)."""
    from train_reports_etl_spark.extensions.evaluation import vocab_estimates

    return vocab_estimates(load_table(spark, sf_dir, "documents"))


def _mrr_sql() -> str:
    from train_reports_etl_spark.extensions.ext_queries import _bm25_sql

    case = "CASE WHEN k = 5 THEN h5 WHEN k = 10 THEN h10 WHEN k = 20 THEN h20 END"
    return f"""
    WITH rel AS (
      SELECT doc_id,
             CASE WHEN LEN(LIST_FILTER(LIST_DISTINCT(toks),
                    x -> x IN ('spark', 'window', 'fast'))) > 0
                  THEN 1 ELSE 0 END AS is_rel
      FROM (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents)),
    nr AS (SELECT CAST(SUM(is_rel) AS BIGINT) AS nr FROM rel),
    ranked AS (
      SELECT CAST(rank AS BIGINT) AS rank, doc_id FROM ({_bm25_sql()}) bm),
    got AS (
      SELECT r.rank FROM ranked r JOIN rel USING (doc_id)
      WHERE rel.is_rel = 1),
    stats AS (
      SELECT MIN(rank) AS first_rel,
             CAST(SUM(CASE WHEN rank <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS h5,
             CAST(SUM(CASE WHEN rank <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS h10,
             CAST(SUM(CASE WHEN rank <= 20 THEN 1 ELSE 0 END) AS BIGINT) AS h20
      FROM got),
    ks(k) AS (VALUES (5), (10), (20))
    SELECT CAST(k AS INT) AS k,
           nr AS n_rel_corpus,
           CAST(COALESCE({case}, 0) AS BIGINT) AS hits_at_k,
           CAST(COALESCE((1000000 * COALESCE({case}, 0)) // NULLIF(nr, 0), 0)
             AS BIGINT) AS recall_ppm,
           CAST(COALESCE(1000000 // first_rel, 0) AS BIGINT) AS mrr_ppm
    FROM ks, stats, nr
    """


@query("e96_mrr_recall", None)
def e96_mrr_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E96 — MRR + recall@{5,10,20} of the BM25 retriever (see
    evaluation.retrieval_mrr_recall). Oracle attached below via
    registry (needs the bm25 SQL built lazily)."""
    from train_reports_etl_spark.extensions.evaluation import retrieval_mrr_recall

    docs = load_table(spark, sf_dir, "documents")
    return retrieval_mrr_recall(docs, ["spark", "window", "fast"])


# the bm25 oracle SQL is assembled from ext_queries at import time;
# register it after the function so the decorator stays declarative
from train_reports_etl_spark.plans.registry import ORACLES  # noqa: E402

ORACLES["e96_mrr_recall"] = _mrr_sql()


_TRANSLATE = (
    "translate(text, 'abcdefghijklmnopqrstuvwxyz',"
    " 'ABCDEFGHIJKLMNOPQRSTUVWXYZ') || '  '"
)

_FOLD_SQL = (
    "(instr('0123456789abcdef', substring(md5(cast({id} as VARCHAR)"
    " || ':fold'), 1, 1)) - 1) % 5"
)


@query(
    "e97_fold_leakage",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, {_TRANSLATE}
      FROM documents WHERE doc_id % 10 = 0),
    base AS (
      SELECT doc_id AS id,
             md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp,
             {_FOLD_SQL.format(id="doc_id")} AS doc_fold
      FROM corpus),
    rep AS (
      SELECT fp, MIN(id) AS rep_id, CAST(COUNT(*) AS BIGINT) AS m
      FROM base GROUP BY fp),
    repf AS (
      SELECT fp, m, {_FOLD_SQL.format(id="rep_id")} AS group_fold
      FROM rep),
    wf AS (
      SELECT b.fp, b.doc_fold, r.group_fold, r.m
      FROM base b JOIN repf r USING (fp) WHERE r.m > 1),
    naive AS (
      SELECT fp, MAX(m) AS m, CAST(SUM((mf * (mf - 1)) // 2) AS BIGINT)
               AS within
      FROM (SELECT fp, doc_fold, CAST(COUNT(*) AS BIGINT) AS mf,
                   MAX(m) AS m
            FROM wf GROUP BY fp, doc_fold)
      GROUP BY fp),
    grp AS (
      SELECT fp, MAX(m) AS m, CAST(SUM((mf * (mf - 1)) // 2) AS BIGINT)
               AS within
      FROM (SELECT fp, group_fold, CAST(COUNT(*) AS BIGINT) AS mf,
                   MAX(m) AS m
            FROM wf GROUP BY fp, group_fold)
      GROUP BY fp)
    SELECT 'per_document' AS method,
           CAST(COUNT(*) AS BIGINT) AS n_dup_groups,
           CAST(COALESCE(SUM((m * (m - 1)) // 2), 0) AS BIGINT) AS dup_pairs,
           CAST(COALESCE(SUM((m * (m - 1)) // 2 - within), 0) AS BIGINT)
             AS leaking_pairs
    FROM naive
    UNION ALL
    SELECT 'per_group',
           CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM((m * (m - 1)) // 2), 0) AS BIGINT),
           CAST(COALESCE(SUM((m * (m - 1)) // 2 - within), 0) AS BIGINT)
    FROM grp
    """,
)
def e97_fold_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E97 — duplicate leakage across CV folds, per-document vs
    per-group assignment (see evaluation.fold_leakage). Duplicates are
    injected as in e1_exact_dedup_groups (ASCII-translate case flip +
    padding of every 10th doc) so the audit has real groups to split."""
    from train_reports_etl_spark.extensions.evaluation import fold_leakage

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mangled = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(
            F.translate(
                "text",
                "abcdefghijklmnopqrstuvwxyz",
                "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
            ),
            F.lit("  "),
        ).alias("text"),
    )
    return fold_leakage(docs.unionByName(mangled))


@query(
    "e98_padding_waste",
    f"""
    WITH lens AS (
      SELECT doc_id AS id, CAST(LEN({_SQL_TOKENS}) AS BIGINT) AS len
      FROM documents),
    a AS (SELECT len, ROW_NUMBER() OVER (ORDER BY id) AS rnk FROM lens),
    s AS (SELECT len, ROW_NUMBER() OVER (ORDER BY len, id) AS rnk FROM lens),
    ab AS (
      SELECT (rnk - 1) // 32 AS batch, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(MAX(len) AS BIGINT) AS max_len,
             CAST(SUM(len) AS BIGINT) AS tokens
      FROM a GROUP BY 1),
    sb AS (
      SELECT (rnk - 1) // 32 AS batch, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(MAX(len) AS BIGINT) AS max_len,
             CAST(SUM(len) AS BIGINT) AS tokens
      FROM s GROUP BY 1)
    SELECT 'arrival_order' AS method,
           CAST(COUNT(*) AS BIGINT) AS n_batches,
           CAST(SUM(tokens) AS BIGINT) AS token_sum,
           CAST(SUM(n_rows * max_len) AS BIGINT) AS padded_sum,
           CAST((1000000 * (SUM(n_rows * max_len) - SUM(tokens)))
                // SUM(n_rows * max_len) AS BIGINT) AS waste_ppm
    FROM ab
    UNION ALL
    SELECT 'length_sorted',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(tokens) AS BIGINT),
           CAST(SUM(n_rows * max_len) AS BIGINT),
           CAST((1000000 * (SUM(n_rows * max_len) - SUM(tokens)))
                // SUM(n_rows * max_len) AS BIGINT)
    FROM sb
    """,
)
def e98_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E98 — padded-batch waste, arrival vs length-sorted order (see
    evaluation.padding_waste). Global ranks via distributed_rank (the
    O5 range-bucketed rank); the oracle's ROW_NUMBER is the semantic
    twin at oracle scale."""
    from train_reports_etl_spark.extensions.evaluation import padding_waste

    return padding_waste(load_table(spark, sf_dir, "documents"))


@query(
    "e99_mad_outlier_gate",
    """
    WITH v AS (
      SELECT event_id AS id, CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
    med AS (
      SELECT cents AS med FROM
        (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, id) AS rnk FROM v),
        nn
      WHERE rnk = (n + 1) // 2),
    d AS (SELECT id, ABS(cents - med) AS dev FROM v, med),
    mad AS (
      SELECT dev AS mad FROM
        (SELECT dev, ROW_NUMBER() OVER (ORDER BY dev, id) AS rnk FROM d),
        nn
      WHERE rnk = (n + 1) // 2)
    SELECT nn.n AS n,
           CAST(med AS BIGINT) AS med_cents,
           CAST(mad AS BIGINT) AS mad_cents,
           CAST(SUM(CASE WHEN dev > 3 * mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           CAST((1000000 * SUM(CASE WHEN dev > 3 * mad THEN 1 ELSE 0 END))
                // nn.n AS BIGINT) AS outlier_ppm
    FROM d, med, mad, nn
    GROUP BY nn.n, med, mad
    """,
)
def e99_mad_outlier_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E99 — median/MAD robust outlier gate on integer cents (see
    evaluation.mad_outlier_gate): lower medians via distributed_rank,
    outliers at |x − med| > 3·MAD."""
    from train_reports_etl_spark.extensions.evaluation import mad_outlier_gate

    return mad_outlier_gate(
        load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    )


_H = "CAST({} AS HUGEINT)"


@query(
    "e100_auc_rank_sum",
    f"""
    WITH v AS (
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS pos
      FROM events WHERE value IS NOT NULL),
    per AS (
      SELECT cents, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(pos) AS BIGINT) AS p
      FROM v GROUP BY cents),
    cum AS (
      SELECT c, p, CAST(SUM(c) OVER (ORDER BY cents) AS BIGINT) AS cum
      FROM per),
    s AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(p) AS BIGINT) AS n_pos,
             CAST(SUM(c - p) AS BIGINT) AS n_neg,
             SUM({_H.format('p')} * {_H.format('2 * cum - c + 1')}) AS r2
      FROM cum)
    SELECT n, n_pos, n_neg,
           CAST(({_H.format('1000000')}
                 * (r2 - {_H.format('n_pos')} * {_H.format('n_pos + 1')}))
                // ({_H.format('2')} * {_H.format('n_pos')}
                    * {_H.format('n_neg')}) AS BIGINT) AS auc_ppm
    FROM s
    """,
)
def e100_auc_rank_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E100 — tie-corrected Mann–Whitney AUC of the value scorer
    against the error outcome (see evaluation.auc_rank_sum): per-score
    midranks from a distributed prefix sum, never a per-row global
    rank."""
    from train_reports_etl_spark.extensions.evaluation import auc_rank_sum

    return auc_rank_sum(load_table(spark, sf_dir, "events"))


@query(
    "e101_chi2_tokens",
    f"""
    WITH base AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos, text
      FROM documents),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS p
      FROM base),
    tok AS (
      SELECT pos, UNNEST(LIST_DISTINCT({_SQL_TOKENS})) AS token FROM base),
    per AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS df_t,
             CAST(SUM(pos) AS BIGINT) AS a
      FROM tok GROUP BY token HAVING COUNT(*) >= 5),
    abcd AS (
      SELECT token, df_t, a, df_t - a AS b, p - a AS c,
             (n - p) - (df_t - a) AS d, n
      FROM per, tot)
    SELECT token, df_t, a, b,
           CAST(({_H.format('1000000')} * {_H.format('n')}
                 * ({_H.format('a')} * {_H.format('d')}
                    - {_H.format('b')} * {_H.format('c')})
                 * ({_H.format('a')} * {_H.format('d')}
                    - {_H.format('b')} * {_H.format('c')}))
                // ({_H.format('a + b')} * {_H.format('c + d')}
                    * {_H.format('a + c')} * {_H.format('b + d')})
                AS BIGINT) AS chi2_ppm
    FROM abcd
    WHERE a + c > 0 AND b + d > 0 AND c + d > 0
    ORDER BY chi2_ppm DESC, token
    LIMIT 20
    """,
)
def e101_chi2_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E101 — top-20 tokens by χ² association with the lang='en' label
    (see evaluation.chi2_token_label): the feature-selection statistic
    a quality-classifier vocabulary is mined from."""
    from train_reports_etl_spark.extensions.evaluation import chi2_token_label

    return chi2_token_label(load_table(spark, sf_dir, "documents"))


@query(
    "e102_spearman_rankers",
    f"""
    WITH lens AS (
      SELECT doc_id AS id,
             CAST(LEN({_SQL_TOKENS}) AS BIGINT) AS n_toks,
             CAST(LEN(LIST_DISTINCT({_SQL_TOKENS})) AS BIGINT) AS n_types
      FROM documents),
    r1 AS (SELECT id, ROW_NUMBER() OVER (ORDER BY n_toks, id) AS r1 FROM lens),
    r2 AS (SELECT id, ROW_NUMBER() OVER (ORDER BY n_types, id) AS r2 FROM lens),
    j AS (
      SELECT {_H.format('r1.r1')} - {_H.format('r2.r2')} AS d
      FROM r1 JOIN r2 USING (id)),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(d * d) AS sumd2 FROM j)
    SELECT n, CAST(sumd2 AS BIGINT) AS sum_d2,
           CAST(({_H.format('6000000')} * sumd2)
                // ({_H.format('n')}
                    * ({_H.format('n')} * {_H.format('n')} - 1)) AS BIGINT)
             AS discordance_ppm,
           CAST(1000000 - ({_H.format('6000000')} * sumd2)
                // ({_H.format('n')}
                    * ({_H.format('n')} * {_H.format('n')} - 1)) AS BIGINT)
             AS rho_ppm
    FROM s
    """,
)
def e102_spearman_rankers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E102 — Spearman ρ between the token-count and distinct-token
    rankers (see evaluation.spearman_rankers): two distributed_ranks,
    one id join, one fold."""
    from train_reports_etl_spark.extensions.evaluation import spearman_rankers

    return spearman_rankers(load_table(spark, sf_dir, "documents"))


_KAPPA_PE = (
    f"({_H.format('a_yes')} * {_H.format('b_yes')}"
    f" + ({_H.format('n')} - {_H.format('a_yes')})"
    f" * ({_H.format('n')} - {_H.format('b_yes')}))"
)
_KAPPA_DEN = f"({_H.format('n')} * {_H.format('n')} - {_KAPPA_PE})"


@query(
    "e103_kappa_agreement",
    f"""
    WITH per AS (
      SELECT CASE WHEN LEN({_SQL_TOKENS}) >= 100 THEN 1 ELSE 0 END AS ra,
             CASE WHEN LEN({_SQL_TOKENS}) > 0
                   AND COALESCE(LIST_SUM(LIST_TRANSFORM({_SQL_TOKENS},
                         t -> LENGTH(t))), 0)
                       >= 5 * LEN({_SQL_TOKENS})
                  THEN 1 ELSE 0 END AS rb
      FROM documents),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ra) AS BIGINT) AS a_yes,
             CAST(SUM(rb) AS BIGINT) AS b_yes,
             CAST(SUM(CASE WHEN ra = rb THEN 1 ELSE 0 END) AS BIGINT) AS agree
      FROM per)
    SELECT n, a_yes, b_yes, agree,
           CAST(({_H.format('1000000')} * {_H.format('agree')})
                // {_H.format('n')} AS BIGINT) AS po_ppm,
           CAST(({_H.format('1000000')} * {_KAPPA_PE})
                // ({_H.format('n')} * {_H.format('n')}) AS BIGINT) AS pe_ppm,
           CAST(({_H.format('1000000')}
                 * ({_H.format('n')} * {_H.format('agree')} - {_KAPPA_PE}
                    + {_KAPPA_DEN}))
                // NULLIF({_KAPPA_DEN}, 0) AS BIGINT) AS kappa_plus1_ppm
    FROM s
    """,
)
def e103_kappa_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E103 — Cohen's κ between the ≥100-token gate and the
    mean-word-length gate (see evaluation.kappa_gate_agreement),
    emitted as the shifted non-negative kappa_plus1_ppm."""
    from train_reports_etl_spark.extensions.evaluation import (
        kappa_gate_agreement,
    )

    return kappa_gate_agreement(load_table(spark, sf_dir, "documents"))


def _benford_values_sql() -> str:
    from train_reports_etl_spark.extensions.evaluation import BENFORD_PPM

    return ", ".join(
        f"({d}, {p})" for d, p in enumerate(BENFORD_PPM, start=1)
    )


@query(
    "e104_benford_audit",
    f"""
    WITH d AS (
      SELECT CAST(SUBSTRING(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit
      FROM (SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events WHERE value IS NOT NULL)
      WHERE cents > 0),
    per AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM per),
    expct(digit, exp_ppm) AS (VALUES {{values}})
    SELECT per.digit, n,
           CAST((1000000 * n) // total AS BIGINT) AS obs_ppm,
           CAST(exp_ppm AS BIGINT) AS exp_ppm,
           CAST(ABS((1000000 * n) // total - exp_ppm) AS BIGINT) AS dev_ppm
    FROM per JOIN expct USING (digit) CROSS JOIN tot
    ORDER BY digit
    """.replace("{values}", "%BENFORD%"),
)
def e104_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E104 — Benford first-digit audit of event values (see
    evaluation.benford_audit): integer digit counts vs the literal
    expected-ppm table, one 9-key aggregate."""
    from train_reports_etl_spark.extensions.evaluation import benford_audit

    return benford_audit(load_table(spark, sf_dir, "events"))


ORACLES["e104_benford_audit"] = ORACLES["e104_benford_audit"].replace(
    "%BENFORD%", _benford_values_sql()
)


@query(
    "e105_gini_concentration",
    f"""
    WITH per AS (
      SELECT source AS g, CAST(SUM(LEN({_SQL_TOKENS})) AS BIGINT) AS x
      FROM documents GROUP BY source),
    r AS (SELECT g, x, ROW_NUMBER() OVER (ORDER BY x, g) AS i FROM per),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS tot,
                 SUM({_H.format('i')} * {_H.format('x')}) AS sixi
          FROM r)
    SELECT n AS n_groups, tot AS total_tokens,
           CAST(({_H.format('1000000')}
                 * (2 * sixi - {_H.format('n + 1')} * {_H.format('tot')}))
                // ({_H.format('n')} * {_H.format('tot')}) AS BIGINT)
             AS gini_ppm
    FROM s
    """,
)
def e105_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E105 — Gini coefficient of per-source token mass (see
    evaluation.gini_concentration): the imbalance number E83's
    waterfilling pass exists to pull down."""
    from train_reports_etl_spark.extensions.evaluation import gini_concentration

    return gini_concentration(load_table(spark, sf_dir, "documents"))


@query(
    "e106_ks_drift",
    f"""
    WITH v AS (
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('purchase', 'view')),
    per AS (
      SELECT cents, CAST(SUM(is_a) AS BIGINT) AS c_a,
             CAST(SUM(1 - is_a) AS BIGINT) AS c_b
      FROM v GROUP BY cents),
    cum AS (
      SELECT CAST(SUM(c_a) OVER (ORDER BY cents) AS BIGINT) AS cum_a,
             CAST(SUM(c_b) OVER (ORDER BY cents) AS BIGINT) AS cum_b
      FROM per),
    tot AS (SELECT CAST(SUM(c_a) AS BIGINT) AS n_a,
                   CAST(SUM(c_b) AS BIGINT) AS n_b FROM per),
    m AS (
      SELECT MAX(ABS({_H.format('cum_a')} * {_H.format('n_b')}
                 - {_H.format('cum_b')} * {_H.format('n_a')})) AS maxnum
      FROM cum, tot)
    SELECT n_a, n_b,
           CAST(({_H.format('1000000')} * maxnum)
                // ({_H.format('n_a')} * {_H.format('n_b')}) AS BIGINT)
             AS d_ppm
    FROM m, tot
    """,
)
def e106_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E106 — two-sample KS statistic between purchase and view value
    distributions (see evaluation.ks_statistic): the drift test run
    between a reference slice and a live slice before retraining."""
    from train_reports_etl_spark.extensions.evaluation import ks_statistic

    return ks_statistic(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------- round 10


@query(
    "e107_trimmed_winsorized",
    """
    WITH v AS (
      SELECT event_id AS id, CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    r AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, id) AS rnk
          FROM v),
    k AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 (CAST(COUNT(*) AS BIGINT) * 100000) // 1000000 AS k
          FROM v),
    b AS (SELECT
      (SELECT cents FROM r, k WHERE rnk = k.k + 1) AS lo,
      (SELECT cents FROM r, k WHERE rnk = k.n - k.k) AS hi),
    t AS (SELECT CAST(SUM(CASE WHEN r.rnk > k.k AND r.rnk <= k.n - k.k
                          THEN r.cents ELSE 0 END) AS BIGINT) AS tsum
          FROM r, k)
    SELECT k.n AS n, k.k AS k_per_side,
           b.lo AS lo_cents, b.hi AS hi_cents,
           CAST((1000 * t.tsum) // (k.n - 2 * k.k) AS BIGINT)
             AS trimmed_mean_millicents,
           CAST((1000 * (t.tsum + k.k * b.lo + k.k * b.hi)) // k.n
             AS BIGINT) AS winsorized_mean_millicents
    FROM k, b, t
    """,
)
def e107_trimmed_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E107 — 10%-trimmed and winsorized means on exact integer cents
    (see evaluation.trimmed_winsorized_mean): the deterministic
    total-order (cents, id) makes the rank cuts engine-portable."""
    from train_reports_etl_spark.extensions.evaluation import (
        trimmed_winsorized_mean,
    )

    return trimmed_winsorized_mean(load_table(spark, sf_dir, "events"))


@query(
    "e108_effective_sample_size",
    f"""
    WITH w AS (
      SELECT source, CAST(LEN({_SQL_TOKENS}) AS BIGINT) AS w
      FROM documents),
    d AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(w) AS BIGINT) AS sw,
                 CAST(SUM(w * w) AS BIGINT) AS sw2 FROM w),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(w) AS BIGINT) AS sw,
                 CAST(SUM(w * w) AS BIGINT) AS sw2
          FROM (SELECT source, CAST(SUM(w) AS BIGINT) AS w
                FROM w GROUP BY source))
    SELECT 'doc_tokens' AS scheme, n AS n_units, sw AS sum_w, sw2 AS sum_w2,
      CAST((CAST(1000 AS HUGEINT) * sw * sw) // sw2 AS BIGINT) AS ess_x1000,
      CAST((CAST(1000000 AS HUGEINT) * sw * sw)
           // (CAST(sw2 AS HUGEINT) * n) AS BIGINT) AS ess_ratio_ppm
    FROM d
    UNION ALL
    SELECT 'source_tokens', n, sw, sw2,
      CAST((CAST(1000 AS HUGEINT) * sw * sw) // sw2 AS BIGINT),
      CAST((CAST(1000000 AS HUGEINT) * sw * sw)
           // (CAST(sw2 AS HUGEINT) * n) AS BIGINT)
    FROM s
    """,
)
def e108_effective_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E108 — Kish effective sample size of token weighting at doc and
    source granularity (see evaluation.effective_sample_size)."""
    from train_reports_etl_spark.extensions.evaluation import (
        effective_sample_size,
    )

    return effective_sample_size(load_table(spark, sf_dir, "documents"))


@query(
    "e109_brier_decomposition",
    f"""
    WITH b AS (
      SELECT LEAST(conf_ppm // 100000, 9) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n_k,
             CAST(SUM(pos) AS BIGINT) AS pos_k,
             CAST(SUM(conf_ppm) AS BIGINT) AS sum_conf,
             SUM({_H.format('conf_ppm - 1000000 * pos')}
                 * {_H.format('conf_ppm - 1000000 * pos')}) AS sq
      FROM (SELECT LEAST(CAST(ROUND(value * 100) AS BIGINT), 10000) * 100
                     AS conf_ppm,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
            FROM events)
      GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_k) AS BIGINT) AS n,
                   CAST(SUM(pos_k) AS BIGINT) AS pos,
                   SUM(sq) AS sq_total FROM b),
    terms AS (
      SELECT tot.n, tot.pos, tot.sq_total,
        SUM(({_H.format('sum_conf')} - {_H.format('1000000')} * pos_k)
            * ({_H.format('sum_conf')} - {_H.format('1000000')} * pos_k)
            // {_H.format('n_k')}) AS rel_num,
        SUM(({_H.format('1000000000000')}
             * ({_H.format('pos_k')} * tot.n - {_H.format('tot.pos')} * n_k)
             * ({_H.format('pos_k')} * tot.n - {_H.format('tot.pos')} * n_k))
            // ({_H.format('n_k')} * tot.n * tot.n)) AS res_num
      FROM b, tot GROUP BY 1, 2, 3)
    SELECT n, pos,
      CAST(sq_total // ({_H.format('n')} * 1000000) AS BIGINT) AS brier_ppm,
      CAST(rel_num // ({_H.format('n')} * 1000000) AS BIGINT)
        AS reliability_ppm,
      CAST(res_num // ({_H.format('n')} * 1000000) AS BIGINT)
        AS resolution_ppm,
      CAST(({_H.format('1000000')} * pos * ({_H.format('n')} - pos))
           // ({_H.format('n')} * n) AS BIGINT) AS uncertainty_ppm
    FROM terms
    """,
)
def e109_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E109 — Murphy decomposition of the Brier score over the E94
    bins (see evaluation.brier_decomposition)."""
    from train_reports_etl_spark.extensions.evaluation import (
        brier_decomposition,
    )

    return brier_decomposition(load_table(spark, sf_dir, "events"))


def _boot_sql(n_boot: int = 64) -> str:
    from train_reports_etl_spark.extensions.evaluation import (
        POISSON1_THRESHOLDS_16_13,
    )

    u_cols = ", ".join(
        f"CAST(('0x' || substring(md5(id || ':boot:{b}'), 1, 13)) AS BIGINT)"
        f" AS u{b}"
        for b in range(n_boot)
    )
    m_cols = ", ".join(
        "("
        + " + ".join(
            f"CASE WHEN u{b} >= {t} THEN 1 ELSE 0 END"
            for t in POISSON1_THRESHOLDS_16_13
        )
        + f") AS m{b}"
        for b in range(n_boot)
    )
    a_cols = ", ".join(
        f"CAST(SUM(m{b} * w) AS BIGINT) AS s{b},"
        f" CAST(SUM(m{b}) AS BIGINT) AS c{b}"
        for b in range(n_boot)
    )
    mean_list = ", ".join(f"(1000000 * s{b}) // c{b}" for b in range(n_boot))
    lo_i = max(0, int(0.05 * n_boot) - 1)
    hi_i = int(0.95 * n_boot)
    return f"""
    WITH base AS (
      SELECT CAST(doc_id AS VARCHAR) AS id,
             CAST(LEN({_SQL_TOKENS}) AS BIGINT) AS w
      FROM documents),
    u AS (SELECT w, {u_cols} FROM base),
    m AS (SELECT w, {m_cols} FROM u),
    a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(w) AS BIGINT) AS sw, {a_cols} FROM m),
    arr AS (SELECT LIST_SORT([{mean_list}]) AS l FROM a)
    SELECT a.n_docs, CAST({n_boot} AS BIGINT) AS n_boot,
           CAST((1000000 * a.sw) // a.n_docs AS BIGINT) AS mean_tokens_ppm,
           CAST(l[{lo_i + 1}] AS BIGINT) AS boot_lo_ppm,
           CAST(l[{hi_i + 1}] AS BIGINT) AS boot_hi_ppm,
           CAST(l[{hi_i + 1}] - l[{lo_i + 1}] AS BIGINT) AS boot_spread_ppm
    FROM a, arr
    """


@query("e110_bootstrap_mean_ci", None)
def e110_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E110 — deterministic Poisson-bootstrap CI for mean tokens/doc
    (see evaluation.bootstrap_mean_ci): the resamples are md5-derived,
    so the DuckDB oracle (registered below) replays them exactly."""
    from train_reports_etl_spark.extensions.evaluation import bootstrap_mean_ci

    return bootstrap_mean_ci(load_table(spark, sf_dir, "documents"))


ORACLES["e110_bootstrap_mean_ci"] = _boot_sql()


@query(
    "e111_pmi_collocations",
    f"""
    WITH toks AS (SELECT {_SQL_TOKENS} AS ts FROM documents),
    uni AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT UNNEST(ts) AS t FROM toks) GROUP BY t),
    nu AS (SELECT CAST(SUM(c) AS BIGINT) AS n_uni FROM uni),
    big AS (
      SELECT b.x AS x, b.y AS y, CAST(COUNT(*) AS BIGINT) AS c_xy
      FROM (SELECT UNNEST(list_transform(range(1, len(ts)),
                   i -> {{'x': ts[i], 'y': ts[i+1]}})) AS b
            FROM toks WHERE len(ts) >= 2)
      GROUP BY 1, 2 HAVING COUNT(*) >= 5),
    nb AS (SELECT CAST(SUM(GREATEST(len(ts) - 1, 0)) AS BIGINT) AS n_big
           FROM toks)
    SELECT x || ' ' || y AS bigram, c_xy, ux.c AS c_x, uy.c AS c_y,
      CAST(ROUND(1000 * (log2(c_xy) + 2 * log2(n_uni) - log2(n_big)
                         - log2(ux.c) - log2(uy.c))) AS BIGINT)
        AS pmi_millibits
    FROM big JOIN uni ux ON big.x = ux.t JOIN uni uy ON big.y = uy.t, nu, nb
    """,
)
def e111_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E111 — adjacent-bigram PMI collocation table (see
    text.pmi_collocations): all bigrams with count ≥ 5, PMI in
    millibits from exact integer counts."""
    from train_reports_etl_spark.extensions.text import pmi_collocations

    return pmi_collocations(load_table(spark, sf_dir, "documents"))


@query(
    "e112_head_coverage",
    f"""
    WITH cnt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c
                 FROM (SELECT UNNEST({_SQL_TOKENS}) AS t FROM documents)
                 GROUP BY t),
    r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS rnk FROM cnt),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS v, CAST(SUM(c) AS BIGINT)
                     AS total FROM cnt),
    ks(k) AS (VALUES (10), (100), (1000)),
    m AS (SELECT k, CAST(SUM(CASE WHEN rnk <= k THEN c ELSE 0 END) AS BIGINT)
                   AS head
          FROM r, ks GROUP BY k)
    SELECT CAST(k AS BIGINT) AS k, CAST(LEAST(k, v) AS BIGINT) AS n_types,
           total AS total_tokens, head AS head_tokens,
           CAST((1000000 * head) // total AS BIGINT) AS coverage_ppm
    FROM m, tot
    """,
)
def e112_head_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E112 — top-k vocabulary mass coverage (see text.head_coverage):
    the tokenizer-truncation planning curve under the deterministic
    (count desc, token) order."""
    from train_reports_etl_spark.extensions.text import head_coverage

    return head_coverage(load_table(spark, sf_dir, "documents"))


@query(
    "e113_conformal_threshold",
    """
    WITH base AS (
      SELECT event_id AS id,
             LEAST(CAST(ROUND(value * 100) AS BIGINT), 10000) * 100
               AS conf_ppm,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
             event_id % 2 = 0 AS is_cal
      FROM events WHERE value IS NOT NULL),
    cal AS (SELECT 1000000 - conf_ppm AS s, id FROM base
            WHERE is_cal AND pos = 1),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM cal),
    kk AS (SELECT n_cal, LEAST(n_cal, ((n_cal + 1) * 90 + 99) // 100) AS k
           FROM n),
    r AS (SELECT s, ROW_NUMBER() OVER (ORDER BY s, id) AS rnk FROM cal),
    q AS (SELECT s AS qhat FROM r, kk WHERE rnk = kk.k),
    t AS (SELECT * FROM base WHERE NOT is_cal)
    SELECT kk.n_cal AS n_cal, CAST(q.qhat AS BIGINT) AS qhat_ppm,
      CAST(SUM(pos) AS BIGINT) AS n_test_pos,
      CAST((1000000 * SUM(CASE WHEN pos = 1
                           AND 1000000 - conf_ppm <= q.qhat
                           THEN 1 ELSE 0 END))
           // NULLIF(SUM(pos), 0) AS BIGINT) AS coverage_ppm,
      CAST(COUNT(*) AS BIGINT) AS n_test,
      CAST((1000000 * SUM(CASE WHEN 1000000 - conf_ppm <= q.qhat
                           THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT)
        AS flagged_ppm
    FROM t, kk, q
    GROUP BY 1, 2
    """,
)
def e113_conformal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E113 — split-conformal threshold + held-out coverage (see
    evaluation.conformal_threshold): q̂ at the ⌈(n+1)·0.9⌉-th
    nonconformity order statistic, coverage on the parity test split."""
    from train_reports_etl_spark.extensions.evaluation import (
        conformal_threshold,
    )

    return conformal_threshold(load_table(spark, sf_dir, "events"))


@query(
    "e114_loo_source_impact",
    f"""
    WITH w AS (SELECT source, CAST(LEN({_SQL_TOKENS}) AS BIGINT) AS w
               FROM documents),
    per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(w) AS BIGINT) AS sum_tokens
            FROM w GROUP BY source),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n,
                   CAST(SUM(sum_tokens) AS BIGINT) AS sw FROM per)
    SELECT source, n_docs, sum_tokens,
      CAST((1000000 * (sw - sum_tokens)) // NULLIF(n - n_docs, 0) AS BIGINT)
        AS loo_mean_tokens_ppm,
      CAST((1000000 * (sw - sum_tokens)) // NULLIF(n - n_docs, 0)
           - (1000000 * sw) // n AS BIGINT) AS delta_vs_global_ppm
    FROM per, tot
    """,
)
def e114_loo_source_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E114 — leave-one-source-out corpus-mean impact (see
    corpus.loo_source_impact)."""
    from train_reports_etl_spark.extensions.corpus import loo_source_impact

    return loo_source_impact(load_table(spark, sf_dir, "documents"))


@query(
    "e115_cramers_v",
    f"""
    WITH cells AS (
      SELECT lang AS a, source AS b, CAST(COUNT(*) AS BIGINT) AS o
      FROM documents GROUP BY 1, 2),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT a) AS BIGINT) AS nr,
                   CAST(COUNT(DISTINCT b) AS BIGINT) AS nc FROM cells),
    ra AS (SELECT a, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY a),
    cb AS (SELECT b, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY b),
    chi AS (
      -- present cells' floored terms + the absent-cell mass folded
      -- exactly: sum over absent of r*c/N = (N^2 - sum_present r*c)/N
      SELECT CAST(SUM(({_H.format('1000000')}
               * ({_H.format('tot.n')} * o - {_H.format('r')} * c)
               * ({_H.format('tot.n')} * o - {_H.format('r')} * c))
              // ({_H.format('tot.n')} * r * c))
             + ({_H.format('1000000')}
                * ({_H.format('tot.n')} * tot.n - SUM({_H.format('r')} * c)))
               // {_H.format('tot.n')} AS BIGINT) AS chi2_e6
      FROM cells JOIN ra USING (a) JOIN cb USING (b), tot
      GROUP BY tot.n)
    SELECT tot.n AS n, tot.nr AS n_rows, tot.nc AS n_cols,
           CAST(LEAST(tot.nr - 1, tot.nc - 1) AS BIGINT) AS dof_min,
           chi.chi2_e6,
           CAST(chi.chi2_e6 // (tot.n * LEAST(tot.nr - 1, tot.nc - 1))
             AS BIGINT) AS v2_ppm
    FROM tot, chi
    """,
)
def e115_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E115 — Cramér's V between lang and source (see
    evaluation.cramers_v): is the corpus mix factorized or confounded?"""
    from train_reports_etl_spark.extensions.evaluation import cramers_v

    return cramers_v(load_table(spark, sf_dir, "documents"))


@query(
    "e116_source_vocab_jaccard",
    f"""
    WITH vocab AS (
      SELECT DISTINCT source AS s, t
      FROM (SELECT source, UNNEST({_SQL_TOKENS}) AS t FROM documents)),
    sizes AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS v FROM vocab GROUP BY s),
    inter AS (
      SELECT x.s AS source_a, y.s AS source_b,
             CAST(COUNT(*) AS BIGINT) AS inter
      FROM vocab x JOIN vocab y ON x.t = y.t AND x.s < y.s
      GROUP BY 1, 2)
    SELECT source_a, source_b, sa.v AS v_a, sb.v AS v_b, inter,
           CAST((1000000 * inter) // (sa.v + sb.v - inter) AS BIGINT)
             AS jaccard_ppm
    FROM inter
    JOIN sizes sa ON inter.source_a = sa.s
    JOIN sizes sb ON inter.source_b = sb.s
    """,
)
def e116_source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E116 — pairwise source-vocabulary Jaccard (see
    text.source_vocab_jaccard)."""
    from train_reports_etl_spark.extensions.text import source_vocab_jaccard

    return source_vocab_jaccard(load_table(spark, sf_dir, "documents"))


@query(
    "e117_psi_drift",
    """
    WITH binned AS (
      SELECT LEAST(CAST(ROUND(value * 100) AS BIGINT) // 5000, 9) AS bin,
             CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_ref
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('view', 'purchase')),
    per AS (SELECT bin, CAST(SUM(is_ref) AS BIGINT) AS c_ref,
                   CAST(SUM(1 - is_ref) AS BIGINT) AS c_live
            FROM binned GROUP BY bin),
    tot AS (SELECT CAST(SUM(c_ref) AS BIGINT) AS n_ref,
                   CAST(SUM(c_live) AS BIGINT) AS n_live FROM per)
    SELECT bin, c_ref, c_live,
      CAST(ROUND(1000000
           * (((c_ref + 1) / CAST(n_ref + 10 AS DOUBLE))
              - ((c_live + 1) / CAST(n_live + 10 AS DOUBLE)))
           * ln(((c_ref + 1) / CAST(n_ref + 10 AS DOUBLE))
                / ((c_live + 1) / CAST(n_live + 10 AS DOUBLE))))
        AS BIGINT) AS contrib_micronats
    FROM per, tot
    """,
)
def e117_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E117 — population stability index bins, view vs purchase (see
    evaluation.psi_drift_bins)."""
    from train_reports_etl_spark.extensions.evaluation import psi_drift_bins

    return psi_drift_bins(load_table(spark, sf_dir, "events"))


@query(
    "e118_dedup_survivorship",
    """
    WITH base AS (
      SELECT doc_id, source,
             md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
      FROM documents),
    k AS (SELECT fp, MIN(doc_id) AS keep_id FROM base GROUP BY fp)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(CASE WHEN doc_id = keep_id THEN 1 ELSE 0 END) AS BIGINT)
        AS n_kept,
      CAST(COUNT(*) - SUM(CASE WHEN doc_id = keep_id THEN 1 ELSE 0 END)
        AS BIGINT) AS n_lost,
      CAST((1000000 * (COUNT(*) - SUM(CASE WHEN doc_id = keep_id
                                       THEN 1 ELSE 0 END))) // COUNT(*)
        AS BIGINT) AS loss_ppm
    FROM base JOIN k USING (fp) GROUP BY source
    """,
)
def e118_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E118 — exact-dup survivorship bias by source (see
    corpus.dedup_survivorship)."""
    from train_reports_etl_spark.extensions.corpus import dedup_survivorship

    return dedup_survivorship(load_table(spark, sf_dir, "documents"))


@query(
    "e119_source_length_percentiles",
    f"""
    WITH pl AS (SELECT source, CAST(LEN({_SQL_TOKENS}) AS BIGINT) AS len
                FROM documents),
    cnt AS (SELECT source, len, CAST(COUNT(*) AS BIGINT) AS c
            FROM pl GROUP BY 1, 2),
    cum AS (SELECT source, len,
                   SUM(c) OVER (PARTITION BY source ORDER BY len) AS cum,
                   SUM(c) OVER (PARTITION BY source) AS n
            FROM cnt)
    SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
      CAST(MIN(CASE WHEN cum >= (50 * n + 99) // 100 THEN len END) AS BIGINT)
        AS p50_tokens,
      CAST(MIN(CASE WHEN cum >= (90 * n + 99) // 100 THEN len END) AS BIGINT)
        AS p90_tokens,
      CAST(MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN len END) AS BIGINT)
        AS p99_tokens
    FROM cum GROUP BY source
    """,
)
def e119_source_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E119 — exact per-source token-length percentiles, ceiling-rank
    convention (see corpus.source_length_percentiles)."""
    from train_reports_etl_spark.extensions.corpus import (
        source_length_percentiles,
    )

    return source_length_percentiles(load_table(spark, sf_dir, "documents"))


def _sql_shingles() -> str:
    from train_reports_etl_spark.extensions.ext_queries import _SQL_SHINGLES

    return _SQL_SHINGLES


@query(
    "e120_ngram_contamination",
    f"""
    WITH toked AS (
      SELECT doc_id, source,
             (instr('0123456789abcdef', substring(md5(cast(doc_id as VARCHAR)
              || ':split'), 1, 1)) - 1) % 10 = 0 AS is_test,
             {_SQL_TOKENS} AS toks
      FROM documents),
    sh AS (
      SELECT source, is_test, md5(g) AS d
      FROM (SELECT source, is_test, UNNEST(%SHINGLES%) AS g FROM toked)),
    test_sh AS (SELECT DISTINCT source, d FROM sh WHERE is_test),
    train_sh AS (SELECT DISTINCT d, CAST(1 AS BIGINT) AS hit
                 FROM sh WHERE NOT is_test)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_test_shingles,
      CAST(SUM(COALESCE(hit, 0)) AS BIGINT) AS n_contaminated,
      CAST((1000000 * SUM(COALESCE(hit, 0))) // COUNT(*) AS BIGINT)
        AS contamination_ppm
    FROM test_sh LEFT JOIN train_sh USING (d) GROUP BY source
    """.replace("%SHINGLES%", "%SQL_SHINGLES%"),
)
def e120_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E120 — word-3-gram train/test contamination per test source
    (see corpus.cross_split_ngram_contamination): digests shuffle,
    never shingle text."""
    from train_reports_etl_spark.extensions.corpus import (
        cross_split_ngram_contamination,
    )

    return cross_split_ngram_contamination(load_table(spark, sf_dir, "documents"))


@query(
    "e121_zipf_slope",
    f"""
    WITH cnt AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT UNNEST({_SQL_TOKENS}) AS t FROM documents) GROUP BY t),
    rk AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS rnk FROM cnt),
    term AS (
      SELECT CAST(ROUND(1000 * log2(CAST(rnk AS DOUBLE))) AS BIGINT) AS x,
             CAST(ROUND(1000 * log2(CAST(c AS DOUBLE))) AS BIGINT) AS y
      FROM rk WHERE rnk <= 4096),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx
          FROM term)
    SELECT n AS n_fit, sx AS sum_x_mb, sy AS sum_y_mb, sxy AS sum_xy,
      sxx AS sum_xx,
      CAST(CAST(sx AS HUGEINT) * sy - CAST(n AS HUGEINT) * sxy AS BIGINT)
        AS neg_slope_num,
      CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS BIGINT)
        AS slope_den,
      CAST((CAST(1000000 AS HUGEINT)
            * GREATEST(CAST(sx AS HUGEINT) * sy - CAST(n AS HUGEINT) * sxy,
                       CAST(0 AS HUGEINT)))
           // NULLIF(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx,
                     CAST(0 AS HUGEINT)) AS BIGINT) AS neg_slope_ppm,
      CAST(GREATEST(CAST(sy AS HUGEINT)
                      * (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
                    + (CAST(sx AS HUGEINT) * sy - CAST(n AS HUGEINT) * sxy)
                      * sx,
                    CAST(0 AS HUGEINT))
           // NULLIF(CAST(n AS HUGEINT)
                       * (CAST(n AS HUGEINT) * sxx
                          - CAST(sx AS HUGEINT) * sx),
                     CAST(0 AS HUGEINT)) AS BIGINT) AS intercept_millibits
    FROM s
    """,
)
def e121_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E121 — Zipf rank–frequency OLS slope over the top-4096 ranks
    (see text.zipf_slope): millibit per-term rounding, exact integer
    OLS sums, decimal finals."""
    from train_reports_etl_spark.extensions.text import zipf_slope

    return zipf_slope(load_table(spark, sf_dir, "documents"))


@query(
    "e122_token_burstiness",
    f"""
    SELECT t AS token, tf, df,
           CAST((CAST(1000000 AS HUGEINT) * tf) // df AS BIGINT) AS burst_ppm
    FROM (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS tf,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM (SELECT doc_id, UNNEST({_SQL_TOKENS}) AS t FROM documents)
      GROUP BY t)
    WHERE tf >= 5
    """,
)
def e122_token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E122 — Church–Gale token burstiness tf/df (see
    text.token_burstiness): every token with tf ≥ 5, integer-exact."""
    from train_reports_etl_spark.extensions.text import token_burstiness

    return token_burstiness(load_table(spark, sf_dir, "documents"))


@query(
    "e123_g2_keyness",
    f"""
    WITH tok AS (
      SELECT CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS in_a,
             UNNEST({_SQL_TOKENS}) AS t
      FROM documents),
    cells AS (SELECT t, CAST(SUM(in_a) AS BIGINT) AS a,
                     CAST(SUM(1 - in_a) AS BIGINT) AS b
              FROM tok GROUP BY t),
    tot AS (SELECT CAST(SUM(a) AS BIGINT) AS na,
                   CAST(SUM(b) AS BIGINT) AS nb FROM cells)
    SELECT t AS token, a AS c_a, b AS c_rest,
      CAST(SIGN(a * nb - b * na) AS BIGINT) AS overuse,
      CAST(ROUND(1000.0 * 2.0 * (
        (CASE WHEN a = 0 THEN 0.0 ELSE CAST(a AS DOUBLE)
          * ln((CAST(a AS DOUBLE) * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))
               / (CAST(na AS DOUBLE)
                  * (CAST(a AS DOUBLE) + CAST(b AS DOUBLE)))) END)
        + (CASE WHEN b = 0 THEN 0.0 ELSE CAST(b AS DOUBLE)
          * ln((CAST(b AS DOUBLE) * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))
               / (CAST(nb AS DOUBLE)
                  * (CAST(a AS DOUBLE) + CAST(b AS DOUBLE)))) END)
      )) AS BIGINT) AS g2_millinats
    FROM cells CROSS JOIN tot
    WHERE a + b >= 5
    """,
)
def e123_g2_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E123 — Dunning/Rayson–Garside G² keyness of src0 vs the rest
    (see text.g2_keyness): integer cells, ln of one shared double
    expression, exact integer sign column."""
    from train_reports_etl_spark.extensions.text import g2_keyness

    return g2_keyness(load_table(spark, sf_dir, "documents"))


@query(
    "e124_simpson_diversity",
    f"""
    WITH cnt AS (
      SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT source, UNNEST({_SQL_TOKENS}) AS t FROM documents)
      GROUP BY 1, 2),
    per AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS v_types,
                   SUM(CAST(c AS HUGEINT) * (c - 1)) AS s2
            FROM cnt GROUP BY source)
    SELECT source, n_tokens, v_types,
      CAST((CAST(1000000 AS HUGEINT) * s2)
           // NULLIF(CAST(n_tokens AS HUGEINT) * (n_tokens - 1),
                     CAST(0 AS HUGEINT)) AS BIGINT) AS repeat_ppm,
      CAST(1000000 - (CAST(1000000 AS HUGEINT) * s2)
           // NULLIF(CAST(n_tokens AS HUGEINT) * (n_tokens - 1),
                     CAST(0 AS HUGEINT)) AS BIGINT) AS diversity_ppm
    FROM per
    """,
)
def e124_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E124 — Simpson repeat-probability λ per source (see
    text.simpson_diversity): a pure rational of integer counts — no
    transcendental anywhere."""
    from train_reports_etl_spark.extensions.text import simpson_diversity

    return simpson_diversity(load_table(spark, sf_dir, "documents"))


@query(
    "e125_jsd_source_pairs",
    f"""
    WITH cnt AS (
      SELECT source AS s, t, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT source, UNNEST({_SQL_TOKENS}) AS t FROM documents)
      GROUP BY 1, 2),
    sizes AS (SELECT s, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY s),
    pair AS (
      SELECT x.s AS sa, y.s AS sb, x.c AS ca, y.c AS cb, za.n AS na, zb.n AS nb
      FROM cnt x JOIN cnt y ON x.t = y.t AND x.s < y.s
      JOIN sizes za ON za.s = x.s JOIN sizes zb ON zb.s = y.s),
    pp AS (
      SELECT sa, sb, CAST(COUNT(*) AS BIGINT) AS n_shared_types,
             CAST(SUM(ca) AS BIGINT) AS shared_ca,
             CAST(SUM(cb) AS BIGINT) AS shared_cb,
             CAST(SUM(CAST(ROUND(1000000.0 * 0.5 * (
               (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
               * ln((2.0 * CAST(ca AS DOUBLE) * CAST(nb AS DOUBLE))
                    / (CAST(ca AS DOUBLE) * CAST(nb AS DOUBLE)
                       + CAST(cb AS DOUBLE) * CAST(na AS DOUBLE)))
               + (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
               * ln((2.0 * CAST(cb AS DOUBLE) * CAST(na AS DOUBLE))
                    / (CAST(ca AS DOUBLE) * CAST(nb AS DOUBLE)
                       + CAST(cb AS DOUBLE) * CAST(na AS DOUBLE)))
             )) AS BIGINT)) AS BIGINT) AS shared_micronats,
             MAX(na) AS na, MAX(nb) AS nb
      FROM pair GROUP BY 1, 2)
    SELECT sa AS source_a, sb AS source_b, n_shared_types,
      CAST((1000000 * (na - shared_ca)) // na AS BIGINT) AS only_a_mass_ppm,
      CAST((1000000 * (nb - shared_cb)) // nb AS BIGINT) AS only_b_mass_ppm,
      CAST(shared_micronats
        + CAST(ROUND(1000000.0 * 0.5 * ln(2.0)
               * (CAST(na - shared_ca AS DOUBLE) / CAST(na AS DOUBLE)))
            AS BIGINT)
        + CAST(ROUND(1000000.0 * 0.5 * ln(2.0)
               * (CAST(nb - shared_cb AS DOUBLE) / CAST(nb AS DOUBLE)))
            AS BIGINT)
        AS BIGINT) AS jsd_micronats
    FROM pp
    """,
)
def e125_jsd_source_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E125 — pairwise Jensen–Shannon divergence between source
    unigram distributions (see evaluation.jsd_source_pairs): shared
    tokens per-term-rounded micronats, one-sided mass folded
    analytically."""
    from train_reports_etl_spark.extensions.evaluation import jsd_source_pairs

    return jsd_source_pairs(load_table(spark, sf_dir, "documents"))


@query(
    "e126_daily_autocorrelation",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS d
      FROM events GROUP BY 1),
    lagd AS (SELECT d, LAG(d) OVER (ORDER BY day) AS pd FROM daily),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                 CAST(SUM(d) AS BIGINT) AS total_events,
                 SUM(CAST(d AS HUGEINT) * d) AS sq,
                 SUM(CASE WHEN pd IS NULL THEN CAST(0 AS HUGEINT)
                     ELSE CAST(d - pd AS HUGEINT) * (d - pd) END) AS sd2
          FROM lagd)
    SELECT n_days, total_events,
      CAST((CAST(1000 AS HUGEINT) * n_days * sd2)
           // NULLIF(CAST(n_days AS HUGEINT) * sq
                     - CAST(total_events AS HUGEINT) * total_events,
                     CAST(0 AS HUGEINT)) AS BIGINT) AS dw_x1000
    FROM s
    """,
)
def e126_daily_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E126 — Durbin–Watson of the daily event-count series (see
    evaluation.daily_autocorrelation): integer quadratic forms, the
    mean eliminated by the n-scaled identity."""
    from train_reports_etl_spark.extensions.evaluation import (
        daily_autocorrelation,
    )

    return daily_autocorrelation(load_table(spark, sf_dir, "events"))


ORACLES["e120_ngram_contamination"] = ORACLES["e120_ngram_contamination"].replace(
    "%SQL_SHINGLES%", _sql_shingles()
)


@query(
    "e127_kendall_tau",
    f"""
    WITH v AS (
      SELECT CAST(LEN({_SQL_TOKENS}) AS BIGINT) AS x,
             CAST(n_chars AS BIGINT) AS y
      FROM documents),
    w AS (SELECT x, y, ROW_NUMBER() OVER (ORDER BY x, y) AS i FROM v),
    p AS (SELECT a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb
          FROM w a JOIN w b ON a.i < b.i),
    s AS (SELECT
      CAST(COUNT(*) AS BIGINT) AS n0,
      CAST(SUM(CASE WHEN (xa < xb AND ya < yb) OR (xa > xb AND ya > yb)
               THEN 1 ELSE 0 END) AS BIGINT) AS c,
      CAST(SUM(CASE WHEN (xa < xb AND ya > yb) OR (xa > xb AND ya < yb)
               THEN 1 ELSE 0 END) AS BIGINT) AS d,
      CAST(SUM(CASE WHEN xa = xb THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      CAST(SUM(CASE WHEN ya = yb THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      CAST(SUM(CASE WHEN xa = xb AND ya = yb THEN 1 ELSE 0 END) AS BIGINT)
        AS n3
      FROM p),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v)
    SELECT n, n0 AS pairs_total, n1 AS ties_x, n2 AS ties_y, n3 AS ties_xy,
      c AS concordant, d AS discordant,
      CAST(ROUND(1000000.0 * CAST(c - d AS DOUBLE)
           / sqrt(CAST(NULLIF(n0 - n1, 0) AS DOUBLE)
                  * CAST(NULLIF(n0 - n2, 0) AS DOUBLE))) AS BIGINT)
        AS tau_b_ppm
    FROM s CROSS JOIN t
    """,
)
def e127_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E127 — exact Kendall τ-b between token count and n_chars (see
    evaluation.kendall_tau_b): the Spark side counts concordances via
    contingency-grid dominance prefix sums (never an all-pairs join);
    the oracle is the INDEPENDENT O(n²) pair formulation — two
    different algorithms, one exact answer."""
    from train_reports_etl_spark.extensions.evaluation import kendall_tau_b
    from train_reports_etl_spark.extensions.text import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        token_count("text").cast("long").alias("x"),
        F.col("n_chars").cast("long").alias("y"),
    )
    return kendall_tau_b(docs, "x", "y")


@query(
    "e128_wasserstein_drift",
    """
    WITH per AS (
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS c_a,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               AS BIGINT) AS c_b
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('purchase', 'view')
      GROUP BY 1),
    cum AS (
      SELECT cents,
             SUM(c_a) OVER (ORDER BY cents) AS cum_a,
             SUM(c_b) OVER (ORDER BY cents) AS cum_b,
             LEAD(cents) OVER (ORDER BY cents) AS next_cents
      FROM per),
    tot AS (SELECT CAST(SUM(c_a) AS BIGINT) AS n_a,
                   CAST(SUM(c_b) AS BIGINT) AS n_b FROM per),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_support,
             SUM(CASE WHEN next_cents IS NULL THEN CAST(0 AS HUGEINT)
                 ELSE ABS(CAST(cum_a AS HUGEINT) * n_b
                          - CAST(cum_b AS HUGEINT) * n_a)
                      * (next_cents - cents) END) AS num
      FROM cum CROSS JOIN tot)
    SELECT n_a, n_b, n_support,
      CAST((CAST(1000 AS HUGEINT) * num)
           // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS w1_millicents
    FROM s CROSS JOIN tot
    """,
)
def e128_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E128 — exact 1-Wasserstein distance between purchase and view
    value distributions (see evaluation.wasserstein1): integral CDF
    gap in millicents, per-row ranks never materialize."""
    from train_reports_etl_spark.extensions.evaluation import wasserstein1

    return wasserstein1(load_table(spark, sf_dir, "events"))


@query(
    "e129_transition_entropy",
    """
    WITH seq AS (
      SELECT event_type AS nxt,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    cells AS (SELECT prev, nxt, CAST(COUNT(*) AS BIGINT) AS c
              FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
    rm AS (SELECT prev, CAST(SUM(c) AS BIGINT) AS r FROM cells GROUP BY prev),
    hc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
                  CAST(SUM(CAST(ROUND(1000000.0 * (CAST(c AS DOUBLE) / n)
                       * log2(CAST(r AS DOUBLE) / CAST(c AS DOUBLE)))
                    AS BIGINT)) AS BIGINT) AS h_cond
           FROM cells JOIN rm USING (prev) CROSS JOIN tot),
    nm AS (SELECT nxt, CAST(SUM(c) AS BIGINT) AS cn FROM cells GROUP BY nxt),
    hn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
                  CAST(SUM(CAST(ROUND(1000000.0 * (CAST(cn AS DOUBLE) / n)
                       * log2(CAST(n AS DOUBLE) / CAST(cn AS DOUBLE)))
                    AS BIGINT)) AS BIGINT) AS h_next
           FROM nm CROSS JOIN tot)
    SELECT n AS n_transitions, n_cells, n_types,
      h_next AS h_next_microbits, h_cond AS h_cond_microbits,
      h_next - h_cond AS mi_microbits,
      CAST((1000000 * GREATEST(h_next - h_cond, 0)) // NULLIF(h_next, 0)
        AS BIGINT) AS theil_u_ppm
    FROM hc CROSS JOIN hn CROSS JOIN tot
    """,
)
def e129_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E129 — conditional entropy / Theil's U of event-type
    transitions (see evaluation.transition_entropy): deterministic
    per-user lag sequences, per-cell microbit rounding."""
    from train_reports_etl_spark.extensions.evaluation import transition_entropy

    return transition_entropy(load_table(spark, sf_dir, "events"))


@query(
    "e130_heaps_checkpoints",
    f"""
    WITH d AS (
      SELECT doc_id AS id, CAST(LEN({_SQL_TOKENS}) AS BIGINT) AS w,
             ROW_NUMBER() OVER (ORDER BY doc_id) AS rnk
      FROM documents),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
    ck AS (
      SELECT CAST(g.generate_series AS BIGINT) AS k,
             CAST(n >> g.generate_series AS BIGINT) AS r
      FROM generate_series(0, 62) g CROSS JOIN tot
      WHERE (n >> g.generate_series) >= 1),
    th AS (SELECT ck.k, ck.r, d.id AS thr_id FROM ck JOIN d ON d.rnk = ck.r),
    fs AS (
      SELECT t, MIN(id) AS first_id
      FROM (SELECT doc_id AS id, UNNEST({_SQL_TOKENS}) AS t FROM documents)
      GROUP BY t),
    nt AS (SELECT th.k,
                  CAST(SUM(CASE WHEN d.rnk <= th.r THEN d.w ELSE 0 END)
                    AS BIGINT) AS n_tokens
           FROM th CROSS JOIN d GROUP BY th.k),
    vt AS (SELECT th.k,
                  CAST(SUM(CASE WHEN fs.first_id <= th.thr_id THEN 1 ELSE 0
                           END) AS BIGINT) AS v_types
           FROM th CROSS JOIN fs GROUP BY th.k)
    SELECT th.k, CAST(th.r AS BIGINT) AS n_docs, nt.n_tokens, vt.v_types
    FROM th JOIN nt USING (k) JOIN vt USING (k)
    """,
)
def e130_heaps_checkpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E130 — Heaps'-law vocabulary growth checkpoints (see
    text.heaps_law_checkpoints): the whole curve from one first-seen
    aggregate, pure integers."""
    from train_reports_etl_spark.extensions.text import heaps_law_checkpoints

    return heaps_law_checkpoints(load_table(spark, sf_dir, "documents"))


@query(
    "e131_event_flow_trigrams",
    """
    WITH seq AS (
      SELECT LAG(event_type, 2) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS a,
             LAG(event_type, 1) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS b,
             event_type AS c3
      FROM events),
    tri AS (SELECT a, b, c3, CAST(COUNT(*) AS BIGINT) AS c
            FROM seq WHERE a IS NOT NULL AND b IS NOT NULL
            GROUP BY 1, 2, 3),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM tri)
    SELECT a || '>' || b || '>' || c3 AS flow, c,
           CAST((1000000 * c) // total AS BIGINT) AS share_ppm
    FROM tri CROSS JOIN tot
    WHERE c >= 5
    """,
)
def e131_event_flow_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E131 — frequent event-type trigram flows (see
    evaluation.event_flow_trigrams): contiguous 3-step sequential
    patterns per user, deterministic (ts, event_id) ordering."""
    from train_reports_etl_spark.extensions.evaluation import (
        event_flow_trigrams,
    )

    return event_flow_trigrams(load_table(spark, sf_dir, "events"))
