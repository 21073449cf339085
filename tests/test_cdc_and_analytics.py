"""CDC-apply (MERGE shape), Count-Min sketch, funnel and retention.

Round-4 batch 2: pins the semantics the driver's oracle can't probe —
the CMS overestimate invariant and merge law, CDC keep-last / delete /
upsert-on-absent arms, funnel stage ordering, cohort triangle shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from train_reports_etl_spark.extensions.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_point_estimates,
    cms_table,
)
from train_reports_etl_spark.operators.cdc import apply_changelog


def _changes(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, seq int, op string")


def test_cdc_keep_last_update_wins(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    ch = _changes(spark, [(1, "a2", 1, "U"), (1, "a3", 2, "U")])
    out = {r.doc_id: r.text for r in apply_changelog(base, ch, ["doc_id"]).collect()}
    assert out == {1: "a3", 2: "b"}


def test_cdc_delete_then_reinsert_by_seq(spark):
    base = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    # delete at seq 1, re-insert at seq 2 -> row survives with new text
    ch = _changes(spark, [(1, None, 1, "D"), (1, "a-new", 2, "I")])
    out = apply_changelog(base, ch, ["doc_id"]).collect()
    assert [(r.doc_id, r.text) for r in out] == [(1, "a-new")]


def test_cdc_delete_wins_when_latest(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    ch = _changes(spark, [(1, "a2", 1, "U"), (1, None, 2, "D")])
    out = apply_changelog(base, ch, ["doc_id"]).collect()
    assert [(r.doc_id, r.text) for r in out] == [(2, "b")]


def test_cdc_update_on_absent_key_inserts(spark):
    base = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    ch = _changes(spark, [(9, "new", 1, "U")])
    out = {r.doc_id: r.text for r in apply_changelog(base, ch, ["doc_id"]).collect()}
    assert out == {1: "a", 9: "new"}


def test_cms_never_underestimates_and_bounded(spark):
    words = [(w,) for w in ("alpha beta beta gamma gamma gamma".split())] * 7
    df = spark.createDataFrame(words, "token string")
    cms = cms_table(df, "token")
    assert cms.count() <= CMS_DEPTH * CMS_WIDTH
    probes = df.select("token").distinct()
    est = {
        r.token: r.cms_est
        for r in cms_point_estimates(cms, probes, "token").collect()
    }
    truth = {r.token: r["cnt"] for r in df.groupBy("token").agg(F.count("*").alias("cnt")).collect()}
    for tok, t in truth.items():
        assert est[tok] >= t  # collisions only ever ADD


def test_cms_merge_law(spark):
    """sketch(A) + sketch(B) merged by (d,bucket) sum == sketch(A∪B)."""
    a = spark.createDataFrame([(f"w{i % 11}",) for i in range(120)], "token string")
    b = spark.createDataFrame([(f"w{i % 7}",) for i in range(90)], "token string")
    merged = (
        cms_table(a, "token")
        .unionByName(cms_table(b, "token"))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_table(a.unionByName(b), "token")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_cms_absent_key_estimates_low(spark):
    df = spark.createDataFrame([("x",)] * 50, "token string")
    cms = cms_table(df, "token")
    probes = spark.createDataFrame([("never-seen",)], "token string")
    est = cms_point_estimates(cms, probes, "token").collect()[0].cms_est
    # with one distinct real key, a phantom needs a 4-way collision
    assert est in (0, 50)
    assert est == 0  # width 4096, 4 rows: collision on ALL rows is ~impossible


def test_funnel_requires_order(spark):
    rows = [
        # user 1: full ordered funnel
        (1, "2024-01-01 00:00:00", 1, "view"),
        (2, "2024-01-01 01:00:00", 1, "click"),
        (3, "2024-01-01 02:00:00", 1, "purchase"),
        # user 2: purchase BEFORE click -> stops at stage 2
        (4, "2024-01-01 00:00:00", 2, "view"),
        (5, "2024-01-01 02:00:00", 2, "click"),
        (6, "2024-01-01 01:00:00", 2, "purchase"),
        # user 3: click before view -> stops at stage 1
        (7, "2024-01-01 05:00:00", 3, "view"),
        (8, "2024-01-01 04:00:00", 3, "click"),
    ]
    from train_reports_etl_spark.extensions.ext_queries import funnel_stages

    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # the PRODUCTION plan, not a re-implementation — a regression in
    # w7's ordering constraint must fail here
    stages = {r.user_id: r.stage for r in funnel_stages(ev).collect()}
    assert stages[1] == 3
    assert stages[2] == 2
    assert stages[3] == 1


def test_retention_offsets_integer_and_week0_full(spark, sf_dir):
    import __spark_entry__ as entry

    out = entry.queries()["w8_retention_cohorts"](spark, sf_dir).collect()
    assert all(r.week_offset >= 0 for r in out)
    # every user is active in their own cohort week by definition:
    # week-0 rows must cover every distinct user exactly once
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_users for r in out if r.week_offset == 0) == n_users


def test_standardize_fold_twin_matches_arrow_path(spark, sf_dir):
    """The strong-oracle fold query and the applyInPandas production
    path must compute the SAME standardization (ddof=0, sigma=0 -> 1):
    different accumulation orders, same math, agreement to 1e-9."""
    import __spark_entry__ as entry
    from train_reports_etl_spark.extensions.similarity import (
        standardize_embeddings,
    )
    from train_reports_etl_spark.sources.registry import load_table

    fold = {
        (r.vec_id, r.pos): r.z
        for r in entry.queries()["e3_standardized_embeddings"](
            spark, sf_dir
        ).collect()
    }
    arrow = standardize_embeddings(load_table(spark, sf_dir, "embeddings"))
    for row in arrow.collect():
        for pos, z in enumerate(row.embedding):
            # 5e-7 from the fold twin's 6dp output rounding + ~1e-6 for
            # accumulation-order divergence (numpy pairwise vs fold)
            assert abs(fold[(row.vec_id, pos)] - z) < 2e-6


def test_rolling_median_range_frame_respects_calendar(spark):
    """Sparse series (days 1, 2, 10): day 10's trailing-7-day frame
    must contain ONLY day 10 — a ROWS frame would wrongly reach back
    to days 1-2, nine days earlier."""
    from train_reports_etl_spark.extensions.ext_queries import (
        rolling_median_daily,
    )

    daily = spark.createDataFrame(
        [("click", "2024-01-01", 19723, 10),
         ("click", "2024-01-02", 19724, 20),
         ("click", "2024-01-10", 19732, 99)],
        "event_type string, day string, day_num int, n long",
    )
    out = {r.day: r.median_7d for r in rolling_median_daily(daily).collect()}
    assert out["2024-01-10"] == 99.0          # frame = {99} only
    assert out["2024-01-02"] == 15.0          # frame = {10, 20}


def test_table_checksum_null_rows_still_contribute(spark):
    """A row with a NULL field must still contribute its OTHER columns
    to the checksum: corrupting a value next to a NULL changes the
    checksum (the COALESCE-sentinel rule)."""
    from train_reports_etl_spark.extensions.ext_queries import (
        _checksum_row_expr,
    )
    from train_reports_etl_spark.extensions.sketches import hash60_sql

    fields = ["CAST(k AS {S})", "s", "CAST(CAST(ROUND(v * 100) AS BIGINT) AS {S})"]
    h = hash60_sql(_checksum_row_expr(fields, "STRING"))

    def checksum(rows):
        df = spark.createDataFrame(rows, "k long, s string, v double")
        return df.agg(F.expr(f"bit_xor({h})")).first()[0]

    a = checksum([(1, None, 10.0), (2, "x", 5.0)])
    b = checksum([(1, None, 99.0), (2, "x", 5.0)])  # corrupt v next to NULL s
    assert a != b
    # and the checksum is order-independent
    c = checksum([(2, "x", 5.0), (1, None, 10.0)])
    assert a == c
