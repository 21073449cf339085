"""E86 — Misra–Gries mergeable heavy hitters: the PODS'12 guarantees
(one-sided error with an explicit integer budget, coverage of every
item above the budget) pinned against exact counts, plus determinism
under repartitioning and the ≤-k output bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from train_reports_etl_spark.extensions.corpus import bucket_sql
from train_reports_etl_spark.extensions.sketches import mg_merge, mg_summaries
from train_reports_etl_spark.extensions.text import tokens
from train_reports_etl_spark.sources.registry import load_table

K = 20


@pytest.fixture(scope="module")
def toks(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.expr(f"({bucket_sql('doc_id')}) % 8").cast("int").alias("bucket"),
        F.explode(tokens("text")).alias("t"),
    ).cache()


@pytest.fixture(scope="module")
def merged(toks):
    return mg_merge(mg_summaries(toks, "bucket", "t", k=K), "bucket", k=K).cache()


def test_summary_bounds_per_bucket(toks):
    """cnt ≤ true in-bucket count ≤ cnt + err for every summary row,
    ≤ k rows per bucket, err constant within a bucket."""
    summ = mg_summaries(toks, "bucket", "t", k=K)
    true = toks.groupBy("bucket", "t").agg(F.count("*").alias("true_c"))
    j = summ.join(true, (summ.bucket == true.bucket) & (summ.item == true.t))
    bad = j.filter(
        (F.col("cnt") > F.col("true_c"))
        | (F.col("true_c") > F.col("cnt") + F.col("err"))
    ).count()
    assert bad == 0
    per_b = summ.groupBy("bucket").agg(
        F.count("*").alias("n"), F.countDistinct("err").alias("ne")
    )
    assert per_b.filter((F.col("n") > K) | (F.col("ne") != 1)).count() == 0


def test_merged_bounds_and_coverage(toks, merged):
    """est ≤ true global count ≤ est + err_bound for emitted items, and
    EVERY token with true count > err_bound has a row (the mergeable-
    summaries theorem's coverage side)."""
    rows = merged.collect()
    assert 0 < len(rows) <= K
    errb = rows[0]["err_bound"]
    assert all(r["err_bound"] == errb for r in rows)
    true = {
        r["t"]: r["c"]
        for r in toks.groupBy("t").agg(F.count("*").alias("c")).collect()
    }
    for r in rows:
        assert r["est_count"] <= true[r["item"]] <= r["est_count"] + errb
    emitted = {r["item"] for r in rows}
    missing = [t for t, c in true.items() if c > errb and t not in emitted]
    assert missing == []


def test_merge_deterministic_under_partitioning(toks, merged):
    """Bit-identical output regardless of input partitioning — the
    property the streaming MG fold gives up and this construction
    keeps (summary = pure function of the multiset)."""
    shuffled = toks.repartition(7, "t")
    again = mg_merge(mg_summaries(shuffled, "bucket", "t", k=K), "bucket", k=K)
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b


def test_small_distinct_domain_is_exact(spark):
    """≤ k distinct items per bucket → err 0 everywhere and the merge
    returns exact counts."""
    rows = [(i % 2, f"w{i % 5}") for i in range(100)]
    df = spark.createDataFrame(rows, "bucket int, t string")
    merged = mg_merge(mg_summaries(df, "bucket", "t", k=K), "bucket", k=K)
    got = {r["item"]: (r["est_count"], r["err_bound"]) for r in merged.collect()}
    assert got == {f"w{i}": (20, 0) for i in range(5)}
