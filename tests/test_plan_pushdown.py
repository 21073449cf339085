"""Plan-shape evidence: pushdown, pruning, and codegen reach the scan.

tools/explain_audit.py tallies join/exchange structure across every
registered query; these tests pin the three scan-level properties that
decide 100 TB I/O and that a refactor could silently regress:

- predicate pushdown: a filter on a scanned column appears in the
  parquet scan's ``PushedFilters`` (row groups skip via statistics);
- column pruning: a 2-column projection reads a 2-column
  ``ReadSchema``, not the full table;
- partition pruning: reading a ``partitionBy`` layout with an equality
  filter lists only the matching directory (``PartitionFilters``, no
  partition count regression to a full scan);
- whole-stage codegen: the scalar hot path (F1/F2 coercions) fuses
  into WholeStageCodegen spans rather than interpreted projections.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from train_reports_etl_spark.sources.registry import load_table


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    plan = _executed(df)
    assert "PushedFilters: [" in plan
    assert "o_orderstatus" in plan.split("PushedFilters:")[1].split("]")[0]


def test_column_pruning_reads_only_projected_columns(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = _executed(df)
    schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in schema and "l_quantity" in schema
    # the 14 other lineitem columns must NOT be read
    assert "l_comment" not in schema and "l_shipdate" not in schema


def test_partition_pruning_on_partitioned_layout(spark, tmp_path):
    base = str(tmp_path / "part_layout")
    src = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 7).cast("string").alias("bucket"),
    )
    src.write.partitionBy("bucket").parquet(base)
    df = spark.read.parquet(base).filter(F.col("bucket") == "3")
    plan = _executed(df)
    assert "PartitionFilters:" in plan
    assert "bucket" in plan.split("PartitionFilters:")[1].split("]")[0]
    # pruning is real, not cosmetic: only 1/7th of the rows are scanned
    assert df.count() == sum(1 for i in range(1000) if i % 7 == 3)
    files = df.select(F.input_file_name()).distinct().collect()
    assert all("bucket=3" in r[0] for r in files)


def test_scalar_hot_path_stays_in_codegen(spark, sf_dir):
    from train_reports_etl_spark.functions.coercion import (
        coerce_double,
        coerce_timestamp,
    )

    df = load_table(spark, sf_dir, "lineitem").select(
        coerce_double(F.col("l_quantity").cast("string")).alias("q"),
        coerce_timestamp(F.col("l_shipdate").cast("string")).alias("d"),
    )
    # "*(N) Project" — the star prefix is the WholeStageCodegen marker
    # in the executed plan's tree string; an interpreted projection
    # would render as a bare "Project". The round-9 load_table scan
    # guard can insert an exchange, which defers plan finalization to
    # AQE — execute first so the printed plan is the final one.
    df.collect()  # executes THIS QueryExecution, finalizing the AQE plan
    plan = _executed(df)
    assert "Project" in plan
    import re

    assert re.search(r"\*\(\d+\) Project", plan), plan
