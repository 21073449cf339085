"""E80 — k-anonymity audit over a generalization ladder.

Reference linkage: none — new scope beyond SURVEY.md §2.11. Before a
dataset (or a training corpus's metadata sidecar) is released, the
privacy question is Sweeney's k-anonymity (IJUFKS 2002): does every
combination of quasi-identifiers (nation × segment × balance bucket)
match at least k records? If not, how far up the GENERALIZATION
LADDER (drop the balance, then the segment, then everything but
nation) must the release go before it does?

The ladder is strictly nested, so the whole audit is ONE
``ROLLUP(nation, segment, bal_bucket)`` — a single scan and a single
shuffle computing every level's equivalence classes simultaneously
(Spark expands rollup in the partial aggregate, so map-side combine
still applies per grouping set); ``grouping_id`` labels the level.
All outputs are integer counts — strong oracle (DuckDB speaks the
same ROLLUP + GROUPING dialect).

Scale shape (100 TB): class keys are bounded-width tuples; the
summary per level is a second tiny aggregate over class rows (#
classes ≪ rows). Skewed giant classes are harmless — they only ever
make k-anonymity PASS, and partial counts commute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: grouping_id → ladder level for ROLLUP(nation, segment, bal_bucket):
#: 0 keeps all three, 1 drops the bucket, 3 keeps nation only,
#: 7 is the fully-generalized root (always k-anonymous for n >= k).
LEVELS = {0: 0, 1: 1, 3: 2, 7: 3}


#: grouping_id → level for ROLLUP(nation, bal_bucket) in the
#: l-diversity audit: 0 keeps both QIs, 1 drops the bucket, 3 is root.
L_LEVELS = {0: 0, 1: 1, 3: 2}


def l_diversity_audit(
    customers: DataFrame,
    l: int = 3,  # noqa: E741
) -> DataFrame:
    """E87 — l-diversity audit (Machanavajjhala et al., ICDE'06): the
    attack k-anonymity misses is HOMOGENEITY — a class of 50 records
    is 50-anonymous, but if all 50 share one sensitive value the
    adversary learns it without re-identifying anyone. Distinct
    l-diversity requires every quasi-identifier equivalence class to
    contain ≥ l distinct SENSITIVE values (here: the market segment,
    deliberately excluded from this ladder's QIs).

    Same single-scan shape as :func:`k_anonymity_ladder`: one
    ``ROLLUP(nation, bal_bucket)`` whose per-class aggregate is
    COUNT(DISTINCT sensitive) — Spark plans rollup + distinct as
    expand → partial distinct → merge, so the wide stage carries at
    most (#classes × |sensitive domain|) rows per level, map-side
    deduplicated. All integer counts + a boolean — strong oracle
    (DuckDB shares the ROLLUP/GROUPING/COUNT DISTINCT dialect).

    Giant classes are again harmless (more rows can only add distinct
    values); the failure mode this catches is the SMALL-DOMAIN class,
    which is exactly what the summary counts.
    """
    classes = (
        customers.select(
            F.col("c_nationkey").cast("long").alias("nation"),
            F.expr("cast(round(c_acctbal * 100) as bigint) div 100000").alias(
                "bal_bucket"
            ),
            F.col("c_mktsegment").alias("sensitive"),
        )
        .rollup("nation", "bal_bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.countDistinct("sensitive").cast("long").alias("n_sens"),
            F.grouping_id().alias("gid"),
        )
    )
    level = F.element_at(
        F.create_map(*[F.lit(x) for kv in L_LEVELS.items() for x in kv]),
        F.col("gid"),
    )
    return (
        classes.withColumn("level", level)
        .groupBy("level")
        .agg(
            F.count("*").cast("long").alias("n_classes"),
            F.min("n_sens").cast("long").alias("min_l"),
            F.sum(F.when(F.col("n_sens") < l, F.col("n")).otherwise(0))
            .cast("long")
            .alias("violating_rows"),
            (F.min("n_sens") >= l).alias("l_diverse"),
        )
        .select(
            F.col("level").cast("int").alias("level"),
            "n_classes",
            "min_l",
            "violating_rows",
            "l_diverse",
        )
    )


def k_anonymity_ladder(
    customers: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Per generalization level: equivalence-class count, smallest
    class, rows living in classes below ``k`` (the re-identifiable
    population), and the pass flag. ``bal_bucket`` is $1000 bands on
    the cents convention (ROUND(bal·100) — the repo's portable money
    form)."""
    classes = (
        customers.select(
            F.col("c_nationkey").cast("long").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.expr("cast(round(c_acctbal * 100) as bigint) div 100000").alias(
                "bal_bucket"
            ),
        )
        .rollup("nation", "segment", "bal_bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.grouping_id().alias("gid"),
        )
    )
    level = F.element_at(
        F.create_map(*[F.lit(x) for kv in LEVELS.items() for x in kv]),
        F.col("gid"),
    )
    return (
        classes.withColumn("level", level)
        .groupBy("level")
        .agg(
            F.count("*").cast("long").alias("n_classes"),
            F.min("n").cast("long").alias("min_class_size"),
            F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0))
            .cast("long")
            .alias("violating_rows"),
            (F.min("n") >= k).alias("k_anonymous"),
        )
        .select(
            F.col("level").cast("int").alias("level"),
            "n_classes",
            "min_class_size",
            "violating_rows",
            "k_anonymous",
        )
    )
