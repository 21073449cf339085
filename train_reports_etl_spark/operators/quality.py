"""Declarative data-quality checks (deequ-style, minimal).

Reference linkage: the reference validates inputs structurally —
header-layout sniffing (`reports_exporter_v0.83.py:214-260`), required
non-null splits (`:771-778`), join-miss assertions (`:640-647`) — and
this operator generalizes that into a declarative constraint report.

Design: every scalar constraint folds into ONE aggregation pass over
the table (a violation is `NOT constraint`, counted with a conditional
sum), and key-uniqueness rides the same pass as
``COUNT(*) − COUNT(DISTINCT key)``. One job, one scan, no matter how
many checks — the deequ insight; running checks one-by-one scans the
table N times.

Output is long-format ``(check, n_rows, n_violations, passed)`` so the
report itself is a DataFrame — filter `passed = false` to gate a load
(the S7/S12 version-gate + audit pattern composes directly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["check_table", "completeness", "in_range", "matches", "is_in"]


def completeness(col: str) -> Column:
    """Constraint: value present."""
    return F.col(col).isNotNull()


def in_range(col: str, lo, hi) -> Column:
    """Constraint: lo ≤ value ≤ hi (NULL counts as a violation)."""
    return F.col(col).isNotNull() & F.col(col).between(lo, hi)


def matches(col: str, pattern: str) -> Column:
    """Constraint: full-string regex match (NULL violates)."""
    return F.col(col).rlike(f"^(?:{pattern})$")


def is_in(col: str, allowed: list) -> Column:
    """Constraint: membership in a closed value set (NULL violates)."""
    return F.col(col).isin(allowed)


def check_table(
    df: DataFrame,
    constraints: dict[str, Column],
    unique_keys: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Run all constraints in one aggregation pass.

    ``constraints`` maps check name → boolean Column (TRUE = row ok);
    ``unique_keys`` maps check name → key column list (violations =
    n_rows − n_distinct keys). Returns one row per check:
    (check_name, n_rows, n_violations, passed), ordered by name.
    """
    aggs = [F.count("*").cast("long").alias("__n")]
    for name, ok in constraints.items():
        aggs.append(
            F.sum(F.when(~F.coalesce(ok, F.lit(False)), 1).otherwise(0))
            .cast("long")
            .alias(f"c__{name}")
        )
    for name, keys in (unique_keys or {}).items():
        aggs.append(
            (F.count("*") - F.count_distinct(F.struct(*keys)))
            .cast("long")
            .alias(f"c__{name}")
        )
    wide = df.agg(*aggs)
    names = sorted(list(constraints) + list(unique_keys or {}))
    stack = ", ".join(f"'{n}', c__{n}" for n in names)
    return (
        wide.select(
            F.expr(f"stack({len(names)}, {stack}) AS (check_name, n_violations)"),
            F.col("__n").alias("n_rows"),
        )
        .select("check_name", "n_rows", "n_violations", (F.col("n_violations") == 0).alias("passed"))
        .orderBy("check_name")
    )
