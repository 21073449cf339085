"""Changelog application (the MERGE INTO / CDC-apply shape).

The reference's load path is DELETE-range + bulk COPY
(``reports_exporter_v0.83.py:1586-1623``) — idempotent replace of a
date slice. The general form of that operation is applying a keyed
changelog (insert / update / delete rows with a sequence number) onto
a base snapshot: exactly what Delta/Iceberg ``MERGE INTO`` does, and
what any incremental corpus refresh at 100 TB needs when the update
unit is a key, not a partition.

Spark-first shape (no table format required):

1. keep-last per key over the changelog — ONE keyed window ordered by
   the sequence column descending (ties broken by the op column so
   reruns are deterministic);
2. base rows whose key never appears in the changelog survive as-is —
   a LEFT ANTI join (keyed, no data movement beyond the key shuffle);
3. the latest change per key contributes its row iff it is not a
   delete.

Cost: one shuffle of the changelog (window), one shuffle of base keys
(anti join), one union — all keyed by the merge key, so AQE can plan
the anti join as broadcast when the changelog is small (the common
case: a day's CDC against a full snapshot). The shuffle carries keys
and the changelog's columns; at 100 TB keep the changelog narrow
(key, seq, op, payload-digest) and join payloads back by key at the
end if bodies are large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_change_per_key(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Keep-last change per key: highest ``seq_col`` wins, ties broken
    by ``op_col`` descending so a same-seq U/D pair resolves to U
    deterministically (documented, not load-order-dependent)."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply an I/U/D changelog to a base snapshot (upsert semantics:
    an update for an absent key inserts — the MERGE WHEN NOT MATCHED
    arm). Returns the merged snapshot with base's column set.

    ``changes`` must carry ``key_cols``, ``seq_col``, ``op_col`` and
    every base column needed to materialize an upserted row.
    """
    latest = latest_change_per_key(changes, key_cols, seq_col, op_col)
    untouched = base.join(latest.select(*key_cols), key_cols, "left_anti")
    upserts = latest.filter(F.col(op_col) != F.lit("D")).select(*base.columns)
    return untouched.unionByName(upserts)
