"""Coercing casts with null-on-error semantics (F1, F2, F10).

The reference ingests every column as string and coerces with
``errors='coerce'`` (`reports_exporter_v0.83.py:545-564` — bad values
become NULL, rows are kept). Spark equivalents under ANSI-off mode:
``to_timestamp`` and ``cast`` both return NULL on parse failure, so
these stay pure Catalyst expressions (no UDF, no try/except).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Reference timestamp wire format (`reports_exporter_v0.83.py:546`).
TS_FORMAT = "yyyy-MM-dd HH:mm:ss"


def coerce_timestamp(col: Column | str, fmt: str = TS_FORMAT) -> Column:
    """F1 — string → timestamp, NULL on parse failure.

    Mirrors ``pd.to_datetime(..., errors='coerce', format=...)``
    (`reports_exporter_v0.83.py:545-549`). ``try_to_timestamp`` keeps
    null-on-error semantics even if a future session flips ANSI on.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit(fmt))


def coerce_double(col: Column | str) -> Column:
    """F2 — string → double, NULL on parse failure.

    Mirrors ``pd.to_numeric(..., errors='coerce')``
    (`reports_exporter_v0.83.py:552-564`). ``try_cast``, not ``cast``:
    under ANSI mode (the Spark 4 default in unconfigured sessions) a
    plain cast *throws* on malformed input — null-on-error must not
    depend on session config.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def blank_to_null(col: Column | str) -> Column:
    """F10 — ``""``/whitespace-only strings → NULL.

    The reference replaces ``""`` and ``" "`` (`reports_exporter_v0.83.py:
    997-998`); the train-list/occupancy variants are a latent no-op bug
    (stale ``df`` global, `:739-740,1212-1213`). We implement the
    *intended* semantic — any blank-after-trim value is NULL — on all
    report paths (SURVEY.md §7.4).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c) == "", F.lit(None)).otherwise(c)
