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


#: Shapes ``pd.to_numeric(errors='coerce')`` and DuckDB ``TRY_CAST``
#: both accept: optional sign, decimal digits with optional point and
#: exponent, or a signed inf/infinity/nan spelling. Spark's bare
#: ``try_cast('double')`` inherits Java ``Double.parseDouble`` lenience
#: — ``'0d'``/``'1f'``/``'2D'``/``'3F'`` suffixes and ``0x1.8p1`` hex
#: floats parse to numbers there but are NULL in pandas and DuckDB —
#: so the cast is gated behind this regex (falsified unguarded by
#: tests/test_properties.py with input ``'0d'``).
_PANDAS_DOUBLE_RE = (
    r"^[+-]?((\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|[iI][nN][fF]([iI][nN][iI][tT][yY])?|[nN][aA][nN])$"
)


def coerce_double(col: Column | str) -> Column:
    """F2 — string → double, NULL on parse failure.

    Mirrors ``pd.to_numeric(..., errors='coerce')``
    (`reports_exporter_v0.83.py:552-564`). ``try_cast``, not ``cast``:
    under ANSI mode (the Spark 4 default in unconfigured sessions) a
    plain cast *throws* on malformed input — null-on-error must not
    depend on session config. The cast is additionally gated behind a
    pandas-shaped numeric regex (see ``_PANDAS_DOUBLE_RE``) so Java
    float-literal lenience never leaks a dirty cell like ``"12.5d"``
    past the P2 required-null quarantine split.
    """
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(t.rlike(_PANDAS_DOUBLE_RE), t.try_cast("double"))


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
