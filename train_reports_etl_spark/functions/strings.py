"""String scalar functions (F6–F9): key building and phone cleaning.

The reference's phone cleaner is a row-wise Python ``apply`` with a
per-row regex (`reports_exporter_v0.83.py:724-736`). Per SURVEY.md §7.4
we avoid regex entirely — ``startswith`` + ``substring`` is exact, stays
in whole-stage codegen, and sidesteps regex-escaping of user data.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def corridor_code(train_number: Column | str, width: int = 2) -> Column:
    """F6 — corridor = first ``width`` chars of the train number
    (`reports_exporter_v0.83.py:647`)."""
    return F.substring(_c(train_number), 1, width)


def concat_key(*cols: Column | str, sep: str = " - ") -> Column:
    """F7 — ``" - "``-joined composite key
    (`reports_exporter_v0.83.py:644-652,1203-1209`)."""
    return F.concat_ws(sep, *[_c(c) for c in cols])


def strip_prefix(value: Column | str, prefix: Column | str) -> Column:
    """F8 — remove ``prefix`` from the start of ``value`` when present
    (`reports_exporter_v0.83.py:725-735`, ``re.sub('^'+escape(p), '', v)``).

    Literal-anchored, not regex: NULL/empty prefix leaves the value
    unchanged (pandas ``re.sub`` with empty pattern is also a no-op on
    the anchor).
    """
    v, p = _c(value), _c(prefix)
    return F.when(
        p.isNotNull() & (p != "") & v.startswith(p),
        v.substr(F.length(p) + 1, F.length(v)),
    ).otherwise(v)


def clean_phone(
    telephone: Column | str,
    prefix: Column | str,
    max_len: int = 14,
) -> Column:
    """X1/F8/F9 — full phone cleaning chain
    (`reports_exporter_v0.83.py:724-736`):

    1. strip the row's dialing ``prefix`` if the number starts with it,
    2. remove ``-`` separators,
    3. truncate to ``max_len`` chars (DB column width, `:736`).

    The reference does this as a row-at-a-time ``df.apply`` (its only
    UDF); here it is three Catalyst expressions — vectorized, no Python.
    """
    stripped = strip_prefix(telephone, prefix)
    return F.substring(F.replace(stripped, F.lit("-"), F.lit("")), 1, max_len)


# lowercase accent-fold table (translate is code-point-wise; the two
# strings below are the same length, pairwise from → to)
_ACCENT_FROM = "àáâãäåèéêëìíîïòóôõöùúûüçñ—"
_ACCENT_TO = "aaaaaaeeeeiiiiooooouuuucn-"


def fold_accents(col: Column | str) -> Column:
    """F17 — fold common accented letters to ASCII after lowercasing
    (``translate`` is a single codegen pass — no regex, no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(F.lower(c), _ACCENT_FROM, _ACCENT_TO)


def normalize_text(col: Column | str) -> Column:
    """F17 — canonical text form: lowercase, accents folded, runs of
    whitespace collapsed to one space, ends trimmed. The normalization
    every dedup fingerprint / token pipeline should share — two texts
    that differ only in case/accents/spacing normalize identically."""
    return F.trim(F.regexp_replace(fold_accents(col), "\\s+", " "))
