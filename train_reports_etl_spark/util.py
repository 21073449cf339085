"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def safe_col(name: str) -> Column:
    """Column reference for raw, untrusted column names.

    Report headers contain '.', '(', '+' (e.g. "Passengers Inc.
    Infants"); unquoted references go through the multipart-identifier
    parser and split on dots. Backtick-quoting (with embedded backticks
    doubled) resolves the name literally. NB: ``df[name]`` does NOT
    escape this in Spark 4.x — it parses too.
    """
    return F.col(f"`{name.replace('`', '``')}`")
