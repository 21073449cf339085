"""JSON column access (semi-structured payloads).

The reference stores no JSON, but its event-ish payloads
(`events.props` in the synthetic star schema) are the common shape:
a string column holding a small JSON object. Two access paths:

- :func:`json_field` — one field, schema-free (`get_json_object`),
  for ad-hoc predicates;
- :func:`parse_props` — `from_json` with an explicit DDL schema: the
  parse happens once per row, every field is a typed column afterward,
  and Catalyst prunes the parse to just the accessed fields
  (JsonToStructs supports field pruning). Prefer this in pipelines —
  N `get_json_object` calls re-parse the string N times.

Malformed documents yield NULL (PERMISSIVE mode), matching the
engine's null-on-error coercion stance (functions/coercion.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["json_field", "parse_props"]


def json_field(col: Column | str, path: str) -> Column:
    """Extract one field as a string (NULL when absent/malformed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{path}")


def parse_props(
    df: DataFrame,
    schema_ddl: str,
    json_col: str = "props",
    prefix: str = "",
) -> DataFrame:
    """Parse ``json_col`` once with an explicit schema and flatten the
    fields as top-level typed columns (optionally prefixed)."""
    parsed = df.withColumn("__j", F.from_json(F.col(json_col), schema_ddl))
    # Field names come from the parsed struct type, not a text split of
    # the DDL — comma-bearing types (decimal(10,2), struct<a:int,b:int>,
    # map<string,int>) would produce bogus names under a ','-split.
    field_names = [f.name for f in parsed.schema["__j"].dataType.fields]
    out = parsed.select(
        *[c for c in df.columns],
        *[F.col(f"__j.{n}").alias(f"{prefix}{n}") for n in field_names],
    )
    return out
