"""JSONL corpus source (S14 — beyond-reference, the de-facto LLM
corpus interchange format).

Line-delimited JSON with PERMISSIVE parsing: malformed lines land in a
quarantine DataFrame instead of failing the job — the same
read-everything / quarantine-bad-rows contract the reference applies
to report rows (`reports_exporter_v0.83.py:601-603`), applied at the
parse layer.

Scale notes: the JSON datasource is splittable per file (and gzip
files fall back to one task per file — shard corpora into many .gz
members, which is exactly how public corpora like C4/Dolma ship);
schema is REQUIRED, never inferred — inference is a full extra pass
over 100 TB and can mis-type sparse fields. Column pruning pushes into
the JSON parser (Jackson skips unprojected fields), so narrow selects
stay cheap even on wide records.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
) -> tuple[DataFrame, DataFrame]:
    """Read line-delimited JSON at ``path`` with an explicit schema;
    return ``(good, quarantine)``.

    ``good`` carries the declared columns for rows that parsed;
    ``quarantine`` carries the full projection — whatever fields DID
    parse plus the raw offending line in ``_corrupt_record`` — the
    at-least-once ingest contract: nothing is silently dropped, bad
    lines are inspectable and replayable.

    Spark refuses plans whose referenced columns are ONLY the internal
    corrupt-record column straight off a JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the parser
    would otherwise skip the very fields whose failure defines
    corruption). Keeping the declared columns in the quarantine
    projection satisfies that without caching the scan — the
    documented `.cache()` workaround is a non-starter on a 100 TB
    read.
    """
    full_schema = f"{schema_ddl}, {CORRUPT_COL} string"
    raw = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    good = raw.filter(raw[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    bad = raw.filter(raw[CORRUPT_COL].isNotNull())
    return good, bad
