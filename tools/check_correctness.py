"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet (default sf0.01), then compares
row-count, schema-insensitive column names, and an order-insensitive
value hash (columns sorted by name, rows sorted, values normalized).

Usage: python tools/check_correctness.py [--json OUT] [sf_dir] [query ...]

``--json OUT`` additionally writes a driver-format artifact (one
record per query: rows/schema/hash match booleans, row counts, err)
so a full local run can stand in when the driver's own artifact is
truncated (ADVICE round 2: CORRECTNESS_r02 covered 50/83 queries).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from train_reports_etl_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
            df[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.map(lambda v: "NaN" if v is None or (isinstance(v, float) and math.isnan(v)) else f"{v:.6g}")
        elif s.dtype == object:
            import datetime as _dt

            df[c] = s.map(
                lambda v: v.isoformat() if isinstance(v, (_dt.date, _dt.datetime)) else repr(v)
            )
        else:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.sha256()
    norm = normalize(df)
    h.update("|".join(norm.columns).encode())
    for row in norm.itertuples(index=False):
        h.update("\x1f".join(map(str, row)).encode())
    return h.hexdigest()[:16]


# Coarse dtype classes: the normalizer formats each class differently
# (floats via %.6g, ints/bools via str, datetimes via strftime, objects
# via repr/isoformat), so ANY cross-class divergence between the Spark
# and oracle frames can flip the value hash even when the underlying
# values are numerically identical — exactly the j13_volume_suppliers
# failure class from round 5 (DuckDB SUM(BIGINT) -> HUGEINT -> pandas
# float64 vs Spark int64). Surface it as its own named problem instead
# of an opaque hash mismatch.
_KIND_CLASS = {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "datetime", "m": "timedelta"}


def dtype_classes(df: pd.DataFrame) -> dict[str, str]:
    return {c: _KIND_CLASS.get(df[c].dtype.kind, "object") for c in df.columns}


def compare_frames(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Driver-shaped comparison: returns the list of problems (empty = green)."""
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rows {len(sdf)} != {len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        return problems
    # Zero-row frames carry no values to mis-hash, and their dtypes are
    # constructor artifacts (non-Arrow toPandas builds empty frames
    # all-object) — skip the dtype check so a legitimately empty result
    # can't false-FAIL in --vanilla mode.
    if len(sdf) and len(odf):
        sk, ok = dtype_classes(sdf), dtype_classes(odf)
        bad = {c: f"{sk[c]}!={ok[c]}" for c in sorted(sk) if sk[c] != ok[c]}
        if bad:
            problems.append(f"dtype_mismatch {bad}")
    if not problems and value_hash(sdf) != value_hash(odf):
        problems.append("value-hash mismatch")
    return problems


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    vanilla = "--vanilla" in argv
    if vanilla:
        argv.remove("--vanilla")
    sf_dir = "/root/testdata/sf0.01"
    if argv and (os.path.isdir(argv[0]) or argv[0].startswith("/")):
        # a path-looking arg that is NOT a directory is an error, not a
        # query-name filter — otherwise a typoed sf_dir silently runs
        # zero queries and the gate false-greens ("0/0 passed", exit 0)
        if not os.path.isdir(argv[0]):
            print(f"sf_dir does not exist: {argv[0]}", file=sys.stderr)
            return 2
        sf_dir = argv[0]
        argv = argv[1:]
    # every remaining arg is a query-name filter (previously the first
    # name was silently dropped when no sf_dir was passed); unknown
    # names error for the same false-green reason
    only = set(argv) or None
    if only:
        unknown = only - set(entrymod.queries())
        if unknown:
            print(f"unknown queries: {sorted(unknown)}", file=sys.stderr)
            return 2

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    if vanilla:
        # Driver-faithful mode: a PLAIN session (ANSI defaults, no UTC
        # pin, no overwrite-mode pin) — catches any query that secretly
        # depends on our session.py configuration. Every query must
        # pass BOTH modes.
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName("correctness-vanilla").getOrCreate()
    else:
        spark = get_spark("correctness-check")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            records[name] = dict(rows_match=False, schema_match=False, hash_match=False,
                                 spark_rows=None, oracle_rows=None, err=f"spark: {e}"[:200])
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            records[name] = dict(rows_match=None, schema_match=None, hash_match=None,
                                 spark_rows=len(sdf), oracle_rows=None, err="no_oracle")
            print(f"weak  {name}: rows={len(sdf)} ({time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            records[name] = dict(rows_match=None, schema_match=None, hash_match=None,
                                 spark_rows=len(sdf), oracle_rows=None, err=f"oracle: {e}"[:200])
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        problems = compare_frames(sdf, odf)
        if any(p.startswith("value-hash") for p in problems):
            ns, no = normalize(sdf), normalize(odf)
            diff = ns.compare(no) if ns.shape == no.shape else None
            if diff is not None and len(diff):
                print(diff.head(5))
        status = "ok  " if not problems else "FAIL"
        if problems:
            failures.append(name)
        dtype_err = next((p for p in problems if p.startswith("dtype_mismatch")), None)
        records[name] = dict(
            rows_match=len(sdf) == len(odf),
            schema_match=sorted(sdf.columns) == sorted(odf.columns),
            hash_match=not problems,
            spark_rows=len(sdf),
            oracle_rows=len(odf),
            err=dtype_err[:200] if dtype_err else None,
        )
        print(f"{status}  {name}: rows={len(sdf)} ({time.time()-t0:.1f}s) {'; '.join(problems)}")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(records, f, indent=2)
        print(f"wrote {json_out} ({len(records)} records)")
    print(f"\n{len(records) - len(failures)}/{len(records)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
