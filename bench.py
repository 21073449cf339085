"""Benchmark harness: runs the declared query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line with per-query and
total wall-clock seconds.

Each query is materialized via a count-collapsing action
(``df.write.format("noop")`` when available, else ``count``) so timings
measure full plan execution, not driver-side collection of wide rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from train_reports_etl_spark.session import get_spark


def run_query(df) -> int:
    """Execute the full plan; noop sink avoids toPandas/collect overhead
    while still computing every output row."""
    try:
        df.write.format("noop").mode("overwrite").save()
        return -1
    except Exception:  # noqa: BLE001 — noop source unavailable
        return df.count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    # Warm the JVM/session on the smallest sf so per-query numbers
    # reflect execution, not session spin-up.
    try:
        run_query(entrymod.entry(spark))
    except Exception:  # noqa: BLE001
        pass

    timings: dict[str, float] = {}
    t_suite = time.time()
    for name, fn in qs.items():
        t0 = time.time()
        try:
            run_query(fn(spark, sf_dir))
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            print(f"bench: {name} failed: {e}", file=sys.stderr)
    total = round(time.time() - t_suite, 3)

    print(
        json.dumps(
            {
                "metric": "suite_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
