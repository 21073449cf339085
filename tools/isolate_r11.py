"""Round-11 optimization harness: isolate queries per guide §1.

Same contract as tools/isolate_r10.py (noop-sink medians, calibration
brackets, ``explain('formatted')`` dumps) with two round-11 additions:

- plan dumps land in ``plans/r11/<q>_<tag>.txt``;
- every run also records the per-run DRIVER JOB COUNT delta (from the
  AppStatusStore) — structural evidence the host weather cannot fake,
  since at sf0.1 most suite rows are job-floor-bound (~0.2 s/job).

Usage:
    python tools/isolate_r11.py [--sf SF_DIR] [--repeat N]
                                [--tag before|after|none] query [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bench import host_calibration, run_query
from train_reports_etl_spark.session import get_spark


def job_count(spark) -> int:
    """Total jobs submitted so far in this app (status store)."""
    try:
        return spark.sparkContext._jsc.sc().statusStore().jobsList(None).size()
    except Exception:  # noqa: BLE001 — py4j surface drift
        return -1


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    repeat = 3
    tag = "none"
    names: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--sf":
            sf_dir = argv[i + 1]
            i += 2
        elif a == "--repeat":
            repeat = int(argv[i + 1])
            i += 2
        elif a == "--tag":
            tag = argv[i + 1]
            i += 2
        else:
            names.append(a)
            i += 1

    print(f"calibration(begin): {host_calibration()}", flush=True)
    spark = get_spark("isolate-r11")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(entrymod.queries())
    from train_reports_etl_spark.plans.registry import BENCH_ONLY

    qs.update(BENCH_ONLY)

    # Warm session + python lane exactly like bench.py.
    try:
        run_query(entrymod.entry(spark))
    except Exception:  # noqa: BLE001
        pass
    try:
        spark.createDataFrame([(1,)], "x int").mapInPandas(lambda it: it, "x int").count()
    except Exception:  # noqa: BLE001
        pass

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(here, "plans", "r11")
    os.makedirs(plans_dir, exist_ok=True)

    # Prebuild shared stores once so store first-touch cost does not
    # pollute the first consumer's isolated number (mirrors bench.py).
    if any(not n.startswith("store:") for n in names):
        try:
            from train_reports_etl_spark.extensions.ext_queries import (
                prebuild_shared_stores,
            )

            prebuild_shared_stores(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"store prebuild failed: {e}", file=sys.stderr)

    results: dict[str, dict] = {}
    for name in names:
        if name not in qs:
            print(f"unknown query: {name}", file=sys.stderr)
            continue
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"isolate:{name}")
        walls, jobs = [], []
        for _ in range(repeat):
            j0 = job_count(spark)
            t0 = time.time()
            try:
                run_query(fn(spark, sf_dir))
                walls.append(round(time.time() - t0, 3))
                j1 = job_count(spark)
                jobs.append(j1 - j0 if j0 >= 0 and j1 >= 0 else -1)
            except Exception as e:  # noqa: BLE001
                walls.append(-1.0)
                jobs.append(-1)
                print(f"{name} FAILED: {e}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
        ok = [w for w in walls if w >= 0]
        med = round(statistics.median(ok), 3) if ok else -1.0
        results[name] = {"median": med, "runs": walls, "jobs": jobs}
        print(f"{name}: median={med} runs={walls} jobs={jobs}", flush=True)
        if tag != "none":
            try:
                df = fn(spark, sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception as e:  # noqa: BLE001
                plan = f"explain failed: {e}"
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
    print(f"calibration(end): {host_calibration()}", flush=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
