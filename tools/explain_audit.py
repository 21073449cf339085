"""Plan audit: scan every registered query's executed plan for
scale-killers and tally join/exchange structure.

Flags (hard failures at 100 TB):
- CartesianProduct anywhere;
- BroadcastNestedLoopJoin on anything bigger than a 1-row scalar side
  (heuristic: reported as a warning — the repo's only legitimate BNLJs
  are 1-row aggregate scalar joins, see SCALING.md).

Usage: python tools/explain_audit.py [sf_dir] [query ...]
Writes PLAN_AUDIT.json (per query: cartesian / bnlj / bhj / smj /
exchange counts) and prints a summary; exit code 1 if any
CartesianProduct is found.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from train_reports_etl_spark.session import get_spark


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv and os.path.isdir(argv[0]) else "/root/testdata/sf0.01"
    only = set(argv[1:]) if len(argv) > 1 else (set(argv[:1]) - {sf_dir} or None)

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out: dict[str, dict] = {}
    n_cartesian = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — streaming/stateful: no batch plan
            out[name] = {"err": str(e)[:120]}
            continue
        rec = {
            "cartesian": plan.count("CartesianProduct"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "bhj": plan.count("BroadcastHashJoin"),
            "smj": plan.count("SortMergeJoin"),
            "exchange": plan.count("Exchange"),
            "codegen": plan.count("WholeStageCodegen"),
        }
        out[name] = rec
        n_cartesian += rec["cartesian"]
        flag = " <-- CARTESIAN" if rec["cartesian"] else ""
        print(
            f"{name}: bhj={rec['bhj']} smj={rec['smj']} bnlj={rec['bnlj']} "
            f"exch={rec['exchange']}{flag}"
        )
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "PLAN_AUDIT.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    n_bnlj = sum(r.get("bnlj", 0) for r in out.values())
    print(
        f"\naudited {len(out)} plans: {n_cartesian} CartesianProduct, "
        f"{n_bnlj} BroadcastNestedLoopJoin (verify each is a 1-row scalar)"
    )
    return 1 if n_cartesian else 0


if __name__ == "__main__":
    raise SystemExit(main())
