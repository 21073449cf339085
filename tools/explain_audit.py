"""Plan audit: scan every registered query's executed plan for
scale-killers and tally join/exchange structure.

Hard failure: CartesianProduct anywhere (exit 1). BroadcastNestedLoopJoin
occurrences are COUNTED, not judged — every current one is a deliberate
1-row aggregate-scalar join (see SCALING.md); review any new BNLJ by
hand.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
Full runs write PLAN_AUDIT.json (per query: cartesian / bnlj / bhj /
smj / exchange counts); subset runs only print (the committed full
audit is never clobbered by a partial one). Unknown query names error.
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
    sf_dir = "/root/testdata/sf0.01"
    if argv and os.path.isdir(argv[0]):
        sf_dir = argv[0]
        argv = argv[1:]
    only = set(argv) or None

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}", file=sys.stderr)
            return 2
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
    if only is None:
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
