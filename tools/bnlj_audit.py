"""BNLJ build-side audit: PROVE every BroadcastNestedLoopJoin is a
tiny-scalar broadcast, not a hidden cross product.

`explain_audit` counts BNLJ nodes but cannot judge them; this tool
walks each flagged query's physical plan tree and classifies every
BNLJ's broadcast (build) side:

- ``scalar_agg``  — subtree contains an ungrouped HashAggregate
  (``keys=[]``): a 1-row aggregate scalar (MAX/SUM/COUNT totals,
  thresholds, date spans).
- ``literal``     — subtree bottoms out in a LocalTableScan, a
  ``Scan ExistingRDD`` (what ``spark.createDataFrame`` over a
  driver-local literal list plans as), or a ReusedExchange of one: a
  literal frame (threshold grids, calendar spines) of a handful of
  driver-side rows by construction.
- ``UNKNOWN``     — anything else. Exit 1: a new BNLJ whose build side
  is real data is exactly the scale-killer the audit exists to catch.

The tree walk uses the JVM plan's children, so nesting is structural,
not parsed from indentation. AQE wrappers are unwrapped via
``initialPlan``. Full runs write BNLJ_AUDIT.json.

Usage: python tools/bnlj_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from train_reports_etl_spark.session import get_spark


def _children(node):
    cs = node.children()
    return [cs.apply(i) for i in range(cs.size())]


def _walk(node):
    yield node
    for c in _children(node):
        yield from _walk(c)


def _subtree_names(node) -> list[str]:
    return [n.nodeName() for n in _walk(node)]


def _classify_build(node) -> str:
    """node is the BNLJ's broadcast-side child (a BroadcastExchange or
    a reuse of one)."""
    names = " ".join(_subtree_names(node))
    simple = node.toString()
    if "HashAggregate" in names and "keys=[]" in simple:
        return "scalar_agg"
    if (
        "LocalTableScan" in names
        or "ExistingRDD" in names
        or "Scan ExistingRDD" in simple
        or "ReusedExchange" in names
    ):
        return "literal"
    return "UNKNOWN"


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if argv and os.path.isdir(argv[0]):
        sf_dir = argv[0]
        argv = argv[1:]
    only = set(argv) or None

    spark = get_spark("bnlj-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out: dict[str, list[str]] = {}
    n_unknown = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            qe = fn(spark, sf_dir)._jdf.queryExecution()
            plan = qe.executedPlan()
            # unwrap AQE so the static join tree is visible
            if plan.nodeName() == "AdaptiveSparkPlan":
                plan = plan.initialPlan()
        except Exception:  # noqa: BLE001 — streaming: no batch plan
            continue
        kinds = []
        for node in _walk(plan):
            if node.nodeName() != "BroadcastNestedLoopJoin":
                continue
            kids = _children(node)
            # the broadcast side is the child that IS (or reuses) a
            # BroadcastExchange subtree
            build = None
            for kid in kids:
                if "BroadcastExchange" in _subtree_names(kid) or "ReusedExchange" in _subtree_names(kid):
                    build = kid
            kind = _classify_build(build) if build is not None else "UNKNOWN"
            kinds.append(kind)
            if kind == "UNKNOWN":
                n_unknown += 1
        if kinds:
            out[name] = kinds
            print(f"{name}: {kinds}")
    total = sum(len(v) for v in out.values())
    print(f"\n{total} BNLJ across {len(out)} queries; UNKNOWN: {n_unknown}")
    if only is None:
        with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BNLJ_AUDIT.json"), "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    return 1 if n_unknown else 0


if __name__ == "__main__":
    sys.exit(main())
