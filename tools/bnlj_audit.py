"""BNLJ build-side audit: PROVE every BroadcastNestedLoopJoin is a
tiny-scalar broadcast, not a hidden cross product.

`explain_audit` counts BNLJ nodes but cannot judge them; this tool
walks each query's physical plan tree (JVM children, AQE unwrapped)
and classifies the BROADCAST (build) side of every BNLJ:

- ``scalar_agg`` — descending from the build root, the FIRST
  aggregate node encountered is ungrouped (its own simpleString has
  ``keys=[]``): the subtree emits exactly one row (totals, maxima,
  thresholds, date spans). A grouped first aggregate is NOT accepted
  — classification is per-node, never a substring match over the
  concatenated subtree (which would let a nested partial's ``keys=[]``
  vouch for a many-row grouped build). AND any leaf reached without
  passing through an ungrouped aggregate (e.g. the other side of a
  join above the aggregate) must still be a driver-literal scan —
  ``Join(scalar-agg, table-scan)`` is a many-row broadcast and
  classifies UNKNOWN.
- ``literal``    — no aggregate, and every leaf is a driver-literal
  scan (LocalTableScan, or the RDDScan/``Scan ExistingRDD`` that
  ``spark.createDataFrame`` over a literal list plans as): a
  threshold grid / calendar spine of a handful of rows by
  construction.
- ``reused``     — the build root is a ReusedExchange. Reuse targets
  are not resolvable through py4j, so it is accepted ONLY if every
  BroadcastExchange anywhere in the plan classifies as
  scalar_agg/literal (any possible origin is safe); otherwise
  UNKNOWN. A ReusedExchange over a data shuffle never satisfies this.
- ``UNKNOWN``    — anything else, including an ambiguous build-side
  pick. Exit 1: a BNLJ building on real data is exactly the
  scale-killer the audit exists to catch.

Queries whose plan cannot be built (streaming entries have no batch
plan) are listed as skipped, never silently dropped — "30/30 proven"
only counts plans actually inspected.

Usage: python tools/bnlj_audit.py [sf_dir] [query ...]
Full runs write BNLJ_AUDIT.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from train_reports_etl_spark.session import get_spark

_AGG = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")
_LITERAL_LEAVES = ("LocalTableScan", "Scan ExistingRDD", "RDDScan")
_BUILD_ROOTS = ("BroadcastExchange", "BroadcastQueryStage", "ReusedExchange")


def _children(node):
    cs = node.children()
    return [cs.apply(i) for i in range(cs.size())]


def _walk(node):
    yield node
    for c in _children(node):
        yield from _walk(c)


def _classify_subtree(root) -> str:
    """Classify a build subtree below its exchange wrapper: the first
    aggregate on each root-to-leaf path decides row count; with no
    aggregate, every leaf must be a driver-literal scan."""
    frontier = [root]
    leaves_ok = True
    saw_agg_scalar = False
    while frontier:
        node = frontier.pop()
        name = node.nodeName()
        if any(a in name for a in _AGG):
            # per-node check on THIS aggregate only
            if "keys=[]" in node.simpleString(100):
                saw_agg_scalar = True
                continue  # ungrouped: subtree below is irrelevant (1 row out)
            return "UNKNOWN"
        kids = _children(node)
        if not kids:
            simple = node.simpleString(100)
            if not any(l in name or l in simple for l in _LITERAL_LEAVES):
                leaves_ok = False
        frontier.extend(kids)
    # Every leaf reached WITHOUT passing through an ungrouped aggregate
    # must still be a literal scan: Join(scalar-agg, table-scan) is a
    # many-row broadcast and must not be certified by the scalar branch.
    if not leaves_ok:
        return "UNKNOWN"
    return "scalar_agg" if saw_agg_scalar else "literal"


def _classify_build(build, full_plan) -> str:
    name = build.nodeName()
    if name == "ReusedExchange":
        # cannot resolve the reuse target: safe only if EVERY broadcast
        # exchange in the plan is itself safe
        kinds = {
            _classify_subtree(_children(n)[0])
            for n in _walk(full_plan)
            if n.nodeName() == "BroadcastExchange" and _children(n)
        }
        return "reused" if kinds and kinds <= {"scalar_agg", "literal"} else "UNKNOWN"
    kids = _children(build)
    if not kids:
        return "UNKNOWN"
    return _classify_subtree(kids[0])


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
    skipped: dict[str, str] = {}
    n_unknown = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan()
            if plan.nodeName() == "AdaptiveSparkPlan":
                plan = plan.initialPlan()
        except Exception as e:  # noqa: BLE001 — recorded, never silently dropped
            skipped[name] = str(e).splitlines()[0][:120]
            continue
        kinds = []
        for node in _walk(plan):
            if node.nodeName() != "BroadcastNestedLoopJoin":
                continue
            kids = _children(node)
            builds = [k for k in kids if k.nodeName() in _BUILD_ROOTS]
            kind = _classify_build(builds[0], plan) if len(builds) == 1 else "UNKNOWN"
            kinds.append(kind)
            if kind == "UNKNOWN":
                n_unknown += 1
        if kinds:
            out[name] = kinds
            print(f"{name}: {kinds}")
    total = sum(len(v) for v in out.values())
    print(f"\n{total} BNLJ across {len(out)} queries; UNKNOWN: {n_unknown}")
    if skipped:
        print(f"skipped (no batch plan): {sorted(skipped)}")
    if only is None:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(here, "BNLJ_AUDIT.json"), "w") as f:
            json.dump(
                {"bnlj": out, "skipped": skipped}, f, indent=1, sort_keys=True
            )
    return 1 if n_unknown else 0


if __name__ == "__main__":
    sys.exit(main())
