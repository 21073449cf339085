"""Mechanical single-row-group serialization audit (VERDICT r08 #5).

Four operators independently hit the same disease in round 8: a
parquet input written as ONE row group plans as N byte-range splits,
but every row materializes in the one split containing the row-group
offset, so any explode/aggregate fused into the scan stage runs
serially on one core (trigram-LM 59 s -> 5.4 s once guarded). The fix
is ``util.repartition_if_coarse``, adopted per-op as each discovery
landed. This tool converts that recurring discovery into a mechanical
invariant:

1. ``--build`` writes a deliberately single-row-group copy of every
   gate table (TPC-H tables from the star probe dataset, documents/
   embeddings/events from the N-x corpus) into ``--dir``.
2. The audit runs every registered batch query against that copy
   under a per-query job group, then reads per-task executorRunTime
   from the AppStatusStore: a stage where ONE task holds >= ``--share``
   of a >= ``--min-stage-ms`` stage's total runtime across >= 4 tasks
   is a serialization — exactly the signature the guard exists to
   remove (a healthy 32-way stage has share ~1/32; a fused serial
   explode has share ~1.0).

Streaming queries are excluded: their micro-batch jobs run on the
stream-execution thread outside the caller's job group (and their
scans go through ``_stream_events``, one shared path). Store-build
rows are timed by bench, not here.

Usage::

    python tools/rowgroup_audit.py --build            # write the copy
    python tools/rowgroup_audit.py [--json OUT] [query ...]

Exit 1 when any query serializes past the bound, so the evidence
sweep can gate on it like bench_diff.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from train_reports_etl_spark.session import get_spark

STAR_TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
CORPUS_TABLES = ("documents", "embeddings", "events")

#: queries whose dominant stage is legitimately narrow at audit scale
#: (bounded driver-side folds, k tiny TakeOrdered jobs, single-row
#: outputs) — audited but not fatal; each entry documents why.
ALLOWLIST: dict[str, str] = {}


def build(dst: str, star_src: str, corpus_src: str) -> None:
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for t, src in [(t, star_src) for t in STAR_TABLES] + [
        (t, corpus_src) for t in CORPUS_TABLES
    ]:
        path = os.path.join(src, f"{t}.parquet")
        tbl = pq.read_table(path)
        out = os.path.join(dst, f"{t}.parquet")
        pq.write_table(tbl, out, row_group_size=max(1, tbl.num_rows))
        meta = pq.ParquetFile(out).metadata
        assert meta.num_row_groups == 1, (t, meta.num_row_groups)
        print(f"{t}: {meta.num_rows} rows -> 1 row group")


def stage_skew(spark, group: str) -> list[dict]:
    """Per-stage (n_tasks, sum_ms, max_ms, share) for every stage of
    the given job group, via statusTracker stage ids + AppStatusStore
    per-task metrics (best-effort: a retried/evicted stage is skipped)."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    sids: set[int] = set()
    for jid in tracker.getJobIdsForGroup(group):
        ji = tracker.getJobInfo(jid)
        if ji is not None:
            sids.update(ji.stageIds)
    store = sc._jsc.sc().statusStore()
    out = []
    for sid in sorted(sids):
        for attempt in (0, 1):
            try:
                tl = store.taskList(sid, attempt, 100_000)
            except Exception:  # noqa: BLE001 — attempt absent/evicted
                continue
            runs = []
            for i in range(tl.size()):
                tm = tl.apply(i).taskMetrics()
                if tm.isDefined():
                    runs.append(tm.get().executorRunTime())
            if runs:
                s = sum(runs)
                out.append(
                    {
                        "stage": sid,
                        "n_tasks": len(runs),
                        "sum_ms": int(s),
                        "max_ms": int(max(runs)),
                        "share": round(max(runs) / s, 3) if s else 0.0,
                    }
                )
            break
    return out


def main() -> int:
    argv = sys.argv[1:]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    audit_dir = os.path.join(here, ".scaledata", "audit_rg1")
    share_bound, min_stage_ms, timeout_s = 0.5, 2000, 300
    json_out = None
    if "--dir" in argv:
        i = argv.index("--dir")
        audit_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--build" in argv:
        build(
            audit_dir,
            os.path.join(here, ".scaledata", "star_x10"),
            os.path.join(here, ".scaledata", "x30"),
        )
        return 0
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--share" in argv:
        i = argv.index("--share")
        share_bound = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if "--timeout" in argv:
        i = argv.index("--timeout")
        timeout_s = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if not os.path.isdir(audit_dir):
        print(f"missing {audit_dir} — run with --build first")
        return 2

    spark = get_spark("rowgroup-audit")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = entrymod.queries()
    names = argv or [
        n for n in qs if "stream" not in n and "streaming" not in n
    ]
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    try:
        from train_reports_etl_spark.extensions.ext_queries import (
            prebuild_shared_stores,
        )

        prebuild_shared_stores(spark, audit_dir)
    except Exception as e:  # noqa: BLE001
        print(f"store prebuild partial: {e}", file=sys.stderr)

    results: dict[str, dict] = {}
    flagged: list[str] = []
    for name in names:
        group = f"rga:{name}"
        sc.setJobGroup(group, name, interruptOnCancel=True)
        timer = threading.Timer(timeout_s, lambda g=group: sc.cancelJobGroup(g))
        timer.start()
        t0 = time.time()
        status = "ok"
        try:
            df = qs[name](spark, audit_dir)
            try:
                df.write.format("noop").mode("overwrite").save()
            except Exception:  # noqa: BLE001
                df.count()
        except Exception as e:  # noqa: BLE001
            status = (
                "timeout" if time.time() - t0 >= timeout_s - 1 else f"error: {str(e)[:120]}"
            )
        finally:
            timer.cancel()
            sc.setJobGroup("rga:idle", "idle")
        wall = round(time.time() - t0, 2)
        stages = stage_skew(spark, group)
        hot = [
            s
            for s in stages
            if s["sum_ms"] >= min_stage_ms
            and s["n_tasks"] >= 4
            and s["share"] >= share_bound
        ]
        worst = max((s["share"] for s in hot), default=0.0)
        rec = {"wall": wall, "status": status, "stages": stages, "hot": hot}
        results[name] = rec
        bad = status != "ok" or bool(hot)
        if bad and name not in ALLOWLIST:
            flagged.append(name)
        mark = "SERIAL" if hot else ("FAIL" if status != "ok" else "ok")
        print(
            f"{mark:6s} {name:36s} wall={wall:7.2f}s status={status}"
            + (f" worst_share={worst}" if hot else "")
        )

    print(
        f"\n{len(flagged)} flagged of {len(names)} audited "
        f"(share >= {share_bound} on stages >= {min_stage_ms} ms, or failure)"
    )
    for n in flagged:
        print(f"  FLAG {n}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {
                    "share_bound": share_bound,
                    "min_stage_ms": min_stage_ms,
                    "flagged": flagged,
                    "queries": results,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {json_out}")
    spark.stop()
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
