"""Mechanical bench-regression gate (VERDICT r07 #6): compare a fresh
BENCH_FULL.json against the previous round's committed one and FAIL
(exit 1) on per-query regressions, so a plan change that quietly
multiplies wall or shuffled bytes fails the builder's own evidence
loop instead of waiting for a judge to diff JSON a round later.

A query regresses when it got ``--ratio`` (default 1.5×) slower AND
its old median wall was above ``--min-wall`` (default 0.5 s) — tiny
rows are boot-noise-dominated — or when its shuffle_mb grew ≥ the
ratio from above ``--min-mb`` (default 1 MB). New/removed queries and
coverage changes are reported informationally, never fatally (adding
queries is the normal round shape); a query that FAILED in the new run
(-1 sentinel) but passed before is always fatal.

Host-speed normalization: two identical-code runs taken in different
host windows measured EVERY row ~1.5–2× apart on this VM (store
builds 2× with zero code change; isolated re-timings reverted), so a
raw per-query ratio conflates "this plan regressed" with "the host
was slower". Preferred path (VERDICT r08 #1): when BOTH files carry
the ``calibration`` block bench.py records (fixed-work sha256
microbenches at suite begin/end), the gate divides by the MEASURED
host-speed ratio — a code change cannot move the microbench, so a
genuine uniform regression can never normalize itself away, and the
suite-total check is normalized by the same measured ratio. Fallback
(old files without calibration): the MEDIAN per-query ratio, clamped
to [0.77, 1.3] (tightened per ADVICE r08 — the old 1.5 clamp set the
effective per-query bar at 2.25× raw) with even-length medians
averaged; under the fallback the suite-total check stays ABSOLUTE,
since a self-referential median could mask a uniform slowdown.
``--no-normalize`` restores raw ratios; shuffle bytes are never
normalized (they are host-speed-independent).

Usage::

    python tools/bench_diff.py OLD_BENCH_FULL.json NEW_BENCH_FULL.json
    python tools/bench_diff.py --git-base HEAD           # old = committed copy

``--git-base REF`` reads the old file from git (``git show
REF:BENCH_FULL.json``) so the evidence step can diff against the last
committed state with no extra bookkeeping.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def load_bench(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def load_bench_git(ref: str, repo: str, name: str = "BENCH_FULL.json") -> dict:
    out = subprocess.run(
        ["git", "-C", repo, "show", f"{ref}:{name}"],
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout)


def calibration_speed(old: dict, new: dict) -> float | None:
    """Measured host-speed ratio new/old from the fixed-work
    microbenches bench.py records, or None when either side lacks
    them. Prefers the 32-thread bench (loads the machine the way
    local[32] does); begin/end pairs are averaged so a mid-suite host
    shift contributes half."""

    def mean_field(cal: object, field: str) -> float | None:
        if not isinstance(cal, dict):
            return None
        # per-pass boundary probes (bench schema with the burst
        # filter): the kept medians ran in the CLEAN window, so the
        # honest host-speed estimate is the best probe — averaging
        # begin/end would let one burst-hit probe overstate host
        # slowness and under-flag a real regression.
        passes = cal.get("passes")
        if isinstance(passes, list) and passes:
            vals = [
                p[field]
                for p in passes
                if isinstance(p, dict)
                and isinstance(p.get(field), (int, float))
                and p[field] > 0
            ]
            if vals:
                return min(vals)
        vals = [
            cal[k][field]
            for k in ("begin", "end")
            if isinstance(cal.get(k), dict)
            and isinstance(cal[k].get(field), (int, float))
            and cal[k][field] > 0
        ]
        return sum(vals) / len(vals) if vals else None

    oc, nc = old.get("calibration"), new.get("calibration")
    for field in ("multi_core_hash_sec", "single_core_hash_sec"):
        om, nm = mean_field(oc, field), mean_field(nc, field)
        if om and nm:
            return nm / om
    return None


def diff_bench(
    old: dict,
    new: dict,
    ratio: float = 1.5,
    min_wall: float = 0.5,
    min_mb: float = 1.0,
    normalize: bool = True,
) -> tuple[list[str], list[str]]:
    """Returns (fatal, info) finding lists. Fatal = wall or shuffle
    regression past the thresholds, or a previously-passing query now
    failing. Store rows (``store:``) use the same rules — a store
    build that got 1.5× slower is as real a regression as a query."""
    fatal: list[str] = []
    info: list[str] = []
    oq, nq = old.get("queries", {}), new.get("queries", {})
    os_mb, ns_mb = old.get("shuffle_mb", {}), new.get("shuffle_mb", {})
    speed = 1.0
    measured = None
    if normalize:
        measured = calibration_speed(old, new)
        if measured is not None:
            # sanity clamp only — a >2x microbench shift means the
            # calibration itself is suspect, not that code got faster
            speed = min(2.0, max(0.5, measured))
            if abs(speed - 1.0) > 0.05:
                info.append(
                    f"host-speed calibration: measured microbench ratio "
                    f"{measured:.2f}x applied to wall thresholds (incl. suite)"
                )
        else:
            ratios = sorted(
                nq[n] / oq[n]
                for n in set(oq) & set(nq)
                if oq[n] > min_wall and nq[n] >= 0
            )
            # need a crowd to estimate host speed; a handful of rows
            # could all be genuine regressions
            if len(ratios) >= 8:
                mid = len(ratios) // 2
                med = (
                    ratios[mid]
                    if len(ratios) % 2
                    else (ratios[mid - 1] + ratios[mid]) / 2
                )
                speed = min(1.3, max(0.77, med))
                if abs(speed - 1.0) > 0.05:
                    info.append(
                        f"host-speed normalization: median per-query ratio "
                        f"{speed:.2f}x applied to wall thresholds"
                    )
    for name in sorted(set(oq) | set(nq)):
        if name not in nq:
            info.append(f"removed: {name} (was {oq[name]}s)")
            continue
        if name not in oq:
            info.append(f"new: {name} ({nq[name]}s)")
            continue
        ow, nw = oq[name], nq[name]
        if nw < 0 and ow >= 0:
            fatal.append(f"FAILED: {name} (previously passed at {ow}s)")
            continue
        if ow < 0 and nw >= 0:
            info.append(f"recovered: {name} ({nw}s)")
            continue
        if ow > min_wall and nw >= ratio * speed * ow:
            rel = nw / (ow * speed)
            fatal.append(
                f"wall regression: {name} {ow}s -> {nw}s "
                f"({nw / ow:.2f}x raw, {rel:.2f}x host-normalized)"
            )
        omb, nmb = os_mb.get(name), ns_mb.get(name)
        if omb is not None and nmb is not None and omb > min_mb and nmb >= ratio * omb:
            fatal.append(
                f"shuffle regression: {name} {omb}MB -> {nmb}MB ({nmb / omb:.2f}x)"
            )
        elif omb is not None and nmb is None and omb > min_mb:
            info.append(f"shuffle coverage lost: {name} (was {omb}MB)")
    ov, nv = old.get("value"), new.get("value")
    if isinstance(ov, (int, float)) and isinstance(nv, (int, float)) and ov > 0:
        # Measured calibration is code-independent, so the suite check
        # can be normalized by it too; under the self-referential
        # median fallback it stays ABSOLUTE (a uniform slowdown would
        # otherwise normalize itself away).
        suite_speed = speed if measured is not None else 1.0
        if suite_speed != 1.0:
            line = (
                f"suite: {ov}s -> {nv}s ({nv / ov:.2f}x raw, "
                f"{nv / (ov * suite_speed):.2f}x host-normalized)"
            )
        else:
            line = f"suite: {ov}s -> {nv}s ({nv / ov:.2f}x)"
        (fatal if nv >= ratio * suite_speed * ov else info).append(line)
    return fatal, info


def main() -> int:
    argv = sys.argv[1:]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ratio, min_wall, min_mb = 1.5, 0.5, 1.0
    normalize = "--no-normalize" not in argv
    if not normalize:
        argv.remove("--no-normalize")
    git_base = None
    for flag, setter in (("--ratio", "ratio"), ("--min-wall", "min_wall"), ("--min-mb", "min_mb")):
        if flag in argv:
            i = argv.index(flag)
            val = float(argv[i + 1])
            if setter == "ratio":
                ratio = val
            elif setter == "min_wall":
                min_wall = val
            else:
                min_mb = val
            argv = argv[:i] + argv[i + 2 :]
    if "--git-base" in argv:
        i = argv.index("--git-base")
        git_base = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if git_base is not None:
        new_path = argv[0] if argv else os.path.join(here, "BENCH_FULL.json")
        old = load_bench_git(git_base, here)
        new = load_bench(new_path)
    else:
        if len(argv) != 2:
            print(__doc__)
            return 2
        old, new = load_bench(argv[0]), load_bench(argv[1])
    fatal, info = diff_bench(
        old, new, ratio=ratio, min_wall=min_wall, min_mb=min_mb, normalize=normalize
    )
    for line in info:
        print(f"  info: {line}")
    for line in fatal:
        print(f"REGRESSION: {line}")
    if fatal:
        print(f"bench_diff: {len(fatal)} regression(s)")
        return 1
    print("bench_diff: clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
