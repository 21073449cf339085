"""Same-window A/B for the DECIMAL(38,0) exactness discipline
(VERDICT r09 #6): the r8→r9 t-closeness regression (1.96→3.17 s)
coincided with moving its TVD numerator from int64 to DECIMAL(38,0) —
a justified wrap-proofing (bigint wraps silently past n ≳ 3·10⁶) —
but its real cost was mixed with host-window noise across rounds.
This tool times the int64 and DECIMAL expressions BACK-TO-BACK,
alternating A/B/A/B within one session so both sides share the same
host weather, on the two shapes that carry the discipline:

1. ``tvd``   — the E93 per-class TVD aggregate (sum of |c·n − g·nc|
   products over the class×sensitive table, then the guarded ppm
   quotient), replicated inline with the numeric type as the only
   difference (`extensions/privacy.py:216-251`).
2. ``cents`` — the A4-style grouped money sum over lineitem cents
   (`plans/star_queries.py` a4 wrap-proof wrap).

Usage::

    python tools/decimal_ab.py [--sf-dir /root/testdata/sf0.1]
        [--star-x10 .scaledata/star_x10] [--reps 5] [--json OUT]

Prints per-shape medians and the decimal/int64 ratio; appends nothing
— paste the JSON into SCALING.md (round-10 section).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from train_reports_etl_spark.session import get_spark


def _tvd_frames(spark, sf_dir: str):
    """The persisted class×sensitive base + its satellite frames —
    built ONCE so the A/B times only the numerics, not the scan."""
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    base = (
        cust.select(
            F.col("c_nationkey").cast("long").alias("nation"),
            F.expr("cast(round(c_acctbal * 100) as bigint) div 100000").alias("bb"),
            F.col("c_mktsegment").alias("sensitive"),
        )
        .groupBy("nation", "bb", "sensitive")
        .agg(F.count("*").cast("long").alias("c"))
        .persist()
    )
    base.count()
    glob = base.groupBy("sensitive").agg(F.sum("c").cast("long").alias("g"))
    tot = base.agg(F.sum("c").cast("long").alias("n"))
    cls = (
        base.select(
            F.concat_ws("|", F.col("nation"), F.col("bb")).alias("ck"),
            "sensitive",
            "c",
        )
        .groupBy("ck", "sensitive")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    nc = cls.groupBy("ck").agg(F.sum("c").cast("long").alias("nc"))
    return base, cls.join(nc, "ck").join(F.broadcast(glob), "sensitive").crossJoin(
        F.broadcast(tot)
    )


def tvd_query(joined, numeric: str):
    """The E93 per-class aggregate with ``numeric`` as the only knob."""
    cast = lambda e: f"cast({e} as {numeric})"  # noqa: E731
    num = (
        f"{cast('1000000')} * ({cast('present_num')}"
        f" + {cast('nc')} * ({cast('n')} - {cast('g_present')}))"
    )
    per_class = (
        joined.groupBy("ck", "nc", "n")
        .agg(
            F.sum(
                F.abs(F.expr(cast("c")) * F.expr(cast("n")) - F.expr(cast("g")) * F.expr(cast("nc")))
            )
            .cast(numeric)
            .alias("present_num"),
            F.sum("g").cast("long").alias("g_present"),
        )
        .select(
            F.expr(
                f"cast(({num}) div ({cast('2')} * {cast('nc')} * {cast('n')}) as bigint)"
            ).alias("tvd_ppm"),
            "nc",
        )
    )
    return per_class.agg(
        F.count("*").alias("k"), F.max("tvd_ppm").alias("mx"), F.sum("nc").alias("s")
    )


def cents_query(li, numeric: str):
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.expr(f"cast(round(l_extendedprice * 100) as {numeric})")).alias("s"),
        F.sum(
            F.expr(f"cast(round(l_extendedprice * 100) as {numeric})")
            * F.expr(f"cast(100 - round(l_discount * 100) as {numeric})")
        ).alias("rev"),
    )


def ab(name: str, build, reps: int, out: dict):
    walls = {"bigint": [], "decimal(38,0)": []}
    results = {}
    for _ in range(reps):
        for numeric in ("bigint", "decimal(38,0)"):
            t0 = time.time()
            rows = build(numeric).collect()
            walls[numeric].append(time.time() - t0)
            # normalize Decimal vs int before comparing: the two sides
            # must agree NUMERICALLY (repr differs by type)
            results[numeric] = sorted(
                tuple(int(v) if isinstance(v, (int, float)) or hasattr(v, "as_tuple")
                      else v for v in r)
                for r in rows
            )
    med = {k: round(statistics.median(v), 3) for k, v in walls.items()}
    ratio = round(med["decimal(38,0)"] / med["bigint"], 3) if med["bigint"] else -1.0
    same = results["bigint"] == results["decimal(38,0)"]
    out[name] = {
        "median_bigint_sec": med["bigint"],
        "median_decimal_sec": med["decimal(38,0)"],
        "decimal_over_int64": ratio,
        "all_walls": {k: [round(x, 3) for x in v] for k, v in walls.items()},
        "results_equal": same,
    }
    print(
        f"{name:8s} int64={med['bigint']:.3f}s decimal={med['decimal(38,0)']:.3f}s "
        f"ratio={ratio}x results_equal={same}"
    )


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    star10 = os.path.join(here, ".scaledata", "star_x10")
    reps = 5
    json_out = None
    if "--sf-dir" in argv:
        sf_dir = argv[argv.index("--sf-dir") + 1]
    if "--star-x10" in argv:
        star10 = argv[argv.index("--star-x10") + 1]
    if "--reps" in argv:
        reps = int(argv[argv.index("--reps") + 1])
    if "--json" in argv:
        json_out = argv[argv.index("--json") + 1]

    spark = get_spark("decimal-ab")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": sf_dir, "reps": reps}

    base, joined = _tvd_frames(spark, sf_dir)
    ab("tvd", lambda n: tvd_query(joined, n), reps, out)
    base.unpersist()

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).persist()
    li.count()
    ab("cents", lambda n: cents_query(li, n), reps, out)
    li.unpersist()

    if os.path.isdir(star10):
        li10 = spark.read.parquet(os.path.join(star10, "lineitem.parquet")).persist()
        li10.count()
        ab("cents_x10", lambda n: cents_query(li10, n), reps, out)
        li10.unpersist()
        base10, joined10 = _tvd_frames(spark, star10)
        ab("tvd_x10", lambda n: tvd_query(joined10, n), reps, out)
        base10.unpersist()

    print(json.dumps({k: v for k, v in out.items() if isinstance(v, dict)}))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
