"""Operator-inventory queries over the driver star schema.

Each query exercises one operator family from SURVEY.md §2, phrased
against the TPC-H-ish tables (TESTDATA.md) with a DuckDB oracle.
Money/quantity aggregates are EXACT integers (cents / centi-cents —
the 2-dp source columns quantize losslessly and integer sums are
order-stable on both engines); ratios of exact integers are single
divisions, bit-identical cross-engine. Raw pass-through doubles are
left exact. ROUND over a float SUM is banned: it is order-dependent
in the last ulp and only hashes green while no group sits within an
ulp of a rounding boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from train_reports_etl_spark.functions import (
    blank_to_null,
    clean_phone,
    coerce_double,
    coerce_timestamp,
    conditional_day_shift,
    day_abbrev,
    fmt_date,
    iso_week,
    seconds_of_day,
)
from train_reports_etl_spark.operators import (
    consecutive_date_ranges,
    join_aggregated,
    keep_last_dedup,
    missing_keys,
    null_split,
    semi_join,
    union_all,
)
from train_reports_etl_spark.plans.registry import query
from train_reports_etl_spark.sources.registry import load_table


# --------------------------------------------------------------------------
# Flagship: W1 keep-last + J1 broadcast dimension chain (SURVEY §7.2 M0)
# --------------------------------------------------------------------------

_FLAGSHIP_ORACLE = """
WITH ranked AS (
  SELECT o.*,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders o
)
SELECT c.c_custkey  AS custkey,
       c.c_name     AS customer_name,
       n.n_name     AS nation_name,
       r.r_name     AS region_name,
       k.o_orderkey   AS latest_orderkey,
       k.o_orderdate  AS latest_orderdate,
       k.o_totalprice AS latest_totalprice
FROM ranked k
JOIN customer c ON k.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE k.rn = 1
"""


@query("flagship_latest_order", _FLAGSHIP_ORACLE)
def flagship_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer latest order enriched through the dimension chain.

    W1 keep-last (`reports_exporter_v0.83.py:1752-1787`) + J1 broadcast
    lookups (`:627-628`). One shuffle (by o_custkey for the window);
    the three dimension joins are broadcast — fact side never moves.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    latest, _dups = keep_last_dedup(orders, ["o_custkey"], ["o_orderdate", "o_orderkey"])
    return (
        latest.join(F.broadcast(customer), latest["o_custkey"] == customer["c_custkey"], "inner")
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"], "inner")
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"], "inner")
        .select(
            customer["c_custkey"].alias("custkey"),
            customer["c_name"].alias("customer_name"),
            nation["n_name"].alias("nation_name"),
            region["r_name"].alias("region_name"),
            latest["o_orderkey"].alias("latest_orderkey"),
            latest["o_orderdate"].alias("latest_orderdate"),
            latest["o_totalprice"].alias("latest_totalprice"),
        )
    )


# --------------------------------------------------------------------------
# Aggregations (A1–A6)
# --------------------------------------------------------------------------

@query(
    "a1_min_per_key",
    """
    SELECT l_orderkey,
           MIN(l_shipdate) AS min_shipdate,
           CAST(COUNT(*) AS INT) AS n_lines
    FROM lineitem GROUP BY l_orderkey
    """,
)
def a1_min_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — group-by MIN (`reports_exporter_v0.83.py:689-694`): earliest
    ship date per order. Partial+final hash agg; shuffle carries one row
    per key."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("min_shipdate"),
        F.count("*").cast("int").alias("n_lines"),
    )


@query(
    "a2_a6_global_extents",
    """
    SELECT MAX(o_totalprice) AS max_price,
           MIN(o_orderdate)  AS first_date,
           MAX(o_orderdate)  AS last_date,
           CAST(DATEDIFF('day', MIN(o_orderdate), MAX(o_orderdate)) + 1 AS INT) AS day_span
    FROM orders
    """,
)
def a2_a6_global_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 global MAX (`:253`) + A6 min/max date span (`:1257-1259`).
    Single-row result; parquet footer stats make this near-free."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.max("o_totalprice").alias("max_price"),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
        (F.datediff(F.max("o_orderdate"), F.min("o_orderdate")) + 1).cast("int").alias("day_span"),
    )


@query(
    "a3_distinct_sorted",
    """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def a3_distinct_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — DISTINCT over a low-cardinality pair (`:1307,1406,1493`);
    map-side partial dedup keeps the shuffle tiny."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@query(
    "a4_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_base_price_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
             AS BIGINT) AS sum_disc_price_cc,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                    * (100 + CAST(ROUND(l_tax * 100) AS BIGINT)))
             AS BIGINT) AS sum_charge_ccm,
           CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS DOUBLE) / COUNT(*)
             AS avg_qty,
           CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE)
             / (COUNT(*) * 100) AS avg_disc,
           CAST(COUNT(*) AS INT) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a4_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4-family rollup in TPC-H Q1 shape — multi-aggregate hash agg
    with arithmetic inside the aggregate (all JVM-side codegen).

    All money/quantity sums are EXACT integers: cents, centi-cents
    (× (100−disc%)), and centi-milli-cents (× (100+tax%)) — the 2-dp
    source columns quantize losslessly, integer sums are order-stable
    on both engines, and the averages are single divisions of exact
    integers (bit-identical doubles cross-engine). The former
    ROUND(SUM(double), 2) form was only green while no group's float
    sum sat within an ulp of a .005 boundary. The cc/ccm products are
    computed per-row in BIGINT (max ≈ 1.2e11, no wrap risk) then
    widened to decimal(38,0) before the SUM, matching DuckDB's
    BIGINT→HUGEINT accumulation — no sf the schema supports can wrap
    the Spark sum. The final BIGINT output cast is the only bound
    left (≈ sf50 for sum_charge_ccm): past it Spark yields NULL
    (non-ANSI) and DuckDB errors — loud, never silently wrong."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("long")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    tax_pct = F.round(F.col("l_tax") * 100).cast("long")
    keep = F.lit(100) - disc_pct
    taxmul = F.lit(100) + tax_pct
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).alias("sum_qty"),
        F.sum(cents.cast("decimal(38,0)")).cast("long").alias("sum_base_price_cents"),
        F.sum((cents * keep).cast("decimal(38,0)")).cast("long").alias("sum_disc_price_cc"),
        F.sum((cents * keep * taxmul).cast("decimal(38,0)")).cast("long").alias("sum_charge_ccm"),
        (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
        (F.sum(disc_pct).cast("double") / (F.count("*") * 100)).alias("avg_disc"),
        F.count("*").cast("int").alias("count_order"),
    )


@query(
    "a7_rollup_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
             AS BIGINT) AS revenue_cc,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a7_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-reference aggregate: ROLLUP hierarchy (flag, flag+status,
    grand total) in ONE pass — Catalyst expands the grouping sets into
    a single Expand + hash aggregate, not three scans. Revenue is the
    exact centi-cent BIGINT (cents × (100−disc%)) — order-stable on
    both engines, unlike the former ROUND(SUM(double), 2)."""
    li = load_table(spark, sf_dir, "lineitem")
    cc = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
    )
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(cc).alias("revenue_cc"),
        F.count("*").cast("long").alias("n_items"),
    )


@query(
    "a8_distinct_and_filtered",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)  AS n_suppliers,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS BIGINT)
             AS n_discounted
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a8_distinct_and_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-reference aggregate: exact multi-column COUNT(DISTINCT)
    (planned as Expand + two-phase aggregate — distinct keys shuffle,
    not rows) plus a conditional count in the same pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").cast("long").alias("n_suppliers"),
        F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).cast("long").alias("n_discounted"),
    )


@query(
    "a9_percentiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.25) AS p25,
           quantile_cont(l_extendedprice, 0.50) AS p50,
           quantile_cont(l_extendedprice, 0.95) AS p95
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a9_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-reference aggregate: exact interpolated percentiles
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont`` bit-for-bit —
    property-proven on generated inputs in
    tests/test_cross_engine_properties.py; the single divergence is
    the SIGN of a zero result — Spark sorts -0.0 < +0.0, SQL compares
    them equal — which positive prices can never hit). At 100 TB swap
    for ``approx_percentile`` (t-digest) when exactness isn't
    required; the exact form shuffles per-group sorted buffers.

    One ``percentile`` aggregate over an ARRAY of percentages, not
    three scalar aggregates: each scalar ``percentile`` keeps its own
    copy of every value in its buffer, so the 3-scalar form buffered
    and shuffled the price column three times (guide §2.3 — shuffle
    fewer bytes; r10 opt: 3.2 → 2.2 s isolated, partial-agg bytes ÷3,
    identical interpolation arithmetic on the same sorted buffer)."""
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.percentile("l_extendedprice", F.lit([0.25, 0.50, 0.95]))
    return li.groupBy("l_returnflag").agg(pct.alias("pcts")).select(
        "l_returnflag",
        F.col("pcts")[0].alias("p25"),
        F.col("pcts")[1].alias("p50"),
        F.col("pcts")[2].alias("p95"),
    )


# --------------------------------------------------------------------------
# Joins (J1–J4)
# --------------------------------------------------------------------------

@query(
    "j1_lineitem_part_lookup",
    """
    SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice,
           p.p_brand, p.p_type
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def j1_lineitem_part_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — fact ⟕ small dim with forced broadcast (`:627-628`): the
    lineitem side is never shuffled, which is the only viable plan when
    the fact table is 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"], "left")
    return joined.select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "p_brand", "p_type"
    )


@query(
    "j2_missing_lookup_keys",
    """
    SELECT DISTINCT o.o_custkey
    FROM orders o LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 0) c
      ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    """,
)
def j2_missing_lookup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — join-miss detection (`:631-637`): distinct fact keys whose
    dimension lookup failed (dimension restricted to positive balances
    to force misses)."""
    o = load_table(spark, sf_dir, "orders")
    dim = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    joined = o.join(F.broadcast(dim), o["o_custkey"] == dim["c_custkey"], "left")
    return missing_keys(joined, "c_custkey", "o_custkey")


@query(
    "j3_join_aggregated_subquery",
    """
    SELECT o.o_orderkey, o.o_orderdate, m.min_shipdate
    FROM orders o
    LEFT JOIN (SELECT l_orderkey, MIN(l_shipdate) AS min_shipdate
               FROM lineitem GROUP BY l_orderkey) m
      ON o.o_orderkey = m.l_orderkey
    """,
)
def j3_join_aggregated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3+A1 — left join to a per-key aggregate (`:686-699`: min
    operation time per ticket joined back to the fact)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    return join_aggregated(
        o, li, "o_orderkey", {"min_shipdate": "min(l_shipdate)"}, how="left"
    ).select("o_orderkey", "o_orderdate", "min_shipdate")


@query(
    "j4_semi_join",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
)
def j4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — semi-join replaces the reference's literal ``IN (...)`` list
    pushdown (`:686-694`); broadcast left-semi, no row duplication."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return semi_join(o, F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"))), "o_custkey").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


# --------------------------------------------------------------------------
# Windows (W1, W2)
# --------------------------------------------------------------------------

@query(
    "w1_keep_last_dedup",
    """
    SELECT o_custkey, o_orderkey AS last_orderkey, o_orderdate AS last_orderdate,
           o_totalprice AS last_totalprice
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders)
    WHERE rn = 1
    """,
)
def w1_keep_last_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — keep-last dedup via row_number (`:1752-1787`), with
    o_orderkey as the deterministic tiebreaker (SURVEY §7.4)."""
    o = load_table(spark, sf_dir, "orders")
    kept, _ = keep_last_dedup(o, ["o_custkey"], ["o_orderdate", "o_orderkey"])
    return kept.select(
        "o_custkey",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_orderdate").alias("last_orderdate"),
        F.col("o_totalprice").alias("last_totalprice"),
    )


@query(
    "w1_duplicates_quarantine",
    """
    SELECT o_custkey, o_orderkey, o_orderdate
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders)
    WHERE rn > 1
    """,
)
def w1_duplicates_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 complement — the quarantined duplicate rows (`:1774-1787`)."""
    o = load_table(spark, sf_dir, "orders")
    _, dups = keep_last_dedup(o, ["o_custkey"], ["o_orderdate", "o_orderkey"])
    return dups.select("o_custkey", "o_orderkey", "o_orderdate")


@query(
    "w2_gaps_and_islands",
    """
    WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events WHERE ts IS NOT NULL),
    flagged AS (
      SELECT d, CASE WHEN d - LAG(d) OVER (ORDER BY d) = 1 THEN 0 ELSE 1 END AS brk
      FROM d),
    isl AS (SELECT d, SUM(brk) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS island
            FROM flagged)
    SELECT STRFTIME(MIN(d), '%Y-%m-%d') AS range_start,
           STRFTIME(MAX(d), '%Y-%m-%d') AS range_end,
           CAST(COUNT(*) AS INT) AS n_days
    FROM isl GROUP BY island
    """,
)
def w2_gaps_and_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — consecutive-date streaks over event days (`:1253-1298`).

    Range bounds emitted as ISO strings (not DATE) so the oracle compare
    is independent of pandas' date/datetime dtype mapping.
    """
    ev = load_table(spark, sf_dir, "events")
    ranges = consecutive_date_ranges(ev, "ts")
    return ranges.select(
        fmt_date("range_start").alias("range_start"),
        fmt_date("range_end").alias("range_end"),
        "n_days",
    )


# --------------------------------------------------------------------------
# Filters / splits / set ops (P1–P5, U1)
# --------------------------------------------------------------------------

_P2_REQUIRED_SQL = "NULLIF(l_returnflag, 'N') IS NOT NULL AND NULLIF(l_shipdate, TIMESTAMP '2024-01-01') IS NOT NULL"


@query(
    "p2_null_split_good",
    f"""
    SELECT l_orderkey, l_linenumber,
           NULLIF(l_returnflag, 'N') AS flag_req,
           NULLIF(l_shipdate, TIMESTAMP '2024-01-01') AS ship_req
    FROM lineitem
    WHERE {_P2_REQUIRED_SQL}
    """,
)
def p2_null_split_good(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — required-non-null split, good side (`:593-594`). Nulls are
    injected deterministically (NULLIF) since the star tables are clean."""
    li = _p2_frame(spark, sf_dir)
    good, _bad = null_split(li, ["flag_req", "ship_req"])
    return good


@query(
    "p2_null_split_bad",
    f"""
    SELECT l_orderkey, l_linenumber,
           NULLIF(l_returnflag, 'N') AS flag_req,
           NULLIF(l_shipdate, TIMESTAMP '2024-01-01') AS ship_req
    FROM lineitem
    WHERE NOT ({_P2_REQUIRED_SQL})
    """,
)
def p2_null_split_bad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — the quarantined complement (`:593-603`)."""
    li = _p2_frame(spark, sf_dir)
    _good, bad = null_split(li, ["flag_req", "ship_req"])
    return bad


def _p2_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_returnflag"), F.lit("N")).alias("flag_req"),
        F.nullif(F.col("l_shipdate"), F.lit("2024-01-01").cast("timestamp")).alias("ship_req"),
    )


@query(
    "u1_union_all",
    """
    SELECT l_returnflag, CAST(COUNT(*) AS INT) AS n
    FROM (SELECT l_returnflag FROM lineitem WHERE l_linenumber <= 3
          UNION ALL
          SELECT l_returnflag FROM lineitem WHERE l_linenumber > 3)
    GROUP BY l_returnflag
    """,
)
def u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — schema-aligned UNION ALL (`:1740`), verified by re-aggregating
    the recombined halves."""
    li = load_table(spark, sf_dir, "lineitem")
    lo = li.filter(F.col("l_linenumber") <= 3).select("l_returnflag")
    hi = li.filter(F.col("l_linenumber") > 3).select("l_returnflag")
    return union_all([lo, hi]).groupBy("l_returnflag").agg(F.count("*").cast("int").alias("n"))


# --------------------------------------------------------------------------
# Scalar layer (F1–F15)
# --------------------------------------------------------------------------

@query(
    "f1_f2_coercing_casts",
    """
    SELECT l_orderkey, l_linenumber,
           TRY_CAST(qty_str AS DOUBLE) AS qty_num,
           TRY_STRPTIME(ship_str, '%Y-%m-%d %H:%M:%S') AS ship_ts
    FROM (SELECT l_orderkey, l_linenumber,
                 CASE WHEN l_linenumber = 1 THEN 'not-a-number'
                      WHEN l_linenumber = 3 THEN CAST(l_quantity AS VARCHAR) || 'd'
                      WHEN l_linenumber = 4 THEN '0x1.8p1'
                      WHEN l_linenumber = 5 THEN ' ' || CAST(l_quantity AS VARCHAR) || ' '
                      WHEN l_linenumber = 6 THEN CAST(l_quantity AS VARCHAR) || 'f'
                      ELSE CAST(l_quantity AS VARCHAR) END AS qty_str,
                 CASE WHEN l_linenumber = 2 THEN 'garbage'
                      ELSE STRFTIME(l_shipdate, '%Y-%m-%d %H:%M:%S') END AS ship_str
          FROM lineitem)
    """,
)
def f1_f2_coercing_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2 — null-on-error casts (`:545-564`): strings round-tripped
    through text with injected garbage; bad values → NULL, rows kept.
    Lines 3/4/6 inject Java-lenience literals (type-suffixed numbers,
    hex floats) that ``Double.parseDouble`` would accept but
    ``pd.to_numeric`` / DuckDB ``TRY_CAST`` null — pinning the round-9
    F2 regex gate against the oracle forever. Line 5 pins the shared
    whitespace-trim acceptance.

    Scans under ``repartition_if_coarse`` (r10): per-row regex gate +
    timestamp parse is the expression-heavy fused-scan class — a
    single-row-group 600k-row lineitem otherwise parses on one core
    (measured 2.0 → 1.2 s at sf0.1)."""
    from train_reports_etl_spark.util import repartition_if_coarse

    li = repartition_if_coarse(
        load_table(spark, sf_dir, "lineitem"), min_rows=10_000
    )
    qty_s = F.col("l_quantity").cast("string")
    staged = li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_linenumber") == 1, F.lit("not-a-number"))
        .when(F.col("l_linenumber") == 3, F.concat(qty_s, F.lit("d")))
        .when(F.col("l_linenumber") == 4, F.lit("0x1.8p1"))
        .when(F.col("l_linenumber") == 5, F.concat(F.lit(" "), qty_s, F.lit(" ")))
        .when(F.col("l_linenumber") == 6, F.concat(qty_s, F.lit("f")))
        .otherwise(qty_s)
        .alias("qty_str"),
        F.when(F.col("l_linenumber") == 2, F.lit("garbage"))
        .otherwise(F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss"))
        .alias("ship_str"),
    )
    return staged.select(
        "l_orderkey",
        "l_linenumber",
        coerce_double("qty_str").alias("qty_num"),
        coerce_timestamp("ship_str").alias("ship_ts"),
    )


@query(
    "f3_f7_datetime_scalars",
    """
    SELECT o_orderkey,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date_str,
           STRFTIME(o_orderdate, '%a')       AS order_dow,
           CAST(WEEKOFYEAR(o_orderdate) AS INT) AS order_week,
           SUBSTRING(o_orderpriority, 1, 2)  AS priority_code,
           CONCAT(CAST(o_custkey AS VARCHAR), ' - ', o_orderstatus) AS cust_status_key
    FROM orders
    """,
)
def f3_f7_datetime_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 format / F4 dow / F5 ISO week / F6 prefix / F7 concat key
    (`:640-652`) — all whole-stage-codegen expressions."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        fmt_date("o_orderdate").alias("order_date_str"),
        day_abbrev("o_orderdate").alias("order_dow"),
        iso_week("o_orderdate").cast("int").alias("order_week"),
        F.substring("o_orderpriority", 1, 2).alias("priority_code"),
        F.concat_ws(" - ", F.col("o_custkey").cast("string"), "o_orderstatus").alias("cust_status_key"),
    )


@query(
    "f8_f9_phone_clean",
    """
    SELECT c_custkey,
           CASE WHEN starts_with(phone, pfx)
                THEN SUBSTRING(REPLACE(SUBSTRING(phone, LENGTH(pfx) + 1), '-', ''), 1, 14)
                ELSE SUBSTRING(REPLACE(phone, '-', ''), 1, 14)
           END AS phone_clean
    FROM (SELECT c_custkey,
                 '+' || CAST(c_nationkey AS VARCHAR) AS pfx,
                 CASE WHEN c_custkey % 3 = 0
                      THEN '+' || CAST(c_nationkey AS VARCHAR) || '-' || CAST(c_custkey * 7919 AS VARCHAR) || '-00-11-22'
                      ELSE CAST(c_custkey * 7919 AS VARCHAR) || '-99'
                 END AS phone
          FROM customer)
    """,
)
def f8_f9_phone_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8/F9/X1 — the reference's only UDF (`:724-736`) as pure
    expressions: strip per-row prefix, drop dashes, truncate to 14."""
    c = load_table(spark, sf_dir, "customer")
    staged = c.select(
        "c_custkey",
        F.concat(F.lit("+"), F.col("c_nationkey").cast("string")).alias("pfx"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(
                F.lit("+"), F.col("c_nationkey").cast("string"), F.lit("-"),
                (F.col("c_custkey") * 7919).cast("string"), F.lit("-00-11-22"),
            ),
        )
        .otherwise(F.concat((F.col("c_custkey") * 7919).cast("string"), F.lit("-99")))
        .alias("phone"),
    )
    return staged.select("c_custkey", clean_phone("phone", "pfx").alias("phone_clean"))


@query(
    "f10_blank_to_null",
    """
    SELECT c_custkey,
           CASE WHEN TRIM(v) = '' THEN NULL ELSE v END AS v_norm
    FROM (SELECT c_custkey,
                 CASE WHEN c_custkey % 5 = 0 THEN ''
                      WHEN c_custkey % 5 = 1 THEN ' '
                      ELSE c_mktsegment END AS v
          FROM customer)
    """,
)
def f10_blank_to_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 — blank/whitespace → NULL (`:997-998`; intended-semantics fix
    of the reference's stale-df bug, SURVEY §7.4)."""
    c = load_table(spark, sf_dir, "customer")
    staged = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 == 0, F.lit(""))
        .when(F.col("c_custkey") % 5 == 1, F.lit(" "))
        .otherwise(F.col("c_mktsegment"))
        .alias("v"),
    )
    return staged.select("c_custkey", blank_to_null("v").alias("v_norm"))


@query(
    "f11_vat_fold",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * 1.15 AS price_gross
    FROM lineitem
    """,
)
def f11_vat_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 — VAT gross-up ×1.15 (`:1001-1002`). No rounding: a single
    IEEE multiply is bit-deterministic, so Spark and the oracle agree
    exactly (rounding is reserved for order-sensitive aggregates)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * 1.15).alias("price_gross"),
    )


@query(
    "f12_f13_conditional_day_shift",
    """
    SELECT event_id, ts,
           CASE WHEN (EXTRACT(HOUR FROM ts) * 3600 + EXTRACT(MINUTE FROM ts) * 60
                      + CAST(EXTRACT(SECOND FROM ts) AS INT)) <= 18000
                THEN ts - INTERVAL 1 DAY ELSE ts END AS service_ts
    FROM events
    """,
)
def f12_f13_conditional_day_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12/F13 — early-train service-date rule (`:674-679`): events at or
    before 05:00 belong to the previous service day. Time-of-day compared
    as seconds since midnight (Spark has no TIME type)."""
    ev = load_table(spark, sf_dir, "events")
    early = seconds_of_day("ts") <= 5 * 3600
    return ev.select("event_id", "ts", conditional_day_shift("ts", early).alias("service_ts"))


@query(
    "f16_json_props",
    """
    WITH k AS (
      SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(MAX(k) AS BIGINT) AS max_k
    FROM k GROUP BY 1
    """,
)
def f16_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16 — semi-structured access: parse the events JSON payload once
    (`from_json` with an explicit schema — N `get_json_object` calls
    would re-parse the string N times) and aggregate a typed field.
    Catalyst prunes JsonToStructs to the accessed fields."""
    from train_reports_etl_spark.functions.json_fns import parse_props

    ev = load_table(spark, sf_dir, "events")
    typed = parse_props(ev, "k bigint")
    return typed.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
    )


@query(
    "w3_scd2_intervals",
    """
    SELECT user_id, event_id, event_type, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
    FROM events
    """,
)
def w3_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — SCD2 validity intervals: each user event is effective until
    the user's next event (NULL valid_to ⇒ current). One lead() window,
    one shuffle by key; deterministic under timestamp ties via the
    event_id tiebreak."""
    from train_reports_etl_spark.operators.temporal import validity_intervals

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    return validity_intervals(
        ev, ["user_id"], ts_col="ts", tiebreak_cols=["event_id"],
        attr_cols=["event_id", "event_type"],
    )


@query(
    "o4_topk_per_group",
    """
    WITH rev AS (
      SELECT n.n_name, l.l_partkey,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
               AS BIGINT) AS revenue_cc
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY 1, 2),
    r AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
                 PARTITION BY n_name ORDER BY revenue_cc DESC, l_partkey) AS INT) AS rk
      FROM rev)
    SELECT n_name, rk, l_partkey, revenue_cc FROM r WHERE rk <= 3
    """,
)
def o4_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 — top-3 parts by revenue per supplier nation. The rank ≤ k
    predicate triggers Spark's window group-limit: each partition keeps
    k rows of heap state per group inside the sort instead of ranking
    the whole group — the per-group analogue of TakeOrderedAndProject.
    Revenue is the exact centi-cent BIGINT, so the rank ORDER itself
    is deterministic cross-engine (a float-sum rank could flip the
    top-3 membership on an ulp)."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name", "l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
            ).alias("revenue_cc")
        )
    )
    from pyspark.sql.window import Window as _W

    w = _W.partitionBy("n_name").orderBy(F.col("revenue_cc").desc(), "l_partkey")
    return (
        rev.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
        .select("n_name", "rk", "l_partkey", "revenue_cc")
    )


@query(
    "a10_pivot_event_types",
    """
    SELECT user_id % 10 AS user_mod,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
           CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
           CAST(COUNT(CASE WHEN event_type = 'scroll' THEN 1 END) AS BIGINT) AS scroll,
           CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
    FROM events GROUP BY 1
    """,
)
def a10_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — pivot: event counts per user-bucket, one column per event
    type. Explicit value list ⇒ single-pass conditional aggregation (no
    second distinct-values job, fixed output schema — mandatory at
    scale; an unlisted pivot must first scan for distinct keys)."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy((F.col("user_id") % 10).alias("user_mod"))
        .pivot("event_type", ["click", "error", "purchase", "scroll", "view"])
        .count()
    )
    return out.select(
        "user_mod",
        *[F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
          for c in ["click", "error", "purchase", "scroll", "view"]],
    )


@query(
    "dq_orders_constraints",
    """
    WITH a AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_key_complete,
             CAST(SUM(CASE WHEN NOT (o_totalprice IS NOT NULL AND o_totalprice BETWEEN 0 AND 1000000) THEN 1 ELSE 0 END) AS BIGINT) AS v_price_range,
             CAST(SUM(CASE WHEN NOT COALESCE(o_orderstatus IN ('O', 'F', 'P'), FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_status_domain,
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v_key_unique
      FROM orders)
    SELECT check_name, n_rows, n_violations, n_violations = 0 AS passed FROM (
      SELECT 'key_complete' AS check_name, n_rows, v_key_complete AS n_violations FROM a
      UNION ALL SELECT 'key_unique', n_rows, v_key_unique FROM a
      UNION ALL SELECT 'price_range', n_rows, v_price_range FROM a
      UNION ALL SELECT 'status_domain', n_rows, v_status_domain FROM a)
    ORDER BY check_name
    """,
)
def dq_orders_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ — declarative constraint report over orders: completeness,
    range, value-domain and key-uniqueness checks folded into ONE
    aggregation pass (deequ's single-scan insight — N checks must not
    mean N scans of a 100 TB table). Generalizes the reference's
    structural input validation (header sniff `:214-260`, required-null
    split `:771-778`, join-miss assert `:640-647`)."""
    from train_reports_etl_spark.operators.quality import (
        check_table,
        completeness,
        in_range,
        is_in,
    )

    orders = load_table(spark, sf_dir, "orders")
    return check_table(
        orders,
        {
            "key_complete": completeness("o_orderkey"),
            "price_range": in_range("o_totalprice", 0, 1_000_000),
            "status_domain": is_in("o_orderstatus", ["O", "F", "P"]),
        },
        unique_keys={"key_unique": ["o_orderkey"]},
    )


@query(
    "w4_rolling_hour_window",
    """
    SELECT event_id, user_id, ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_prev_hour,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT)
             AS sum_prev_hour_cents
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts
      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def w4_rolling_hour_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — event-time RANGE frame: per user, count/sum of activity in
    the trailing hour at every event. Spark's rangeBetween needs a
    numeric ordering key, so the frame rides epoch seconds — same
    shuffle shape as any per-key window (one exchange by user_id).
    The rolling sum is exact integer cents: DuckDB evaluates sliding
    frames with a segment tree (different float summation order than
    Spark's running frame), so only an integer sum is order-proof."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window as _W

    from train_reports_etl_spark.functions.datetime_fns import epoch_micros

    # epoch_micros handles both units the driver testdata has shipped:
    # TIMESTAMP_NTZ (micros parquet) via timezone-independent interval
    # arithmetic, TIMESTAMP (the nanos-rebuild path) via unix_micros.
    is_ntz = ev.schema["ts"].dataType.typeName() == "timestamp_ntz"
    w = (
        _W.partitionBy("user_id")
        .orderBy(epoch_micros(F.col("ts"), is_ntz))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).cast("long").alias("n_prev_hour"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .over(w)
        .alias("sum_prev_hour_cents"),
    )


@query(
    "w5_window_analytics",
    """
    SELECT event_id, user_id, ts,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM (SELECT * FROM events WHERE event_type = 'purchase')
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w5_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 — ordered analytics sampler per user purchase history: lag /
    lead neighbors, quartile bucket, percent_rank, cume_dist. One
    shuffle by user_id serves all five functions (same window spec ⇒
    one WindowExec); rank ratios are exact int/int divisions. Ordering
    is total (ts, event_id) so every function is deterministic."""
    from pyspark.sql.window import Window as _W

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = _W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "a11_cube_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS base_price_cents,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def a11_cube_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 — CUBE: all four grouping-set combinations in ONE pass (the
    expand operator replicates each input row per set BEFORE the
    shuffle, so it's still a single hash agg, not four scans).
    grouping_id disambiguates real NULL keys from subtotal rows —
    emitted identically by both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    gid = (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).cast("int")
    return li.cube("l_returnflag", "l_linestatus").agg(
        gid.alias("gid"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "base_price_cents"
        ),
        F.count("*").cast("long").alias("n_items"),
    )


@query(
    "u2_except_intersect",
    """
    WITH cur AS (SELECT DISTINCT c_nationkey FROM customer WHERE c_acctbal > 0),
    sup AS (SELECT DISTINCT s_nationkey FROM supplier)
    SELECT 'customer_only' AS side, CAST(c_nationkey AS BIGINT) AS nationkey
    FROM (SELECT c_nationkey FROM cur EXCEPT SELECT s_nationkey FROM sup)
    UNION ALL
    SELECT 'both', CAST(c_nationkey AS BIGINT)
    FROM (SELECT c_nationkey FROM cur INTERSECT SELECT s_nationkey FROM sup)
    """,
)
def u2_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — set difference and intersection (§2.7): nations with
    positive-balance customers split by supplier presence. Both plan as
    aggregate-keyed joins (EXCEPT ⇒ left-anti, INTERSECT ⇒ left-semi
    over distinct keys) — no sort, shuffle carries distinct keys only."""
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    cur = cust.filter(F.col("c_acctbal") > 0).select("c_nationkey").distinct()
    sn = sup.select(F.col("s_nationkey").alias("c_nationkey")).distinct()
    only = cur.exceptAll(sn).select(
        F.lit("customer_only").alias("side"), F.col("c_nationkey").cast("long").alias("nationkey")
    )
    both = cur.intersect(sn).select(
        F.lit("both").alias("side"), F.col("c_nationkey").cast("long").alias("nationkey")
    )
    return only.unionByName(both)


@query(
    "j5_full_outer_reconciliation",
    """
    WITH c AS (
      SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM customer GROUP BY 1),
    s AS (
      SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers
      FROM supplier GROUP BY 1)
    SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers,
           c_nationkey IS NULL OR s_nationkey IS NULL AS one_sided
    FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
    """,
)
def j5_full_outer_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — full-outer reconciliation: customer vs supplier presence
    per nation, neither side dropped (the two-ledger diff shape). Both
    inputs pre-aggregate to one row per key BEFORE the join, so the
    full-outer shuffle carries key counts, never raw rows."""
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    c = cust.groupBy("c_nationkey").agg(F.count("*").cast("long").alias("n_customers"))
    s = sup.groupBy("s_nationkey").agg(F.count("*").cast("long").alias("n_suppliers"))
    j = c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
    return j.select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        (F.col("c_nationkey").isNull() | F.col("s_nationkey").isNull()).alias("one_sided"),
    )


@query(
    "f17_normalize_text",
    """
    WITH aug AS (
      SELECT doc_id,
             text || '  Crème  BRÛLÉE à SÃO paulo — naïve  ' AS text
      FROM documents)
    SELECT doc_id,
           TRIM(regexp_replace(
             translate(lower(text), 'àáâãäåèéêëìíîïòóôõöùúûüçñ—',
                       'aaaaaaeeeeiiiiooooouuuucn-'),
             '\\s+', ' ', 'g')) AS normalized
    FROM aug
    """,
)
def f17_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17 — canonical text normalization (lowercase, accent fold,
    whitespace collapse, trim) — byte-compared across engines over an
    accent-injected corpus. One translate + one regexp_replace, all
    codegen; the shared normalization for fingerprints/tokenizers."""
    from train_reports_etl_spark.functions.strings import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(F.col("text"), F.lit("  Crème  BRÛLÉE à SÃO paulo — naïve  ")).alias("text"),
    )
    return aug.select("doc_id", normalize_text("text").alias("normalized"))


# --------------------------------------------------------------------------
# A12 — GROUPING SETS (mixed hierarchies ROLLUP/CUBE cannot express)

@query(
    "a12_grouping_sets",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
             AS BIGINT) AS revenue_cc,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
    """,
)
def a12_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 — explicit GROUPING SETS: (flag, status) detail, a status
    slice, and the grand total in ONE scan. Mixed hierarchies like
    this ((flag,status) detail + a status-only slice + grand total,
    skipping the flag-only level) are inexpressible as ROLLUP or CUBE; Catalyst plans one
    Expand + a single hash aggregate (3 grouping sets ⇒ 3× row
    expansion pre-combine, not 3 scans of the fact table). NULL group
    markers are COALESCEd to 'ALL' on both engines so the oracle
    compare never depends on NULL-vs-data ambiguity."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__a12_lineitem")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
             AS BIGINT) AS revenue_cc,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM __a12_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        """
    )


# --------------------------------------------------------------------------
# O5 — distributed total-order rank (no single-partition window)

@query(
    "o5_distributed_rank",
    """
    WITH ranked AS (
      SELECT o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rnk
      FROM orders)
    SELECT CAST(rnk AS BIGINT) AS rnk, o_orderkey, o_totalprice
    FROM ranked WHERE (rnk - 1) % 100 = 0
    """,
)
def o5_distributed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 — global ROW_NUMBER over (price, key) WITHOUT the
    single-partition window: range-bucket on sampled cut points,
    per-bucket window rank, stitch with cumulative bucket offsets
    (``operators/ranking.py``). The oracle is the naive global window
    — identical output, but the Spark plan keeps every task bounded at
    ~n/32 rows where the naive form funnels 100 TB through one task.
    Output thinned to every 100th rank."""
    from train_reports_etl_spark.operators.ranking import distributed_rank

    orders = load_table(spark, sf_dir, "orders")
    ranked = distributed_rank(
        orders.select("o_orderkey", "o_totalprice"),
        bucket_col="o_totalprice",
        order_cols=["o_totalprice", "o_orderkey"],
        n_buckets=32,
    )
    return ranked.filter((F.col("rnk") - 1) % 100 == 0).select(
        "rnk", "o_orderkey", "o_totalprice"
    )
