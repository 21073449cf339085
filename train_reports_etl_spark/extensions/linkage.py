"""E73 — record linkage / entity resolution (Fellegi–Sunter).

Reference linkage: none — new scope beyond the reference's report
pipelines (SURVEY.md §2.11 extension). The shape is the classic
probabilistic record-linkage pipeline (Fellegi & Sunter, JASA 1969;
the Splink/dedupe production shape): **blocking** bounds the pair
space, an **agreement vector** compares fields pairwise, literal
integer **log-odds weights** (the trained-artifact shape — in
production these come from an EM fit) score each pair, and two
thresholds split match / possible / non-match.

Everything is integer-exact so the DuckDB oracle is a strong
value-hash check:

- the dirty replica is built by DETERMINISTIC perturbations keyed on
  ``c_custkey % 4`` (ASCII ``translate`` case flip, last-char drop,
  ``#``→``-``) — no RNG, both engines derive byte-identical replicas;
- money comparison uses the repo's cents convention
  (``ROUND(bal*100) AS BIGINT``, proven portable by the a4 family);
- weights are integer milli-bits (log2(m/u)·1000 literals); the score
  is a SUM of longs.

Scale shape (100 TB): linkage without blocking is O(n²) — the entire
design is that candidate pairs exist ONLY inside blocks. Pass 1
(nation) yields Σ_b m_a·m_b pairs with bounded block sizes; pass 2
(digit substring of the name key) is near-exact. The union of passes
is the standard multi-pass recall net: a pair missed by one key
survives via the other. Each pass is one equi-join (hash-partitioned
on the block key, map-side combinable distinct) — no cross join
anywhere, and the agreement/scoring stage is per-row codegen on the
bounded candidate set. A skewed block (one giant nation) is the same
problem as any skewed join key: AQE skew-join or the salted-join
machinery (E15) applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LOWER = "abcdefghijklmnopqrstuvwxyz"
_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"

# Literal Fellegi–Sunter weights in milli-bits: log2(m/u)*1000 for
# agreement, log2((1-m)/(1-u))*1000 for disagreement. Literals are the
# trained-artifact shape (production fits them with EM); keeping them
# integer makes the pair score a SUM of longs — exact cross-engine.
WEIGHTS = {
    "name_eq": (3800, -1200),
    "digits_eq": (5200, -900),
    "digits_prefix_eq": (2600, -700),
    "bal_eq": (1500, -800),
    "seg_eq": (700, -300),
    "nation_eq": (460, -150),
}
# Threshold tuning is the F-S exercise: each perturbation class lands
# at a deterministic weight (clean 14260/11660, case-flip 9260,
# hyphen 9260, char-drop 3160, char-drop+blank-segment 2160), while
# false pairs cluster <= 860 with a thin lucky-balance tail ~2550. The
# review band [2100, 6000) sits below the weakest TRUE class and above
# the bulk false band — full recall at match+possible, with the lucky
# tail landing in clerical review where it belongs.
MATCH_MILLIBITS = 6000
POSSIBLE_MILLIBITS = 2100


def _cents(col: Column) -> Column:
    return F.round(col * 100).cast("long")


def perturbed_customers(customers: DataFrame) -> DataFrame:
    """Deterministic dirty replica: every customer re-appears with
    ``link_id = c_custkey + 1_000_000`` and keyed perturbations —
    ``%4==0`` byte-identical, ``%4==1`` ASCII-uppercased name,
    ``%4==2`` last name char dropped, ``%4==3`` ``#``→``-``; account
    balance shifted by ``(key % 7) - 3`` cents; every 10th segment
    blanked to ``UNKNOWN``. The true match for replica row r is
    customer ``r - 1_000_000`` — known by construction, which is what
    lets the confusion query measure recall/precision exactly."""
    k = F.col("c_custkey") % 4
    name = (
        F.when(k == 1, F.translate(F.col("c_name"), _LOWER, _UPPER))
        .when(k == 2, F.expr("substring(c_name, 1, length(c_name) - 1)"))
        .when(k == 3, F.replace(F.col("c_name"), F.lit("#"), F.lit("-")))
        .otherwise(F.col("c_name"))
    )
    seg = F.when(F.col("c_custkey") % 10 == 0, F.lit("UNKNOWN")).otherwise(
        F.col("c_mktsegment")
    )
    return customers.select(
        (F.col("c_custkey") + 1000000).cast("long").alias("link_id"),
        name.alias("name"),
        F.col("c_nationkey").cast("long").alias("nation"),
        (_cents(F.col("c_acctbal")) + (F.col("c_custkey") % 7) - 3).alias("bal_cents"),
        seg.alias("segment"),
    )


def _clean_side(customers: DataFrame) -> DataFrame:
    return customers.select(
        F.col("c_custkey").cast("long").alias("link_id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").cast("long").alias("nation"),
        _cents(F.col("c_acctbal")).alias("bal_cents"),
        F.col("c_mktsegment").alias("segment"),
    )


def _digits(col: Column) -> Column:
    return F.regexp_replace(col, "[^0-9]", "")


def blocked_pairs(
    left: DataFrame,
    right: DataFrame,
    max_block_rows: int | None = 1000,
) -> DataFrame:
    """Union of two blocking passes, distinct on the pair key.

    Pass 1: (nation, $100 balance band) — coarse attribute blocking.
    Pass 2: digits 5..8 of the numeric name key (fine — survives every
    name perturbation above because only the LAST char is ever
    dropped). Multi-pass union is the standard recall net; distinct
    collapses pairs both passes emit. Each pass is an equi-join on its
    block key — never a cross join.

    ``max_block_rows`` is the OVERSIZED-BLOCK GUARD, and it is what
    makes pass 1 scale-safe: a fixed-cardinality key (this round-8
    probe measured plain nation blocking at 15k→150k customers
    exploding Σm·m′ pairs ~100× per decade — quadratic, minutes per
    run at x10) produces blocks whose size grows WITH the data, so
    Σ over blocks of m·m′ is O(n²/#blocks). Capping combined block
    membership at ``max_block_rows`` (oversized keys skipped entirely
    — Splink's ``maximum_pairs`` discipline) bounds the pass-1 pair
    count by cap·#blocks and the whole candidate set by O(cap·n):
    LINEAR in the data. Recall survives by the multi-pass contract —
    a giant block carries almost no discriminating signal, and every
    true pair this corpus can produce is independently netted by the
    precise digit pass (pinned by the full-recall test). ``None``
    disables the guard (measurement/comparison only).
    """
    band = (F.col("bal_cents") - (F.col("bal_cents") % 10000)) / 10000
    lt = left.select(
        F.col("link_id").alias("a"),
        F.concat_ws("|", F.col("nation"), band.cast("long")).alias("block_n"),
        F.substring(_digits(F.col("name")), 5, 4).alias("block_d"),
    )
    rt = right.select(
        F.col("link_id").alias("b"),
        F.concat_ws("|", F.col("nation"), band.cast("long")).alias("block_n"),
        F.substring(_digits(F.col("name")), 5, 4).alias("block_d"),
    )
    if max_block_rows is not None:
        sizes = (
            lt.select(F.col("block_n").alias("k"))
            .unionByName(rt.select(F.col("block_n").alias("k")))
            .groupBy("k")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") <= max_block_rows)
            .select("k")
        )
        lt_n = lt.join(sizes, lt["block_n"] == sizes["k"]).select("a", "block_n")
        rt_n = rt.join(sizes, rt["block_n"] == sizes["k"]).select("b", "block_n")
    else:
        lt_n, rt_n = lt.select("a", "block_n"), rt.select("b", "block_n")
    p1 = lt_n.join(rt_n, "block_n").select("a", "b")
    p2 = lt.join(rt, "block_d").select("a", "b")
    return p1.unionByName(p2).distinct()


def score_pairs(left: DataFrame, right: DataFrame, pairs: DataFrame) -> DataFrame:
    """Agreement vector + Fellegi–Sunter milli-bit score + decision.

    ``pattern`` renders the agreement vector as a 6-char 0/1 string
    (name, digits, digits-prefix-8, bal±3c, segment, nation) — the
    human-auditable key the F-S literature groups pairs by. All
    arithmetic is long; the decision is a CASE over two literal
    thresholds. The digits-prefix field is the partial-agreement level
    every production linker carries (Jaro-Winkler bands in Splink):
    it is what keeps a truncated key in the clerical-review band
    instead of silently dropping to non-match.
    """
    ls = left.select(
        F.col("link_id").alias("a"),
        F.col("name").alias("name_a"),
        _digits(F.col("name")).alias("dig_a"),
        F.col("bal_cents").alias("bal_a"),
        F.col("segment").alias("seg_a"),
        F.col("nation").alias("nat_a"),
    )
    rs = right.select(
        F.col("link_id").alias("b"),
        F.col("name").alias("name_b"),
        _digits(F.col("name")).alias("dig_b"),
        F.col("bal_cents").alias("bal_b"),
        F.col("segment").alias("seg_b"),
        F.col("nation").alias("nat_b"),
    )
    j = pairs.join(ls, "a").join(rs, "b")
    agree = {
        "name_eq": (F.col("name_a") == F.col("name_b")).cast("int"),
        "digits_eq": (F.col("dig_a") == F.col("dig_b")).cast("int"),
        "digits_prefix_eq": (
            F.substring("dig_a", 1, 8) == F.substring("dig_b", 1, 8)
        ).cast("int"),
        "bal_eq": (F.abs(F.col("bal_a") - F.col("bal_b")) <= 3).cast("int"),
        "seg_eq": (F.col("seg_a") == F.col("seg_b")).cast("int"),
        "nation_eq": (F.col("nat_a") == F.col("nat_b")).cast("int"),
    }
    score = None
    for field, (w_on, w_off) in WEIGHTS.items():
        term = F.when(agree[field] == 1, F.lit(w_on)).otherwise(F.lit(w_off))
        score = term if score is None else score + term
    decision = (
        F.when(score >= MATCH_MILLIBITS, F.lit("match"))
        .when(score >= POSSIBLE_MILLIBITS, F.lit("possible"))
        .otherwise(F.lit("non_match"))
    )
    pattern = F.concat(*[agree[f].cast("string") for f in WEIGHTS])
    return j.select(
        "a",
        "b",
        pattern.alias("pattern"),
        score.cast("long").alias("weight_mb"),
        decision.alias("decision"),
    )


def link_customers(customers: DataFrame) -> DataFrame:
    """End-to-end: clean side × deterministic dirty replica →
    blocked candidates → scored pairs (all decisions, unfiltered —
    callers bound output with decision/weight predicates)."""
    left = _clean_side(customers)
    right = perturbed_customers(customers)
    return score_pairs(left, right, blocked_pairs(left, right))
