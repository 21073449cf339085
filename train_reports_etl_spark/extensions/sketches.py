"""Cardinality sketches (E4): KMV (k-minimum-values) distinct-count
estimation.

No reference citation — new scope beyond SURVEY.md §2.11. Why KMV and
not just ``approx_count_distinct`` (Spark's HyperLogLog++): HLL's
binary registers are engine-private, so its estimates can't be
oracle-checked and its sketches can't leave Spark. KMV is the
*portable* sketch — keep the k smallest 60-bit hashes of the values;
then ``D̂ = (k−1) / U(k)`` with ``U(k)`` the k-th minimum normalized to
[0, 1) (Bar-Yossef et al. 2002; Beyer et al., SIGMOD'07). Everything
is integer hashing + one double division, so Spark and DuckDB agree
bit-for-bit, and two sketches merge by unioning their hash sets and
re-taking the bottom k — the property that lets per-shard / per-day
sketches roll up without rescanning 100 TB (proven in
tests/test_sketches.py).

The one-shot plan shuffles distinct (group, hash) rows — same shuffle
class as exact COUNT(DISTINCT); the window group-limit then keeps only
k rows per group. The scale win is *storage and reuse* (k longs per
group instead of the distinct set), not the first pass: persist the
bottom-k table per partition/day and every later rollup is a union +
re-limit over k-row inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "hash60_sql",
    "hash60",
    "kmv_bottom_k",
    "kmv_estimate",
    "bloom_positions_sql",
    "bloom_build",
    "bloom_probe",
    "hll_parts_sql",
    "hll_registers",
    "hll_estimate_from_registers",
    "hll_distinct",
    "hll_registers_by",
    "hll_merge_registers",
    "hll_estimate_grouped",
    "histogram_sketch",
    "quantiles_from_histogram",
    "histogram_quantiles",
    "rank_sample_sketch",
    "merge_rank_sketches",
    "mg_summaries",
    "mg_merge",
]

_HEX = "0123456789abcdef"

# 2^60 — hash60 values are uniform on [0, 2^60)
_SCALE = float(1 << 60)


def hash60_sql(expr: str) -> str:
    """60-bit uniform hash of a string expression as SQL text —
    identical in Spark SQL and DuckDB: md5, then the first 15 hex
    nibbles decoded via ``instr`` against a hex alphabet (no hex-cast
    dialect traps; 60 bits keeps every intermediate far below 2^63).

    Every term CASTs the nibble to BIGINT *before* multiplying: Spark
    types ``16^7`` as INT, so ``(instr(..)-1) * 268435456`` multiplies
    INT×INT and silently wraps to −2^31 for nibbles ≥ 8 (DuckDB
    promotes to BIGINT and doesn't). The wrap is a ±2^32 shift on a
    2^60 scale — invisible in sketch *estimates* (2^-28 relative), but
    fatal to exact-equality consumers like the portable MinHash
    signatures, which is how it was caught."""
    h = f"md5({expr})"
    terms = " + ".join(
        f"CAST(instr('{_HEX}', substring({h}, {i + 1}, 1)) - 1 AS BIGINT) * {16 ** (14 - i)}"
        for i in range(15)
    )
    return f"CAST({terms} AS BIGINT)"


def hash60(col: Column | str) -> Column:
    """Spark-side fast twin of :func:`hash60_sql`: ``conv`` parses the
    15 hex nibbles in one call instead of 15 instr/substring terms
    (~2× on the hot paths; verified bit-equal on real data — base-16
    integer parsing is exact either way). The oracle keeps the instr
    chain because DuckDB has no ``conv``. Accepts a SQL expression
    string or a Column."""
    c = F.expr(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def kmv_bottom_k(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 128,
) -> DataFrame:
    """The sketch itself: per group, the (up to) k smallest distinct
    60-bit hashes of ``value_col`` — one row per kept hash, columns
    (*group_cols, h). Mergeable: union two sketches and call this
    again (group on the same keys, value already hashed) to combine.
    The rank-≤-k predicate lets Spark's window group-limit keep k rows
    of state per group inside the sort."""
    hashed = df.select(*group_cols, hash60(value_col).alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(*group_cols, "h")
    )


def estimate_from_sketch(sketch: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """(group, n_kept, kmv_estimate) from a bottom-k sketch table.
    Fewer than k kept hashes means the group's distinct count is below
    k — the sketch holds *all* hashes and the exact count is n_kept."""
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise((k - 1) / (F.col("kth_hash") / F.lit(_SCALE)))
    return (
        sketch.groupBy(*group_cols)
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.max("h").alias("kth_hash"),
        )
        .select(*group_cols, "n_kept", F.round(est, 6).alias("kmv_estimate"))
    )


def kmv_estimate(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 128,
) -> DataFrame:
    """One-shot per-group distinct-count estimate: bottom-k then the
    KMV estimator."""
    return estimate_from_sketch(kmv_bottom_k(df, group_cols, value_col, k), group_cols, k)


# --------------------------------------------------------------- Bloom

# m = 2^16 bit positions, k = 3 hash functions. Each hash is 4 md5
# nibbles (16 bits) from a disjoint region of the digest — independent
# enough for Bloom math, and reproducible verbatim in DuckDB SQL.
BLOOM_BITS = 1 << 16
BLOOM_HASHES = 3


def bloom_positions_sql(expr: str) -> list[str]:
    """The k bit positions of a key as SQL text, identical in Spark SQL
    and DuckDB (md5 nibbles via ``instr``, no hex-cast dialects)."""
    h = f"md5({expr})"
    out = []
    for j in range(BLOOM_HASHES):
        terms = " + ".join(
            f"(instr('{_HEX}', substring({h}, {4 * j + i + 1}, 1)) - 1) * {16 ** (3 - i)}"
            for i in range(4)
        )
        out.append(f"CAST({terms} AS BIGINT)")
    return out


def bloom_positions(expr: str) -> list[Column]:
    """Spark-side fast twin of :func:`bloom_positions_sql` — ``conv``
    on each 4-nibble digest region (bit-equal; see :func:`hash60`)."""
    h = F.md5(F.expr(expr))
    return [
        F.conv(F.substring(h, 4 * j + 1, 4), 16, 10).cast("bigint")
        for j in range(BLOOM_HASHES)
    ]


def bloom_build(df: DataFrame, key_sql: str) -> DataFrame:
    """Build the Bloom bit set for ``key_sql`` (a SQL expression over
    ``df``'s columns): one row per SET bit position — the portable,
    mergeable representation (union two tables and distinct = merged
    filter; a bitmap blob would be engine-private).

    Scale shape: k narrow projections → union → distinct on a BIGINT
    bounded by 2^16 — the shuffle carries at most 65,536 rows no
    matter how many keys went in. The realized table is exactly what a
    broadcast bloom-join prunes with: broadcast it, semi-join probe
    positions, and only possible-members reach the real join."""
    pos = bloom_positions(key_sql)
    parts = [df.select(p.alias("bit_pos")) for p in pos]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.distinct()


def bloom_probe(
    probe: DataFrame,
    bits: DataFrame,
    key_sql: str,
    id_col: str,
) -> DataFrame:
    """Probe keys against a built filter: ``predicted_member`` is true
    iff all k of the key's bit positions are set. Broadcast the bit
    table (≤ 2^16 rows); the probe is k left joins' worth of work in
    ONE join + count — no per-key loop, no UDF."""
    pos = bloom_positions(key_sql)
    exploded = probe.select(
        F.col(id_col),
        F.explode(F.array(*pos)).alias("bit_pos"),
    )
    hits = (
        exploded.join(F.broadcast(bits), "bit_pos", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit"))
    )
    return probe.select(id_col).join(hits, id_col, "left").select(
        F.col(id_col),
        (F.coalesce(F.col("n_hit"), F.lit(0)) == BLOOM_HASHES).alias(
            "predicted_member"
        ),
    )


# ----------------------------------------------------------------- HLL

# p = 8 -> m = 256 registers. Bucket = first 2 md5 nibbles (8 bits),
# register word w = next 13 nibbles (52 bits), rho = leading zeros of
# w within 52 bits + 1 = 53 - bitlength(w). Everything is integer
# arithmetic over md5 text — identical in Spark SQL and DuckDB (both
# engines' `bin()` prints without leading zeros, which IS bitlength).
HLL_P = 8
HLL_M = 1 << HLL_P
_HLL_RHO_MAX = 53  # w == 0 -> all 52 bits zero -> rho = 53


def hll_parts_sql(expr: str) -> tuple[str, str]:
    """(bucket_sql, rho_sql) for a key expression — shared verbatim by
    the Spark plan and the DuckDB oracle, so the register tables are
    bit-identical by construction."""
    h = f"md5({expr})"
    bucket = " + ".join(
        f"(instr('{_HEX}', substring({h}, {i + 1}, 1)) - 1) * {16 ** (1 - i)}"
        for i in range(2)
    )
    w = " + ".join(
        f"(instr('{_HEX}', substring({h}, {i + 3}, 1)) - 1) * CAST({16 ** (12 - i)} AS BIGINT)"
        for i in range(13)
    )
    rho = (
        f"CASE WHEN ({w}) = 0 THEN {_HLL_RHO_MAX} "
        f"ELSE {_HLL_RHO_MAX} - length(bin({w})) END"
    )
    return f"CAST({bucket} AS INT)", f"CAST({rho} AS INT)"


def hll_registers(df: DataFrame, key_sql: str) -> DataFrame:
    """The sketch: one row per non-empty register, columns
    (bucket, rho) with rho = max over the bucket's keys. At most
    ``HLL_M`` rows regardless of input size — the shuffle after the
    map-side partial max carries ≤ m rows per partition. Mergeable:
    union two register tables and ``groupBy(bucket).max(rho)`` is the
    sketch of the union of the key sets (max is idempotent/commutative
    — the property that lets per-day / per-shard sketches roll up
    without rescanning the corpus)."""
    # One bucket/rho derivation for the whole module: the grouped
    # variant with an empty group list IS the global sketch.
    return hll_registers_by(df, [], key_sql)


def hll_estimate_from_registers(registers: DataFrame) -> DataFrame:
    """One-row estimate from a register table. The indicator sum
    ``Z = Σ 2^(-M_j)`` is computed as the exact BIGINT
    ``Σ 2^(53 - M_j)`` (empty registers contribute 2^53 each), so the
    only float ops are one exactly-rounded multiply/divide chain from
    integer inputs — bit-identical across engines, unlike a float
    harmonic sum whose value depends on addition order.

    Columns: n_registers_set, z_sum (the integer Z numerator), and
    hll_estimate = alpha_m * m^2 * 2^53 / z_sum (raw HLL estimator,
    Flajolet et al. 2007). With m = 256 the standard error is
    ~1.04/sqrt(m) = 6.5%; callers needing the linear-counting
    small-range correction should use the KMV sketch instead — its
    ln()-free math is what keeps this oracle-exact."""
    contrib = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RHO_MAX} - rho)")
    agg = registers.agg(
        F.count("*").cast("int").alias("n_registers_set"),
        F.sum(contrib).alias("present_sum"),
    )
    z = (
        F.col("present_sum")
        + (HLL_M - F.col("n_registers_set")).cast("long")
        * F.lit(1 << _HLL_RHO_MAX).cast("long")
    ).alias("z_sum")
    alpha = 0.7213 / (1.0 + 1.079 / float(HLL_M))
    est = (
        F.lit(alpha)
        * F.lit(float(HLL_M * HLL_M))
        * F.lit(float(1 << _HLL_RHO_MAX))
        / F.col("z_sum").cast("double")
    )
    return agg.select("n_registers_set", z).select(
        F.lit(HLL_M).cast("int").alias("m"),
        F.col("n_registers_set"),
        F.col("z_sum"),
        est.alias("hll_estimate"),
    )


def hll_distinct(df: DataFrame, key_sql: str) -> DataFrame:
    """One-shot global distinct-count estimate for ``key_sql``."""
    return hll_estimate_from_registers(hll_registers(df, key_sql))


# ---------------------------------------------------- histogram sketch


def histogram_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """Equi-width histogram sketch: per group, INTEGER counts per bin —
    the third mergeable sketch family next to KMV and HLL (union two
    histograms and ``groupBy(bin).sum(n)`` = histogram of the union;
    per-day sketches roll up without rescanning). Out-of-range values
    clamp into the edge bins, so no row is silently dropped.

    The bin index is ``FLOOR((v - lo)/width)`` with an explicit FLOOR —
    Spark's int cast truncates while DuckDB's rounds, the one cast
    dialect trap in this file. At most ``n_bins`` rows per group leave
    the map side (partial agg)."""
    width = (float(hi) - float(lo)) / float(n_bins)
    bin_ = F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(float(lo))) / F.lit(width)).cast("int"),
            F.lit(0),
        ),
        F.lit(n_bins - 1),
    )
    return (
        df.select(*group_cols, bin_.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").cast("long").alias("n"))
    )


def quantiles_from_histogram(
    hist: DataFrame,
    group_cols: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """Per-group quantile estimates from a histogram sketch: for each
    ``q``, the LOWER EDGE of the first bin whose cumulative count
    reaches ``q × total`` — deterministic arithmetic on integer counts
    (no float summation order, no interpolation ambiguity), so the
    estimate is bit-identical across engines. Error is bounded by one
    bin width, the classic accuracy/size dial.

    Columns: (*group_cols, q, n_rows, est_value)."""
    from pyspark.sql.window import Window

    width = (float(hi) - float(lo)) / float(n_bins)
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*group_cols)
    cum = hist.withColumn("cum", F.sum("n").over(w_cum)).withColumn(
        "total", F.sum("n").over(w_tot)
    )
    qd = cum.withColumn("q", F.explode(F.array(*[F.lit(float(q)) for q in qs])))
    sel = (
        qd.filter(F.col("cum").cast("double") >= F.col("q") * F.col("total").cast("double"))
        .groupBy(*group_cols, "q")
        .agg(F.min("bin").alias("qbin"), F.max("total").alias("n_rows"))
    )
    return sel.select(
        *group_cols,
        "q",
        F.col("n_rows"),
        (F.lit(float(lo)) + F.col("qbin").cast("double") * F.lit(width)).alias(
            "est_value"
        ),
    )


def histogram_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """One-shot: build the sketch, read the quantiles."""
    hist = histogram_sketch(df, group_cols, value_col, lo, hi, n_bins)
    return quantiles_from_histogram(hist, group_cols, qs, lo, hi, n_bins)


def hll_registers_by(df: DataFrame, group_cols: list[str], key_sql: str) -> DataFrame:
    """Per-group register tables: (*group_cols, bucket, rho) with at
    most ``HLL_M`` rows per group — the shard/day/source sketch that
    rolls up. Merge rule is the same union+max; see
    :func:`hll_merge_registers`."""
    h = F.md5(F.expr(key_sql))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    w = F.conv(F.substring(h, 3, 13), 16, 10).cast("bigint")
    rho = (
        F.when(w == 0, F.lit(_HLL_RHO_MAX))
        .otherwise(F.lit(_HLL_RHO_MAX) - F.length(F.bin(w)))
        .cast("int")
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge_registers(registers: DataFrame) -> DataFrame:
    """Merge per-group register tables into ONE sketch WITHOUT
    rescanning the data: drop the group columns, ``groupBy(bucket).
    max(rho)``. max is idempotent/commutative/associative, so
    merge(shards) == sketch(union of shards) exactly — the property
    that makes per-day sketches roll up at 100 TB."""
    return registers.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate_grouped(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Per-group estimates from per-group register tables — the same
    exact-BIGINT indicator sum as :func:`hll_estimate_from_registers`,
    keyed. Output: (*group_cols, n_registers_set, z_sum, hll_estimate).
    """
    contrib = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RHO_MAX} - rho)")
    agg = registers.groupBy(*group_cols).agg(
        F.count("*").cast("int").alias("n_registers_set"),
        F.sum(contrib).alias("present_sum"),
    )
    z = (
        F.col("present_sum")
        + (HLL_M - F.col("n_registers_set")).cast("long")
        * F.lit(1 << _HLL_RHO_MAX).cast("long")
    ).alias("z_sum")
    alpha = 0.7213 / (1.0 + 1.079 / float(HLL_M))
    est = (
        F.lit(alpha)
        * F.lit(float(HLL_M * HLL_M))
        * F.lit(float(1 << _HLL_RHO_MAX))
        / F.col("z_sum").cast("double")
    )
    return agg.select(
        *group_cols,
        F.col("n_registers_set"),
        z,
    ).select(
        *group_cols,
        "n_registers_set",
        "z_sum",
        est.alias("hll_estimate"),
    )


# ----------------------------------------------------------------- CMS

# Count-Min sketch: depth d independent hash rows x width w counters.
# Point estimate = min over rows of the key's counter — always an
# OVERestimate (collisions only add). depth 4, width 4096 = 3 md5
# nibbles per row, each row salted with its own prefix so the d
# hashes are independent. Like Bloom/HLL above, the sketch is a plain
# (d, bucket, cnt) row table: mergeable by (d,bucket) SUM — shard/day
# sketches roll up without rescanning — and every bucket derivation is
# md5-nibble integer math reproducible verbatim in DuckDB.
CMS_DEPTH = 4
CMS_WIDTH = 1 << 12  # 3 hex nibbles


def cms_bucket_sql(expr: str, d: int) -> str:
    """DuckDB-portable bucket of ``expr`` in hash row ``d``: first 3
    nibbles of md5 of the row-salted key, decoded via ``instr`` (no
    hex-cast dialects)."""
    h = f"md5('cms{d}:' || {expr})"
    terms = " + ".join(
        f"(instr('{_HEX}', substring({h}, {i + 1}, 1)) - 1) * {16 ** (2 - i)}"
        for i in range(3)
    )
    return f"CAST({terms} AS INT)"


def cms_bucket(expr: str, d: int) -> Column:
    """Spark fast twin of :func:`cms_bucket_sql` (``conv`` on the same
    3-nibble region — bit-equal)."""
    h = F.md5(F.concat(F.lit(f"cms{d}:"), F.expr(expr)))
    return F.conv(F.substring(h, 1, 3), 16, 10).cast("int")


def cms_table(df: DataFrame, key_sql: str) -> DataFrame:
    """Build the sketch for ``key_sql`` occurrences: one row per
    non-empty (d, bucket) with its occurrence count.

    Scale shape: ONE scan — each input row explodes into its d
    (row, bucket) coordinates, then a single groupBy over a key space
    bounded by d*CMS_WIDTH. Partial (map-side) aggregation caps the
    shuffle at d*width rows per input partition, and the realized
    table is ≤ d*width rows regardless of input size. (A union of d
    per-row groupBys would re-scan and re-tokenize the input d
    times.) Merging shard sketches = union + groupBy(d,bucket).sum —
    never rescan."""
    coords = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        cms_bucket(key_sql, d).alias("bucket"),
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("c")
    )
    return coords.groupBy(
        F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket")
    ).agg(F.count("*").alias("cnt"))


def cms_point_estimates(
    cms: DataFrame, probes: DataFrame, key_col: str
) -> DataFrame:
    """Estimate the occurrence count of each probe key: explode the d
    (row, bucket) coordinates per key, join the sketch (broadcast —
    ≤ d*width rows by construction), take MIN over rows. A key whose
    bucket row is absent has true count 0 in that row → COALESCE to 0
    before the min."""
    coords = probes.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        cms_bucket(key_col, d).alias("bucket"),
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("c"),
    ).select(key_col, F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
    joined = coords.join(F.broadcast(cms), ["d", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("cms_est")
    )


# ---------------------------------------------------------------- E77

def rank_sample_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    k: int = 32,
) -> DataFrame:
    """E77 — data-ADAPTIVE quantile sketch: per group, the k values at
    exact midpoint ranks ``ceil((2i-1)·n / 2k)``, i = 1..k, under the
    total order (value, id). The fourth quantile answer in this file's
    progression and the one production pickers (GK / t-digest /
    ``approx_percentile``) occupy: :func:`histogram_sketch` needs a
    KNOWN [lo, hi] and pays one bin width of VALUE error — useless on
    unbounded or heavy-tailed columns — while the rank sample is
    domain-free with rank error ≤ n/2k by construction (the sample
    IS the exact order statistic at the midpoint rank).

    Unlike GK/t-digest, the build is DETERMINISTIC — global per-group
    ranks via one keyed window, sample selection by pure arithmetic on
    (rn, n) — so the sketch is bit-identical under any partitioning
    and the build itself gets a strong SQL oracle (the t-digest's
    centroid drift under merge order is exactly what it trades away).
    Each row derives the tiny i-interval it can serve (≤ k/n + 2
    candidates, usually 0 or 1) instead of exploding k candidates per
    row — the map side emits O(k) rows per group, not O(n·k).

    Output: (*group_cols, i, value, n) — exactly k rows per group
    (values may repeat when n < k). At 100 TB the only data-sized
    stage is the per-group rank window (keyed, spills independently);
    a single giant group uses the distributed_rank stitch instead —
    same swap the E18 docstring names.
    """
    w_rank = Window.partitionBy(*group_cols).orderBy("value", "__id")
    w_grp = Window.partitionBy(*group_cols)
    ranked = df.select(
        *group_cols,
        F.col(value_col).cast("long").alias("value"),
        F.col(id_col).alias("__id"),
    ).select(
        *group_cols,
        "value",
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_grp).cast("long").alias("n"),
    )
    k_ = F.lit(k)
    i_lo = F.greatest(F.lit(1), F.expr(f"(({k} * (rn - 1)) div n)"))
    i_hi = F.least(k_, F.expr(f"(({k} * rn) div n) + 1"))
    cand = ranked.filter(i_lo <= i_hi).select(
        *group_cols,
        "value",
        "rn",
        "n",
        F.explode(F.sequence(i_lo, i_hi)).alias("i"),
    )
    target = F.expr(f"((2 * i - 1) * n + 2 * {k} - 1) div (2 * {k})")
    return cand.filter(F.col("rn") == target).select(
        *group_cols, F.col("i").cast("int").alias("i"), "value", "n"
    )


def merge_rank_sketches(
    sketch: DataFrame,
    group_cols: list[str],
    k: int = 32,
) -> DataFrame:
    """E77 companion — weighted merge of per-group rank sketches into
    ONE corpus sketch WITHOUT rescanning the data (the E27 rollup
    story, for quantiles): each sample point carries mass n_g/k, so in
    k-scaled integer units point weight = n_g and the merged j-th
    midpoint is the first point (ordered by value with a total
    tie-break) whose cumulative scaled weight reaches
    ``ceil((2j-1)·N / 2)``. All integers — deterministic, strong
    oracle — and the merge runs on sketch ROWS (groups × k), never on
    data. Merged rank error ≤ N/k + Σ_g n_g/2k (each source
    contributes at most one sample spacing of uncertainty); the
    pytest pins observe ≲ N/k in practice.

    Output: (j, est_value, n_rows) — k rows.
    """
    w_cum = Window.orderBy("value", *group_cols, "i").rowsBetween(
        Window.unboundedPreceding, 0
    )
    pts = sketch.select(
        "value", "i", *group_cols, F.col("n").alias("wt")
    ).withColumn("cumw", F.sum("wt").over(w_cum))
    total = sketch.groupBy(*group_cols).agg(F.min("n").alias("n")).agg(
        F.sum("n").cast("long").alias("N")
    )
    j_df = pts.crossJoin(F.broadcast(total)).withColumn(
        "j", F.explode(F.sequence(F.lit(1), F.lit(k)))
    )
    tgt = F.expr("((2 * j - 1) * N + 1) div 2")
    return (
        j_df.filter(F.col("cumw") >= tgt)
        .groupBy("j")
        .agg(
            F.min_by("value", "cumw").alias("est_value"),
            F.min("N").alias("n_rows"),
        )
        .select(F.col("j").cast("int").alias("j"), "est_value", "n_rows")
    )


def mg_summaries(
    items: DataFrame,
    bucket_col: str,
    item_col: str,
    k: int = 24,
) -> DataFrame:
    """E86 — per-bucket Misra–Gries heavy-hitter summary (Misra &
    Gries 1982), the DETERMINISTIC frequency sketch next to the CMS
    (E35): an exact per-bucket histogram is an MG summary with error
    0, and COMPRESS-ing it to k counters — subtract the (k+1)-th
    largest count from every counter, drop the non-positive — is the
    reduction Agarwal et al. (PODS'12, *Mergeable Summaries*) build
    the merge theorem on. Unlike the streaming fold, the compress of
    an exact histogram does not depend on arrival order, so the
    summary is a pure function of the bucket's multiset: bit-identical
    under any partitioning, strong-oracle-checkable, all integers.

    Per bucket the guarantee is one-sided and exact:
    ``cnt ≤ true_count_in_bucket ≤ cnt + err`` where ``err`` is the
    subtracted (k+1)-th count (0 when the bucket has ≤ k distinct
    items), and every item with in-bucket frequency > err survives.

    The only data-sized stage is the map-combinable (bucket, item)
    count; the rank window runs per bucket on its distinct-item rows
    (vocabulary-bounded) and each summary is ≤ k rows — persist them
    per shard/day and every later rollup (:func:`mg_merge`) is
    arithmetic on B·k rows, never a 100 TB rescan.

    Output: (bucket, item, cnt, err) — ≤ k rows per bucket, ``err``
    constant within a bucket.
    """
    c = (
        items.groupBy(bucket_col, item_col)
        .agg(F.count("*").cast("long").alias("c"))
    )
    w = Window.partitionBy(bucket_col).orderBy(
        F.desc("c"), F.col(item_col).asc()
    )
    ranked = c.withColumn("rk", F.row_number().over(w))
    # (k+1)-th largest count per bucket = the compress subtrahend.
    sub = (
        ranked.filter(F.col("rk") == k + 1)
        .select(F.col(bucket_col), F.col("c").alias("err"))
    )
    return (
        ranked.filter(F.col("rk") <= k)
        .join(F.broadcast(sub), bucket_col, "left")
        .withColumn("err", F.coalesce(F.col("err"), F.lit(0)).cast("long"))
        .filter(F.col("c") - F.col("err") > 0)
        .select(
            F.col(bucket_col),
            F.col(item_col).alias("item"),
            (F.col("c") - F.col("err")).cast("long").alias("cnt"),
            "err",
        )
    )


def mg_merge(summ: DataFrame, bucket_col: str, k: int = 24) -> DataFrame:
    """E86 companion — merge per-bucket MG summaries into one global
    k-counter summary WITHOUT rescanning the data (the E27/E77 rollup
    discipline, for frequencies): COMBINE by summing each item's
    counters across buckets, then one global COMPRESS (subtract the
    (k+1)-th largest combined count, keep the positive top k). PODS'12
    proves the result is itself a valid MG summary; doing the compress
    once after a full combine (rather than pairwise) keeps the output
    a pure function of the input summaries — deterministic, so the
    whole two-level pipeline gets a strong integer oracle.

    Error accounting is explicit in the output: ``err_bound`` =
    Σ_buckets err_b (what the per-bucket compresses may have shaved,
    at most once per bucket per item) + the global subtrahend, so
    ``est_count ≤ true_count ≤ est_count + err_bound`` for emitted
    items, and any item with true global count > err_bound is
    guaranteed a row (absent items have true count ≤ err_bound by the
    same two terms). The global window orders B·k summary rows — a
    driver-scale relation at any corpus size.

    Output: (rk, item, est_count, err_bound) — ≤ k rows, rk the
    (count DESC, item ASC) rank.
    """
    prior = (
        summ.groupBy(bucket_col)
        .agg(F.max("err").alias("e_b"))
        .agg(F.sum("e_b").cast("long").alias("e0"))
    )
    comb = summ.groupBy("item").agg(F.sum("cnt").cast("long").alias("s"))
    w = Window.orderBy(F.desc("s"), F.col("item").asc())
    ranked = comb.withColumn("rk", F.row_number().over(w))
    # the (k+1)-th largest combined count as a SCALAR aggregate (1 row
    # even on empty input; max-of-empty → NULL → 0) — an earlier
    # filter(rk == k+1) + always-true left join built the same scalar
    # but as a BNLJ whose build side the plan audit could not prove
    # bounded; the no-grouping aggregate is the auditable shape
    d2 = ranked.agg(
        F.coalesce(F.max(F.when(F.col("rk") == k + 1, F.col("s"))), F.lit(0))
        .cast("long")
        .alias("d2")
    )
    return (
        ranked.filter(F.col("rk") <= k)
        .crossJoin(F.broadcast(d2))
        .crossJoin(F.broadcast(prior))
        .filter(F.col("s") - F.col("d2") > 0)
        .select(
            F.col("rk").cast("int").alias("rk"),
            "item",
            (F.col("s") - F.col("d2")).cast("long").alias("est_count"),
            (F.col("d2") + F.col("e0")).cast("long").alias("err_bound"),
        )
    )
