"""Distributed k-means (E3): a real coarse quantizer for the IVF
similarity path (similarity.py uses per-label means as a deterministic
stand-in; this is the unsupervised version).

No reference citation — new scope beyond SURVEY.md §2.11.

Iteration shape (the same one MLlib uses): centroids live on the
driver as k×dim literals (k is small — a coarse quantizer is 2^8-ish
even at 10⁹ vectors), each round is ONE distributed job — assign via
broadcast-literal distance expressions, re-average via posexplode +
per-dimension mean — and the collected means become the next round's
literals. The driver loop keeps every round's plan flat (no lineage
growth), and nothing larger than k×dim ever reaches the driver.

Determinism: init picks the k vectors with the smallest md5(id) (a
seeded hash order, never ``rand()``), so the whole trajectory is a
pure function of the data — re-runs, including partial-failure
re-runs, converge identically. Mean aggregation uses float SUM whose
partition order Spark does not fix, so last-ulp centroid wobble is
possible run-to-run; assignments are robust to it except for points
equidistant to two centroids — which the lowest-cluster-index
tie-break in the argmin absorbs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from train_reports_etl_spark.extensions.similarity import dot

__all__ = [
    "kmeans_fit",
    "kmeans_assign",
    "kmeans_fit_portable",
    "quantize_vectors",
    "kcenter_select_portable",
    "kcenter_assign",
]


def _assign(df: DataFrame, centroids: list[list[float]], id_col: str, vec_col: str) -> DataFrame:
    """(id, vec, cluster): nearest centroid by squared L2, computed as
    |v|² − 2·v·c + |c|² with the per-vector norm factored out (it can't
    change the argmin, so only the −2·v·c + |c|² terms are compared)."""
    scores = [
        (-2.0 * dot(F.col(vec_col), F.array(*[F.lit(x) for x in c]))
         + sum(x * x for x in c)).alias(f"d{j}")
        for j, c in enumerate(centroids)
    ]
    scored = df.select(F.col(id_col), F.col(vec_col), *scores)
    arr = F.array(*[F.col(f"d{j}") for j in range(len(centroids))])
    # first index holding the min — lowest-cluster-index tie-break
    best = F.array_position(arr, F.array_min(arr)) - 1
    return scored.select(
        F.col(id_col), F.col(vec_col), best.cast("int").alias("cluster")
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd's iterations; returns the k×dim centroid list (driver-side
    literals, ready to broadcast into :func:`kmeans_assign`).

    The input is persisted for the duration of the fit (seed scan +
    n_iter assignment/re-average jobs all read it) and unpersisted
    before returning — the standard iterate-over-cached-input shape;
    at cluster scale swap MEMORY_AND_DISK for a checkpoint if the
    vector table exceeds cluster memory."""
    df = df.persist()
    try:
        return _kmeans_fit_cached(df, k, n_iter, id_col, vec_col)
    finally:
        df.unpersist()


def _kmeans_fit_cached(
    df: DataFrame, k: int, n_iter: int, id_col: str, vec_col: str
) -> list[list[float]]:
    # TakeOrderedAndProject, not a global row_number window: the seed
    # scan keeps k rows per partition and merges on the driver — no
    # single task ever sorts the whole vector table.
    seeds = (
        df.select(
            F.md5(F.col(id_col).cast("string")).alias("__h"),
            F.col(id_col),
            F.col(vec_col),
        )
        .orderBy("__h", id_col)
        .limit(k)
        .collect()
    )
    centroids = [list(map(float, r[2])) for r in seeds]
    for _ in range(n_iter):
        assigned = _assign(df, centroids, id_col, vec_col)
        per_dim = (
            assigned.select("cluster", F.posexplode(F.col(vec_col)).alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        new = {}
        for r in per_dim:
            new.setdefault(r.cluster, {})[r.pos] = r.m
        centroids = [
            [new[j][p] for p in sorted(new[j])] if j in new else centroids[j]
            for j in range(k)
        ]
    return centroids


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster) for fitted centroids — one narrow map, centroids
    as broadcast literals."""
    return _assign(df, centroids, id_col, vec_col).select(id_col, "cluster")


def quantize_vectors(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 1_000_000.0,
) -> DataFrame:
    """(id, vq: array<long>) with ``vq[i] = FLOOR(v[i] * scale)``.

    FLOOR (not ROUND) on purpose: floor acts on the BINARY double and is
    bit-identical across engines, whereas Spark's ROUND goes through the
    shortest decimal repr (BigDecimal HALF_UP) and DuckDB's through the
    binary value — they disagree on reprs ending in .5. The quantization
    itself only needs to be a shared deterministic map, not unbiased."""
    vq = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * F.lit(scale))
    )
    return df.select(F.col(id_col), vq.alias("vq"))


def kmeans_fit_portable(
    df: DataFrame,
    k: int = 4,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float | None = None,
    quantized: DataFrame | None = None,
) -> tuple[list[list[float]], DataFrame]:
    """Cross-engine-replayable Lloyd's fit: quantize components to
    integers (:func:`quantize_vectors`), so every per-cluster mean is an
    EXACT bigint sum divided by an exact count — no float-sum partition
    order anywhere. An oracle replaying the same iterations (exact int
    sums → IEEE double division → sequential-fold distances → lowest-
    index argmin) reproduces every centroid bit-for-bit, which makes the
    final assignment strongly checkable — the same trick that gave
    e3_ivf_topk_cosine its strong oracle.

    Centroids are returned in QUANTIZED units (argmin is scale-invariant
    so assignment never needs de-scaling); divide by the quantization
    scale — ``scale`` when this function built the frame (default 1e6),
    or whatever scale the caller's ``quantized`` frame was built with
    (passing ``scale`` together with ``quantized`` raises: the frame
    already fixes it, and a mismatched value would mis-report units). Also returns the quantized frame so the caller can
    run the final assignment on exactly the data the fit saw. Pass
    ``quantized`` (e.g. a signature-store frame, already persisted and
    caller-owned — see extensions/store.py) to keep it cached across
    the fit AND the caller's later jobs; without it the fit persists
    its own copy for the iterations and unpersists before returning,
    so the caller's follow-up jobs deterministically recompute the
    (narrow, cheap) quantization. Exactness bound: |component| · scale
    · n_rows must stay below 2^53 for the sums to convert exactly —
    unit-norm embeddings at scale 1e6 keep that true up to ~10⁹ rows
    per cluster-dimension."""
    own = quantized is None
    if not own:
        if scale is not None:
            # The caller's frame fixes the quantization; a scale passed
            # alongside it is dead at best and a silent unit mismatch at
            # worst (centroids would be reported in the wrong units).
            raise ValueError(
                "pass scale only when kmeans_fit_portable builds the "
                "quantized frame itself; a caller-supplied `quantized` "
                "already fixes the quantization scale"
            )
        missing = {id_col, "vq"} - set(quantized.columns)
        if missing:
            raise ValueError(f"quantized frame lacks column(s) {sorted(missing)}")
    q = (
        quantize_vectors(df, id_col, vec_col, scale or 1_000_000.0).persist()
        if own
        else quantized
    )
    try:
        seeds = (
            q.select(
                F.md5(F.col(id_col).cast("string")).alias("__h"),
                F.col(id_col),
                F.col("vq"),
            )
            .orderBy("__h", id_col)
            .limit(k)
            .collect()
        )
        centroids = [[float(x) for x in r[2]] for r in seeds]
        for _ in range(n_iter):
            assigned = _assign(q, centroids, id_col, "vq")
            per_dim = (
                assigned.select(
                    "cluster", F.posexplode(F.col("vq")).alias("pos", "v")
                )
                .groupBy("cluster", "pos")
                .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
                .collect()
            )
            new: dict[int, dict[int, float]] = {}
            for r in per_dim:
                # exact ints → correctly-rounded double division, the
                # same IEEE op an oracle's CAST(s AS DOUBLE)/n performs
                new.setdefault(r.cluster, {})[r.pos] = r.s / r.n
            centroids = [
                [new[j][p] for p in sorted(new[j])] if j in new else centroids[j]
                for j in range(k)
            ]
        return centroids, q
    finally:
        if own:
            q.unpersist()


# ---------------------------------------------------------- k-center

def _d2_int(vq, center: list[int]):
    """Exact squared L2 between a quantized vector column and a
    quantized center literal: every term is a bigint product of bigint
    differences, the fold is integer addition — associative, so neither
    partition order nor engine can perturb it (64 dims × (2·10⁶)² per
    term ≈ 2.6·10¹⁴ total, far inside int64).

    The center literal is built as ONE parsed SQL array expression,
    not 64 ``F.lit`` calls — each ``lit``/``cast`` is a py4j round
    trip, and a k-round traversal builds O(k²/2) center arrays, which
    measurably dominated driver time (thousands of RPCs) before the
    fold ever ran."""
    arr = F.expr(
        "array(" + ",".join(f"{int(x)}L" for x in center) + ")"
    )
    return F.aggregate(
        F.zip_with(vq, arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def kcenter_select_portable(
    df: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 1_000_000.0,
    quantized: DataFrame | None = None,
) -> tuple[list[tuple[int, int, list[int], int | None]], DataFrame]:
    """Greedy k-center / farthest-first traversal (Gonzalez, TCS 1985):
    seed with the hash-order-first vector (same md5-order discipline as
    ``kmeans_fit_portable``), then k−1 times pick the point FARTHEST
    from its nearest chosen center. The classic 2-approximation to the
    k-center objective, used as a diversity/coreset selector in
    training-data curation (maximal geometric coverage — the complement
    of SemDeDup's redundancy removal, E46).

    Cross-engine-exact by construction: coordinates quantize to bigints
    (:func:`quantize_vectors`), so min-distances are EXACT integers and
    the argmax — including the lowest-id tie-break — replays
    bit-identically in an unrolled SQL oracle. No float enters until a
    caller de-scales for display.

    Scale story: the running min-distance column is maintained
    INCREMENTALLY — round r persists ``LEAST(prev_ms, d2(new_center))``
    and the previous round's cache is dropped as soon as the next is
    materialized, so each round is ONE distributed TakeOrdered job
    evaluating ONE new integer fold per row (O(n·k) total work, never
    the naive O(n·k²) least-of-all-centers rebuild), at most two
    (id, vq, ms) snapshots cached at a time, and only a single row
    reaching the driver per round. The quantized scan goes through
    ``repartition_if_coarse`` — a single-row-group parquet input would
    otherwise serialize every interpreted HOF fold onto one core
    (measured 66 s → ~4 s at 60k vectors).

    Returns ``(centers, quantized)`` where each center is
    ``(rank, id, vq, sel_d2)`` — ``sel_d2`` the exact squared distance
    that made it the farthest point (None for the seed).
    """
    from train_reports_etl_spark.util import repartition_if_coarse

    if k < 1:
        raise ValueError("k must be >= 1")
    own = quantized is None
    q = quantized if quantized is not None else (
        repartition_if_coarse(
            quantize_vectors(df, id_col, vec_col, scale)
        ).persist()
    )
    cur = None
    prev = None
    try:
        seed = (
            q.select(
                F.md5(F.col(id_col).cast("string")).alias("__h"),
                F.col(id_col),
                F.col("vq"),
            )
            .orderBy("__h", id_col)
            .limit(1)
            .collect()[0]
        )
        centers: list[tuple[int, int, list[int], int | None]] = [
            (0, seed[1], [int(x) for x in seed[2]], None)
        ]
        if k == 1:
            return centers, q
        cur = q.select(
            F.col(id_col),
            F.col("vq"),
            _d2_int(F.col("vq"), centers[0][2]).alias("__ms"),
        ).persist()
        for r in range(1, k):
            far = (
                cur.orderBy(F.desc("__ms"), F.col(id_col))
                .limit(1)
                .collect()[0]
            )
            # the argmax job materialized `cur`; its parent snapshot is
            # no longer reachable by any future job
            if prev is not None:
                prev.unpersist()
                prev = None
            centers.append((r, far[0], [int(x) for x in far[1]], int(far[2])))
            if r < k - 1:
                prev, cur = cur, cur.select(
                    F.col(id_col),
                    F.col("vq"),
                    F.least(
                        F.col("__ms"), _d2_int(F.col("vq"), centers[-1][2])
                    ).alias("__ms"),
                ).persist()
        return centers, q
    finally:
        for f in (cur, prev):
            if f is not None:
                f.unpersist()
        if own:
            q.unpersist()


def kcenter_assign(
    quantized: DataFrame,
    centers: list[tuple[int, int, list[int], int | None]],
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, center_rank, d2): nearest selected center by exact integer
    squared L2, lowest-rank tie-break — the lexicographic LEAST over
    (d2, rank) structs, all broadcast literals, map-only."""
    structs = [
        F.struct(
            _d2_int(F.col("vq"), c[2]).alias("d2"),
            F.lit(c[0]).cast("int").alias("rank"),
        )
        for c in centers
    ]
    best = structs[0] if len(structs) == 1 else F.least(*structs)
    return quantized.select(
        F.col(id_col),
        best.getField("rank").alias("center_rank"),
        best.getField("d2").alias("d2"),
    )
