"""Builder-owned scale-up dataset generator (documents / embeddings /
events) for measuring the pair-pipeline family's scaling exponent.

TESTDATA.md caps driver data at sf0.1 (~5k documents), so every
100×-scale argument in SCALING.md was plan-shape + complexity math
with no measurement above ~600k rows. This generator extrapolates the
SAME distributional family as the driver's synthetic tables — profiled
from /root/testdata/sf0.1 (read-only), never modifying it — to N× the
row counts, into a repo-local dir the driver never reads:

- ``documents``: random sequences from the same 30-word vocabulary,
  lengths ~Uniform(10, 100); 5%% near-duplicates (another doc's text +
  " dup", the driver's own marker scheme); ~0.16%% exact copies; langs
  weighted {en: 0.4, de/es/fr/zh: 0.15}; sources uniform src0..src19.
- ``embeddings``: 64-dim unit vectors, 10 labels with a weak centroid
  tilt (profiled within-cluster std 0.125 vs between-centroid ~0.1 —
  the driver's clusters overlap heavily, so ANN cost structure is
  n- and k-driven, not geometry-driven).
- ``events``: sequential ids, 30 days, users ~67 events each, 5
  uniform event types, value ~ |N(0,1)|-ish positive with a long tail.

Deterministic (numpy PCG64, fixed seed) so repeated probe runs see the
same data. Usage::

    python tools/gen_scaledata.py 10 /root/repo/.scaledata/x10
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# The sf0.1 profile this extrapolates (see module docstring).
VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast the row "
    "agg key query a scan batch"
).split()
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]

BASE_DOCS = 5_000  # sf0.1 row counts this scales from
BASE_EMB = 2_000
BASE_EVENTS = 100_000

NEAR_DUP_FRAC = 0.05
EXACT_DUP_FRAC = 0.0016


def _assemble_documents(
    texts: list[str], n: int, rng: np.random.Generator
) -> pa.Table:
    """Shared document-table assembly: dup seeding (near-dups append
    the driver's ' dup' marker to a copy of a random doc; exact dups
    copy verbatim), weighted langs, round-robin sources, n_chars.
    ONE implementation for every vocabulary sampler so the seeding and
    schema cannot drift between the corpora that claim to share them."""
    n_near = int(n * NEAR_DUP_FRAC)
    n_exact = int(n * EXACT_DUP_FRAC)
    victims = rng.choice(n, size=n_near + n_exact, replace=False)
    for i in victims[:n_near]:
        texts[int(i)] = texts[int(rng.integers(0, n))] + " dup"
    for i in victims[n_near:]:
        src = int(rng.integers(0, n))
        if int(i) != src:
            texts[int(i)] = texts[src]
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    sources = np.array([f"src{i % 20}" for i in rng.permutation(n)])
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
        }
    )


def gen_documents(n: int, rng: np.random.Generator) -> pa.Table:
    """The driver family: uniform draws from the closed 30-word vocab."""
    lengths = rng.integers(10, 101, size=n)
    vocab = np.array(VOCAB)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), size=ln)]) for ln in lengths
    ]
    return _assemble_documents(texts, n, rng)


def gen_documents_zipf(n: int, rng: np.random.Generator) -> pa.Table:
    """Documents over a REALISTIC vocabulary: 30k words, Zipf-ranked
    frequencies (p_r ∝ 1/r^1.1, the classic natural-text exponent
    range). The committed synthetic's closed 30-word vocabulary gives
    every shingle ~equal document frequency, which makes df-ordered
    prefix filtering selectivity-free by construction — this corpus
    exists to measure the prefix-filtered exact similarity join in the
    regime real text occupies (rare tokens exist, posting lists are
    Zipf-skewed). Same dup seeding/schema via ``_assemble_documents``.
    """
    v = 30_000
    ranks = np.arange(1, v + 1, dtype=np.float64)
    p = 1.0 / ranks**1.1
    p /= p.sum()
    vocab = np.array([f"w{i}" for i in range(v)])
    lengths = rng.integers(10, 101, size=n)
    texts = [" ".join(vocab[rng.choice(v, size=ln, p=p)]) for ln in lengths]
    return _assemble_documents(texts, n, rng)


def gen_embeddings(n: int, rng: np.random.Generator) -> pa.Table:
    dim, k = 64, 10
    centroids = rng.normal(0.0, 0.0088, size=(k, dim))  # norm ≈ 0.07
    labels = rng.integers(0, k, size=n)
    raw = rng.normal(0.0, 0.125, size=(n, dim)) + centroids[labels]
    unit = (raw / np.linalg.norm(raw, axis=1, keepdims=True)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(unit), type=pa.list_(pa.float32())),
            "label": pa.array(labels.astype(np.int32)),
        }
    )


def gen_events(n: int, rng: np.random.Generator) -> pa.Table:
    n_users = max(1, n // 67)
    start = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = start + rng.integers(0, span_us, size=n).astype("timedelta64[us]")
    ts.sort()
    value = np.round(np.abs(rng.normal(45.0, 40.0, size=n)) + rng.exponential(5.0, size=n), 2)
    ks = rng.integers(0, 100, size=n)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts),
            "user_id": pa.array(rng.integers(0, n_users, size=n)),
            "event_type": pa.array(rng.choice(EVENT_TYPES, size=n)),
            "value": pa.array(value),
            "props": pa.array([f'{{"k": {k}}}' for k in ks]),
        }
    )


# ---------------------------------------------------------------- star
# Relational (TPC-H-ish) family, profiled from /root/testdata/sf0.1:
# row ratios customer:supplier:part:orders = 15k:1k:20k:150k with
# lineitem ≈ 4.07 lines/order (1 + Poisson(3)-ish histogram), quantity
# uniform int 1..50, discount 0..0.10 step .01, tax 0..0.08,
# extendedprice uniform 900..105k INDEPENDENT of quantity, order/ship
# dates independent uniform over the 1995-2001 span, literal pools
# copied from the driver tables so filter selectivities match.

BASE_CUST, BASE_SUPP, BASE_PART, BASE_ORDERS = 15_000, 1_000, 20_000, 150_000
_SEGMENTS = ["MACHINERY", "FURNITURE", "AUTOMOBILE", "HOUSEHOLD", "BUILDING"]
_PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
_ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
_NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _ts_uniform(rng, n, start: str, days: int):
    """Uniform midnight-aligned TIMESTAMP(us) over [start, start+days)."""
    base = np.datetime64(start, "us")
    return base + (
        rng.integers(0, days, size=n) * np.int64(86_400_000_000)
    ).astype("timedelta64[us]")


def gen_star(mult: float, rng: np.random.Generator) -> dict[str, pa.Table]:
    n_cust = int(BASE_CUST * mult)
    n_supp = int(BASE_SUPP * mult)
    n_part = int(BASE_PART * mult)
    n_ord = int(BASE_ORDERS * mult)
    tables: dict[str, pa.Table] = {}
    tables["region"] = pa.table(
        {"r_regionkey": pa.array(np.arange(5, dtype=np.int64)), "r_name": _REGIONS}
    )
    tables["nation"] = pa.table(
        {
            "n_nationkey": pa.array(np.arange(25, dtype=np.int64)),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": pa.array(np.arange(25, dtype=np.int64) % 5),
        }
    )
    tables["customer"] = pa.table(
        {
            "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32)),
            "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_cust), 2)),
            "c_mktsegment": pa.array(rng.choice(_SEGMENTS, n_cust)),
        }
    )
    tables["supplier"] = pa.table(
        {
            "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32)),
            "s_acctbal": pa.array(np.round(rng.uniform(0, 10000, n_supp), 2)),
        }
    )
    names = rng.integers(0, len(_ADJ) * len(_NOUN), n_part)
    tables["part"] = pa.table(
        {
            "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
            "p_name": [
                f"{_ADJ[i // len(_NOUN)]} {_NOUN[i % len(_NOUN)]}" for i in names
            ],
            "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(1, 26, n_part)]),
            "p_type": pa.array(rng.choice(_PTYPES, n_part)),
            "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
            "p_retailprice": pa.array(
                900.0 + (np.arange(n_part, dtype=np.int64) % 1000) / 10.0
            ),
        }
    )
    tables["orders"] = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
            "o_custkey": pa.array(rng.integers(0, n_cust, n_ord)),
            "o_orderstatus": pa.array(rng.choice(["O", "P", "F"], n_ord)),
            "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, n_ord), 2)),
            "o_orderdate": pa.array(_ts_uniform(rng, n_ord, "1995-01-01", 2400)),
            "o_orderpriority": pa.array(rng.choice(_PRIOS, n_ord)),
        }
    )
    lines = np.clip(1 + rng.poisson(3.07, n_ord), 1, 17)
    n_li = int(lines.sum())
    okeys = np.repeat(np.arange(n_ord, dtype=np.int64), lines)
    linenum = (np.arange(n_li, dtype=np.int64) - np.repeat(
        np.cumsum(lines) - lines, lines
    ) + 1).astype(np.int32)
    tables["lineitem"] = pa.table(
        {
            "l_orderkey": pa.array(okeys),
            "l_partkey": pa.array(rng.integers(0, n_part, n_li)),
            "l_suppkey": pa.array(rng.integers(0, n_supp, n_li)),
            "l_linenumber": pa.array(linenum),
            "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64)),
            "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, n_li), 2)),
            "l_discount": pa.array(rng.integers(0, 11, n_li) / 100.0),
            "l_tax": pa.array(rng.integers(0, 9, n_li) / 100.0),
            "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li)),
            "l_linestatus": pa.array(rng.choice(["O", "F"], n_li)),
            "l_shipdate": pa.array(_ts_uniform(rng, n_li, "1995-01-02", 2490)),
        }
    )
    return tables


def main() -> None:
    args = [a for a in sys.argv[1:] if a not in ("--zipf", "--star")]
    zipf = "--zipf" in sys.argv
    star = "--star" in sys.argv
    mult = float(args[0]) if args else 10.0
    kind = "star_" if star else ("zipf_" if zipf else "")
    default = f"/root/repo/.scaledata/{kind}x{mult:g}"
    out = args[1] if len(args) > 1 else default
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    if star:
        for name, table in gen_star(mult, rng).items():
            path = os.path.join(out, f"{name}.parquet")
            pq.write_table(table, path)
            print(f"{path}: {table.num_rows} rows")
        return
    specs = [
        ("documents", gen_documents_zipf if zipf else gen_documents, int(BASE_DOCS * mult)),
        ("embeddings", gen_embeddings, int(BASE_EMB * mult)),
        ("events", gen_events, int(BASE_EVENTS * mult)),
    ]
    for name, fn, n in specs:
        path = os.path.join(out, f"{name}.parquet")
        pq.write_table(fn(n, rng), path)
        print(f"{path}: {n} rows")


if __name__ == "__main__":
    main()
