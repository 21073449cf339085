"""Round-8 additions: integer-exact PageRank and the CCNet-style
char-trigram LM perplexity filter — each pinned against an
independent pure-Python recomputation on small inputs, plus the
plan/flag properties the docstrings promise."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SCALE = 10**12


def _py_pagerank(edge_list, nodes, iters=5, scale=SCALE, d=85):
    """Independent reference: same integer recurrence, dict-based."""
    sym = set()
    for u, v in edge_list:
        if u != v:
            sym.add((u, v))
            sym.add((v, u))
    deg: dict = {}
    for u, _ in sym:
        deg[u] = deg.get(u, 0) + 1
    n = len(nodes)
    base = ((100 - d) * scale) // (100 * n)
    rank = {x: scale // n for x in nodes}
    for _ in range(iters):
        contrib: dict = {x: 0 for x in nodes}
        for u, v in sym:
            contrib[v] += rank[u] // deg[u]
        rank = {x: base + (d * contrib[x]) // 100 for x in nodes}
    return rank


def test_pagerank_matches_reference_recurrence(spark):
    """Triangle + chain + isolated node: Spark ranks == the dict
    recurrence bit-for-bit (integer ops commute, so partitioning
    cannot move the result)."""
    from train_reports_etl_spark.extensions.graph import pagerank

    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (5, 6)]
    nodes = [1, 2, 3, 4, 5, 6, 7]
    edf = spark.createDataFrame(edges, "u long, v long")
    ndf = spark.createDataFrame([(x,) for x in nodes], "doc_id long")
    got = {r["node"]: r["rank"] for r in pagerank(edf, ndf, iters=5).collect()}
    assert got == _py_pagerank(edges, nodes)


def test_pagerank_isolated_node_keeps_teleport_only(spark):
    """Dangling/isolated docs receive exactly the base term every
    iteration — the documented no-redistribution variant."""
    from train_reports_etl_spark.extensions.graph import pagerank

    edf = spark.createDataFrame([(1, 2)], "u long, v long")
    ndf = spark.createDataFrame([(1,), (2,), (9,)], "doc_id long")
    got = {r["node"]: r["rank"] for r in pagerank(edf, ndf, iters=3).collect()}
    base = (15 * SCALE) // (100 * 3)
    assert got[9] == base


def test_pagerank_hub_outranks_leaf(spark):
    """A star center accumulates its leaves' mass: rank(center) >
    rank(leaf) — the boilerplate-hub signal the query exists for."""
    from train_reports_etl_spark.extensions.graph import pagerank

    star = [(0, i) for i in range(1, 8)]
    edf = spark.createDataFrame(star, "u long, v long")
    ndf = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    got = {r["node"]: r["rank"] for r in pagerank(edf, ndf).collect()}
    assert got[0] > got[1] > 0


def _py_trigram_millibits(texts, train_ids, train_mod=10, train_keep=8):
    tris = {i: [t[j : j + 3] for j in range(len(t) - 2)] for i, t in texts.items() if len(t) >= 3}
    counts: dict = {}
    for i, ts in tris.items():
        if i % train_mod < train_keep:
            for t in ts:
                counts[t] = counts.get(t, 0) + 1
    denom = sum(counts.values()) + len(counts) + 1
    out = {}
    for i, ts in tris.items():
        bits = sum(-math.log2((counts.get(t, 0) + 1) / denom) for t in ts)
        mb = 1000.0 * bits / len(ts)
        out[i] = (len(ts), math.floor(mb + 0.5))
    return out


def test_trigram_lm_matches_reference(spark):
    """Millibits per trigram match an independent float recomputation
    (half-up rounding) on a corpus where some held-out trigrams are
    OOV — exercising the +1/V+1 smoothing path."""
    from train_reports_etl_spark.extensions.text import char_trigram_lm_millibits

    texts = {
        0: "abcabcabc",
        1: "abcabd",
        2: "hello world",
        3: "ab",  # too short: must be absent
        18: "zzzqqq",  # held out (18 % 10 = 8), all-OOV trigrams
        19: "abcab",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_trigrams"], r["millibits_per_trigram"])
        for r in char_trigram_lm_millibits(docs).collect()
    }
    want = _py_trigram_millibits(texts, None)
    assert 3 not in got
    assert got == want
    # OOV-heavy held-out doc scores strictly worse than in-model text
    assert got[18][1] > got[0][1]


def test_trigram_lm_model_join_is_broadcast(spark, sf_dir):
    """The scoring join must broadcast the charset³-bounded model —
    the corpus-side trigrams never shuffle for the probe."""
    from train_reports_etl_spark.extensions.ext_queries import (
        e4_trigram_lm_perplexity,
    )

    df = e4_trigram_lm_perplexity(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().treeString()
    assert "BroadcastHashJoin" in plan, plan


def _write_single_rowgroup_parquet(path, n_rows):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.Table.from_pandas(
        pd.DataFrame({"doc_id": range(n_rows), "text": ["x" * 200] * n_rows})
    )
    pq.write_table(tbl, path, row_group_size=n_rows)


def test_repartition_if_coarse_fixes_single_rowgroup_skew(spark, tmp_path):
    """A single-row-group parquet plans as many byte-range splits but
    materializes every row in ONE task — getNumPartitions() lies. The
    guard must see through it via footer metadata and repartition
    (the x30 probe regression: 55 s serial explode vs 4 s)."""
    from train_reports_etl_spark.util import repartition_if_coarse

    p = str(tmp_path / "one_rg.parquet")
    _write_single_rowgroup_parquet(p, 5000)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    try:
        df = spark.read.parquet(p)
        planned = df.rdd.getNumPartitions()
        target = min(planned, 8)
        assert planned >= target  # the lying case: splits look plentiful
        nonempty = (
            df.select(F.spark_partition_id().alias("p")).distinct().count()
        )
        assert nonempty == 1  # ...but all rows live in one task
        out = repartition_if_coarse(df, min_partitions=target)
        assert out.rdd.getNumPartitions() == target
        assert out.count() == 5000
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_repartition_if_coarse_backs_off_on_real_rowgroups(spark, tmp_path):
    """Many row groups = the scan parallelizes natively; the guard must
    NOT add a shuffle (returns the input frame untouched)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from train_reports_etl_spark.util import repartition_if_coarse

    p = str(tmp_path / "many_rg.parquet")
    tbl = pa.Table.from_pandas(
        pd.DataFrame({"doc_id": range(4000), "text": ["y" * 200] * 4000})
    )
    pq.write_table(tbl, p, row_group_size=250)  # 16 row groups
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    try:
        df = spark.read.parquet(p)
        planned = df.rdd.getNumPartitions()
        assert planned >= 2
        target = min(planned, 16)  # 16 row groups back every split
        out = repartition_if_coarse(df, min_partitions=target)
        assert out is df
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_repartition_if_coarse_widens_coarse_plans(spark):
    """Planned partitions below target (the original 2-3-split dim
    case) still repartitions, including for non-file inputs."""
    from train_reports_etl_spark.util import repartition_if_coarse

    df = spark.range(100).coalesce(1)
    out = repartition_if_coarse(df, min_partitions=6)
    assert out.rdd.getNumPartitions() == 6
    assert out.count() == 100


def test_trigram_lm_gate_flags(spark, sf_dir):
    """keep/is_heldout are pure functions of the score and id."""
    from train_reports_etl_spark.extensions.ext_queries import (
        _TRIGRAM_LM_KEEP_MB,
        e4_trigram_lm_perplexity,
    )

    rows = e4_trigram_lm_perplexity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["keep"] == (r["millibits_per_trigram"] <= _TRIGRAM_LM_KEEP_MB)
        assert r["is_heldout"] == (r["doc_id"] % 10 >= 8)


def _py_link_prediction(edge_list, top_k=100):
    """Independent reference: dict/set common-neighbor scoring."""
    nbrs: dict = {}
    edges = set()
    for u, v in edge_list:
        if u == v:
            continue
        edges.add((min(u, v), max(u, v)))
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    out = []
    nodes = sorted(nbrs)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if (a, b) in edges:
                continue
            cn = len(nbrs[a] & nbrs[b])
            if cn == 0:
                continue
            un = len(nbrs[a] | nbrs[b])
            out.append((a, b, cn, un, math.floor(1000.0 * cn / un + 0.5)))
    out.sort(key=lambda r: (-r[2], r[0], r[1]))
    return out[:top_k]


def test_link_prediction_matches_reference(spark):
    """Kite graph + appendage: Spark rows == the set-based reference
    (scores, unions, jaccard_milli, ordering and the adjacency
    exclusion all pinned)."""
    from train_reports_etl_spark.extensions.graph import link_prediction

    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    edf = spark.createDataFrame(edges, "u long, v long")
    got = [
        (r.node_a, r.node_b, r.common_neighbors, r.union_neighbors, r.jaccard_milli)
        for r in link_prediction(edf).collect()
    ]
    assert got == _py_link_prediction(edges)
    assert all((a, b) not in {(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)} for a, b, *_ in got)


def test_link_prediction_top_k_total_order(spark):
    """top_k truncates under the documented total order — equal-score
    ties resolve by (node_a, node_b), never by partitioning."""
    from train_reports_etl_spark.extensions.graph import link_prediction

    # star: center 0, leaves 1..6 — all leaf pairs tie at cn=1
    edges = [(0, i) for i in range(1, 7)]
    edf = spark.createDataFrame(edges, "u long, v long")
    got = [(r.node_a, r.node_b) for r in link_prediction(edf, top_k=5).collect()]
    assert got == [(1, 2), (1, 3), (1, 4), (1, 5), (1, 6)]


def test_link_prediction_mid_degree_cap_drops_hub_wedges(spark):
    """max_mid_degree prunes super-hub common neighbors (their wedges
    vanish) while Jaccard unions keep TRUE degrees."""
    from train_reports_etl_spark.extensions.graph import link_prediction

    # hub 0 touches everyone; 1-2 also share low-degree neighbor 3
    edges = [(0, i) for i in range(1, 5)] + [(1, 3), (2, 3)]
    edf = spark.createDataFrame(edges, "u long, v long")
    full = {(r.node_a, r.node_b): r.common_neighbors for r in link_prediction(edf).collect()}
    capped_rows = link_prediction(edf, max_mid_degree=3).collect()
    capped = {(r.node_a, r.node_b): r.common_neighbors for r in capped_rows}
    assert full[(1, 2)] == 2  # via hub 0 and via 3
    assert capped[(1, 2)] == 1  # hub wedge pruned
    # union still uses true degrees: deg(1)=2 {0,3}, deg(2)=2 {0,3}, cn=1 -> union 3
    r12 = next(r for r in capped_rows if (r.node_a, r.node_b) == (1, 2))
    assert r12.union_neighbors == 3


def _py_mattr(texts, window=20):
    import re

    out = {}
    for i, t in texts.items():
        toks = re.findall(r"[a-z0-9]+", t.lower())
        n = len(toks)
        if n == 0:
            continue
        if n >= window:
            wins = [
                len(set(toks[j : j + window])) for j in range(n - window + 1)
            ]
            denom = window * len(wins)
        else:
            wins = [len(set(toks))]
            denom = n
        s = sum(wins)
        out[i] = (n, len(wins), s, math.floor(1000.0 * s / denom + 0.5))
    return out


def test_mattr_matches_reference(spark):
    """Windowed, short-fallback and empty-doc paths all pinned against
    a pure-Python recomputation (window=5 to exercise both regimes)."""
    from train_reports_etl_spark.extensions.text import mattr_lexical_diversity

    texts = {
        0: "a b c d e f g a b c",      # 10 tokens, 6 windows of 5
        1: "x x x x x x x",            # zero diversity, repeated token
        2: "one two three",            # short fallback: 1 window of 3
        3: "",                         # no tokens: dropped
        4: "Q w E r T y U i O p Q w",  # case-folding + exactly repeating head
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_windows, r.sum_window_types, r.mattr_milli)
        for r in mattr_lexical_diversity(docs, window=5).collect()
    }
    assert got == _py_mattr(texts, window=5)
    assert 3 not in got
    # repeated-token doc bottoms out at 1 type per window -> 200 milli at w=5
    assert got[1][3] == 200


def test_mattr_is_length_unbiased_unlike_ttr(spark):
    """The reason the op exists: duplicating a doc's text leaves MATTR
    (asymptotically) stable while plain TTR halves."""
    from train_reports_etl_spark.extensions.text import mattr_lexical_diversity

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(0, base), (1, " ".join([base] * 8))], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.mattr_milli
        for r in mattr_lexical_diversity(docs, window=5).collect()
    }
    # TTR of doc 1 is 10/80 = 125 milli; MATTR stays at full diversity
    assert got[0] == 1000
    assert got[1] >= 900


# ----- property-based pins (batch-per-example, repo convention) -----

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_HSETTINGS = dict(max_examples=5, deadline=None)

_gen_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=60,
)


@given(st.lists(_gen_text, min_size=1, max_size=15), st.integers(2, 8))
@settings(**_HSETTINGS)
def test_mattr_property_matches_python(spark, texts, window):
    """MATTR ≡ the pure-Python reference on arbitrary unicode text and
    window sizes — pins the window/fallback boundary (n == window ± 1)
    and unicode lower()+tokenize interplay the fixed cases can't."""
    from train_reports_etl_spark.extensions.text import mattr_lexical_diversity

    tmap = {i: t for i, t in enumerate(texts)}
    docs = spark.createDataFrame(
        [(i, t) for i, t in tmap.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_windows, r.sum_window_types, r.mattr_milli)
        for r in mattr_lexical_diversity(docs, window=window).collect()
    }
    # python re's [a-z0-9] on str.lower() differs from Java on a few
    # unicode foldings; compare through the SAME token streams instead
    toks_rows = docs.select(
        "doc_id", F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0)).alias("t")
    ).collect()
    want = {}
    for r in toks_rows:
        toks, n = r.t, len(r.t)
        if n == 0:
            continue
        if n >= window:
            wins = [len(set(toks[j : j + window])) for j in range(n - window + 1)]
            denom = window * len(wins)
        else:
            wins = [len(set(toks))]
            denom = n
        s = sum(wins)
        want[r.doc_id] = (n, len(wins), s, math.floor(1000.0 * s / denom + 0.5))
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=40
    ),
    st.integers(1, 8),
)
@settings(**_HSETTINGS)
def test_link_prediction_property_matches_python(spark, edge_list, top_k):
    """link_prediction ≡ the set-based reference on random multigraphs
    (self-loops and duplicate/reversed edges included) for any top_k —
    pins symmetrization, dedup, adjacency exclusion and tie order."""
    from train_reports_etl_spark.extensions.graph import link_prediction

    edf = spark.createDataFrame(edge_list, "u long, v long")
    got = [
        (r.node_a, r.node_b, r.common_neighbors, r.union_neighbors, r.jaccard_milli)
        for r in link_prediction(edf, top_k=top_k).collect()
    ]
    assert got == _py_link_prediction(edge_list, top_k=top_k)
