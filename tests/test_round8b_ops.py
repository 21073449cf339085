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
