"""Graph operators (operators/graph.py): connected components and
integer PageRank, verified against scalar references."""

import numpy as np
from pyspark.sql import Row, functions as F

from spapy_spark.operators import graph


def ref_components(edges):
    """Scalar union-find."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_cc_random_graph(spark):
    rng = np.random.default_rng(13)
    edges = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, 300, 400), rng.integers(0, 300, 400))
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["cluster"]
        for r in graph.connected_components(df).collect()
    }
    assert got == ref_components(edges)


def test_cc_long_chain_pointer_doubling(spark):
    # 200-node path: plain propagation needs ~200 rounds; doubling
    # must close it inside the 25-round cap
    edges = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = graph.connected_components(df, max_iter=25).collect()
    assert len(out) == 201
    assert all(r["cluster"] == 0 for r in out)


def test_cc_raises_when_unconverged(spark):
    # 60-node path with max_iter=2 cannot reach the fixpoint; silent
    # truncation would hand wrong clusters to dedup_clusters
    import pytest

    edges = [(i, i + 1) for i in range(60)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(df, max_iter=2)


def test_cc_self_loops_and_dupes(spark):
    edges = [(1, 1), (2, 3), (3, 2), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["cluster"]
        for r in graph.connected_components(df).collect()
    }
    # pure self-loop nodes have no real edges → absent; 2-3 merge
    assert got == {2: 2, 3: 2}


def test_dedup_clusters_canonical_flag(spark):
    df = spark.createDataFrame(
        [(10, 20), (20, 30), (40, 50)], "id_a long, id_b long"
    )
    rows = {r["node"]: r for r in graph.dedup_clusters(df).collect()}
    assert rows[10]["is_canonical"] and rows[40]["is_canonical"]
    assert not rows[20]["is_canonical"] and not rows[30]["is_canonical"]
    assert rows[30]["cluster"] == 10 and rows[50]["cluster"] == 40


def test_minhash_pairs_to_clusters_pipeline(spark):
    """End-to-end dedup: near-identical docs → minhash band collisions
    → connected components → canonical survivors."""
    from spapy_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        Row(doc_id=1, text=base),
        Row(doc_id=2, text=base + " x"),       # near-dup of 1
        Row(doc_id=3, text=base + " x y"),     # near-dup of 2 (chain)
        Row(doc_id=4, text="completely different content about spark "
                           "engines and parquet files at scale"),
    ]
    df = spark.createDataFrame(rows)
    pairs = dedup.minhash_candidate_pairs(df, n_hashes=16, bands=8)
    out = {r["node"]: r for r in graph.dedup_clusters(pairs).collect()}
    # 1-2-3 collapse into one cluster with 1 canonical; 4 is untouched
    assert out[1]["is_canonical"]
    assert out[2]["cluster"] == 1 and out[3]["cluster"] == 1
    assert 4 not in out  # no collision → never entered the pair graph


def ref_pagerank_int(edges, nodes, n_iter=5, damping_pct=85):
    from collections import defaultdict

    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    r = {n: graph.RANK_UNIT for n in nodes}
    base = (100 - damping_pct) * graph.RANK_UNIT // 100
    for _ in range(n_iter):
        acc = defaultdict(int)
        for s, d in edges:
            if s in r:
                acc[d] += r[s] // outdeg[s]
        r = {n: base + damping_pct * acc.get(n, 0) // 100 for n in nodes}
    return r


def test_pagerank_matches_scalar_reference(spark):
    rng = np.random.default_rng(99)
    nodes = list(range(50))
    edges = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, 50, 150), rng.integers(0, 50, 150))
    ]
    ndf = spark.createDataFrame([Row(id=n) for n in nodes])
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: r["rank"]
        for r in graph.pagerank_int(edf, ndf, n_iter=5).collect()
    }
    assert got == ref_pagerank_int(edges, nodes)


def test_pagerank_sink_gets_base_only(spark):
    # node 2 has no in-links after iteration: rank = base every round
    ndf = spark.createDataFrame([Row(id=1), Row(id=2)])
    edf = spark.createDataFrame([(2, 1)], "src long, dst long")
    got = {
        r["id"]: r["rank"] for r in graph.pagerank_int(edf, ndf).collect()
    }
    assert got[2] == 150_000
    assert got[1] > got[2]


def test_pagerank_mass_is_deterministic_across_partitionings(spark):
    nodes = list(range(40))
    edges = [(i, (i * 7 + 3) % 40) for i in nodes] + [
        (i, (i * 13 + 11) % 40) for i in nodes
    ]
    ndf = spark.createDataFrame([Row(id=n) for n in nodes])
    for parts in (1, 7):
        edf = spark.createDataFrame(
            edges, "src long, dst long"
        ).repartition(parts)
        got = sorted(
            (r["id"], r["rank"])
            for r in graph.pagerank_int(edf, ndf, n_iter=4).collect()
        )
        if parts == 1:
            first = got
        else:
            assert got == first
