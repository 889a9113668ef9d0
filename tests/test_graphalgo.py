"""Fixed-point PageRank: engine vs an independent pure-Python twin."""

from __future__ import annotations

from conftest import SF_TINY

from mmgraphrag_spark import api
from mmgraphrag_spark.operators import graphalgo


def _py_pagerank(names, undirected_edges, iters=5, damping_pct=85,
                 scale=graphalgo.SCALE):
    """The same integer recurrence, dict-and-loop (no Spark, no SQL)."""
    adj: dict[str, set[str]] = {n: set() for n in names}
    for a, b in undirected_edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rank = {n: scale for n in names}
    base = (100 - damping_pct) * scale // 100
    for _ in range(iters):
        contrib = {n: 0 for n in names}
        for u, vs in adj.items():
            if u not in rank or not vs:
                continue
            share = rank[u] // len(vs)
            for v in vs:
                if v in contrib:
                    contrib[v] += share
        rank = {n: base + (damping_pct * contrib[n]) // 100 for n in names}
    return rank


def test_pagerank_matches_python_twin_and_ranks_hub_first(spark):
    # star (hub h, leaves l1..l4) + a disjoint pair + an isolated node
    names = ["h", "l1", "l2", "l3", "l4", "p1", "p2", "iso"]
    edges = [("h", "l1"), ("h", "l2"), ("h", "l3"), ("h", "l4"), ("p1", "p2")]
    ndf = spark.createDataFrame([(n,) for n in names], "entity_name string")
    edf = spark.createDataFrame(edges, "src string, dst string")

    got = {
        r.entity_name: r.rank_scaled
        for r in graphalgo.pagerank(ndf, edf).collect()
    }
    want = _py_pagerank(names, edges)
    assert got == want
    # the hub dominates its leaves; leaves are symmetric; isolated node
    # holds exactly the teleport fixpoint of the recurrence
    assert got["h"] > got["l1"] == got["l2"] == got["l3"] == got["l4"]
    assert got["iso"] == (100 - 85) * graphalgo.SCALE // 100
    assert got["p1"] == got["p2"]


def test_pagerank_fused_graph_mass_and_determinism(spark):
    df = api.pagerank(spark, SF_TINY)
    rows = df.collect()
    assert len(rows) > 0
    n, e = api.fused_graph(spark, SF_TINY)
    # one rank per fused node, every rank >= the teleport floor
    assert len(rows) == n.count()
    floor = (100 - 85) * graphalgo.SCALE // 100
    assert all(r.rank_scaled >= floor for r in rows)
    # integer contract => bit-identical across a re-run (fresh plan)
    again = {r.entity_name: r.rank_scaled for r in api.pagerank(spark, SF_TINY).collect()}
    assert {r.entity_name: r.rank_scaled for r in rows} == again
