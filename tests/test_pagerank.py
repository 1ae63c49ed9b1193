"""Integer fixed-point PageRank (operators/pagerank.py): mass
conservation, centrality ordering, determinism, graph edge cases."""

from __future__ import annotations

import pytest

from eventhub_to_timescale_spark.operators.pagerank import (
    SCALE,
    pagerank,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def test_star_center_outranks_leaves(spark):
    # star: 0-1, 0-2, 0-3 — the hub collects mass from three leaves
    got = {r["doc_id"]: r["rank_fp"]
           for r in pagerank(_pairs(spark, [(0, 1), (0, 2), (0, 3)])).collect()}
    assert len(got) == 4
    assert got[0] > got[1]
    assert got[1] == got[2] == got[3]  # leaves symmetric


def test_mass_approximately_conserved(spark):
    # integer div leaks < iters * N sub-units; total stays ~SCALE
    got = pagerank(_pairs(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])).collect()
    total = sum(r["rank_fp"] for r in got)
    assert abs(total - SCALE) < 1000


def test_symmetric_cycle_uniform(spark):
    # a 4-cycle is vertex-transitive: all ranks identical
    got = {r["rank_fp"]
           for r in pagerank(_pairs(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])).collect()}
    assert len(got) == 1


def test_zero_iters_is_uniform_base(spark):
    got = {r["rank_fp"]
           for r in pagerank(_pairs(spark, [(0, 1), (1, 2)]), iters=0).collect()}
    assert got == {SCALE // 3}


def test_empty_graph(spark):
    got = pagerank(_pairs(spark, [])).collect()
    assert got == []


def test_matches_float_pagerank_closely(spark):
    # the fixed-point result tracks textbook float PageRank to ~1e-9
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4)]
    got = {r["doc_id"]: r["rank_fp"] / SCALE
           for r in pagerank(_pairs(spark, edges), iters=3).collect()}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = len(adj)
    p = {v: 1 / n for v in adj}
    for _ in range(3):
        p = {
            v: 0.15 / n + 0.85 * sum(p[u] / len(adj[u]) for u in adj[v])
            for v in adj
        }
    for v in adj:
        assert got[v] == pytest.approx(p[v], abs=1e-6)


def test_rejects_negative_iters(spark):
    with pytest.raises(ValueError):
        pagerank(_pairs(spark, [(0, 1)]), iters=-1)
