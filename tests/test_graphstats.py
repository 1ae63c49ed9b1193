"""Triangle count + clustering coefficient
(operators/graphstats.py) — known graphs, a brute-force differential
model, and cross-engine parity."""

from __future__ import annotations

import itertools
import random

import duckdb
import pytest

from eventhub_to_timescale_spark.operators.graphstats import (
    graph_triangle_stats,
    graph_triangle_stats_oracle_sql,
)


def _stats(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return graph_triangle_stats(df).collect()[0]


def _brute(edges):
    """Set-based reference: canonical edges → count all-node triples."""
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({x for e in es for x in e})
    tri = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )
    deg = {n: 0 for n in nodes}
    for u, v in es:
        deg[u] += 1
        deg[v] += 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    return len(nodes), len(es), wedges, tri


class TestTriangleStats:
    def test_k4_plus_path(self, spark):
        edges = list(itertools.combinations([1, 2, 3, 4], 2)) + [
            (5, 6), (6, 7), (2, 1),  # duplicate reversed edge
        ]
        r = _stats(spark, edges)
        assert (
            r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"]
        ) == (7, 8, 13, 4)
        assert r["clustering_coeff"] == pytest.approx(12 / 13, abs=1e-6)

    def test_triangle_free_graph(self, spark):
        edges = [(1, 2), (2, 3), (3, 4), (4, 5)]  # a path
        r = _stats(spark, edges)
        assert r["n_triangles"] == 0
        assert r["clustering_coeff"] == 0.0

    def test_matches_brute_force_on_random_graphs(self, spark):
        rng = random.Random(3)
        for trial in range(3):
            edges = [
                (rng.randint(1, 25), rng.randint(1, 25)) for _ in range(80)
            ]
            edges = [e for e in edges if e[0] != e[1]]
            r = _stats(spark, edges)
            assert (
                r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"]
            ) == _brute(edges), f"trial {trial}"

    def test_matches_duckdb_oracle(self, spark):
        rng = random.Random(9)
        edges = [(rng.randint(1, 30), rng.randint(1, 30)) for _ in range(100)]
        edges = [e for e in edges if e[0] != e[1]]
        got = tuple(_stats(spark, edges))
        con = duckdb.connect()
        con.execute("CREATE TABLE p (doc_a BIGINT, doc_b BIGINT)")
        con.executemany("INSERT INTO p VALUES (?, ?)", edges)
        want = con.execute(
            graph_triangle_stats_oracle_sql("SELECT doc_a, doc_b FROM p")
        ).fetchall()[0]
        assert got == want


def test_empty_pair_frame_totals(spark):
    # r16 single-pass totals: n_edges = Σdeg/2 must coalesce to the
    # old COUNT(*)'s 0 on an empty graph, while n_wedges stays NULL
    # exactly as the bare SUM (and the DuckDB oracle) produced
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    r = graph_triangle_stats(df).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (0, 0, 0)
    assert r["n_wedges"] is None
    assert r["clustering_coeff"] == 0.0


def test_unpersisted_form_matches(spark):
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    cached = graph_triangle_stats(df).collect()
    lazy = graph_triangle_stats(df, persist_graph=False).collect()
    assert cached == lazy
