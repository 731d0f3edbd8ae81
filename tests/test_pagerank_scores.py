"""Unit tests for ops/graph.pagerank_scores (integer-exact PageRank).
DuckDB value parity lives in test_oracle.py; these pin the recurrence
against a hand-rolled reference, dangling redistribution, and edge
dedup."""

import numpy as np


def _ds(rows):
    import ray.data

    return ray.data.from_items(rows)


def _reference(edges, n_iter=3, scale=10**12, d_num=85, d_den=100):
    """Straightforward dict-based implementation of the documented
    integer recurrence."""
    edges = sorted(set(edges))
    nodes = sorted({v for e in edges for v in e})
    n = len(nodes)
    deg = {v: 0 for v in nodes}
    for s, _ in edges:
        deg[s] += 1
    r = {v: scale // n for v in nodes}
    base = ((d_den - d_num) * scale) // (d_den * n)
    for _ in range(n_iter):
        contrib = {v: (r[v] // deg[v] if deg[v] else 0) for v in nodes}
        acc = {v: 0 for v in nodes}
        for s, t in edges:
            acc[t] += contrib[s]
        dm = sum(r[v] for v in nodes if deg[v] == 0) // n
        r = {v: base + (d_num * (acc[v] + dm)) // d_den for v in nodes}
    return r


class TestPagerankScores:
    def test_matches_reference_recurrence(self, ray_session):
        from marginalia_ray.ops.graph import pagerank_scores

        edges = [(1, 2), (2, 3), (3, 1), (4, 1), (1, 3)]
        rows = [{"src": s, "dst": t} for s, t in edges]
        got = {r["node"]: r["rank"] for r in pagerank_scores(_ds(rows)).take_all()}
        assert got == _reference(edges)

    def test_dangling_mass_redistributed(self, ray_session):
        from marginalia_ray.ops.graph import pagerank_scores

        # node 9 has no out-edges: its mass spreads to every node
        edges = [(1, 9), (2, 9), (1, 2)]
        rows = [{"src": s, "dst": t} for s, t in edges]
        got = {r["node"]: r["rank"] for r in pagerank_scores(_ds(rows)).take_all()}
        ref = _reference(edges)
        assert got == ref
        assert got[9] > got[2] > got[1]  # sink collects the most mass

    def test_duplicate_edges_count_once(self, ray_session):
        from marginalia_ray.ops.graph import pagerank_scores

        base = [{"src": 1, "dst": 2}, {"src": 2, "dst": 1}]
        doubled = base + base
        a = {r["node"]: r["rank"] for r in pagerank_scores(_ds(base)).take_all()}
        b = {r["node"]: r["rank"] for r in pagerank_scores(_ds(doubled)).take_all()}
        assert a == b

    def test_empty_edges(self, ray_session):
        from marginalia_ray.ops.graph import pagerank_scores
        import ray.data
        import pyarrow as pa

        empty = ray.data.from_arrow(
            pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        )
        assert pagerank_scores(empty).count() == 0
