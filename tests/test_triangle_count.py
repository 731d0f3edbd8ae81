"""triangle_count: degree-oriented wedge counting (Suri & Vassilvitskii,
WWW'11).  Covers both the single-task fast path and the distributed
shuffle path (forced via local_cap=0), canonicalization, and a
brute-force parity check on a pseudo-random graph."""

from itertools import combinations

import numpy as np
import pytest


def _ds(rows):
    import ray.data

    return ray.data.from_items(rows)


def _edges(pairs):
    return _ds([{"src": a, "dst": b} for a, b in pairs])


def _brute(pairs):
    es = set()
    for a, b in pairs:
        if a != b:
            es.add((min(a, b), max(a, b)))
    nodes = sorted({n for e in es for n in e})
    tris = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )
    return len(nodes), len(es), tris


@pytest.mark.parametrize(
    "local_cap,num_partitions", [(2_000_000, None), (0, 4)]
)
class TestTriangleCount:
    def test_k4_and_canonicalization(self, ray_session, local_cap, num_partitions):
        from marginalia_ray.ops.graph import triangle_count

        k4 = [(a, b) for a, b in combinations([1, 2, 5, 9], 2)]
        # duplicates, reversals and self-loops must not change the census
        noisy = k4 + [(b, a) for a, b in k4] + [(1, 2)] * 3 + [(5, 5)]
        got = triangle_count(
            _edges(noisy), local_cap=local_cap, num_partitions=num_partitions
        ).take_all()
        assert got == [{"n_nodes": 4, "n_edges": 6, "n_triangles": 4}]

    def test_triangle_free_path(self, ray_session, local_cap, num_partitions):
        from marginalia_ray.ops.graph import triangle_count

        got = triangle_count(
            _edges([(1, 2), (2, 3), (3, 4)]),
            local_cap=local_cap,
            num_partitions=num_partitions,
        ).take_all()[0]
        assert got["n_triangles"] == 0 and got["n_edges"] == 3

    def test_random_graph_matches_brute_force(self, ray_session, local_cap, num_partitions):
        from marginalia_ray.ops.graph import triangle_count

        rng = np.random.RandomState(7)
        pairs = [
            (int(rng.randint(0, 30)), int(rng.randint(0, 30))) for _ in range(200)
        ]
        n_nodes, n_edges, tris = _brute(pairs)
        got = triangle_count(
            _edges(pairs), local_cap=local_cap, num_partitions=num_partitions
        ).take_all()[0]
        assert got == {
            "n_nodes": n_nodes,
            "n_edges": n_edges,
            "n_triangles": tris,
        }


def test_empty_graph_self_loops_only(ray_session):
    from marginalia_ray.ops.graph import triangle_count

    got = triangle_count(_edges([(3, 3), (7, 7)])).take_all()
    assert got == [{"n_nodes": 0, "n_edges": 0, "n_triangles": 0}]


def test_hub_wedge_guard(ray_session):
    from marginalia_ray.ops.graph import triangle_count

    # a pure star generates ZERO wedges after degree orientation (leaves
    # all point at the hub) — the guard needs genuinely dense
    # neighborhoods, so use a complete graph
    k10 = [(a, b) for a, b in combinations(range(10), 2)]
    with pytest.raises(Exception, match="wedges"):
        triangle_count(
            _edges(k10), local_cap=0, max_block_wedges=10, num_partitions=2
        ).take_all()


def test_local_path_wedge_guard(ray_session):
    from marginalia_ray.ops.graph import triangle_count

    # dense graph under the edge fast-path cap must still hit the wedge
    # guard on the single-task path
    k10 = [(a, b) for a, b in combinations(range(10), 2)]
    with pytest.raises(Exception, match="single-task fast path"):
        triangle_count(_edges(k10), max_block_wedges=10).take_all()
