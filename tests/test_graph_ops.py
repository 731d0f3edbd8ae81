"""Unit tests for distributed connected components (large-star/small-star)
and the SemDeDup semantic-dedup op."""

import numpy as np
import pyarrow as pa
import pytest


def _cc_labels(edges, nodes):
    """Reference union-find on the driver for comparison."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonicalize to component min
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _run_cc(edges, nodes, ray_session, **cc_kwargs):
    import ray.data

    from marginalia_ray.ops.graph import components_apply, connected_components

    edge_ds = ray.data.from_items([{"doc_a": a, "doc_b": b} for a, b in edges])
    node_ds = ray.data.from_items([{"doc_id": n} for n in nodes])
    stars = connected_components(edge_ds, **cc_kwargs)
    got = {
        r["doc_id"]: r["component"]
        for r in components_apply(node_ds, stars).take_all()
    }
    assert got == _cc_labels(edges, nodes)
    return got


def test_cc_simple_clusters(ray_session):
    edges = [(1, 2), (2, 3), (10, 11), (20, 20)]  # self-loop dropped
    nodes = [1, 2, 3, 4, 10, 11, 20]
    got = _run_cc(edges, nodes, ray_session)
    assert got[3] == 1 and got[11] == 10 and got[4] == 4 and got[20] == 20


def test_cc_long_chain_and_dup_edges(ray_session):
    # a 40-node chain exercises multi-round convergence (diameter >> 1)
    # on the STAR-ROUNDS path (local_cap=0 forces it); duplicate +
    # reversed edges exercise canonicalization
    edges = [(i, i + 1) for i in range(100, 140)]
    edges += [(i + 1, i) for i in range(100, 140, 3)]
    nodes = list(range(100, 141)) + [999]
    got = _run_cc(edges, nodes, ray_session, local_cap=0)
    assert all(got[n] == 100 for n in range(100, 141))
    assert got[999] == 999


def test_cc_random_graph_matches_union_find(ray_session):
    # both paths over the same random graph must agree with union-find
    rng = np.random.RandomState(7)
    nodes = list(range(300))
    edges = [tuple(sorted(rng.choice(300, 2, replace=False))) for _ in range(180)]
    _run_cc(edges, nodes, ray_session)  # local fast path
    _run_cc(edges, nodes, ray_session, local_cap=0)  # star rounds


def test_fuzzy_dedup_components_end_to_end(ray_session):
    import ray.data

    from marginalia_ray.ops.graph import fuzzy_dedup_components

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + " ok"},          # near-dup of 1
        {"doc_id": 3, "text": base + " ok yes"},      # near-dup of 2 (chain)
        {"doc_id": 4, "text": "completely different words about ray data pipelines"},
    ]
    out = {
        r["doc_id"]: r["component"]
        for r in fuzzy_dedup_components(
            ray.data.from_items(rows), threshold=0.5, method="jaccard"
        ).take_all()
    }
    assert len(out) == 4
    assert out[1] == 1 and out[2] == 1 and out[3] == 1  # transitive closure
    assert out[4] == 4


def test_semantic_dedup_keep_rule(ray_session):
    import ray.data

    from marginalia_ray.ops.similarity import semantic_dedup

    rng = np.random.RandomState(3)
    cents = rng.standard_normal((4, 16))
    a = rng.standard_normal(16)
    rows = [
        {"vec_id": 1, "embedding": list(a)},
        {"vec_id": 2, "embedding": list(a * 2.0)},          # cosine 1.0 with #1
        {"vec_id": 3, "embedding": list(a + rng.standard_normal(16) * 3)},
        {"vec_id": 4, "embedding": list(-a)},               # cosine -1 with #1
    ]
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            ray.data.from_items(rows), threshold=0.95, centroids=cents
        ).take_all()
    }
    assert len(out) == 4
    assert out[1]["keep"] == 1
    assert out[2]["keep"] == 0  # lower-id exact duplicate exists in its cluster
    assert out[2]["cluster"] == out[1]["cluster"]
    assert out[4]["keep"] == 1  # opposite direction, never above threshold


def test_near_dedup_apply_cap_fallback_matches_broadcast(ray_session):
    """Round-3 VERDICT #3: above max_dropped_ids the anti-filter becomes a
    dataset-side anti-semi-join — same survivors, no driver growth, no
    hard error."""
    import ray.data

    from marginalia_ray.ops.graph import near_dedup_apply

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [{"doc_id": i, "text": base + " ok" * (i % 3)} for i in range(1, 9)]
    rows += [
        {"doc_id": 100 + i, "text": f"completely different words number {i} " * 6}
        for i in range(4)
    ]
    ds = ray.data.from_items(rows).repartition(5)
    fast = sorted(
        r["doc_id"]
        for r in near_dedup_apply(ds, threshold=0.5, method="jaccard").take_all()
    )
    slow = sorted(
        r["doc_id"]
        for r in near_dedup_apply(
            ds, threshold=0.5, method="jaccard", max_dropped_ids=1
        ).take_all()
    )
    assert fast == slow
    assert set(r["doc_id"] for r in rows) - set(fast)  # something was dropped
    assert all(100 + i in fast for i in range(4))  # uniques survive
