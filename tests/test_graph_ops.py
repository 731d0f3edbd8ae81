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


class TestDomainAdjacencies:
    """WebsiteAdjacenciesCalculator port (similar-domains weighted cosine).

    The weighted cosine only counts shared sources that are THEMSELVES
    eligible dests (``getWeights`` fills weights for the dest list only;
    everything else is the array default 0 —
    WebsiteAdjacenciesCalculator.java:139-141, AdjacenciesData.java:
    114-127), so each fixture links source nodes from node 0 to make them
    dests with cardinality 2."""

    def _run(self, edges, ray_session, **kw):
        import ray.data

        from marginalia_ray.ops.graph import domain_adjacencies

        ds = ray.data.from_items(
            [{"source": s, "dest": d} for s, d in edges]
        ).repartition(3)
        out = domain_adjacencies(ds, **kw).to_pandas()
        if len(out) == 0:
            return out
        return out.sort_values(["domain_id", "neighbor_id"]).reset_index(drop=True)

    @staticmethod
    def _weighted_sources(n_dst: int = 2, n_src: int = 12):
        edges = [(0, s) for s in range(1, n_src + 1)]
        for dst in range(100, 100 + n_dst):
            edges += [(s, dst) for s in range(1, n_src + 1)]
        return edges

    def test_identical_inlink_sets_are_strongly_related(self, ray_session):
        out = self._run(self._weighted_sources(), ray_session)
        pairs = {
            (r.domain_id, r.neighbor_id): r.relatedness for r in out.itertuples()
        }
        # the two big dests share all 12 weighted sources (only their self
        # terms differ) -> symmetric, near-1, and their own best neighbor
        assert pairs[(100, 101)] == pairs[(101, 100)] > 0.9
        # the small source-dests (card 2 < min_probe_card) never probe
        assert all(d >= 100 for d, _ in pairs)
        # but they DO appear as candidates of the big dests
        assert (100, 1) in pairs and pairs[(100, 1)] < pairs[(100, 101)]

    def test_zero_weight_when_no_shared_source_is_a_dest(self, ray_session):
        # sources are never dests -> weighted intersection is 0 -> the
        # expensive-cosine filter drops everything (the Java array-default)
        edges = [(s, 100) for s in range(1, 13)] + [(s, 101) for s in range(1, 13)]
        assert len(self._run(edges, ray_session)) == 0

    def test_probe_cardinality_floor(self, ray_session):
        edges = self._weighted_sources(n_src=6)  # big-dest card 7 < 10
        assert len(self._run(edges, ray_session)) == 0
        out = self._run(edges, ray_session, min_probe_card=5)
        big = out[(out.domain_id >= 100) & (out.neighbor_id >= 100)]
        assert len(big) == 2  # (100,101) both ways; card-2 dests still mute

    def test_max_card_eligibility_drops_megadest(self, ray_session):
        out = self._run(self._weighted_sources(), ray_session, max_card=10)
        assert len(out) == 0  # big dests card 13 >= 10 -> out of universe

    def test_disjoint_sources_never_pair(self, ray_session):
        edges = [(0, s) for s in range(1, 25)]
        edges += [(s, 100) for s in range(1, 13)]
        edges += [(s, 101) for s in range(13, 25)]
        out = self._run(edges, ray_session)
        pairs = set(zip(out.domain_id, out.neighbor_id)) if len(out) else set()
        assert (100, 101) not in pairs and (101, 100) not in pairs

    def test_top_k_cap_and_tiebreak(self, ray_session):
        out = self._run(self._weighted_sources(n_dst=4), ray_session, top_k=2)
        got = out.groupby("domain_id")["neighbor_id"].apply(list).to_dict()
        # relatedness ties among the identical big dests break by id asc
        assert got[100] == [101, 102]
        assert got[103] == [100, 101]
