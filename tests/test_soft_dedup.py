"""Unit tests for ops/graph.soft_dedup_weights (SoftDeDup-style
down-weighting of near-dup clusters).  DuckDB value parity lives in
test_oracle.py; these pin the weight math and the cluster grouping."""


def _ds(rows):
    import ray.data

    return ray.data.from_items(rows)


class TestSoftDedupWeights:
    def test_cluster_weights_and_singletons(self, ray_session):
        from marginalia_ray.ops.graph import soft_dedup_weights

        near = "the quick brown fox jumps over the lazy dog again and again"
        rows = [
            {"doc_id": 1, "text": near},
            {"doc_id": 2, "text": near},
            {"doc_id": 3, "text": near + " extra"},
            {"doc_id": 9, "text": "completely different words nothing shared here at all ok"},
        ]
        out = soft_dedup_weights(_ds(rows), threshold=0.5, method="jaccard").take_all()
        got = {r["doc_id"]: (r["cluster_size"], r["weight"]) for r in out}
        assert got[1] == (3, 0.333333)
        assert got[2] == (3, 0.333333)
        assert got[3] == (3, 0.333333)
        assert got[9] == (1, 1.0)
        assert len(got) == 4  # every input doc appears exactly once

    def test_all_unique_corpus_is_all_ones(self, ray_session):
        from marginalia_ray.ops.graph import soft_dedup_weights

        rows = [
            {"doc_id": i, "text": f"unique{i} totally different tokens d{i} e{i} f{i}"}
            for i in range(6)
        ]
        out = soft_dedup_weights(_ds(rows), threshold=0.5, method="jaccard").take_all()
        assert all(r["cluster_size"] == 1 and r["weight"] == 1.0 for r in out)
        assert len(out) == 6

    def test_weight_rounding_matches_sql(self, ray_session):
        # 1/3 and 1/7 hit the floor(1e6*x+0.5)/1e6 convention
        import math

        for n in (3, 7, 11):
            w = math.floor(1_000_000 / n + 0.5) / 1_000_000
            assert abs(w - 1 / n) < 1e-6
