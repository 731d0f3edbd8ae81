"""Unit tests for the round-3 additions: near_dedup_apply (ops/graph.py),
linear_classifier (ops/classify.py), bloom_filter_membership
(ops/sketch.py), group_quality_filter (ops/curation.py)."""

import numpy as np
import pytest


def _ds(rows):
    import ray.data

    return ray.data.from_items(rows)


class TestNearDedupApply:
    def test_cluster_collapses_to_min(self, ray_session):
        from marginalia_ray.ops.graph import near_dedup_apply

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [
            {"doc_id": 1, "text": base, "tag": "a"},
            {"doc_id": 2, "text": base + " extra", "tag": "b"},  # near-dup of 1
            {"doc_id": 3, "text": "completely different words in this one here now", "tag": "c"},
        ]
        out = near_dedup_apply(_ds(rows), threshold=0.5, method="jaccard").take_all()
        ids = sorted(r["doc_id"] for r in out)
        assert ids == [1, 3]
        # all original columns survive
        assert {r["doc_id"]: r["tag"] for r in out} == {1: "a", 3: "c"}

    def test_transitive_chain_one_survivor(self, ray_session):
        # A~B and B~C but A!~C: the whole chain must collapse to min(A)
        from marginalia_ray.ops.graph import near_dedup_apply

        w = [f"w{i}" for i in range(12)]
        rows = [
            {"doc_id": 10, "text": " ".join(w[0:8])},
            {"doc_id": 11, "text": " ".join(w[2:10])},
            {"doc_id": 12, "text": " ".join(w[4:12])},
        ]
        out = near_dedup_apply(_ds(rows), threshold=0.3, method="jaccard").take_all()
        assert [r["doc_id"] for r in out] == [10]

    def test_no_dups_is_identity(self, ray_session):
        from marginalia_ray.ops.graph import near_dedup_apply

        rows = [
            {"doc_id": 1, "text": "one two three four five"},
            {"doc_id": 2, "text": "six seven eight nine ten"},
        ]
        out = near_dedup_apply(_ds(rows), threshold=0.5, method="jaccard").take_all()
        assert sorted(r["doc_id"] for r in out) == [1, 2]

    def test_drop_cap_falls_back_to_semi_join(self, ray_session):
        """Above max_dropped_ids the anti-filter switches to the dataset-side
        co-partitioned semi-join (round-3 VERDICT #3) instead of the old hard
        RuntimeError — same keep-first survivor either way."""
        from marginalia_ray.ops.graph import near_dedup_apply

        base = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [{"doc_id": i, "text": base} for i in range(8)]
        out = near_dedup_apply(
            _ds(rows), threshold=0.5, method="jaccard", max_dropped_ids=3
        ).take_all()
        assert [r["doc_id"] for r in out] == [0]


class TestLinearClassifier:
    def test_margin_matches_serial_reference(self, ray_session):
        import pyarrow as pa

        from marginalia_ray.ops.classify import CLF_SEED, _W_MOD, linear_classifier
        from marginalia_ray.ops.dedup import U64, _fmix64_vec, _token_hash_arrow

        rows = [
            {"doc_id": 1, "text": "Spark and RAY process data, data!"},
            {"doc_id": 2, "text": ""},
            {"doc_id": 3, "text": "one token"},
        ]
        out = {r["doc_id"]: r for r in linear_classifier(_ds(rows)).take_all()}

        def serial(text):
            import re

            toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
            if not toks:
                return 0, 0
            h = _token_hash_arrow(pa.array(toks, pa.string()))
            w = (_fmix64_vec(h ^ U64(CLF_SEED)) % U64(_W_MOD)).astype(np.int64) - 1000
            return int(w.sum()), len(toks)

        for r in rows:
            m, n = serial(r["text"])
            assert out[r["doc_id"]]["margin"] == m
            assert out[r["doc_id"]]["n_tokens"] == n
            assert out[r["doc_id"]]["label"] == int(m > 0)

    def test_repeated_token_counts_per_occurrence(self, ray_session):
        from marginalia_ray.ops.classify import linear_classifier

        one = linear_classifier(_ds([{"doc_id": 1, "text": "word"}])).take_all()[0]
        three = linear_classifier(_ds([{"doc_id": 1, "text": "word word word"}])).take_all()[0]
        assert three["margin"] == 3 * one["margin"]
        assert three["n_tokens"] == 3


class TestBloomMembership:
    def test_no_false_negatives(self, ray_session):
        from marginalia_ray.ops.sketch import bloom_filter_membership

        build = _ds([{"k": i} for i in range(0, 100, 7)])
        probe = _ds([{"k": i} for i in range(100)])
        out = {r["k"]: r["maybe_member"] for r in bloom_filter_membership(
            build, probe, "k", "k", n_bits=1 << 12, k=3
        ).take_all()}
        for i in range(0, 100, 7):
            assert out[i] == 1  # a Bloom filter can NEVER miss a member

    def test_misses_dominate_with_wide_filter(self, ray_session):
        from marginalia_ray.ops.sketch import bloom_filter_membership

        build = _ds([{"k": 1}, {"k": 2}])
        probe = _ds([{"k": i} for i in range(1000)])
        out = bloom_filter_membership(
            build, probe, "k", "k", n_bits=1 << 16, k=4
        ).take_all()
        hits = sum(r["maybe_member"] for r in out)
        # 8 bits set in 65536: false-positive odds ~ (8/65536)^4 per probe
        assert hits == 2

    def test_parameter_validation(self, ray_session):
        from marginalia_ray.ops.sketch import bloom_filter_membership

        with pytest.raises(ValueError, match="multiple of 64"):
            bloom_filter_membership(_ds([{"k": 1}]), _ds([{"k": 1}]), "k", "k", n_bits=100)


class TestGroupQualityFilter:
    def test_drops_whole_failing_group(self, ray_session):
        from marginalia_ray.ops.curation import group_quality_filter

        # quality = ln(n_tok / (1 + n_chars)): longer words => lower score
        good = "ab cd ef gh ij"  # 5 tokens / 14 chars
        bad = "abcdefghijklmnopqrstuvwxyz0123456789abcdefghijklmnop"  # 1 token
        rows = [
            {"doc_id": 1, "text": good, "source": "g"},
            {"doc_id": 2, "text": good, "source": "g"},
            {"doc_id": 3, "text": bad, "source": "b"},
            {"doc_id": 4, "text": good, "source": "b"},  # dragged down by 3
        ]
        out = group_quality_filter(
            _ds(rows), min_mean_quality=-2.0
        ).take_all()
        assert sorted(r["doc_id"] for r in out) == [1, 2]

    def test_all_pass_is_identity(self, ray_session):
        from marginalia_ray.ops.curation import group_quality_filter

        rows = [{"doc_id": 1, "text": "ab cd", "source": "s"}]
        out = group_quality_filter(_ds(rows), min_mean_quality=-100.0).take_all()
        assert len(out) == 1


class TestSimilarityJoin:
    def test_cross_pairs_only(self, ray_session):
        from marginalia_ray.ops.dedup import similarity_join

        base = "alpha beta gamma delta epsilon zeta eta theta"
        left = _ds([
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": "unrelated words entirely different content here"},
            # near-dup INSIDE left: must NOT pair
            {"doc_id": 3, "text": base},
        ])
        right = _ds([
            {"doc_id": 10, "text": base + " extra"},
            {"doc_id": 11, "text": "nothing in common with anything at all"},
        ])
        out = similarity_join(left, right, threshold=0.5).take_all()
        got = sorted((r["left_id"], r["right_id"]) for r in out)
        assert got == [(1, 10), (3, 10)]
        for r in out:
            assert 0.5 <= r["jaccard"] <= 1.0

    def test_equal_ids_are_legitimate_matches(self, ray_session):
        from marginalia_ray.ops.dedup import similarity_join

        t = "one two three four five six seven"
        left = _ds([{"doc_id": 7, "text": t}])
        right = _ds([{"doc_id": 7, "text": t}])
        out = similarity_join(left, right, threshold=0.9).take_all()
        assert len(out) == 1 and out[0]["jaccard"] == 1.0

    def test_jaccard_value_matches_exact(self, ray_session):
        from marginalia_ray.ops.dedup import similarity_join

        # shingles(3) of 5 tokens = 3; of the 6-token superset = 4;
        # overlap = 3 => jaccard = 3 / (3 + 4 - 3) = 0.75
        left = _ds([{"doc_id": 1, "text": "a b c d e"}])
        right = _ds([{"doc_id": 2, "text": "a b c d e f"}])
        out = similarity_join(left, right, threshold=0.5).take_all()
        assert len(out) == 1 and out[0]["jaccard"] == 0.75


class TestKMeans:
    def _emb_ds(self, vecs, ids=None):
        import pyarrow as pa
        import ray.data

        ids = ids or list(range(1, len(vecs) + 1))
        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, v)) for v in vecs],
                        pa.list_(pa.float32()),
                    ),
                }
            )
        )

    def test_assign_nearest_and_tie_to_lowest(self, ray_session):
        from marginalia_ray.ops.similarity import kmeans_assign

        cents = np.array([[0.0, 0.0], [10.0, 0.0]])
        ds = self._emb_ds([[1.0, 0.0], [9.0, 0.0], [5.0, 0.0]])  # last is a tie
        out = {r["vec_id"]: r for r in kmeans_assign(ds, cents).take_all()}
        assert out[1]["cluster"] == 0 and out[1]["dist"] == 1.0
        assert out[2]["cluster"] == 1 and out[2]["dist"] == 1.0
        assert out[3]["cluster"] == 0 and out[3]["dist"] == 25.0  # tie -> lowest id

    def test_update_means_and_empty_cluster_omitted(self, ray_session):
        from marginalia_ray.ops.similarity import kmeans_update

        cents = np.array([[0.0, 0.0], [10.0, 10.0], [100.0, 100.0]])
        ds = self._emb_ds([[1.0, 3.0], [3.0, 1.0], [9.0, 11.0]])
        rows = kmeans_update(ds, cents).take_all()
        got = {(r["cluster"], r["dim"]): (r["n"], r["value"]) for r in rows}
        assert got[(0, 1)] == (2, 2.0) and got[(0, 2)] == (2, 2.0)
        assert got[(1, 1)] == (1, 9.0) and got[(1, 2)] == (1, 11.0)
        assert not any(c == 2 for c, _ in got)  # empty cluster: no rows

    def test_lloyd_iteration_reduces_total_distance(self, ray_session):
        from marginalia_ray.ops.similarity import kmeans_assign, kmeans_update

        rng = np.random.default_rng(3)
        blob_a = rng.normal(0.0, 0.3, (30, 4))
        blob_b = rng.normal(5.0, 0.3, (30, 4))
        vecs = np.vstack([blob_a, blob_b])
        ds = self._emb_ds(vecs.tolist())
        cents = rng.normal(2.0, 1.0, (2, 4))  # poor initial centroids

        def total_dist(c):
            return sum(r["dist"] for r in kmeans_assign(ds, c).take_all())

        d0 = total_dist(cents)
        upd = kmeans_update(ds, cents).take_all()
        new = cents.copy()
        for r in upd:
            new[r["cluster"], r["dim"] - 1] = r["value"]
        d1 = total_dist(new)
        assert d1 < d0
        # second iteration converges onto the blob means
        upd2 = kmeans_update(ds, new).take_all()
        new2 = new.copy()
        for r in upd2:
            new2[r["cluster"], r["dim"] - 1] = r["value"]
        means = sorted(new2[:, 0].tolist())
        assert abs(means[0] - blob_a[:, 0].mean()) < 0.2
        assert abs(means[1] - blob_b[:, 0].mean()) < 0.2


class TestNgramNovelty:
    def test_unique_vs_shared_trigrams(self, ray_session):
        from marginalia_ray.ops.dedup import ngram_novelty

        shared = "alpha beta gamma delta"  # trigrams: abc, bcd (shared by 1,2)
        rows = [
            {"doc_id": 1, "text": shared},
            {"doc_id": 2, "text": shared + " epsilon"},  # adds 1 unique trigram
            {"doc_id": 3, "text": "wholly original words appearing nowhere else"},
        ]
        out = {r["doc_id"]: r for r in ngram_novelty(_ds(rows)).take_all()}
        assert out[1]["n_shingles"] == 2 and out[1]["n_unique"] == 0
        assert out[1]["novelty"] == 0.0
        assert out[2]["n_shingles"] == 3 and out[2]["n_unique"] == 1
        assert out[2]["novelty"] == round(1 / 3, 6)
        assert out[3]["novelty"] == 1.0

    def test_short_docs_emit_no_row(self, ray_session):
        from marginalia_ray.ops.dedup import ngram_novelty

        rows = [{"doc_id": 1, "text": "two words"}, {"doc_id": 2, "text": "a b c"}]
        out = {r["doc_id"]: r for r in ngram_novelty(_ds(rows)).take_all()}
        assert 1 not in out
        assert out[2]["n_shingles"] == 1
