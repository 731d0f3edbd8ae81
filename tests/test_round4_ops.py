"""Unit tests for the round-4 additions: normalized_dedup (ops/dedup.py),
pmi_collocations (ops/curation.py), rrf_fusion (ops/bm25.py).  The
DuckDB value-parity check for all three lives in test_oracle.py; these
cover the semantic edges the oracle fixture can't reach."""

import math

import numpy as np
import pytest


def _ds(rows):
    import ray.data

    return ray.data.from_items(rows)


class TestNormalizedDedup:
    def test_case_punct_whitespace_collapse(self, ray_session):
        from marginalia_ray.ops.dedup import normalized_dedup

        rows = [
            {"doc_id": 1, "text": "Hello, World!"},
            {"doc_id": 2, "text": "hello   world"},  # same after normalize
            {"doc_id": 3, "text": "  HELLO-WORLD  "},  # same after normalize
            {"doc_id": 4, "text": "hello worlds"},  # different
        ]
        out = normalized_dedup(_ds(rows)).take_all()
        by_keep = {r["keep_doc_id"]: r["n_dups"] for r in out}
        assert by_keep == {1: 3, 4: 1}

    def test_distinct_from_exact_dedup(self, ray_session):
        # exact_dedup keeps both variants; normalized_dedup merges them
        from marginalia_ray.ops.dedup import exact_dedup, normalized_dedup

        rows = [
            {"doc_id": 1, "text": "a b c"},
            {"doc_id": 2, "text": "A b C"},
        ]
        assert len(exact_dedup(_ds(rows)).take_all()) == 2
        assert len(normalized_dedup(_ds(rows)).take_all()) == 1


class TestPmiCollocations:
    def test_pmi_value_matches_hand_computation(self, ray_session):
        from marginalia_ray.ops.curation import pmi_collocations

        # "x y" always adjacent; "p q" never adjacent (separated by filler)
        rows = [{"doc_id": i, "text": "x y p f q g"} for i in range(6)]
        out = pmi_collocations(_ds(rows), min_count=5, k=50).take_all()
        got = {(r["w1"], r["w2"]): (r["c_xy"], r["pmi"]) for r in out}
        # corpus: 6 docs * 6 tokens = 36 unigrams, 6*5 = 30 bigrams
        n, m = 36.0, 30.0
        exp = round(math.log((6 * n * n) / (m * 6 * 6)), 6)
        assert got[("x", "y")] == (6, exp)
        assert ("p", "q") not in got  # never adjacent

    def test_join_scale_path_matches_fast_path(self, ray_session):
        # fast_path_rows=0 forces the distributed hash-join route; it must
        # produce exactly the driver-side fast path's answer
        from marginalia_ray.ops.curation import pmi_collocations

        rows = [{"doc_id": i, "text": "x y p f q g x y"} for i in range(6)]
        fast = pmi_collocations(_ds(rows), min_count=5, k=50).take_all()
        slow = pmi_collocations(
            _ds(rows), min_count=5, k=50, fast_path_rows=0
        ).take_all()
        key = lambda r: (r["w1"], r["w2"])  # noqa: E731
        assert sorted(fast, key=key) == sorted(slow, key=key)
        assert len(fast) > 0

    def test_min_count_filters(self, ray_session):
        from marginalia_ray.ops.curation import pmi_collocations

        rows = [{"doc_id": 1, "text": "a b"}] * 1  # c_xy("a","b") = 1
        out = pmi_collocations(_ds(rows), min_count=2, k=10).take_all()
        assert out == []

    def test_order_is_pmi_desc_then_words(self, ray_session):
        from marginalia_ray.ops.curation import pmi_collocations

        rows = [{"doc_id": i, "text": "a b c d a b"} for i in range(5)]
        out = pmi_collocations(_ds(rows), min_count=5, k=50).take_all()
        keys = [(r["pmi"], r["w1"], r["w2"]) for r in out]
        assert keys == sorted(keys, key=lambda t: (-t[0], t[1], t[2]))


class TestQuantileByKey:
    def test_interpolated_quantile(self, ray_session):
        from marginalia_ray.ops.relational import quantile_by_key

        rows = [{"source": "a", "n_chars": v} for v in (10, 20, 30, 40)] + [
            {"source": "b", "n_chars": 7}
        ]
        out = quantile_by_key(_ds(rows), q=0.5, val_col="n_chars").take_all()
        got = {r["source"]: (r["n"], r["q50"]) for r in out}
        # q=0.5, n=4: pos = 1.5 -> 20 + (30-20)*0.5 = 25
        assert got == {"a": (4, 25.0), "b": (1, 7.0)}

    def test_q90_matches_numpy(self, ray_session):
        import numpy as np

        from marginalia_ray.ops.relational import quantile_by_key

        vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
        rows = [{"source": "s", "n_chars": v} for v in vals]
        out = quantile_by_key(_ds(rows), q=0.9).take_all()
        assert out[0]["q90"] == round(float(np.quantile(vals, 0.9)), 6)

    def test_bad_q_raises(self, ray_session):
        from marginalia_ray.ops.relational import quantile_by_key

        with pytest.raises(ValueError):
            quantile_by_key(_ds([{"source": "a", "n_chars": 1}]), q=1.5)


class TestNovelAgainstCorpus:
    def test_only_unseen_texts_survive(self, ray_session):
        from marginalia_ray.ops.dedup import novel_against_corpus

        seen = _ds(
            [
                {"doc_id": 1, "text": "alpha beta"},
                {"doc_id": 2, "text": "gamma delta"},
            ]
        )
        new = _ds(
            [
                {"doc_id": 10, "text": "alpha beta"},  # seen — dropped
                {"doc_id": 11, "text": "epsilon zeta"},  # novel
                {"doc_id": 12, "text": "epsilon zeta"},  # novel dup: BOTH kept
            ]
        )
        out = novel_against_corpus(new, seen).take_all()
        assert sorted(r["doc_id"] for r in out) == [11, 12]

    def test_exact_not_normalized(self, ray_session):
        # membership is exact content: a case variant is NOT seen
        from marginalia_ray.ops.dedup import novel_against_corpus

        seen = _ds([{"doc_id": 1, "text": "alpha beta"}])
        new = _ds([{"doc_id": 2, "text": "Alpha Beta"}])
        out = novel_against_corpus(new, seen).take_all()
        assert [r["doc_id"] for r in out] == [2]


class TestRrfFusion:
    def test_fusion_weights_exact(self, ray_session):
        from marginalia_ray.ops.bm25 import rrf_fusion

        rows = [
            {"doc_id": 1, "text": "spark spark spark"},  # top of list A only
            {"doc_id": 2, "text": "hash hash hash"},  # top of list B only
            {"doc_id": 3, "text": "spark hash"},  # in both lists
            {"doc_id": 4, "text": "filler words only"},  # in neither
        ]
        out = rrf_fusion(_ds(rows), ["spark"], ["hash"], k=10, n=5).to_pylist()
        got = {r["doc_id"]: r["rrf_score"] for r in out}
        assert 4 not in got
        # doc 3 is rank 2 in both lists: 2/(60+2); docs 1/2 rank 1 once
        assert got[3] == round(2 * (1.0 / 62), 6)
        assert got[1] == got[2] == round(1.0 / 61, 6)
        # both-lists doc must outrank single-list docs here
        assert got[3] > got[1]

    def test_no_hits_returns_empty_typed(self, ray_session):
        from marginalia_ray.ops.bm25 import rrf_fusion

        rows = [{"doc_id": 1, "text": "nothing relevant"}]
        out = rrf_fusion(_ds(rows), ["absent"], ["missing"], k=5, n=5)
        assert out.to_pylist() == []
        assert out.schema.names == ["doc_id", "rrf_score"]
