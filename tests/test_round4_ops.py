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
