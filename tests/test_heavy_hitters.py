"""Unit tests for ops/sketch.heavy_hitters (exact two-pass heavy hitters
with Misra-Gries-style local candidate generation).  The DuckDB value
parity lives in test_oracle.py; these cover the pruning guarantee, the
batching-independence of the exact result, and the candidate cap."""

import pytest


def _ds(rows, parallelism=None):
    import ray.data

    if parallelism:
        return ray.data.from_items(rows, override_num_blocks=parallelism)
    return ray.data.from_items(rows)


def _hh_dict(ds, **kw):
    from marginalia_ray.ops.sketch import heavy_hitters

    out = heavy_hitters(ds, **kw).take_all()
    return {r["term"]: r["cnt"] for r in out}


class TestHeavyHitters:
    def test_exact_counts_long_tail(self, ray_session):
        # "hot" is 40 of 130 tokens (>= 1/4); each raretoken appears once
        rows = [{"doc_id": i, "text": "hot " * 4 + f"rare{i}"} for i in range(10)]
        rows += [{"doc_id": 100 + i, "text": f"tailword{i} x y z " * 2} for i in range(10)]
        got = _hh_dict(_ds(rows), num=1, den=4)
        # corpus: 10*5 + 10*8 = 130 tokens; only 'hot' (40) reaches 130/4
        assert got == {"hot": 40}

    def test_threshold_boundary_is_inclusive(self, ray_session):
        # 4 tokens total, 'a' has 2 = exactly 1/2 of mass -> included
        rows = [{"doc_id": 1, "text": "a a b c"}]
        got = _hh_dict(_ds(rows), num=1, den=2)
        assert got == {"a": 2}

    def test_batching_independent(self, ray_session):
        # a term that is NOT a local heavy hitter in any one skewed batch
        # arrangement must still be found if globally heavy: spread 'ub'
        # thinly across many docs, pad each doc with unique tokens
        rows = [
            {"doc_id": i, "text": f"ub u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f u{i}g u{i}h"}
            for i in range(32)
        ]
        # 'ub' = 32 of 288 tokens = 1/9 of mass
        for par in (1, 4, 16):
            got = _hh_dict(_ds(rows, parallelism=par), num=1, den=9)
            assert got == {"ub": 32}, f"parallelism={par}"

    def test_candidate_cap_fails_loud(self, ray_session):
        # threshold so low every token is a local candidate; tiny cap
        rows = [{"doc_id": i, "text": f"w{i}a w{i}b w{i}c"} for i in range(20)]
        from marginalia_ray.ops.sketch import heavy_hitters

        with pytest.raises(RuntimeError, match="candidates"):
            heavy_hitters(
                _ds(rows), num=1, den=1000, max_candidates=5
            ).take_all()

    def test_empty_and_no_hitters(self, ray_session):
        # uniform corpus where no token reaches the bar -> empty output
        rows = [{"doc_id": i, "text": f"t{i}x t{i}y"} for i in range(10)]
        got = _hh_dict(_ds(rows), num=1, den=4)
        assert got == {}


class TestHeavyNgrams:
    def test_trigram_counts_exact(self, ray_session):
        # "a b c" appears in docs 1 and 2 (3 of 8 total trigrams >= 1/3)
        rows = [
            {"doc_id": 1, "text": "a b c d"},      # trigrams: "a b c", "b c d"
            {"doc_id": 2, "text": "x a b c"},      # "x a b", "a b c"
            {"doc_id": 3, "text": "p q r s t"},    # "p q r", "q r s", "r s t"
        ]
        got = _hh_dict(_ds(rows), num=1, den=4, ngram=3)
        # 7 trigrams total; only "a b c" (2) reaches 7/4
        assert got == {"a b c": 2}

    def test_windows_never_cross_documents(self, ray_session):
        # "c d" + "e f" adjacency across two docs must NOT form a bigram
        rows = [
            {"doc_id": 1, "text": "c d"},
            {"doc_id": 2, "text": "e f"},
            {"doc_id": 3, "text": "c d"},
        ]
        got = _hh_dict(_ds(rows), num=1, den=2, ngram=2)
        assert got == {"c d": 2}
        assert "d e" not in got
