"""Typeahead + spell-correction parity (reference assistant-service:
Suggestions.java / SpellChecker.java): the service class must mirror the
reference's trie-window + value-sort semantics, and the distributed ops
must match a brute-force in-memory reimplementation on the same corpus."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from marginalia_ray.ops.suggest import (
    _levenshtein_vec,
    _char_matrix,
    spell_correct,
    suggest_terms,
)
from marginalia_ray.query.suggest import MIN_SUGGEST_LENGTH, SpellChecker, Suggestions


def _lev_py(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class TestLevenshteinKernel:
    def test_matches_scalar_dp(self):
        words = ["", "a", "table", "tabel", "tble", "battle", "tablecloth", "xyzzy"]
        arr = pa.array(words, pa.large_string())
        chars, lens = _char_matrix(arr)
        for probe in ["table", "a", "zz", "tabel"]:
            got = _levenshtein_vec(chars, lens, probe)
            want = [_lev_py(w, probe) for w in words]
            np.testing.assert_array_equal(got, want)


from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.text(alphabet="ab1", min_size=0, max_size=8)


class TestLevenshteinProperty:
    @given(st.lists(_words, min_size=1, max_size=20), _words)
    @settings(max_examples=150, deadline=None)
    def test_vectorized_dp_equals_scalar(self, words, probe):
        # small alphabet forces dense collisions/near-misses
        arr = pa.array(words, pa.large_string())
        chars, lens = _char_matrix(arr)
        got = _levenshtein_vec(chars, lens, probe)
        np.testing.assert_array_equal(got, [_lev_py(w, probe) for w in words])

    @given(st.lists(_words, min_size=1, max_size=20), _words)
    @settings(max_examples=100, deadline=None)
    def test_spellchecker_equals_bruteforce(self, words, probe):
        import re as _re

        vocab = sorted(set(w for w in words if w))  # "" is dropped by init too
        if not vocab:
            return
        freqs = [len(w) + 1 for w in vocab]
        sc = SpellChecker(vocab, freqs)
        got = sc.correct(probe)
        if not _re.fullmatch(r"[a-z0-9]+", probe):
            assert got == []
            return
        fq = dict(zip(vocab, freqs))
        cand = [(w, _lev_py(probe, w)) for w in vocab if _lev_py(probe, w) <= 2]
        want = [w for w, d in sorted(cand, key=lambda x: (x[1], -fq[x[0]], x[0]))]
        assert got == want


class TestSpellChecker:
    def test_ranks_by_distance_then_freq(self):
        sc = SpellChecker(["table", "cable", "tables", "tale"], [5, 100, 7, 1])
        # d0: table; d1: cable (sub), tables (ins), tale (del) — freq desc
        assert sc.correct("table") == ["table", "cable", "tables", "tale"]

    def test_rejects_non_word(self):
        sc = SpellChecker(["table"], [1])
        assert sc.correct("ta ble!") == []

    def test_distance_cap(self):
        sc = SpellChecker(["table"], [1], max_dist=1)
        assert sc.correct("tle") == []

    def test_multiword_vocab_does_not_crash_bag_bound(self):
        # regression: a space byte used to overflow the 36-symbol
        # bincount in _bag_lower_bound (reshape ValueError / silent
        # cross-row corruption); multi-word terms now collapse into the
        # shared out-of-alphabet bucket
        svc = Suggestions(["ab cd", "abcd", "abce", "abcf"], [5, 10, 3, 2])
        assert svc.spell.correct("abcd") == ["abcd", "abce", "abcf"]
        sc = SpellChecker(["ab cd", "abcd"], [5, 10])
        assert sc.correct("abcd")[0] == "abcd"

    def test_non_ascii_vocab_dropped_not_mismeasured(self):
        sc = SpellChecker(["naïve", "table"], [9, 1])
        assert sc.correct("tble") == ["table"]
        assert sc.correct("naïve") == []  # non-word input -> no correction


class TestSuggestions:
    @pytest.fixture(scope="class")
    def svc(self):
        terms = ["apple", "apply", "applied", "banana", "band", "bandana"]
        freqs = [50, 80, 10, 99, 5, 7]
        return Suggestions(terms, freqs, extra_keywords=("special:media",))

    def test_min_length(self, svc):
        assert svc.get_suggestions(10, "ap") == []
        assert svc.suggestions_for_keyword(10, "ap") == []

    def test_value_sort_within_window(self, svc):
        # freq desc, then length, then lexicographic (Suggestions.java:148)
        assert svc.suggestions_for_keyword(10, "app") == ["apply", "apple", "applied"]

    def test_feature_keywords_present(self, svc):
        assert svc.suggestions_for_keyword(10, "spe") == ["special:media"]
        assert svc.suggestions_for_keyword(10, "-special:") == ["-special:media"]

    def test_last_word_completion_carries_prefix(self, svc):
        out = svc.get_suggestions(10, "banana app")
        assert out[:3] == ["banana apply", "banana apple", "banana applied"]

    def test_spell_stream_when_no_completion(self, svc):
        out = svc.get_suggestions(10, "bannana")
        assert out == ["banana", "bandana"]  # d1 then d2

    def test_count_limit(self, svc):
        assert len(svc.get_suggestions(2, "app")) == 2

    def test_lex_window_quirk(self):
        # a frequent term lexicographically PAST the first-256 window is
        # not suggested — the reference's trie iteration limit(256)
        terms = [f"zzz{i:04d}" for i in range(300)] + ["zzzpopular"]
        freqs = [1] * 300 + [10_000]
        svc = Suggestions(terms, freqs, extra_keywords=())
        got = svc.suggestions_for_keyword(5, "zzz")
        assert "zzzpopular" not in got
        assert got == [f"zzz{i:04d}" for i in range(5)]

    def test_filters_malformed_and_long(self):
        svc = Suggestions(["ok", "Has Upper".lower(), "bad-dash", "x" * 40], [1, 1, 1, 1], extra_keywords=())
        assert list(svc.terms) == ["has upper", "ok"]


CORPUS = [
    ("d spark sql table", 1),
    ("spark spark streaming table tables", 2),
    ("stream table tablet tabby", 3),
    ("sparse sparks tab", 4),
]


def _corpus_ds():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([i for _, i in CORPUS], pa.int64()),
                "text": pa.array([t for t, _ in CORPUS], pa.large_string()),
            }
        )
    )


def _vocab_py():
    from collections import Counter

    c = Counter()
    for t, _ in CORPUS:
        c.update(w for w in t.lower().split() if w)
    return c


class TestSuggestOps:
    def test_suggest_terms_matches_bruteforce(self, ray_session):
        got = (
            suggest_terms(_corpus_ds(), ["tab", "spar", "s"], count=3)
            .to_pandas()
            .sort_values(["prefix", "rank"])
            .reset_index(drop=True)
        )
        vocab = _vocab_py()
        for p in ["tab", "spar", "s"]:
            cand = sorted(t for t in vocab if t.startswith(p))[:256]
            want = sorted(cand, key=lambda t: (-vocab[t], len(t), t))[:3]
            sub = got[got["prefix"] == p]
            assert list(sub["term"]) == want, p
            assert list(sub["rank"]) == list(range(1, len(want) + 1))
            assert list(sub["freq"]) == [vocab[t] for t in want]

    def test_suggest_lex_window_binds(self, ray_session):
        rows = [f"w{i:04d}" for i in range(300)]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(301), pa.int64()),
                    "text": pa.array(rows + ["w9999 " * 50], pa.large_string()),
                }
            )
        )
        got = suggest_terms(ds, ["w"], count=5, lex_window=256).to_pandas()
        assert "w9999" not in set(got["term"])  # frequent but past the window

    def test_spell_correct_matches_bruteforce(self, ray_session):
        probes = ["tabel", "sprak", "qqqqq"]
        got = (
            spell_correct(_corpus_ds(), probes, k=3, max_dist=2)
            .to_pandas()
            .sort_values(["probe", "rank"])
            .reset_index(drop=True)
        )
        vocab = _vocab_py()
        for p in probes:
            cand = [(t, _lev_py(p, t), f) for t, f in vocab.items()]
            cand = [(t, d, f) for t, d, f in cand if d <= 2]
            cand.sort(key=lambda x: (x[1], -x[2], x[0]))
            want = cand[:3]
            sub = got[got["probe"] == p]
            assert list(sub["term"]) == [t for t, _, _ in want], p
            assert list(sub["dist"]) == [d for _, d, _ in want]

    def test_vocab_artifact_roundtrip(self, ray_session, tmp_path):
        # offline term_frequencies -> parquet -> online Suggestions
        from marginalia_ray.ops.suggest import term_frequencies

        out = str(tmp_path / "vocab")
        term_frequencies(_corpus_ds()).write_parquet(out)
        svc = Suggestions.from_parquet(out, extra_keywords=())
        vocab = _vocab_py()
        cand = sorted(t for t in vocab if t.startswith("tab"))[:256]
        want = sorted(cand, key=lambda t: (-vocab[t], len(t), t))[:5]
        assert svc.suggestions_for_keyword(5, "tab") == want
        assert svc.spell.correct("tabel")[0] == "table"

    def test_guards(self, ray_session):
        with pytest.raises(ValueError):
            suggest_terms(_corpus_ds(), [])
        with pytest.raises(ValueError):
            suggest_terms(_corpus_ds(), ["a", "a"])
        with pytest.raises(ValueError):
            suggest_terms(_corpus_ds(), ["a"], count=300, lex_window=256)
        with pytest.raises(ValueError):
            spell_correct(_corpus_ds(), ["x"], k=0)
        with pytest.raises(ValueError):
            spell_correct(_corpus_ds(), ["café"])  # non-ASCII probe
