"""ops/bpe.bpe_train vs the independent sequential reference
(tools/bpe_reference.ref_bpe): randomized parity, greedy-run semantics,
early stop.  The two implementations share only the spec (token regex,
id-based tie-break, left-to-right greedy apply)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from bpe_reference import ref_bpe  # noqa: E402


def _ds(texts):
    import ray.data

    return ray.data.from_items([{"doc_id": i, "text": t} for i, t in enumerate(texts)])


def _run(texts, n_merges, min_count=2, local_cap=2_000_000):
    from marginalia_ray.ops.bpe import bpe_train

    got = bpe_train(
        _ds(texts), n_merges=n_merges, min_count=min_count, local_cap=local_cap
    ).take_all()
    return sorted(got, key=lambda r: r["step"])


@pytest.mark.parametrize("local_cap", [2_000_000, 0])
class TestBpeTrain:
    def test_simple_corpus_known_merges(self, ray_session, local_cap):
        texts = ["low low low low low", "lower lower", "newest newest newest"]
        got = _run(texts, 4, local_cap=local_cap)
        want = ref_bpe(texts, 4)
        assert got == want
        # 'lo' (or a tie-resolved equivalent) must be the first merge
        assert got[0]["n"] >= 7

    def test_equal_symbol_runs_greedy(self, ray_session, local_cap):
        # 'aaaa' -> (a,a) merges greedily left-to-right: [aa][aa]
        texts = ["aaaa aaaa aaa"]
        got = _run(texts, 2, local_cap=local_cap)
        want = ref_bpe(texts, 2)
        assert got == want

    def test_min_count_early_stop(self, ray_session, local_cap):
        texts = ["ab ab ab", "xy"]
        got = _run(texts, 10, min_count=2, local_cap=local_cap)
        want = ref_bpe(texts, 10, min_count=2)
        assert got == want
        assert len(got) < 10

    def test_randomized_parity(self, ray_session, local_cap):
        rng = np.random.RandomState(13)
        alpha = list("abcde")
        texts = [
            " ".join(
                "".join(rng.choice(alpha, size=rng.randint(1, 8)))
                for _ in range(rng.randint(1, 30))
            )
            for _ in range(40)
        ]
        got = _run(texts, 12, local_cap=local_cap)
        want = ref_bpe(texts, 12)
        assert got == want

    def test_no_pairs_empty_result(self, ray_session, local_cap):
        got = _run(["a b c", "d e"], 3, local_cap=local_cap)
        assert got == []


class TestSymbolCollisionGuard:
    def test_register_merged_raises_on_string_collision(self):
        # the engine identifies symbols by int id, the oracle by string:
        # a duplicate string must fail LOUDLY on both sides, not diverge
        from marginalia_ray.ops.bpe import _register_merged

        seen = {"a", "b", "ab"}
        _register_merged(seen, "abc", 3)
        assert "abc" in seen
        with pytest.raises(RuntimeError, match="different merge path"):
            _register_merged(seen, "ab", 4)
