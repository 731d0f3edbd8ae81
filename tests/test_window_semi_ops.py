"""Unit tests for the window / semi-join batch of ops
(ops/relational.py: hash_semi_join, event_deltas, cumsum_by_key,
pivot_counts, value_histogram; ops/text_ops.py: flesch_readability).
DuckDB value parity for all of them lives in test_oracle.py; these
cover the semantic edges the oracle fixture can't reach."""

import datetime as dt

import numpy as np
import pyarrow as pa
import pytest


def _ds(rows):
    import ray.data

    return ray.data.from_items(rows)


def _ts(minute: int):
    return dt.datetime(2024, 1, 1, 0, minute)


class TestHashSemiJoin:
    LEFT = [
        {"k": 1, "name": "a"},
        {"k": 2, "name": "b"},
        {"k": 3, "name": "c"},
    ]

    def test_semi_and_anti_partition_left(self, ray_session):
        from marginalia_ray.ops.relational import hash_semi_join

        right = _ds([{"rk": 2}, {"rk": 2}, {"rk": 3}, {"rk": 99}])
        semi = hash_semi_join(
            _ds(self.LEFT), right, on="k", right_on="rk", how="semi"
        ).take_all()
        anti = hash_semi_join(
            _ds(self.LEFT), right, on="k", right_on="rk", how="anti"
        ).take_all()
        assert sorted(r["k"] for r in semi) == [2, 3]
        assert sorted(r["k"] for r in anti) == [1]
        # left payload travels unchanged
        assert {r["k"]: r["name"] for r in semi} == {2: "b", 3: "c"}

    def test_empty_right_side(self, ray_session):
        from marginalia_ray.ops.relational import hash_semi_join

        right = _ds([{"rk": 7}]).filter(lambda r: False)
        semi = hash_semi_join(
            _ds(self.LEFT), right, on="k", right_on="rk", how="semi"
        ).take_all()
        anti = hash_semi_join(
            _ds(self.LEFT), right, on="k", right_on="rk", how="anti"
        ).take_all()
        assert semi == []
        assert sorted(r["k"] for r in anti) == [1, 2, 3]

    def test_string_key_rejected(self, ray_session):
        from marginalia_ray.ops.relational import hash_semi_join

        with pytest.raises(TypeError, match="integer"):
            hash_semi_join(
                _ds([{"k": "x"}]), _ds([{"k": 1}]), on="k", how="semi"
            )

    def test_bad_how_rejected(self, ray_session):
        from marginalia_ray.ops.relational import hash_semi_join

        with pytest.raises(ValueError, match="semi"):
            hash_semi_join(_ds(self.LEFT), _ds([{"k": 1}]), on="k", how="left")

    def test_null_key_rejected(self, ray_session):
        import ray.data

        from marginalia_ray.ops.relational import hash_semi_join

        left = ray.data.from_arrow(
            pa.table({"k": pa.array([1, None], pa.int64())})
        )
        with pytest.raises(Exception, match="null"):
            hash_semi_join(
                left, _ds([{"k": 1}]), on="k", how="semi"
            ).take_all()


class TestEventDeltas:
    def test_first_event_null_then_diffs(self, ray_session):
        from marginalia_ray.ops.relational import event_deltas

        rows = [
            {"event_id": 1, "user_id": 7, "ts": _ts(0)},
            {"event_id": 2, "user_id": 7, "ts": _ts(5)},
            {"event_id": 3, "user_id": 7, "ts": _ts(6)},
            {"event_id": 4, "user_id": 8, "ts": _ts(2)},
        ]
        out = {r["event_id"]: r for r in event_deltas(_ds(rows)).take_all()}
        assert out[1]["delta_us"] is None
        assert out[2]["delta_us"] == 5 * 60_000_000
        assert out[3]["delta_us"] == 1 * 60_000_000
        assert out[4]["delta_us"] is None  # other user's first event

    def test_tie_broken_by_id(self, ray_session):
        from marginalia_ray.ops.relational import event_deltas

        rows = [
            {"event_id": 2, "user_id": 1, "ts": _ts(0)},
            {"event_id": 1, "user_id": 1, "ts": _ts(0)},
        ]
        out = {r["event_id"]: r for r in event_deltas(_ds(rows)).take_all()}
        assert out[1]["delta_us"] is None  # lower id sorts first at equal ts
        assert out[2]["delta_us"] == 0


class TestCumsumByKey:
    def test_exact_running_total(self, ray_session):
        from marginalia_ray.ops.relational import cumsum_by_key

        # 0.1 + 0.2 is the float-accumulation trap; micro-units keep it exact
        rows = [
            {"event_id": 1, "user_id": 1, "ts": _ts(0), "value": 0.1},
            {"event_id": 2, "user_id": 1, "ts": _ts(1), "value": 0.2},
            {"event_id": 3, "user_id": 1, "ts": _ts(2), "value": 0.3},
            {"event_id": 4, "user_id": 2, "ts": _ts(0), "value": 5.0},
        ]
        out = {r["event_id"]: r["cum_value"] for r in cumsum_by_key(_ds(rows)).take_all()}
        assert out == {1: 0.1, 2: 0.3, 3: 0.6, 4: 5.0}


class TestPivotCounts:
    def test_counts_and_zero_fill(self, ray_session):
        from marginalia_ray.ops.relational import pivot_counts

        rows = [
            {"user_id": 1, "event_type": "a"},
            {"user_id": 1, "event_type": "a"},
            {"user_id": 1, "event_type": "b"},
            {"user_id": 2, "event_type": "b"},
        ]
        out = {r["user_id"]: r for r in pivot_counts(_ds(rows), ["a", "b"]).take_all()}
        assert (out[1]["n_a"], out[1]["n_b"]) == (2, 1)
        assert (out[2]["n_a"], out[2]["n_b"]) == (0, 1)

    def test_unknown_category_raises(self, ray_session):
        from marginalia_ray.ops.relational import pivot_counts

        ds = _ds([{"user_id": 1, "event_type": "zzz"}])
        with pytest.raises(Exception, match="outside the declared"):
            pivot_counts(ds, ["a", "b"]).take_all()

    def test_duplicate_categories_rejected(self, ray_session):
        from marginalia_ray.ops.relational import pivot_counts

        with pytest.raises(ValueError, match="distinct"):
            pivot_counts(_ds([{"user_id": 1, "event_type": "a"}]), ["a", "a"])


class TestValueHistogram:
    def test_negative_values_floor_down(self, ray_session):
        from marginalia_ray.ops.relational import value_histogram

        rows = [
            {"event_type": "x", "value": -0.5},
            {"event_type": "x", "value": 0.5},
            {"event_type": "x", "value": 4.999},
            {"event_type": "y", "value": 5.0},
        ]
        out = {
            (r["event_type"], r["bin"]): r["n"]
            for r in value_histogram(_ds(rows), bin_width=5.0).take_all()
        }
        assert out == {("x", -1): 1, ("x", 0): 2, ("y", 1): 1}

    def test_bad_bin_width(self, ray_session):
        from marginalia_ray.ops.relational import value_histogram

        with pytest.raises(ValueError, match="positive"):
            value_histogram(_ds([{"event_type": "x", "value": 1.0}]), bin_width=0)


class TestDistinctByKey:
    def test_exact_distinct_counts(self, ray_session):
        from marginalia_ray.ops.relational import distinct_by_key

        rows = [
            {"event_type": "a", "user_id": 1},
            {"event_type": "a", "user_id": 1},
            {"event_type": "a", "user_id": 2},
            {"event_type": "b", "user_id": 1},
        ]
        out = {r["event_type"]: r["n_distinct"] for r in distinct_by_key(_ds(rows)).take_all()}
        assert out == {"a": 2, "b": 1}


class TestRankWithTies:
    def test_boundary_ties_all_kept(self, ray_session):
        from marginalia_ray.ops.relational import rank_with_ties

        # key 1: values 10, 5, 5, 5, 1 -> rank()  = 1, 2, 2, 2, 5;
        # k=2 keeps the 10 AND all three tied 5s (row_number would not)
        rows = [
            {"o_custkey": 1, "o_orderkey": i, "o_totalprice": v}
            for i, v in enumerate([10.0, 5.0, 5.0, 5.0, 1.0])
        ]
        out = rank_with_ties(_ds(rows), k=2).take_all()
        got = sorted((r["o_orderkey"], r["rank"]) for r in out)
        assert got == [(0, 1), (1, 2), (2, 2), (3, 2)]

    def test_tie_at_rank_one(self, ray_session):
        from marginalia_ray.ops.relational import rank_with_ties

        rows = [
            {"o_custkey": 7, "o_orderkey": 1, "o_totalprice": 9.0},
            {"o_custkey": 7, "o_orderkey": 2, "o_totalprice": 9.0},
            {"o_custkey": 7, "o_orderkey": 3, "o_totalprice": 8.0},
        ]
        out = rank_with_ties(_ds(rows), k=1).take_all()
        got = sorted((r["o_orderkey"], r["rank"]) for r in out)
        assert got == [(1, 1), (2, 1)]  # both rank-1 ties; the 8.0 is rank 3

    def test_multi_key_rank_isolation(self, ray_session):
        from marginalia_ray.ops.relational import rank_with_ties

        rows = [
            {"o_custkey": 1, "o_orderkey": 1, "o_totalprice": 1.0},
            {"o_custkey": 2, "o_orderkey": 2, "o_totalprice": 100.0},
            {"o_custkey": 2, "o_orderkey": 3, "o_totalprice": 50.0},
        ]
        out = rank_with_ties(_ds(rows), k=1).take_all()
        got = sorted((r["o_custkey"], r["o_orderkey"], r["rank"]) for r in out)
        assert got == [(1, 1, 1), (2, 2, 1)]

    def test_bad_k(self, ray_session):
        from marginalia_ray.ops.relational import rank_with_ties

        with pytest.raises(ValueError, match="positive"):
            rank_with_ties(_ds([{"o_custkey": 1, "o_orderkey": 1, "o_totalprice": 1.0}]), k=0)


class TestLangidConfusion:
    def test_counts_by_label_and_prediction(self, ray_session):
        from marginalia_ray.ops.text_ops import langid_confusion

        rows = [
            {"doc_id": 1, "lang": "en", "text": "the quick fox and the dog"},
            {"doc_id": 2, "lang": "en", "text": "the cat is with the hat"},
            {"doc_id": 3, "lang": "de", "text": "der hund und die katze sind"},
            {"doc_id": 4, "lang": "de", "text": "zzz qqq"},  # no stopwords -> und
        ]
        out = {(r["lang"], r["pred_lang"]): r["n"] for r in langid_confusion(_ds(rows)).take_all()}
        assert out[("en", "en")] == 2
        assert out[("de", "de")] == 1
        assert out[("de", "und")] == 1


class TestFlesch:
    def test_empty_doc_scores_constant(self, ray_session):
        from marginalia_ray.ops.text_ops import flesch_readability

        out = flesch_readability(_ds([{"doc_id": 1, "text": ""}])).take_all()
        r = out[0]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (0, 0, 0)
        # clamped denominators: 206.835 - 1.015*(1/1) - 84.6*(0/1)
        assert r["flesch"] == pytest.approx(205.82, abs=1e-9)

    def test_known_sentence(self, ray_session):
        from marginalia_ray.ops.text_ops import flesch_readability

        out = flesch_readability(
            _ds([{"doc_id": 1, "text": "The cat sat. The dog ran!"}])
        ).take_all()[0]
        # words: the cat sat the dog ran = 6; sentences: 2; vowel groups:
        # e,a,a,e,o,a = 6
        assert (out["n_words"], out["n_sentences"], out["n_syllables"]) == (6, 2, 6)
        expected = round(206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6), 6)
        assert out["flesch"] == pytest.approx(expected, abs=1e-9)


class TestEventTransitions:
    def test_basic_chain(self, ray_session):
        from marginalia_ray.ops.relational import event_transitions

        rows = [
            {"event_id": i, "user_id": 1, "ts": _ts(i), "event_type": t}
            for i, t in enumerate(["view", "click", "view", "click", "buy"])
        ]
        got = {
            (r["prev_type"], r["next_type"]): r["n"]
            for r in event_transitions(_ds(rows)).take_all()
        }
        assert got == {("view", "click"): 2, ("click", "view"): 1, ("click", "buy"): 1}

    def test_single_event_user_and_tie_break(self, ray_session):
        from marginalia_ray.ops.relational import event_transitions

        rows = [
            {"event_id": 1, "user_id": 1, "ts": _ts(0), "event_type": "solo"},
            # same ts for user 2: order falls back to event_id
            {"event_id": 3, "user_id": 2, "ts": _ts(1), "event_type": "b"},
            {"event_id": 2, "user_id": 2, "ts": _ts(1), "event_type": "a"},
        ]
        got = event_transitions(_ds(rows)).take_all()
        assert len(got) == 1
        assert (got[0]["prev_type"], got[0]["next_type"], got[0]["n"]) == ("a", "b", 1)
