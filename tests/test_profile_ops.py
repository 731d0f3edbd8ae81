"""Unit tests for the profiling / gaps-and-islands batch of ops
(ops/relational.py: mode_by_key, ntile_buckets, window_unique_users,
activity_streaks, string_agg_by_key, benford_digits; ops/dedup.py:
dup_cluster_sizes, source_token_jaccard).  DuckDB value parity for all
of them lives in test_oracle.py; these cover the semantic edges the
oracle fixture can't reach."""

import datetime as dt

import pytest


def _ds(rows):
    import ray.data

    return ray.data.from_items(rows)


def _ts(day: int, hour: int = 0, minute: int = 0):
    return dt.datetime(2024, 1, day, hour, minute)


class TestModeByKey:
    def test_tie_breaks_to_smallest_value(self, ray_session):
        from marginalia_ray.ops.relational import mode_by_key

        rows = (
            [{"user_id": 1, "event_type": "view"}] * 3
            + [{"user_id": 1, "event_type": "click"}] * 3
            + [{"user_id": 2, "event_type": "purchase"}]
        )
        got = {r["user_id"]: r for r in mode_by_key(_ds(rows)).take_all()}
        # tie 3-3 between click/view -> lexicographically smaller wins
        assert got[1]["mode"] == "click" and got[1]["n_mode"] == 3
        assert got[2]["mode"] == "purchase" and got[2]["n_mode"] == 1

    def test_single_winner(self, ray_session):
        from marginalia_ray.ops.relational import mode_by_key

        rows = [{"user_id": 9, "event_type": "a"}] + [
            {"user_id": 9, "event_type": "z"}
        ] * 2
        (got,) = mode_by_key(_ds(rows)).take_all()
        assert got["mode"] == "z" and got["n_mode"] == 2


class TestNtileBuckets:
    def test_remainder_rule(self, ray_session):
        from marginalia_ray.ops.relational import ntile_buckets

        # 6 rows into 4 buckets: sizes 2,2,1,1 (first cnt%n buckets larger)
        rows = [
            {"o_custkey": 1, "o_orderkey": i, "o_totalprice": float(i * 10)}
            for i in range(1, 7)
        ]
        got = ntile_buckets(_ds(rows), n=4).take_all()
        by_id = {r["o_orderkey"]: r["bucket"] for r in got}
        assert by_id == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 4}

    def test_fewer_rows_than_buckets(self, ray_session):
        from marginalia_ray.ops.relational import ntile_buckets

        rows = [
            {"o_custkey": 1, "o_orderkey": 1, "o_totalprice": 5.0},
            {"o_custkey": 1, "o_orderkey": 2, "o_totalprice": 7.0},
        ]
        got = sorted(
            ntile_buckets(_ds(rows), n=4).take_all(), key=lambda r: r["o_orderkey"]
        )
        assert [r["bucket"] for r in got] == [1, 2]

    def test_tie_broken_by_id(self, ray_session):
        from marginalia_ray.ops.relational import ntile_buckets

        rows = [
            {"o_custkey": 1, "o_orderkey": 2, "o_totalprice": 5.0},
            {"o_custkey": 1, "o_orderkey": 1, "o_totalprice": 5.0},
        ]
        got = {r["o_orderkey"]: r["bucket"] for r in ntile_buckets(_ds(rows), n=2).take_all()}
        assert got == {1: 1, 2: 2}

    def test_invalid_n(self, ray_session):
        from marginalia_ray.ops.relational import ntile_buckets

        with pytest.raises(ValueError):
            ntile_buckets(_ds([{"o_custkey": 1, "o_orderkey": 1, "o_totalprice": 1.0}]), n=0)


class TestWindowUniqueUsers:
    def test_distinct_within_window(self, ray_session):
        from marginalia_ray.ops.relational import window_unique_users

        rows = [
            {"ts": _ts(1, 0, 5), "user_id": 1},
            {"ts": _ts(1, 0, 10), "user_id": 1},  # same user, same hour
            {"ts": _ts(1, 0, 20), "user_id": 2},
            {"ts": _ts(1, 1, 5), "user_id": 1},  # next hour
        ]
        got = sorted(
            window_unique_users(_ds(rows), width_minutes=60).take_all(),
            key=lambda r: r["win_us"],
        )
        assert [r["n_users"] for r in got] == [2, 1]
        assert got[1]["win_us"] - got[0]["win_us"] == 3_600_000_000


class TestActivityStreaks:
    def test_runs_and_gaps(self, ray_session):
        from marginalia_ray.ops.relational import activity_streaks

        rows = (
            # user 1: days 1,2,3 then 5,6 -> max streak 3, n_days 5
            [{"user_id": 1, "ts": _ts(d)} for d in (1, 2, 3, 5, 6)]
            # duplicate events inside one day must not inflate the streak
            + [{"user_id": 1, "ts": _ts(2, 12)}]
            # user 2: one day
            + [{"user_id": 2, "ts": _ts(9)}]
        )
        got = {r["user_id"]: r for r in activity_streaks(_ds(rows)).take_all()}
        assert got[1]["n_days"] == 5 and got[1]["max_streak"] == 3
        assert got[2]["n_days"] == 1 and got[2]["max_streak"] == 1


class TestStringAggByKey:
    def test_sorted_concat(self, ray_session):
        from marginalia_ray.ops.relational import string_agg_by_key

        rows = [
            {"s_nationkey": 1, "s_name": "zeta"},
            {"s_nationkey": 1, "s_name": "alpha"},
            {"s_nationkey": 2, "s_name": "solo"},
        ]
        got = {r["s_nationkey"]: r for r in string_agg_by_key(_ds(rows)).take_all()}
        assert got[1]["agg"] == "alpha,zeta" and got[1]["n"] == 2
        assert got[2]["agg"] == "solo" and got[2]["n"] == 1


class TestBenfordDigits:
    def test_leading_digit_counts(self, ray_session):
        from marginalia_ray.ops.relational import benford_digits

        rows = [{"o_totalprice": v} for v in (1.5, 19.0, 123.4, 2.0, 999.99)]
        got = {r["digit"]: r["n"] for r in benford_digits(_ds(rows)).take_all()}
        assert got == {"1": 3, "2": 1, "9": 1}

    def test_rejects_below_one(self, ray_session):
        from marginalia_ray.ops.relational import benford_digits

        with pytest.raises(Exception, match="finite and >= 1"):
            benford_digits(_ds([{"o_totalprice": 0.5}])).take_all()


class TestDupClusterSizes:
    def test_histogram(self, ray_session):
        from marginalia_ray.ops.dedup import dup_cluster_sizes

        rows = (
            [{"text": "aaa"}] * 3
            + [{"text": "bbb"}] * 2
            + [{"text": "ccc"}, {"text": "ddd"}]
        )
        got = {r["cluster_size"]: r["n_clusters"] for r in dup_cluster_sizes(_ds(rows)).take_all()}
        assert got == {3: 1, 2: 1, 1: 2}


class TestSourceTokenJaccard:
    def test_pairwise_vocab_overlap(self, ray_session):
        from marginalia_ray.ops.dedup import source_token_jaccard

        rows = [
            {"source": "a", "text": "red green blue"},
            {"source": "a", "text": "blue yellow"},  # a = {red,green,blue,yellow}
            {"source": "b", "text": "red blue"},  # b = {red,blue}
            {"source": "c", "text": "purple"},  # c disjoint
        ]
        got = source_token_jaccard(_ds(rows)).take_all()
        assert len(got) == 1  # only (a, b) share tokens
        (p,) = got
        assert (p["source_a"], p["source_b"]) == ("a", "b")
        assert p["n_common"] == 2
        assert p["jaccard"] == pytest.approx(0.5)  # 2 / (4 + 2 - 2)

    def test_empty_corpus(self, ray_session):
        from marginalia_ray.ops.dedup import source_token_jaccard

        got = source_token_jaccard(
            _ds([{"source": "a", "text": ""}])
        ).take_all()
        assert got == []


class TestPercentRank:
    def test_ties_and_extremes(self, ray_session):
        from marginalia_ray.ops.relational import percent_rank_by_key

        rows = [
            {"o_custkey": 1, "o_orderkey": 1, "o_totalprice": 10.0},
            {"o_custkey": 1, "o_orderkey": 2, "o_totalprice": 20.0},
            {"o_custkey": 1, "o_orderkey": 3, "o_totalprice": 20.0},
            {"o_custkey": 1, "o_orderkey": 4, "o_totalprice": 40.0},
            {"o_custkey": 2, "o_orderkey": 5, "o_totalprice": 7.0},
        ]
        got = {
            r["o_orderkey"]: r
            for r in percent_rank_by_key(_ds(rows)).take_all()
        }
        assert got[1]["percent_rank"] == 0.0 and got[1]["cume_dist"] == 0.25
        # tied pair shares the MIN rank but the MAX cume_dist
        for k in (2, 3):
            assert got[k]["percent_rank"] == pytest.approx(1 / 3)
            assert got[k]["cume_dist"] == 0.75
        assert got[4]["percent_rank"] == 1.0 and got[4]["cume_dist"] == 1.0
        # single-row key: percent_rank 0 by convention, cume_dist 1
        assert got[5]["percent_rank"] == 0.0 and got[5]["cume_dist"] == 1.0


class TestWeeklyRevenueDelta:
    def test_lag_over_aggregated_weeks(self, ray_session):
        from marginalia_ray.ops.relational import weekly_revenue_delta

        rows = [
            {"o_orderdate": _ts(1), "o_totalprice": 10.50},
            {"o_orderdate": _ts(2), "o_totalprice": 0.25},  # same week
            {"o_orderdate": _ts(10), "o_totalprice": 5.00},  # next week
        ]
        got = sorted(
            weekly_revenue_delta(_ds(rows)).take_all(), key=lambda r: r["week"]
        )
        assert [r["revenue_cents"] for r in got] == [1075, 500]
        assert got[0]["delta_cents"] is None
        assert got[1]["delta_cents"] == -575


class TestZscoreOutliers:
    def test_flags_only_past_threshold(self, ray_session):
        from marginalia_ray.ops.relational import zscore_outliers

        rows = [
            {"doc_id": i, "source": "a", "n_chars": v}
            for i, v in enumerate([10, 10, 10, 10, 10, 10, 10, 10, 10, 100])
        ] + [{"doc_id": 99, "source": "b", "n_chars": 5}]  # zero variance
        got = zscore_outliers(_ds(rows), z=2.0).take_all()
        assert [r["doc_id"] for r in got] == [9]  # only the planted spike
        assert got[0]["zscore"] == pytest.approx(3.0)

    def test_rejects_float_column(self, ray_session):
        from marginalia_ray.ops.relational import zscore_outliers

        with pytest.raises(Exception, match="must be integer"):
            zscore_outliers(
                _ds([{"doc_id": 1, "source": "a", "n_chars": 1.5}])
            ).take_all()


class TestBpePairCounts:
    def test_counts_within_tokens_only(self, ray_session):
        from marginalia_ray.ops.text_ops import bpe_pair_counts

        rows = [{"text": "hello he"}, {"text": "ab ba"}]
        got = {r["pair"]: r["n"] for r in bpe_pair_counts(_ds(rows)).take_all()}
        assert got == {"he": 2, "el": 1, "ll": 1, "lo": 1, "ab": 1, "ba": 1}

    def test_case_and_punct_normalized(self, ray_session):
        from marginalia_ray.ops.text_ops import bpe_pair_counts

        got = {
            r["pair"]: r["n"]
            for r in bpe_pair_counts(_ds([{"text": "AB, ab!"}])).take_all()
        }
        assert got == {"ab": 2}


class TestTokenLengthHistogram:
    def test_lengths_with_multiplicity(self, ray_session):
        from marginalia_ray.ops.text_ops import token_length_histogram

        got = {
            r["len"]: r["n"]
            for r in token_length_histogram(_ds([{"text": "ab abc ab"}])).take_all()
        }
        assert got == {2: 2, 3: 1}


class TestVocabGrowth:
    def test_cumulative_first_occurrence(self, ray_session):
        from marginalia_ray.ops.text_ops import vocab_growth

        rows = [
            {"doc_id": 0, "text": "alpha beta"},
            {"doc_id": 1, "text": "beta gamma"},
            {"doc_id": 2, "text": "alpha"},
            {"doc_id": 3, "text": "delta"},
        ]
        got = {
            r["threshold"]: r["vocab"]
            for r in vocab_growth(_ds(rows), fractions=(0.5, 1.0)).take_all()
        }
        # threshold floor(3*0.5)=1: {alpha,beta,gamma}; threshold 3: +delta
        assert got == {1: 3, 3: 4}

    def test_invalid_fraction(self, ray_session):
        from marginalia_ray.ops.text_ops import vocab_growth

        with pytest.raises(ValueError):
            vocab_growth(_ds([{"doc_id": 0, "text": "x"}]), fractions=(0.0,))


class TestDupRateBySource:
    def test_cross_source_twins_count(self, ray_session):
        from marginalia_ray.ops.dedup import dup_rate_by_source

        rows = [
            {"source": "a", "text": "same same"},
            {"source": "a", "text": "same same"},  # in-source twin
            {"source": "a", "text": "unique to a"},
            {"source": "b", "text": "unique to a"},  # cross-source twin
            {"source": "b", "text": "only b"},
        ]
        got = {r["source"]: r for r in dup_rate_by_source(_ds(rows)).take_all()}
        assert got["a"]["n_docs"] == 3 and got["a"]["n_duped"] == 3
        assert got["b"]["n_docs"] == 2 and got["b"]["n_duped"] == 1
        assert got["b"]["dup_rate"] == 0.5


class TestFirstLastByKey:
    def test_extremes_with_ts_tie(self, ray_session):
        from marginalia_ray.ops.relational import first_last_by_key

        rows = [
            {"user_id": 1, "event_id": 5, "ts": _ts(1, 1)},
            {"user_id": 1, "event_id": 3, "ts": _ts(1, 1)},  # ts tie: id wins
            {"user_id": 1, "event_id": 9, "ts": _ts(2)},
            {"user_id": 2, "event_id": 7, "ts": _ts(1)},  # single event
        ]
        got = {r["user_id"]: r for r in first_last_by_key(_ds(rows)).take_all()}
        assert got[1]["first_event_id"] == 3 and got[1]["last_event_id"] == 9
        assert got[2]["first_event_id"] == 7 and got[2]["last_event_id"] == 7
        assert got[2]["first_ts_us"] == got[2]["last_ts_us"]


class TestSessionDurationHistogram:
    def test_bins(self, ray_session):
        from marginalia_ray.ops.relational import session_duration_histogram

        rows = [
            # user 1, session of 12 minutes -> bin 2 at width 5
            {"user_id": 1, "ts": _ts(1, 0, 0)},
            {"user_id": 1, "ts": _ts(1, 0, 12)},
            # user 1, second session (after >30 min gap), 0 minutes -> bin 0
            {"user_id": 1, "ts": _ts(1, 2, 0)},
            # user 2, 4 minutes -> bin 0
            {"user_id": 2, "ts": _ts(1, 0, 0)},
            {"user_id": 2, "ts": _ts(1, 0, 4)},
        ]
        got = {
            r["bin"]: r["n"]
            for r in session_duration_histogram(_ds(rows), bin_minutes=5).take_all()
        }
        assert got == {2: 1, 0: 2}

    def test_invalid_bin(self, ray_session):
        from marginalia_ray.ops.relational import session_duration_histogram

        with pytest.raises(ValueError):
            session_duration_histogram(_ds([{"user_id": 1, "ts": _ts(1)}]), bin_minutes=0)


class TestMadByKey:
    def test_exact_mad(self, ray_session):
        from marginalia_ray.ops.relational import mad_by_key

        rows = [{"source": "a", "n_chars": v} for v in (1, 2, 3, 4, 100)] + [
            {"source": "b", "n_chars": v} for v in (10, 20)
        ]
        got = {r["source"]: r for r in mad_by_key(_ds(rows)).take_all()}
        # a: median 3, deviations {2,1,0,1,97} -> median 1
        assert got["a"]["mad"] == 1.0 and got["a"]["n"] == 5
        # b: median 15, deviations {5,5} -> 5 (even-count averaging)
        assert got["b"]["mad"] == 5.0 and got["b"]["n"] == 2


class TestRevenueByNation:
    def test_three_table_rollup(self, ray_session):
        from marginalia_ray.ops.relational import revenue_by_nation

        orders = _ds(
            [
                {"o_custkey": 1, "o_totalprice": 10.25},
                {"o_custkey": 1, "o_totalprice": 5.00},
                {"o_custkey": 2, "o_totalprice": 7.50},
            ]
        )
        customer = _ds(
            [{"c_custkey": 1, "c_nationkey": 7}, {"c_custkey": 2, "c_nationkey": 9}]
        )
        nation = _ds(
            [{"n_nationkey": 7, "n_name": "FRANCE"}, {"n_nationkey": 9, "n_name": "PERU"}]
        )
        got = {
            r["n_name"]: r["revenue_cents"]
            for r in revenue_by_nation(orders, customer, nation).take_all()
        }
        assert got == {"FRANCE": 1525, "PERU": 750}


class TestPricingSummary:
    def test_integer_exact_products(self, ray_session):
        from marginalia_ray.ops.relational import pricing_summary

        rows = [
            {"l_returnflag": "A", "l_linestatus": "F", "l_quantity": 2.0,
             "l_extendedprice": 100.00, "l_discount": 0.05, "l_tax": 0.08},
            {"l_returnflag": "A", "l_linestatus": "F", "l_quantity": 3.0,
             "l_extendedprice": 50.00, "l_discount": 0.00, "l_tax": 0.00},
        ]
        (got,) = pricing_summary(_ds(rows)).take_all()
        assert got["sum_qty"] == 5
        assert got["sum_base_cents"] == 15000
        # 10000c*95 + 5000c*100 = 1_450_000 (cents x 100)
        assert got["sum_disc_c2"] == 1_450_000
        # 10000*95*108 + 5000*100*100 = 152_600_000 (cents x 10000)
        assert got["sum_charge_c4"] == 152_600_000
        assert got["avg_qty"] == 2.5
        assert got["avg_disc_pct"] == 2.5
        assert got["n"] == 2


class TestShipDelayHistogram:
    def test_day_bins(self, ray_session):
        from marginalia_ray.ops.relational import ship_delay_histogram

        li = _ds(
            [
                {"l_orderkey": 1, "l_shipdate": _ts(3)},
                {"l_orderkey": 1, "l_shipdate": _ts(5)},
                {"l_orderkey": 2, "l_shipdate": _ts(2)},
            ]
        )
        orders = _ds(
            [
                {"o_orderkey": 1, "o_orderdate": _ts(1)},
                {"o_orderkey": 2, "o_orderdate": _ts(2)},
            ]
        )
        got = {
            r["delay_days"]: r["n"]
            for r in ship_delay_histogram(li, orders).take_all()
        }
        assert got == {2: 1, 4: 1, 0: 1}


class TestJsonFieldStats:
    def test_extract_and_rollup(self, ray_session):
        from marginalia_ray.ops.relational import json_field_stats

        rows = [
            {"event_type": "a", "props": '{"k": 5}'},
            {"event_type": "a", "props": '{"k": -2}'},
            {"event_type": "b", "props": '{"k": 10}'},
        ]
        got = {r["event_type"]: r for r in json_field_stats(_ds(rows)).take_all()}
        assert got["a"]["sum_v"] == 3 and got["a"]["min_v"] == -2
        assert got["a"]["max_v"] == 5 and got["a"]["avg_v"] == 1.5
        assert got["b"]["n"] == 1

    def test_malformed_row_fails_loudly(self, ray_session):
        from marginalia_ray.ops.relational import json_field_stats

        with pytest.raises(Exception, match="lack an"):
            json_field_stats(
                _ds([{"event_type": "a", "props": '{"other": 1}'}])
            ).take_all()


class TestSkipgramCounts:
    def test_window_and_min_count(self, ray_session):
        from marginalia_ray.ops.text_ops import skipgram_counts

        # "a b c" twice: d=1 pairs (a,b),(b,c); d=2 pair (a,c) — each x2
        rows = [{"text": "a b c"}, {"text": "a b c"}]
        got = {
            (r["w1"], r["w2"]): r["n"]
            for r in skipgram_counts(_ds(rows), k=2, min_count=2).take_all()
        }
        assert got == {("a", "b"): 2, ("b", "c"): 2, ("a", "c"): 2}

    def test_no_cross_document_pairs(self, ray_session):
        from marginalia_ray.ops.text_ops import skipgram_counts

        rows = [{"text": "x"}, {"text": "y"}]
        assert skipgram_counts(_ds(rows), k=2, min_count=1).take_all() == []


class TestGraphDegreeStats:
    def test_degrees_with_duplicate_edges(self, ray_session):
        from marginalia_ray.ops.graph import graph_degree_stats

        edges = _ds(
            [
                {"src": 1, "dst": 2},
                {"src": 1, "dst": 2},  # duplicate edge must not double-count
                {"src": 1, "dst": 3},
                {"src": 2, "dst": 3},
            ]
        )
        got = {r["node"]: r for r in graph_degree_stats(edges).take_all()}
        assert got[1]["out_deg"] == 2 and got[1]["in_deg"] == 0
        assert got[2]["out_deg"] == 1 and got[2]["in_deg"] == 1
        assert got[3]["out_deg"] == 0 and got[3]["in_deg"] == 2


class TestReviewRegressions:
    def test_json_float_value_fails_loudly(self, ray_session):
        # review finding: a float field must raise, not silently truncate
        from marginalia_ray.ops.relational import json_field_stats

        with pytest.raises(Exception, match="non-integer value"):
            json_field_stats(
                _ds([{"event_type": "a", "props": '{"k": 1.5}'}])
            ).take_all()

    def test_vocab_growth_dedups_equal_thresholds(self, ray_session):
        # review finding: fractions flooring to one threshold -> one row
        from marginalia_ray.ops.text_ops import vocab_growth

        rows = [{"doc_id": 0, "text": "a"}, {"doc_id": 1, "text": "b"}]
        got = vocab_growth(_ds(rows), fractions=(0.25, 0.5, 1.0)).take_all()
        assert [r["threshold"] for r in got] == [0, 1]
        assert [r["vocab"] for r in got] == [1, 2]

    def test_benford_overflow_fails_loudly(self, ray_session):
        from marginalia_ray.ops.relational import benford_digits

        with pytest.raises(Exception, match="exceeds int64"):
            benford_digits(_ds([{"o_totalprice": 1e19}])).take_all()


class TestColumnProfile:
    def test_nulls_empties_distinct(self, ray_session):
        import pyarrow as pa
        import ray.data

        from marginalia_ray.ops.relational import column_profile

        t = pa.table(
            {
                "a": pa.array([1, 1, 2, None], pa.int64()),
                "b": pa.array(["x", "", "", None], pa.string()),
            }
        )
        got = {r["column"]: r for r in column_profile(ray.data.from_arrow(t)).take_all()}
        assert got["a"]["n"] == 4 and got["a"]["n_null"] == 1
        assert got["a"]["n_empty"] == 0 and got["a"]["n_distinct"] == 2
        assert got["b"]["n_null"] == 1 and got["b"]["n_empty"] == 2
        assert got["b"]["n_distinct"] == 2  # "x" and ""

    def test_column_subset(self, ray_session):
        import pyarrow as pa
        import ray.data

        from marginalia_ray.ops.relational import column_profile

        t = pa.table({"a": [1], "b": ["y"]})
        got = column_profile(ray.data.from_arrow(t), cols=["b"]).take_all()
        assert [r["column"] for r in got] == ["b"]


class TestGlobalQuantiles:
    def test_interpolation(self, ray_session):
        from marginalia_ray.ops.relational import global_quantiles

        rows = [{"n_chars": v} for v in (10, 20, 30, 40)]
        got = {r["q"]: r["value"] for r in global_quantiles(_ds(rows), qs=(0.5, 1.0)).take_all()}
        assert got[0.5] == 25.0  # quantile_cont midpoint
        assert got[1.0] == 40.0

    def test_invalid_q(self, ray_session):
        from marginalia_ray.ops.relational import global_quantiles

        with pytest.raises(ValueError):
            global_quantiles(_ds([{"n_chars": 1}]), qs=(1.5,))

    def test_empty_input_returns_empty(self, ray_session):
        # regression: used to IndexError on cum[-1]
        import pyarrow as pa
        import ray.data

        from marginalia_ray.ops.relational import global_quantiles

        empty = ray.data.from_arrow(pa.table({"n_chars": pa.array([], pa.int64())}))
        assert global_quantiles(empty).take_all() == []

    def test_distinct_cap_enforced_during_collection(self, ray_session):
        from marginalia_ray.ops.relational import global_quantiles

        rows = [{"n_chars": v} for v in range(10)]
        with pytest.raises(RuntimeError, match="max_distinct"):
            global_quantiles(_ds(rows), max_distinct=5).take_all()

    def test_int64_above_2_53_exact(self, ray_session):
        # regression: a float64 roundtrip of the values used to round
        # big int64s before interpolation
        from marginalia_ray.ops.relational import global_quantiles

        lo = (1 << 60) + 1
        rows = [{"n_chars": lo}, {"n_chars": lo}]
        got = global_quantiles(_ds(rows), qs=(0.5,)).take_all()
        assert got[0]["value"] == float(lo) or int(got[0]["value"]) == lo


class TestEditDistancePairs:
    def _run(self, names, **kw):
        from marginalia_ray.ops.dedup import edit_distance_pairs

        rows = [{"p_name": n} for n in names]
        got = edit_distance_pairs(_ds(rows), **kw).take_all()
        return {(r["a"], r["b"]) for r in got}

    def test_sub_ins_del(self, ray_session):
        pairs = self._run(["widget", "widgex", "widgets", "idget", "zzzzz"])
        assert ("widget", "widgex") in pairs  # substitution
        assert ("widget", "widgets") in pairs  # insertion
        assert ("idget", "widget") in pairs  # deletion
        assert not any("zzzzz" in p for p in pairs)

    def test_transposition_is_distance_two(self, ray_session):
        # "ab"/"ba" share deletion variants "a" and "b" (candidates) but
        # levenshtein = 2 — the verify pass must reject them
        assert self._run(["ab", "ba"]) == set()

    def test_duplicates_collapse(self, ray_session):
        # corpus duplicates of the same value never pair with themselves
        pairs = self._run(["bolt", "bolt", "bolt", "boltz"])
        assert pairs == {("bolt", "boltz")}

    def test_long_strings_excluded(self, ray_session):
        assert self._run(["x" * 30, "x" * 31], max_len=16) == set()

    def test_hot_variant_group_capped(self, ray_session):
        # 5 single-char strings all share the "" deletion variant; with
        # max_group=2 that group is dropped like a stop-shingle
        assert self._run(list("abcde"), max_group=2) == set()

    def test_empty_input(self, ray_session):
        assert self._run([]) == set()


class TestTrainingShuffle:
    def test_dense_positions_and_determinism(self, ray_session):
        from marginalia_ray.ops.curation import training_shuffle

        rows = [{"doc_id": i} for i in range(200)]
        a = training_shuffle(_ds(rows), n_shards=4, seed=1).take_all()
        b = training_shuffle(_ds(rows), n_shards=4, seed=1).take_all()
        key = lambda rs: sorted((r["doc_id"], r["shard"], r["pos"]) for r in rs)
        assert key(a) == key(b)  # reproducible across runs
        assert len(a) == 200
        by_shard = {}
        for r in a:
            assert 0 <= r["shard"] < 4
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        for poss in by_shard.values():
            assert sorted(poss) == list(range(len(poss)))  # dense 0..n-1

    def test_seed_changes_order(self, ray_session):
        from marginalia_ray.ops.curation import training_shuffle

        rows = [{"doc_id": i} for i in range(200)]
        a = {r["doc_id"]: (r["shard"], r["pos"]) for r in training_shuffle(_ds(rows), n_shards=4, seed=1).take_all()}
        b = {r["doc_id"]: (r["shard"], r["pos"]) for r in training_shuffle(_ds(rows), n_shards=4, seed=2).take_all()}
        assert a != b

    def test_bad_shards(self, ray_session):
        from marginalia_ray.ops.curation import training_shuffle

        with pytest.raises(ValueError):
            training_shuffle(_ds([{"doc_id": 1}]), n_shards=0)


class TestMutualInformation:
    def test_independent_columns_zero_mi(self, ray_session):
        from marginalia_ray.ops.relational import mutual_information

        # perfectly independent 2x2: every cell pmi = ln(1) = 0
        rows = [
            {"source": s, "lang": l}
            for s in ("a", "b")
            for l in ("en", "fr")
        ] * 5
        got = mutual_information(_ds(rows)).take_all()
        assert len(got) == 4
        assert all(r["pmi"] == 0.0 and r["contrib"] == 0.0 for r in got)
        assert all(r["n"] == 5 for r in got)

    def test_perfect_dependence(self, ray_session):
        import math

        from marginalia_ray.ops.relational import mutual_information

        # x determines y: MI = ln(2) for a uniform 2-value pair
        rows = [{"source": "a", "lang": "en"}] * 6 + [{"source": "b", "lang": "fr"}] * 6
        got = mutual_information(_ds(rows)).take_all()
        mi = sum(r["contrib"] for r in got)
        assert abs(mi - math.log(2)) < 1e-5

    def test_max_cells_guard(self, ray_session):
        from marginalia_ray.ops.relational import mutual_information

        rows = [{"source": str(i), "lang": str(i)} for i in range(10)]
        with pytest.raises(Exception, match="max_cells"):
            mutual_information(_ds(rows), max_cells=5).take_all()


class TestCorrelationMatrix:
    def test_perfect_positive_and_negative(self, ray_session):
        from marginalia_ray.ops.relational import correlation_matrix

        rows = [{"a": i, "b": 2 * i + 3, "c": -i} for i in range(10)]
        got = {
            (r["col_x"], r["col_y"]): r["corr"]
            for r in correlation_matrix(_ds(rows), ["a", "b", "c"]).take_all()
        }
        assert got[("a", "b")] == 1.0
        assert got[("a", "c")] == -1.0
        assert got[("b", "c")] == -1.0

    def test_constant_column_yields_null(self, ray_session):
        from marginalia_ray.ops.relational import correlation_matrix

        rows = [{"a": i, "b": 7} for i in range(5)]
        got = correlation_matrix(_ds(rows), ["a", "b"]).take_all()
        assert got[0]["corr"] is None

    def test_guards(self, ray_session):
        from marginalia_ray.ops.relational import correlation_matrix

        with pytest.raises(ValueError):
            correlation_matrix(_ds([{"a": 1}]), ["a"])
        with pytest.raises(Exception, match="integer"):
            correlation_matrix(
                _ds([{"a": 1.5, "b": 2}]), ["a", "b"]
            ).take_all()
        with pytest.raises(Exception, match="overflow"):
            correlation_matrix(
                _ds([{"a": 1 << 30, "b": 2}]), ["a", "b"]
            ).take_all()


class TestKsStatistic:
    def test_identical_distributions_zero(self, ray_session):
        from marginalia_ray.ops.relational import ks_statistic

        rows = [
            {"source": s, "n_chars": v} for s in ("a", "b") for v in (1, 2, 3, 3, 9)
        ]
        got = ks_statistic(_ds(rows), group_a="a", group_b="b").take_all()
        assert got == [
            {"group_a": "a", "group_b": "b", "n_a": 5, "n_b": 5, "ks": 0.0}
        ]

    def test_disjoint_distributions_one(self, ray_session):
        from marginalia_ray.ops.relational import ks_statistic

        rows = [{"source": "a", "n_chars": v} for v in (1, 2)] + [
            {"source": "b", "n_chars": v} for v in (10, 11, 12)
        ]
        got = ks_statistic(_ds(rows), group_a="a", group_b="b").take_all()[0]
        assert got["ks"] == 1.0 and got["n_a"] == 2 and got["n_b"] == 3

    def test_known_value_and_other_groups_ignored(self, ray_session):
        from marginalia_ray.ops.relational import ks_statistic

        # a: {1,2,3,4}; b: {3,4,5,6}; max |F_a - F_b| at v=2: 2/4 - 0 = 0.5
        rows = (
            [{"source": "a", "n_chars": v} for v in (1, 2, 3, 4)]
            + [{"source": "b", "n_chars": v} for v in (3, 4, 5, 6)]
            + [{"source": "noise", "n_chars": 999}] * 7
        )
        got = ks_statistic(_ds(rows), group_a="a", group_b="b").take_all()[0]
        assert got["ks"] == 0.5

    def test_empty_group_raises(self, ray_session):
        from marginalia_ray.ops.relational import ks_statistic

        rows = [{"source": "a", "n_chars": 1}]
        with pytest.raises(Exception, match="no rows"):
            ks_statistic(_ds(rows), group_a="a", group_b="b").take_all()


class TestWeightedSample:
    def test_deterministic_and_k_bounded(self, ray_session):
        from marginalia_ray.ops.curation import weighted_sample

        rows = [{"doc_id": i, "n_chars": 10 + i} for i in range(50)]
        a = weighted_sample(_ds(rows), k=10, seed=3).take_all()
        b = weighted_sample(_ds(rows), k=10, seed=3).take_all()
        assert a == b and len(a) == 10
        assert len({r["doc_id"] for r in a}) == 10

    def test_seed_changes_sample(self, ray_session):
        from marginalia_ray.ops.curation import weighted_sample

        rows = [{"doc_id": i, "n_chars": 10 + i} for i in range(200)]
        a = {r["doc_id"] for r in weighted_sample(_ds(rows), k=20, seed=1).take_all()}
        b = {r["doc_id"] for r in weighted_sample(_ds(rows), k=20, seed=2).take_all()}
        assert a != b

    def test_weight_bias(self, ray_session):
        from marginalia_ray.ops.curation import weighted_sample

        # one id with overwhelming weight is (essentially) always drawn
        rows = [{"doc_id": i, "n_chars": 1} for i in range(100)]
        rows.append({"doc_id": 999, "n_chars": 10_000_000})
        got = {r["doc_id"] for r in weighted_sample(_ds(rows), k=5, seed=4).take_all()}
        assert 999 in got

    def test_positive_weight_guard(self, ray_session):
        from marginalia_ray.ops.curation import weighted_sample

        with pytest.raises(Exception, match="positive"):
            weighted_sample(
                _ds([{"doc_id": 1, "n_chars": 0}]), k=1
            ).take_all()


class TestDiversityByKey:
    def test_uniform_two_categories(self, ray_session):
        import math

        from marginalia_ray.ops.relational import diversity_by_key

        rows = [{"source": "s", "lang": l} for l in ("en", "fr") for _ in range(5)]
        got = diversity_by_key(_ds(rows)).take_all()
        assert len(got) == 1
        r = got[0]
        assert r["n"] == 10 and r["n_distinct"] == 2
        assert abs(r["entropy"] - math.log(2)) < 1e-5
        assert r["simpson"] == 0.5

    def test_single_category_zero_diversity(self, ray_session):
        from marginalia_ray.ops.relational import diversity_by_key

        rows = [{"source": "s", "lang": "en"}] * 7
        r = diversity_by_key(_ds(rows)).take_all()[0]
        assert r["entropy"] == 0.0 and r["simpson"] == 0.0 and r["n_distinct"] == 1

    def test_keys_independent(self, ray_session):
        from marginalia_ray.ops.relational import diversity_by_key

        rows = [{"source": "a", "lang": "en"}] * 3 + [
            {"source": "b", "lang": l} for l in ("en", "fr", "de")
        ]
        got = {r["source"]: r for r in diversity_by_key(_ds(rows)).take_all()}
        assert got["a"]["n_distinct"] == 1 and got["b"]["n_distinct"] == 3
        assert got["b"]["simpson"] > got["a"]["simpson"]


class TestGuardHardening:
    """Regression tests for the session-5 review findings: guards must
    cover accumulated/global quantities, not just per-batch values."""

    def test_correlation_global_overflow_guard(self, ray_session):
        from marginalia_ray.ops.relational import correlation_matrix

        # per-value magnitudes pass, but rows x max_abs^2 breaches the
        # int64-safe bound -> loud error instead of silent wraparound
        rows = [{"a": 1000, "b": 1000}] * 10
        with pytest.raises(Exception, match="int64-safe"):
            correlation_matrix(_ds(rows), ["a", "b"], max_abs=1 << 31)

    def test_weighted_sample_nan_and_null_weights(self, ray_session):
        from marginalia_ray.ops.curation import weighted_sample

        with pytest.raises(Exception, match="positive"):
            weighted_sample(
                _ds([{"doc_id": 1, "n_chars": float("nan")}]), k=1
            ).take_all()
        with pytest.raises(Exception, match="null"):
            weighted_sample(
                _ds([{"doc_id": 1, "n_chars": None}, {"doc_id": 2, "n_chars": 3}]),
                k=1,
            ).take_all()


class TestBlocklistFilter:
    def test_word_boundary_counts(self, ray_session):
        from marginalia_ray.ops.text_ops import blocklist_filter

        rows = [
            {"doc_id": 1, "text": "slow slow slowly winslow"},
            {"doc_id": 2, "text": "all clean here"},
            {"doc_id": 3, "text": "Error ERROR broken"},
        ]
        got = {
            r["doc_id"]: r
            for r in blocklist_filter(
                _ds(rows), ["slow", "error", "broken"], max_hits=2
            ).take_all()
        }
        # 'slowly'/'winslow' must NOT match: word boundaries
        assert got[1]["n_blocked"] == 2 and got[1]["keep"] is True
        assert got[2]["n_blocked"] == 0 and got[2]["keep"] is True
        # lowercasing applies before matching
        assert got[3]["n_blocked"] == 3 and got[3]["keep"] is False

    def test_bad_term_rejected(self, ray_session):
        from marginalia_ray.ops.text_ops import blocklist_filter

        with pytest.raises(ValueError, match="lowercase"):
            blocklist_filter(_ds([{"doc_id": 1, "text": "x"}]), ["a b"])


class TestChiSquared:
    def test_independent_columns_zero(self, ray_session):
        from marginalia_ray.ops.relational import chi_squared

        rows = [
            {"source": s, "lang": l}
            for s in ("a", "b")
            for l in ("en", "fr")
        ] * 4
        got = chi_squared(_ds(rows)).take_all()
        assert got == [{"chi2": 0.0, "dof": 1, "n_cells": 4, "n": 16}]

    def test_perfect_dependence_equals_n_times_dof(self, ray_session):
        from marginalia_ray.ops.relational import chi_squared

        # 2x2 perfect dependence: chi2 = N (the two UNOBSERVED zero
        # cells contribute their expected counts)
        rows = [{"source": "a", "lang": "en"}] * 6 + [
            {"source": "b", "lang": "fr"}
        ] * 6
        got = chi_squared(_ds(rows)).take_all()[0]
        assert got["chi2"] == 12.0 and got["dof"] == 1 and got["n"] == 12
        assert got["n_cells"] == 2

    def test_max_cells_guard(self, ray_session):
        from marginalia_ray.ops.relational import chi_squared

        rows = [{"source": str(i), "lang": str(i)} for i in range(9)]
        with pytest.raises(Exception, match="max_cells"):
            chi_squared(_ds(rows), max_cells=4).take_all()


class TestZipfSlope:
    def test_exact_power_law(self, ray_session):
        from marginalia_ray.ops.text_ops import zipf_slope

        # geometric frequencies 64/32/16/8 over ranks 1..4: log-freq vs
        # log-rank is monotone decreasing (not exactly linear), so assert
        # a strongly negative slope and the exact term count
        rows = []
        for i, (w, f) in enumerate([("aa", 64), ("bb", 32), ("cc", 16), ("dd", 8)]):
            rows.append({"doc_id": i, "text": " ".join([w] * f)})
        got = zipf_slope(_ds(rows), top_n=10).take_all()
        assert len(got) == 1
        assert got[0]["n_terms"] == 4
        assert got[0]["slope"] < -0.5

    def test_uniform_frequencies_zero_slope(self, ray_session):
        from marginalia_ray.ops.text_ops import zipf_slope

        rows = [{"doc_id": 0, "text": "aa bb cc dd " * 5}]
        got = zipf_slope(_ds(rows), top_n=4).take_all()[0]
        assert got["slope"] == 0.0 and got["n_terms"] == 4

    def test_top_n_truncates(self, ray_session):
        from marginalia_ray.ops.text_ops import zipf_slope

        rows = [{"doc_id": 0, "text": "aa aa aa bb bb cc dd ee"}]
        got = zipf_slope(_ds(rows), top_n=2).take_all()[0]
        assert got["n_terms"] == 2

    def test_guard(self, ray_session):
        from marginalia_ray.ops.text_ops import zipf_slope

        with pytest.raises(ValueError, match="top_n"):
            zipf_slope(_ds([{"doc_id": 0, "text": "x"}]), top_n=1)
