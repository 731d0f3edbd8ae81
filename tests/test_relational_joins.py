"""asof_join / range_join / rolling_window / topk_per_group edge cases.

The sf-scale value parity vs DuckDB lives in test_oracle.py; these cover
the group-kernel edges: keys with only one side present, right-ts ties,
interval boundaries (inclusive ends), short rolling prefixes, and the
per-batch top-k combiner."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl: pa.Table):
    import ray.data

    return ray.data.from_arrow(tbl)


TS0 = 1_700_000_000_000_000  # epoch micros


def _ts(us):
    return pa.array(np.asarray(us, dtype="int64"), pa.timestamp("us"))


def test_asof_join_picks_latest_prior_and_breaks_ties(ray_session):
    from marginalia_ray.ops.relational import asof_join

    left = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([7, 7, 7], pa.int64()),
            "ts": _ts([TS0 + 50, TS0 + 150, TS0 - 10]),
        }
    )
    right = pa.table(
        {
            # two orders at the same ts (TS0+100): the max orderkey wins;
            # event 3 predates every order -> dropped (inner)
            "o_orderkey": pa.array([10, 11, 12, 13], pa.int64()),
            "o_custkey": pa.array([7, 7, 7, 7], pa.int64()),
            "o_orderdate": _ts([TS0, TS0 + 100, TS0 + 100, TS0 + 400]),
        }
    )
    out = asof_join(_ds(left), _ds(right)).to_pandas().set_index("event_id")
    assert sorted(out.index) == [1, 2]
    assert out.loc[1, "o_orderkey"] == 10
    assert out.loc[2, "o_orderkey"] == 12  # ts tie -> max orderkey
    assert out.loc[2, "right_ts_us"] == TS0 + 100


def test_asof_join_single_sided_keys_emit_nothing(ray_session):
    from marginalia_ray.ops.relational import asof_join

    left = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "user_id": pa.array([1], pa.int64()),
            "ts": _ts([TS0]),
        }
    )
    right = pa.table(
        {
            "o_orderkey": pa.array([9], pa.int64()),
            "o_custkey": pa.array([2], pa.int64()),  # different key
            "o_orderdate": _ts([TS0 - 5]),
        }
    )
    assert asof_join(_ds(left), _ds(right)).count() == 0


def test_range_join_boundaries_inclusive(ray_session):
    from marginalia_ray.ops.relational import range_join

    left = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([5, 5, 5, 5], pa.int64()),
            "ts": _ts([TS0, TS0 + 100, TS0 + 101, TS0 + 250]),
        }
    )
    right = pa.table(
        {
            "user_id": pa.array([5, 5], pa.int64()),
            "session_no": pa.array([0, 1], pa.int64()),
            "start_us": pa.array([TS0, TS0 + 200], pa.int64()),
            "end_us": pa.array([TS0 + 100, TS0 + 300], pa.int64()),
        }
    )
    out = range_join(_ds(left), _ds(right)).to_pandas().set_index("event_id")
    # both ends inclusive; the gap row (ts=+101) matches nothing
    assert out.loc[1, "session_no"] == 0
    assert out.loc[2, "session_no"] == 0
    assert 3 not in out.index
    assert out.loc[4, "session_no"] == 1


def test_rolling_window_prefix_and_order(ray_session):
    from marginalia_ray.ops.relational import rolling_window

    tbl = pa.table(
        {
            "event_id": pa.array([3, 1, 2], pa.int64()),
            "user_id": pa.array([1, 1, 1], pa.int64()),
            # same ts for events 1 and 2: event_id breaks the order
            "ts": _ts([TS0 + 10, TS0, TS0]),
            "value": pa.array([30.0, 10.0, 20.0], pa.float64()),
        }
    )
    out = rolling_window(_ds(tbl)).to_pandas().set_index("event_id")
    assert out.loc[1, "ravg"] == pytest.approx(10.0)
    assert out.loc[2, "ravg"] == pytest.approx(15.0)
    assert out.loc[3, "ravg"] == pytest.approx(20.0)


def test_asof_join_rejects_float_payload_and_accepts_date32(ray_session):
    """Float payloads would silently truncate through the int64 union —
    must raise; date32 ts columns must cast cleanly to epoch micros."""
    from marginalia_ray.ops.relational import asof_join

    left = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "user_id": pa.array([7], pa.int64()),
            "ts": _ts([TS0 + 86_400_000_000 * 400]),
        }
    )
    right_float = pa.table(
        {
            "o_orderkey": pa.array([1.9], pa.float64()),
            "o_custkey": pa.array([7], pa.int64()),
            "o_orderdate": _ts([TS0]),
        }
    )
    with pytest.raises((TypeError, Exception)) as ei:
        asof_join(_ds(left), _ds(right_float)).count()
    assert "payload column" in str(ei.value)

    right_date = pa.table(
        {
            "o_orderkey": pa.array([10], pa.int64()),
            "o_custkey": pa.array([7], pa.int64()),
            "o_orderdate": pa.array([19700], pa.date32()),  # ~2023-12
        }
    )
    out = asof_join(_ds(left), _ds(right_date)).to_pandas()
    assert len(out) == 1
    assert out.loc[0, "right_ts_us"] == 19700 * 86_400_000_000


def test_mp3_truncated_final_frame_not_counted():
    from marginalia_ray.ops.multimodal import mp3_stream_info

    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])  # MPEG1 L3 128k 44100
    flen = 1152 * 128000 // (8 * 44100)
    frame = hdr + b"\x00" * (flen - 4)
    data = frame * 3 + hdr + b"\x00" * 10  # 4th frame truncated
    dur, rate, frames = mp3_stream_info(data)
    assert frames == 3
    assert rate == 44100
    assert dur == pytest.approx(3 * 1152 / 44100)


def test_topk_per_group_combiner_matches_global(ray_session):
    """Split the same rows across many blocks: the per-batch combiner must
    not change the global answer."""
    import ray.data

    from marginalia_ray.ops.relational import topk_per_group

    rng = np.random.RandomState(7)
    n = 400
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(rng.randint(0, 5, n), pa.int64()),
            "value": pa.array(rng.rand(n).round(3), pa.float64()),
        }
    )
    whole = topk_per_group(_ds(tbl)).to_pandas()
    split = topk_per_group(ray.data.from_arrow(tbl).repartition(16)).to_pandas()
    key = ["user_id", "rn"]
    whole = whole.sort_values(key).reset_index(drop=True)
    split = split.sort_values(key).reset_index(drop=True)
    assert whole.equals(split)
    assert (whole.groupby("user_id")["rn"].max() <= 3).all()


class TestHoppingWindow:
    def _events(self, rows):
        return _ds(
            pa.table(
                {
                    "ts": pa.array([TS0 + r[0] * 60_000_000 for r in rows],
                                   pa.timestamp("us")),
                    "event_type": pa.array([r[1] for r in rows]),
                    "value": pa.array([float(r[2]) for r in rows]),
                }
            )
        )

    def test_tumbling_counts_and_sums(self, ray_session):
        from marginalia_ray.ops.relational import hopping_window

        # TS0 is 13m20s into its hour: offsets 0, 10, 30 stay in window 0,
        # offset 61 (74m into the hour) falls in window 1
        ev = self._events([(0, "a", 1.5), (10, "a", 2.25), (30, "b", 1.0), (61, "a", 4.0)])
        out = {
            (r["window_start_us"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in hopping_window(ev, width_minutes=60).take_all()
        }
        w0 = (TS0 // 3_600_000_000) * 3_600_000_000
        assert out[(w0, "a")] == (2, 3.75)
        assert out[(w0, "b")] == (1, 1.0)
        assert out[(w0 + 3_600_000_000, "a")] == (1, 4.0)

    def test_hopping_event_lands_in_k_windows(self, ray_session):
        from marginalia_ray.ops.relational import hopping_window

        ev = self._events([(90, "a", 1.0)])  # one event
        out = hopping_window(ev, width_minutes=60, hop_minutes=20).take_all()
        # width/hop = 3 overlapping windows contain it
        assert len(out) == 3
        starts = sorted(r["window_start_us"] for r in out)
        assert all(b - a == 20 * 60_000_000 for a, b in zip(starts, starts[1:]))
        ts = TS0 + 90 * 60_000_000
        for r in out:
            assert r["window_start_us"] <= ts < r["window_start_us"] + 3_600_000_000

    def test_non_divisible_width_trims_partial_window(self, ray_session):
        from marginalia_ray.ops.relational import hopping_window

        # width 50, hop 20 -> ceil = 3 candidate windows, but the earliest
        # only covers the event when ts - wstart < 50 min
        ev = self._events([(45, "a", 1.0)])
        out = hopping_window(ev, width_minutes=50, hop_minutes=20).take_all()
        ts = TS0 + 45 * 60_000_000
        for r in out:
            assert r["window_start_us"] <= ts < r["window_start_us"] + 50 * 60_000_000
        # exact containment count, computed independently
        hop, width = 20 * 60_000_000, 50 * 60_000_000
        n_expect = sum(
            1
            for j in range(3)
            if ts < ((ts // hop) - j) * hop + width
        )
        assert len(out) == n_expect

    def test_micro_quantization_is_exact(self, ray_session):
        from marginalia_ray.ops.relational import hopping_window

        # values that would accumulate float error if summed as doubles
        ev = self._events([(0, "a", 0.1)] * 1 + [(1, "a", 0.2), (2, "a", 0.3)])
        (row,) = hopping_window(ev, width_minutes=60).take_all()
        assert row["sum_value"] == 0.6
        assert row["n_events"] == 3


class TestBroadcastJoin:
    def test_inner_semantics_and_order(self, ray_session):
        from marginalia_ray.ops.relational import broadcast_join

        big = _ds(pa.table({"k": pa.array([3, 1, 9, 1]), "v": pa.array(list("abcd"))}))
        small = pa.table({"sk": pa.array([1, 2, 3]), "name": pa.array(["one", "two", "three"])})
        out = broadcast_join(big, small, on="k", small_on="sk").take_all()
        assert [(r["k"], r["v"], r["name"]) for r in out] == [
            (3, "a", "three"), (1, "b", "one"), (1, "d", "one")
        ]  # big order kept, unmatched k=9 dropped

    def test_duplicate_small_key_rejected(self, ray_session):
        from marginalia_ray.ops.relational import broadcast_join

        big = _ds(pa.table({"k": pa.array([1])}))
        small = pa.table({"k": pa.array([1, 1]), "x": pa.array([1, 2])})
        with pytest.raises(ValueError, match="duplicate"):
            broadcast_join(big, small, on="k").take_all()

    def test_small_side_cap(self, ray_session):
        from marginalia_ray.ops.relational import broadcast_join

        big = _ds(pa.table({"k": pa.array([1])}))
        small = _ds(pa.table({"k": pa.array(range(100)), "x": pa.array(range(100))}))
        with pytest.raises(RuntimeError, match="exceeds"):
            broadcast_join(big, small, on="k", max_small_rows=10).take_all()


class TestHashEquiJoin:
    def test_many_to_many(self, ray_session):
        from marginalia_ray.ops.relational import hash_equi_join

        left = _ds(pa.table({"k": pa.array([1, 1, 2, 7]), "lv": pa.array(list("abcd"))}))
        right = _ds(pa.table({"rk": pa.array([1, 1, 2]), "rv": pa.array(["x", "y", "z"])}))
        out = hash_equi_join(left, right, on="k", right_on="rk").take_all()
        got = sorted((r["k"], r["lv"], r["rv"]) for r in out)
        assert got == [
            (1, "a", "x"), (1, "a", "y"), (1, "b", "x"), (1, "b", "y"), (2, "c", "z")
        ]  # 2x2 cross on k=1, unmatched k=7 dropped

    def test_no_matches_is_empty_with_schema(self, ray_session):
        from marginalia_ray.ops.relational import hash_equi_join

        left = _ds(pa.table({"k": pa.array([1, 2]), "lv": pa.array([10, 20])}))
        right = _ds(pa.table({"k": pa.array([5, 6]), "rv": pa.array([1.5, 2.5])}))
        out = hash_equi_join(left, right, on="k")
        # Ray's to_pandas drops columns for ANY zero-row dataset; the
        # schema-anchor block keeps Dataset.schema() correct instead
        assert out.count() == 0
        assert out.schema().names == ["k", "lv", "rv"]

    def test_column_projection(self, ray_session):
        from marginalia_ray.ops.relational import hash_equi_join

        left = _ds(pa.table({"k": pa.array([1]), "a": pa.array([2]), "b": pa.array([3])}))
        right = _ds(pa.table({"k": pa.array([1]), "c": pa.array([4]), "d": pa.array([5])}))
        out = hash_equi_join(
            left, right, on="k", left_cols=["k", "a"], right_cols=["d"]
        ).take_all()
        assert out == [{"k": 1, "a": 2, "d": 5}]

    def test_left_join_keeps_unmatched_with_nulls(self, ray_session):
        from marginalia_ray.ops.relational import hash_equi_join

        left = _ds(pa.table({"k": pa.array([1, 2, 3]), "lv": pa.array(list("abc"))}))
        right = _ds(pa.table({"k": pa.array([2]), "rv": pa.array(["hit"])}))
        out = sorted(
            hash_equi_join(left, right, on="k", how="left").take_all(),
            key=lambda r: r["k"],
        )
        assert [(r["k"], r["lv"], r["rv"]) for r in out] == [
            (1, "a", None), (2, "b", "hit"), (3, "c", None)
        ]

    def test_left_join_with_empty_right(self, ray_session):
        from marginalia_ray.ops.relational import hash_equi_join

        left = _ds(pa.table({"k": pa.array([5]), "lv": pa.array([9])}))
        right = _ds(pa.table({"k": pa.array([], pa.int64()), "rv": pa.array([], pa.string())}))
        out = hash_equi_join(left, right, on="k", how="left").take_all()
        assert out == [{"k": 5, "lv": 9, "rv": None}]

    def test_requested_right_column_collision_raises(self, ray_session):
        # ADVICE r3: right_cols=['comment'] colliding with a left column
        # used to silently return the LEFT values; now a loud error
        from marginalia_ray.ops.relational import hash_equi_join

        left = _ds(pa.table({"k": pa.array([1]), "comment": pa.array(["l"])}))
        right = _ds(pa.table({"k": pa.array([1]), "comment": pa.array(["r"])}))
        with pytest.raises(ValueError, match="collide"):
            hash_equi_join(left, right, on="k", right_cols=["comment"])
        # default (right_cols unset) keeps the documented drop behavior
        out = hash_equi_join(left, right, on="k").take_all()
        assert out == [{"k": 1, "comment": "l"}]

    def test_null_join_key_raises(self, ray_session):
        from marginalia_ray.ops.relational import hash_equi_join

        left = _ds(pa.table({"k": pa.array([1, None], pa.int64()), "lv": pa.array([1, 2])}))
        right = _ds(pa.table({"k": pa.array([1]), "rv": pa.array([9])}))
        with pytest.raises(Exception, match="null"):
            hash_equi_join(left, right, on="k").take_all()

    def test_broadcast_join_null_key_raises(self, ray_session):
        from marginalia_ray.ops.relational import broadcast_join

        big = _ds(pa.table({"k": pa.array([1, None], pa.int64()), "v": pa.array([1, 2])}))
        small = pa.table({"k": pa.array([1]), "w": pa.array([9])})
        with pytest.raises(Exception, match="null"):
            broadcast_join(big, small, on="k").take_all()
        with pytest.raises(TypeError, match="null"):
            broadcast_join(
                _ds(pa.table({"k": pa.array([1])})),
                pa.table({"k": pa.array([1, None], pa.int64()), "w": pa.array([1, 2])}),
                on="k",
            )


class TestHashFullJoin:
    def test_full_join_keeps_both_unmatched_sides(self, ray_session):
        from marginalia_ray.ops.relational import hash_equi_join

        left = _ds(pa.table({"k": pa.array([1, 2, 3]), "lv": pa.array(list("abc"))}))
        right = _ds(pa.table({"rk": pa.array([2, 9]), "rv": pa.array(["hit", "ronly"])}))
        out = sorted(
            hash_equi_join(left, right, on="k", right_on="rk", how="full").take_all(),
            key=lambda r: r["k"],
        )
        # unmatched right row carries its key in the `on` column
        assert [(r["k"], r["lv"], r["rv"]) for r in out] == [
            (1, "a", None), (2, "b", "hit"), (3, "c", None), (9, None, "ronly")
        ]

    def test_full_join_many_to_many_plus_right_only(self, ray_session):
        from marginalia_ray.ops.relational import hash_equi_join

        left = _ds(pa.table({"k": pa.array([1, 1]), "lv": pa.array(["a", "b"])}))
        right = _ds(
            pa.table({"k": pa.array([1, 1, 4]), "rv": pa.array(["x", "y", "solo"])})
        )
        out = sorted(
            hash_equi_join(left, right, on="k", how="full").take_all(),
            key=lambda r: (r["k"], r["lv"] or "", r["rv"]),
        )
        assert [(r["k"], r["lv"], r["rv"]) for r in out] == [
            (1, "a", "x"), (1, "a", "y"), (1, "b", "x"), (1, "b", "y"),
            (4, None, "solo"),
        ]

    def test_full_join_with_empty_left(self, ray_session):
        from marginalia_ray.ops.relational import hash_equi_join

        left = _ds(pa.table({"k": pa.array([], pa.int64()), "lv": pa.array([], pa.string())}))
        right = _ds(pa.table({"k": pa.array([7]), "rv": pa.array(["only"])}))
        out = hash_equi_join(left, right, on="k", how="full").take_all()
        assert out == [{"k": 7, "lv": None, "rv": "only"}]


class TestCohortRetention:
    def test_cohort_matrix_hand_computed(self, ray_session):
        from marginalia_ray.ops.relational import cohort_retention

        WEEK = 604_800_000_000  # us
        def ev(uid, week, n=1):
            # n events inside the same week must count the user ONCE
            return [
                {"user_id": uid, "ts": np.datetime64((week * WEEK) + i, "us")}
                for i in range(n)
            ]

        rows = (
            ev(1, 100) + ev(1, 101, n=3) + ev(1, 102)   # cohort 100, offsets 0,1,2
            + ev(2, 100) + ev(2, 102)                     # cohort 100, offsets 0,2
            + ev(3, 101, n=2)                             # cohort 101, offset 0
        )
        import ray.data

        out = cohort_retention(ray.data.from_items(rows)).take_all()
        got = {(r["cohort_week"], r["week_offset"]): r["n_users"] for r in out}
        assert got == {
            (100, 0): 2, (100, 1): 1, (100, 2): 2,
            (101, 0): 1,
        }
