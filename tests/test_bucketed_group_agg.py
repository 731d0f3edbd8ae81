"""bucketed_group_agg: exact parity with a reference pandas groupby
across key dtypes, aggs, block layouts and edge cases — the helper now
backs the TPC-H shapes, hits_scores, column_profile and nine other
call sites, so its contract gets direct coverage here.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from marginalia_ray.ops.relational import bucketed_group_agg


def _ds(tbl: pa.Table, blocks=5):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


def _collect(ds) -> pd.DataFrame:
    return pa.Table.from_pylist(ds.take_all()).to_pandas()


def _ref(df: pd.DataFrame, keys, vals, agg):
    g = df.groupby(keys, as_index=False)
    if agg == "count":
        out = g.size().rename(columns={"size": "count()"})
    else:
        out = g[vals].agg(agg)
        out.columns = keys + [f"{agg}({v})" for v in vals]
    return out


def _check(tbl, keys, vals, agg, blocks=5):
    got = (
        _collect(bucketed_group_agg(_ds(tbl, blocks), keys, vals, agg=agg))
        .sort_values(keys)
        .reset_index(drop=True)
    )
    want = (
        _ref(tbl.to_pandas(), keys, vals, agg).sort_values(keys).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )


def test_int_key_sum_min_max_count(ray_session):
    rng = np.random.RandomState(0)
    tbl = pa.table(
        {
            "k": pa.array(rng.randint(-50, 50, 4000).astype(np.int64)),
            "a": pa.array(rng.randint(-1000, 1000, 4000).astype(np.int64)),
            "b": pa.array(rng.normal(0, 10, 4000)),
        }
    )
    for agg in ("sum", "min", "max"):
        _check(tbl, ["k"], ["a", "b"], agg)
    _check(tbl, ["k"], [], "count")


def test_string_and_multi_key(ray_session):
    rng = np.random.RandomState(1)
    tbl = pa.table(
        {
            "s": pa.array([f"key{v}" for v in rng.randint(0, 30, 3000)]),
            "k2": pa.array(rng.randint(0, 4, 3000).astype(np.int64)),
            "v": pa.array(rng.randint(0, 100, 3000).astype(np.int64)),
        }
    )
    _check(tbl, ["s"], ["v"], "sum")
    _check(tbl, ["s", "k2"], ["v"], "sum")
    _check(tbl, ["s", "k2"], [], "count")


def test_uint64_keys_above_2_63_do_not_collide(ray_session):
    # the regression the helper guards against: uint64 hash keys above
    # 2^63 must not be routed through a lossy/raising int64 cast
    ks = np.array([2**63 + 1, 2**63 + 1, 2**64 - 2, 5], dtype=np.uint64)
    tbl = pa.table(
        {
            "k": pa.array(ks),
            "v": pa.array(np.array([1, 2, 4, 8], dtype=np.int64)),
        }
    )
    got = {}
    for b in bucketed_group_agg(_ds(tbl, 3), ["k"], ["v"]).iter_batches(
        batch_format="pyarrow"
    ):
        for kk, vv in zip(b["k"].to_pylist(), b["sum(v)"].to_pylist()):
            got[int(kk)] = int(vv)
    assert got == {2**63 + 1: 3, 2**64 - 2: 4, 5: 8}


def test_int_sums_accumulate_exactly_in_int64(ray_session):
    # values whose float64 sum would lose ulps: int64 reduceat must be exact
    v = np.array([2**53 + 1] * 4 + [1] * 4, dtype=np.int64)
    tbl = pa.table(
        {"k": pa.array(np.zeros(8, np.int64)), "v": pa.array(v)}
    )
    got = _collect(bucketed_group_agg(_ds(tbl, 2), ["k"], ["v"]))
    assert int(got["sum(v)"][0]) == int(v.sum())


def test_block_layout_invariance_and_empty_blocks(ray_session):
    rng = np.random.RandomState(2)
    tbl = pa.table(
        {
            "k": pa.array(rng.randint(0, 7, 1000).astype(np.int64)),
            "v": pa.array(rng.randint(0, 9, 1000).astype(np.int64)),
        }
    )
    a = _collect(bucketed_group_agg(_ds(tbl, 1), ["k"], ["v"])).sort_values("k")
    b = _collect(bucketed_group_agg(_ds(tbl, 37), ["k"], ["v"])).sort_values("k")
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True), check_dtype=False
    )


def test_unsupported_agg_raises(ray_session):
    tbl = pa.table({"k": pa.array([1], pa.int64()), "v": pa.array([1], pa.int64())})
    with pytest.raises(ValueError):
        bucketed_group_agg(_ds(tbl, 1), ["k"], ["v"], agg="mean")
