"""Sketch operators: approximate distinct counting (HyperLogLog).

HLL (Flajolet et al. 2007) re-expressed as a Ray Data aggregation: the
register table IS a groupby — register updates are per-batch partial
max aggregations over (key, bucket), the shuffle moves at most
n_keys * m rows (never the data), and the estimator is a per-key
map_groups.  All arithmetic is chosen to be exactly reproducible in SQL
(integer msb extraction, powers-of-two register contributions), so the
op is oracle-checkable despite being a sketch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from marginalia_ray.ops.text_ops import _FMIX_SPLIT


def _msb56(v: np.ndarray) -> np.ndarray:
    """Index of the highest set bit (0-based) of each value, exact
    integer math (branchless vectorized binary search); caller handles
    v == 0."""
    v = v.copy()
    msb = np.zeros(len(v), np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(shift))
        msb[big] += shift
        v[big] >>= np.uint64(shift)
    return msb


def approx_distinct_by_key(
    ds,
    key_col: str = "event_type",
    val_col: str = "user_id",
    b: int = 8,
):
    """HyperLogLog approximate count-distinct of `val_col` per `key_col`.

    h = fmix64(value); bucket = top `b` bits; rho = position of the first
    1-bit in the remaining 64-b bits (1-based, 64-b+1 when all zero);
    register[key][bucket] = max rho.  Estimate = alpha_m * m^2 /
    sum(2^-register), with the small-range correction
    m * ln(m / zero_registers) when E <= 2.5m and zeros > 0.

    Scale shape: per-batch partial (key, bucket) max — the shuffle moves
    at most n_keys * 2^b rows per batch, never the values; the estimator
    group is exactly one sketch (<= 2^b rows).  This is the pattern for
    any mergeable sketch on Ray Data: partial-combine in map_batches,
    merge in one small groupby.

    Output: (<key_col>, approx_distinct) — the estimate rounded to 6 dp
    (a DOUBLE: the op reports the estimator's value, not a row count).
    """
    m = 1 << b
    rem_bits = 64 - b
    rem_mask = np.uint64((1 << rem_bits) - 1)
    alpha = 0.7213 / (1.0 + 1.079 / m)

    def _partial(batch: pa.Table) -> pa.Table:
        vals = batch[val_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _FMIX_SPLIT(vals)
        bucket = (h >> np.uint64(rem_bits)).astype(np.int64)
        rem = h & rem_mask
        rho = np.where(rem == 0, rem_bits + 1, rem_bits - _msb56(rem)).astype(np.int64)
        t = pa.table(
            {key_col: batch[key_col], "bucket": pa.array(bucket), "rho": pa.array(rho)}
        )
        g = t.group_by([key_col, "bucket"]).aggregate([("rho", "max")])
        return g.rename_columns([key_col, "bucket", "rho"])

    regs = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby([key_col, "bucket"])
        .max("rho")
    )

    def _estimate(group: pa.Table) -> pa.Table:
        key = group[key_col][0].as_py()
        rho = group["max(rho)"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_present = len(rho)
        s = float(np.sum(np.power(2.0, -rho))) + (m - n_present)
        zeros = m - n_present
        e = alpha * m * m / s
        if e <= 2.5 * m and zeros > 0:
            e = m * np.log(m / zeros)
        return pa.table(
            {
                key_col: pa.array([key], group[key_col].type),
                "approx_distinct": pa.array([round(float(e), 6)], pa.float64()),
            }
        )

    return regs.groupby(key_col).map_groups(_estimate, batch_format="pyarrow")
