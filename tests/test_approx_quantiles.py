"""approx_quantiles: deterministic bottom-k quantile sketch.

The sample is the global bottom-k by (fmix64(fmix64(id)^seed), id), so
the result is independent of block layout (mergeable KMV property) and
exact when k >= n.
"""

import numpy as np
import pyarrow as pa
import pytest

from marginalia_ray.ops.sketch import approx_quantiles

QS = (0.1, 0.25, 0.5, 0.75, 0.9)


def _ds(vals, ids=None, blocks=4):
    import ray.data

    n = len(vals)
    ids = np.arange(n, dtype=np.int64) if ids is None else np.asarray(ids)
    t = pa.table(
        {"doc_id": pa.array(ids), "v": pa.array(np.asarray(vals, np.float64))}
    )
    return ray.data.from_arrow(t).repartition(blocks)


def _run(ds, **kw):
    rows = approx_quantiles(ds, qs=QS, val_col="v", **kw).take_all()
    return [(r["q"], r["value"]) for r in sorted(rows, key=lambda r: r["q"])]


def test_exact_when_k_covers_input(ray_session):
    rng = np.random.RandomState(3)
    vals = rng.gamma(2.0, 100.0, size=400)
    got = _run(_ds(vals), k=1000)
    for (q, v) in got:
        assert v == round(float(np.quantile(vals, q)), 6)


def test_block_layout_independent(ray_session):
    rng = np.random.RandomState(7)
    vals = rng.normal(50, 10, size=2000)
    a = _run(_ds(vals, blocks=1), k=128, seed=9)
    b = _run(_ds(vals, blocks=17), k=128, seed=9)
    assert a == b


def test_sample_error_within_rank_bound(ray_session):
    # k=512 of n=20000: rank error ~ 3*sqrt(q(1-q)/k) whp; verify the
    # VALUE at q sits between the exact quantiles at q +/- that margin
    rng = np.random.RandomState(11)
    vals = rng.lognormal(4.0, 0.8, size=20000)
    got = _run(_ds(vals, blocks=8), k=512, seed=1)
    for (q, v) in got:
        m = 3.0 * np.sqrt(q * (1 - q) / 512)
        lo = float(np.quantile(vals, max(0.0, q - m)))
        hi = float(np.quantile(vals, min(1.0, q + m)))
        assert lo <= v <= hi, (q, v, lo, hi)


def test_validation_errors(ray_session):
    import ray.data

    ds = _ds([1.0, 2.0])
    with pytest.raises(ValueError):
        approx_quantiles(ds, qs=(1.5,), val_col="v").take_all()
    with pytest.raises(ValueError):
        approx_quantiles(ds, qs=(0.5,), val_col="v", k=0).take_all()
    bad = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1, None]), "v": pa.array([1.0, 2.0])})
    )
    with pytest.raises(Exception):
        approx_quantiles(bad, qs=(0.5,), val_col="v").take_all()


def _kds(keys, vals, blocks=4):
    import ray.data

    n = len(vals)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "k": pa.array(list(keys)),
            "v": pa.array(np.asarray(vals, np.float64)),
        }
    )
    return ray.data.from_arrow(t).repartition(blocks)


def _run_by_key(ds, **kw):
    from marginalia_ray.ops.sketch import approx_quantiles_by_key

    rows = approx_quantiles_by_key(
        ds, qs=QS, key_col="k", val_col="v", **kw
    ).take_all()
    return sorted((r["k"], r["q"], r["value"]) for r in rows)


def test_by_key_exact_when_k_covers_each_key(ray_session):
    rng = np.random.RandomState(5)
    keys = np.repeat(["a", "b", "c"], 60)
    vals = rng.gamma(3.0, 50.0, size=180)
    got = _run_by_key(_kds(keys, vals), k=100)
    for (kk, q, v) in got:
        assert v == round(float(np.quantile(vals[keys == kk], q)), 6)


def test_by_key_layout_independent_and_int_keys(ray_session):
    rng = np.random.RandomState(6)
    keys = rng.randint(0, 7, size=3000)
    vals = rng.normal(10, 3, size=3000)
    a = _run_by_key(_kds(keys, vals, blocks=1), k=64, seed=2)
    b = _run_by_key(_kds(keys, vals, blocks=13), k=64, seed=2)
    assert a == b
    assert len(a) == 7 * len(QS)


def test_by_key_sample_matches_global_sketch_per_key(ray_session):
    # one key only: by-key result must equal the global sketch's result
    # for the same k/seed (same bottom-k rows, same interpolation)
    rng = np.random.RandomState(8)
    vals = rng.lognormal(3.0, 0.5, size=800)
    by_key = _run_by_key(_kds(["x"] * 800, vals), k=32, seed=4)
    ds = _ds(vals)
    glob = _run(ds, k=32, seed=4)
    assert [(q, v) for (_, q, v) in by_key] == glob


def test_duplicate_ids_block_layout_independent(ray_session):
    """Duplicate ids hash to identical u; the per-block bottom-k must
    tie-break by (u, id) like the final merge so the result is the same
    for every block layout even when the k boundary falls inside a tie."""
    rng = np.random.RandomState(11)
    n = 600
    ids = np.repeat(np.arange(n // 4, dtype=np.int64), 4)[:n]  # each id x4
    vals = rng.normal(50.0, 10.0, size=n)
    ref = _run(_ds(vals, ids=ids, blocks=1), k=64)
    for blocks in (2, 5, 13):
        assert _run(_ds(vals, ids=ids, blocks=blocks), k=64) == ref
