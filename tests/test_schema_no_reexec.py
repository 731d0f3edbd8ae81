"""schema_no_reexec: schema fetch without a throwaway execution.

Dataset.schema() on a shuffle-descended lineage executes the whole
subplan to see one block, discards the blocks, and the next consumer
re-executes everything (measured ~2x wall on the TPC-H Q3 shape).  The
helper materializes exactly those lineages once; map-only lineages keep
the cheap one-block peek and stay lazy (streaming).
"""

import numpy as np
import pyarrow as pa
import pytest

from marginalia_ray.ops.relational import (
    _lineage_has_shuffle,
    bucketed_group_agg,
    hash_equi_join,
    schema_no_reexec,
)


def _src(n=1000):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(np.arange(n, dtype=np.int64) % 7),
                "v": pa.array(np.ones(n, dtype=np.int64)),
            }
        )
    )


def test_map_only_lineage_stays_lazy(ray_session):
    import ray.data

    ds = _src().map_batches(lambda b: b, batch_format="pyarrow")
    assert not _lineage_has_shuffle(ds)
    sch, out = schema_no_reexec(ds)
    assert sch is not None and set(sch.names) == {"k", "v"}
    # the handle is returned unchanged — not force-materialized
    assert out is ds
    assert not isinstance(out, ray.data.dataset.MaterializedDataset)


def test_shuffle_lineage_detected_and_pinned(ray_session):
    import ray.data

    agg = bucketed_group_agg(_src(), ["k"], ["v"])
    assert _lineage_has_shuffle(agg)
    sch, out = schema_no_reexec(agg)
    assert set(sch.names) == {"k", "sum(v)"}
    # the shuffle output is pinned so the caller's downstream consumption
    # does not re-run the subplan
    assert isinstance(out, ray.data.dataset.MaterializedDataset)
    assert out.count() == 7


def test_native_groupby_and_sort_detected(ray_session):
    assert _lineage_has_shuffle(_src().groupby("k").sum("v"))
    assert _lineage_has_shuffle(_src().sort("k"))
    assert not _lineage_has_shuffle(_src())


def test_join_on_shuffled_input_matches_join_on_materialized(ray_session):
    import ray.data

    left = bucketed_group_agg(_src(), ["k"], ["v"])
    right = ray.data.from_arrow(
        pa.table(
            {
                "k2": pa.array(np.arange(7, dtype=np.int64)),
                "name": pa.array([f"g{i}" for i in range(7)]),
            }
        )
    )
    j = hash_equi_join(
        left,
        right,
        on="k",
        right_on="k2",
        left_cols=["k", "sum(v)"],
        right_cols=["name"],
    )
    rows = sorted(
        (r["k"], r["sum(v)"], r["name"]) for r in j.take_all()
    )
    expect = sorted(
        (k, 1000 // 7 + (1 if k < 1000 % 7 else 0), f"g{k}") for k in range(7)
    )
    assert rows == expect
