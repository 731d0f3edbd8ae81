"""Relational / windowed operators over the auxiliary tables.

domain_stats mirrors the reference's per-domain metadata aggregation
(DomainMetadataCompiler / UpdateDomainStatistics, SURVEY.md G8).
sessionize is the windowed-aggregate pattern (gap-based sessions) a
training-data pipeline needs for event logs — groupby(user).map_groups
with a vectorized diff, partitioning assumption: one user's events fit
in one group (true at any realistic user cardinality; hot users would be
salted by day before this stage)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def domain_stats(ds, key_col: str = "source", text_col: str = "text"):
    """Per-domain doc counts + mean length: (domain, n_docs, avg_chars).
    Partial per-batch aggregation -> tiny groupby."""

    def _partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "domain": batch[key_col],
                "chars": pc.cast(pc.utf8_length(batch[text_col]), pa.int64()),
            }
        )
        g = t.group_by("domain").aggregate([("chars", "sum"), ("chars", "count")])
        return g.rename_columns(["domain", "sum_chars", "n"])

    out = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("domain")
        .sum(["sum_chars", "n"])
    )

    def _finalize(batch: pa.Table) -> pa.Table:
        s = batch["sum(sum_chars)"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = batch["sum(n)"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "domain": batch["domain"],
                "n_docs": pa.array(n.astype(np.int64)),
                "avg_chars": pa.array(np.round(s / n, 6), pa.float64()),
            }
        )

    return out.map_batches(_finalize, batch_format="pyarrow")


SAMPLE_MOD = 1_000_000
SAMPLE_MIX = 2_654_435_761  # Knuth multiplicative hash constant


def sample_by_key(ds, fraction: float, key_col: str = "doc_id"):
    """Deterministic fraction sample keyed on an integer column: keep rows
    where (key * 2654435761) % 2^32 % 1e6 < fraction*1e6.  Reproducible
    across runs/partitionings and SQL-replicable (unlike random_shuffle)."""
    cut = int(fraction * SAMPLE_MOD)

    def _batch(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (k * np.uint64(SAMPLE_MIX)) % np.uint64(1 << 32) % np.uint64(SAMPLE_MOD)
        return batch.filter(pa.array(h < cut))

    return ds.map_batches(_batch, batch_format="pyarrow")


def sessionize(ds, gap_minutes: int = 30, user_col: str = "user_id", ts_col: str = "ts"):
    """Gap-based sessionization of an event log: one row per (user, session)
    with (user_id, session_no, n_events, start_ts, end_ts).

    session_no numbers a user's sessions in time order from 0; a new
    session starts when the gap from the previous event exceeds
    `gap_minutes`.  One shuffle (groupby user)."""
    gap_us = np.int64(gap_minutes * 60 * 1_000_000)

    def _sessions(group: pa.Table) -> pa.Table:
        uid = group[user_col][0].as_py()
        ts = group[ts_col].to_numpy(zero_copy_only=False)
        ts_i = ts.astype("datetime64[us]").astype(np.int64)
        order = np.argsort(ts_i, kind="stable")
        ts_i = ts_i[order]
        new_session = np.r_[True, (ts_i[1:] - ts_i[:-1]) > gap_us]
        sess = np.cumsum(new_session) - 1
        n_sess = sess[-1] + 1 if len(sess) else 0
        starts = ts_i[new_session]
        ends = ts_i[np.r_[new_session[1:], True]]
        counts = np.bincount(sess, minlength=n_sess)
        # timestamps as epoch microseconds: int64 hashes identically across
        # engines (datetime dtype canonicalization does not)
        return pa.table(
            {
                "user_id": pa.array(np.full(n_sess, uid, dtype=np.int64)),
                "session_no": pa.array(np.arange(n_sess, dtype=np.int64)),
                "n_events": pa.array(counts.astype(np.int64)),
                "start_us": pa.array(starts),
                "end_us": pa.array(ends),
            }
        )

    return ds.groupby(user_col).map_groups(_sessions, batch_format="pyarrow")
