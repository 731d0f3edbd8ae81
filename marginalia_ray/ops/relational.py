"""Relational / windowed operators over the auxiliary tables.

domain_stats mirrors the reference's per-domain metadata aggregation
(DomainMetadataCompiler / UpdateDomainStatistics, SURVEY.md G8).
sessionize is the windowed-aggregate pattern (gap-based sessions) a
training-data pipeline needs for event logs — groupby(user).map_groups
with a vectorized diff, partitioning assumption: one user's events fit
in one group (true at any realistic user cardinality; hot users would be
salted by day before this stage)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


def _lineage_has_shuffle(ds) -> bool:
    """True when the Dataset's logical plan contains an all-to-all stage
    (groupby / sort / repartition-shuffle).  Internal-API probe with a
    conservative False fallback."""
    try:
        from ray.data._internal.logical.operators.all_to_all_operator import (
            AbstractAllToAll,
        )

        stack = [ds._logical_plan.dag]
    except Exception:
        return False
    while stack:
        op = stack.pop()
        if isinstance(op, AbstractAllToAll):
            return True
        stack.extend(getattr(op, "input_dependencies", ()))
    return False


def schema_no_reexec(ds):
    """``(schema, ds)`` without paying a throwaway execution for the schema.

    ``Dataset.schema()`` on a lineage whose metadata doesn't carry the
    schema executes the plan far enough to see one block.  For map-only
    lineages that peek is cheap and streaming is preserved — keep it.
    But when the lineage contains an all-to-all stage, "one block" means
    the ENTIRE upstream subplan runs and its blocks are then DISCARDED;
    the next consumer re-executes everything (measured: the TPC-H Q3
    shape paid ~2x wall time for joins whose inputs sit downstream of a
    groupby).  For those lineages ``materialize()`` costs the same one
    execution but pins the shuffle output in the object store, so the
    caller's downstream consumption is free.  Returns the possibly
    materialized handle alongside the schema — use it in place of the
    original Dataset.
    """
    sch = ds.schema(fetch_if_missing=False)
    if sch is not None:
        return sch, ds
    if _lineage_has_shuffle(ds):
        ds = ds.materialize()
        return ds.schema(), ds
    return ds.schema(), ds


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


def _to_epoch_us(arr, name: str):
    """timestamp/date -> epoch-micros int64; integer columns pass through
    as int64 (contract: already epoch micros); anything else is a loud
    TypeError — a blind cast would either crash inside a Ray task
    (date32) or silently compare milliseconds against microseconds."""
    t = arr.type
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return pc.cast(pc.cast(arr, pa.timestamp("us")), pa.int64())
    if pa.types.is_integer(t):
        return pc.cast(arr, pa.int64())
    raise TypeError(
        f"column {name!r}: expected timestamp/date or epoch-micros integer, got {t}"
    )


def _norm_payload(arr, name: str):
    """Validate + normalize a join payload column to non-null int64.

    The co-partition join carries payloads through a union whose other
    side holds typed nulls, and the group kernels round-trip through
    numpy — only integer/timestamp payloads survive that exactly.
    Floats/strings raise (join on an id and fetch other columns with a
    post-join lookup); source nulls raise (they would be
    indistinguishable from the other side's fill)."""
    t = arr.type
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        arr = pc.cast(pc.cast(arr, pa.timestamp("us")), pa.int64())
    elif pa.types.is_integer(t):
        arr = pc.cast(arr, pa.int64())
    else:
        raise TypeError(
            f"payload column {name!r}: only integer/timestamp payloads ride "
            f"through the co-partition join (got {t}); join on an id and "
            "fetch wide columns with a post-join lookup"
        )
    if arr.null_count:
        raise TypeError(f"payload column {name!r} contains nulls")
    return arr


def _tag_union(left, right, key_pairs, ts_pairs, left_cols, right_cols):
    """Normalize two Datasets into ONE schema and union them, tagged by
    side — the co-partition primitive under asof_join / range_join.

    Ray's ``Dataset.union`` requires block-schema agreement, and feeding
    heterogeneous map_groups output into later stages is exactly the
    empty-schema-block failure mode of round 2's minhash join; building
    the common schema explicitly (absent columns become typed int64
    nulls, owned payloads validated + normalized to int64 by
    _norm_payload) keeps every block identically typed no matter which
    side or partition it came from.  key/ts columns are cast to int64
    ("_key", "_ts_us" epoch micros) so the group kernels are pure
    numpy."""
    all_cols = list(left_cols) + list(right_cols)

    def _mk(side, key_col, ts_col, own_cols):
        def _norm(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {
                "_key": pc.cast(batch[key_col], pa.int64()),
                "_ts_us": _to_epoch_us(batch[ts_col], ts_col),
                "_side": pa.array(np.full(n, side, dtype=np.int8)),
            }
            for c in all_cols:
                if c in own_cols:
                    cols[c] = _norm_payload(batch[c], c)
                else:
                    cols[c] = pa.nulls(n, pa.int64())
            return pa.table(cols)

        return _norm

    lk, rk = key_pairs
    lt, rt = ts_pairs
    return left.map_batches(
        _mk(0, lk, lt, set(left_cols)), batch_format="pyarrow"
    ).union(right.map_batches(_mk(1, rk, rt, set(right_cols)), batch_format="pyarrow"))


def _group_payload(group: pa.Table, col: str, mask) -> np.ndarray:
    """Extract a payload column's rows for one side as int64 numpy.
    fill_null(0) only neutralizes the OTHER side's typed nulls (masked
    out right after) — owned-side nulls were rejected at _tag_union."""
    return (
        pc.fill_null(group[col], 0)
        .to_numpy(zero_copy_only=False)[mask]
        .astype(np.int64)
    )


def _emit_left(group: pa.Table, l_cols, lmask, hit, l_ts) -> dict:
    """Output columns shared by both join kernels: the matched left
    rows' payloads + (key, ts_us)."""
    cols = {}
    for c in l_cols:
        cols[c] = pa.array(_group_payload(group, c, lmask)[hit])
    cols["key"] = pa.array(group["_key"].to_numpy(zero_copy_only=False)[lmask][hit])
    cols["ts_us"] = pa.array(l_ts[hit])
    return cols


def asof_join(
    left,
    right,
    *,
    on=("user_id", "o_custkey"),
    ts=("ts", "o_orderdate"),
    left_cols=("event_id",),
    right_cols=("o_orderkey",),
):
    """Distributed as-of join: for each left row, the single right row of
    the same key with the greatest right-ts <= left-ts (inner semantics;
    ties on right-ts resolved to the row with the greatest right_cols
    values, lexicographically — deterministic on both engines).

    Plan: normalize both sides into one schema, union, ONE hash shuffle
    on the key, then a per-group numpy merge (sort right by ts,
    searchsorted the left timestamps).  No row ever leaves its key
    partition, so this scales as a single groupby regardless of the
    time-range blowup a naive range-predicate join would pay (the sf0.01
    oracle's intermediate is ~10x its output).  Partitioning assumption:
    one key's rows fit in one group — salt hot keys by coarse time
    bucket upstream if that breaks.

    Output: left_cols + (_key as key, _ts_us) + right_cols + right_ts_us.
    Payload columns must be non-null integer/timestamp (validated loudly
    at _tag_union); carry wide/float columns with a post-join lookup.
    """
    tagged = _tag_union(left, right, on, ts, left_cols, right_cols)
    l_cols = list(left_cols)
    r_cols = list(right_cols)

    out_schema = pa.schema(
        [(c, pa.int64()) for c in l_cols]
        + [("key", pa.int64()), ("ts_us", pa.int64())]
        + [(c, pa.int64()) for c in r_cols]
        + [("right_ts_us", pa.int64())]
    )

    def _merge(group: pa.Table) -> pa.Table:
        side = group["_side"].to_numpy(zero_copy_only=False)
        ts_us = group["_ts_us"].to_numpy(zero_copy_only=False)
        lmask = side == 0
        rmask = ~lmask
        if not lmask.any() or not rmask.any():
            return out_schema.empty_table()
        r_ts = ts_us[rmask]
        r_payload = [_group_payload(group, c, rmask) for c in r_cols]
        # sort right by (ts, payload...): after this, searchsorted's
        # "last index with ts <= t" is also the max-payload tie winner
        order = np.lexsort(tuple(reversed(r_payload)) + (r_ts,))
        r_ts = r_ts[order]
        r_payload = [p[order] for p in r_payload]
        l_ts = ts_us[lmask]
        idx = np.searchsorted(r_ts, l_ts, side="right") - 1
        hit = idx >= 0
        idx = idx[hit]
        cols = _emit_left(group, l_cols, lmask, hit, l_ts)
        for c, p in zip(r_cols, r_payload):
            cols[c] = pa.array(p[idx])
        cols["right_ts_us"] = pa.array(r_ts[idx])
        return pa.table(cols, schema=out_schema)

    return tagged.groupby("_key").map_groups(_merge, batch_format="pyarrow")


def range_join(
    left,
    right,
    *,
    on=("user_id", "user_id"),
    left_ts="ts",
    right_start="start_us",
    right_end="end_us",
    left_cols=("event_id",),
    right_cols=("session_no",),
):
    """Distributed equi+range join: left rows matched to the right-side
    interval [start, end] of the same key that contains left-ts.

    Same co-partition plan as asof_join (one hash shuffle, per-group
    searchsorted over interval starts).  Assumes the right side's
    intervals are NON-OVERLAPPING within a key (true for gap sessions,
    shard epochs, validity windows); overlapping intervals would need
    the start-sorted sweep to also scan backwards — documented, not
    silently wrong: with overlaps only the latest-starting containing
    interval is reported."""
    tagged = _tag_union(
        left, right, on, (left_ts, right_start), left_cols, list(right_cols) + [right_end]
    )
    l_cols = list(left_cols)
    r_cols = list(right_cols)
    out_schema = pa.schema(
        [(c, pa.int64()) for c in l_cols]
        + [("key", pa.int64()), ("ts_us", pa.int64())]
        + [(c, pa.int64()) for c in r_cols]
    )

    def _merge(group: pa.Table) -> pa.Table:
        side = group["_side"].to_numpy(zero_copy_only=False)
        ts_us = group["_ts_us"].to_numpy(zero_copy_only=False)
        lmask = side == 0
        rmask = ~lmask
        if not lmask.any() or not rmask.any():
            return out_schema.empty_table()
        starts = ts_us[rmask]
        ends = _group_payload(group, right_end, rmask)
        r_payload = [_group_payload(group, c, rmask) for c in r_cols]
        order = np.argsort(starts, kind="stable")
        starts, ends = starts[order], ends[order]
        r_payload = [p[order] for p in r_payload]
        l_ts = ts_us[lmask]
        idx = np.searchsorted(starts, l_ts, side="right") - 1
        hit = (idx >= 0) & (l_ts <= ends[np.maximum(idx, 0)])
        idx = idx[hit]
        cols = _emit_left(group, l_cols, lmask, hit, l_ts)
        for c, p in zip(r_cols, r_payload):
            cols[c] = pa.array(p[idx])
        return pa.table(cols, schema=out_schema)

    return tagged.groupby("_key").map_groups(_merge, batch_format="pyarrow")


def rolling_window(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    tie_col: str = "event_id",
    window: int = 3,
):
    """Per-key rolling mean over the trailing `window` rows ordered by
    (ts, tie): SQL's AVG(val) OVER (PARTITION BY key ORDER BY ts, tie
    ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW).

    One hash-bucket exchange (fmix64(key), not a full sort of the log);
    the window never crosses keys so there is no partial-combiner form —
    inside each partition EVERY key's windows come from one
    (key, ts, tie) lexsort with the sliding adds masked at key
    boundaries (left-to-right adds in FRAME order, matching SQL
    engines' accumulation order so rounded values hash-match).
    Output: (tie, key, ts_us, ravg)."""
    w = int(window)

    def _roll(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table(
                {
                    tie_col: pa.array([], pa.int64()),
                    key_col: pa.array([], pa.int64()),
                    "ts_us": pa.array([], pa.int64()),
                    "ravg": pa.array([], pa.float64()),
                }
            )
        ts_us = _to_epoch_us(part[ts_col], ts_col).to_numpy(zero_copy_only=False)
        tie = part[tie_col].to_numpy(zero_copy_only=False)
        val = part[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        keys = part[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((tie, ts_us, keys))
        keys_s = keys[order]
        ts_us, tie, val = ts_us[order], tie[order], val[order]
        n = len(val)
        new_key = np.r_[True, keys_s[1:] != keys_s[:-1]]
        starts = np.flatnonzero(new_key)
        seg = np.cumsum(new_key) - 1
        rank = np.arange(n) - starts[seg]
        # sliding sum with explicit adds in FRAME order (oldest row
        # first, as a SQL engine's naive window sum walks the frame;
        # no cumsum-diff — its cancellation error differs); each shifted
        # add is masked so a frame never crosses its key's segment start
        acc = np.zeros(n, dtype=np.float64)
        for d in range(w - 1, 0, -1):
            idx = np.flatnonzero(rank >= d)
            acc[idx] += val[idx - d]
        acc += val
        counts = np.minimum(rank + 1, w)
        ravg = np.round(acc / counts, 6)
        take = pa.array(order)
        return pa.table(
            {
                tie_col: pa.array(tie),
                key_col: part[key_col].take(take),
                "ts_us": pa.array(ts_us),
                "ravg": pa.array(ravg, pa.float64()),
            }
        )

    return _bucket_by_int_key(ds, key_col).groupby("_pk").map_groups(
        _roll, batch_format="pyarrow"
    )


def bucketed_group_agg(
    ds,
    keys: list[str],
    vals: list[str],
    agg: str = "sum",
    *,
    n_buckets: int = 256,
):
    """Exact ``groupby(keys).agg(vals)`` WITHOUT Ray's native groupby.

    Ray's ``Dataset.groupby`` shuffles via a full SORT of every row by
    the key — measured 4-6x slower at 6M rows than hash-bucketing by
    ``fmix64(key) % n_buckets`` and aggregating each partition
    vectorized (lexsort + ``np.<op>.reduceat`` segments).  Same one
    exchange, same exact results: integer sums accumulate in int64
    (reduceat, no float round-trip), floats in float64.

    Keys may be integer or string columns (strings hash through the
    dedup token-hash kernel); output columns are ``keys`` plus
    ``{agg}({v})`` for each value column — Ray's naming, so call sites
    swap in without downstream changes.  ``agg``: sum | min | max |
    count (count ignores ``vals`` values, emitting ``count()``).
    """
    from .dedup import _token_hash_arrow

    if agg not in ("sum", "min", "max", "count"):
        raise ValueError(f"bucketed_group_agg: unsupported agg {agg!r}")
    red = {"sum": np.add, "min": np.minimum, "max": np.maximum}.get(agg)
    out_vals = ["count()"] if agg == "count" else [f"{agg}({v})" for v in vals]

    def _hash_col(col) -> np.ndarray:
        if pa.types.is_integer(col.type):
            # no Arrow cast: uint64 values above 2^63 must not overflow;
            # numpy astype wraps deterministically for signed inputs
            return _fmix64(
                col.to_numpy(zero_copy_only=False).astype(np.uint64)
            )
        return _token_hash_arrow(col)

    def _key(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("_pk", pa.array([], pa.int64()))
        h = _hash_col(batch[keys[0]])
        for k in keys[1:]:
            h = _fmix64(h ^ _hash_col(batch[k]))
        pk = (h % np.uint64(n_buckets)).view(np.int64)
        return batch.append_column("_pk", pa.array(pk))

    def _np_key(col) -> np.ndarray:
        if pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
            return col.to_numpy(zero_copy_only=False)
        return np.asarray(col.to_pylist(), dtype=object)

    def _part(part: pa.Table) -> pa.Table:
        cols: dict = {}
        if part.num_rows == 0:
            for k in keys:
                cols[k] = pa.array([], part.schema.field(k).type)
            for ov, v in zip(out_vals, vals or [None]):
                if agg == "count":
                    cols[ov] = pa.array([], pa.int64())
                else:
                    t = part.schema.field(v).type
                    cols[ov] = pa.array(
                        [], pa.int64() if pa.types.is_integer(t) else pa.float64()
                    )
            return pa.table(cols)
        karrs = [_np_key(part[k].combine_chunks() if isinstance(part[k], pa.ChunkedArray) else part[k]) for k in keys]
        order = np.lexsort(tuple(reversed(karrs)))
        ks = [a[order] for a in karrs]
        diff = np.zeros(len(order) - 1, dtype=bool)
        for a in ks:
            diff |= a[1:] != a[:-1]
        starts = np.flatnonzero(np.r_[True, diff])
        for k, a in zip(keys, ks):
            cols[k] = pa.array(a[starts].tolist(), part.schema.field(k).type)
        if agg == "count":
            cols["count()"] = pa.array(
                np.diff(np.r_[starts, len(order)]).astype(np.int64)
            )
        else:
            for ov, v in zip(out_vals, vals):
                arr = part[v].to_numpy(zero_copy_only=False)[order]
                if np.issubdtype(arr.dtype, np.integer):
                    arr = arr.astype(np.int64)
                else:
                    arr = arr.astype(np.float64)
                cols[ov] = pa.array(red.reduceat(arr, starts))
        return pa.table(cols)

    return (
        ds.map_batches(_key, batch_format="pyarrow")
        .groupby("_pk")
        .map_groups(_part, batch_format="pyarrow")
    )


def topk_per_group(
    ds,
    *,
    key_col: str = "user_id",
    val_col: str = "value",
    tie_col: str = "event_id",
    k: int = 3,
):
    """Top-k rows per key by value (desc; ties broken by tie_col asc) with
    their 1-based rank — row_number() OVER (PARTITION BY key ORDER BY
    val DESC, tie) <= k.

    Scale path: a per-BATCH top-k combiner runs before the shuffle, so at
    most k rows per (key, batch) enter the groupby — the shuffle moves
    O(k * distinct_keys) rows, not the corpus.

    Values rank through float64 (int64 values above 2^53 would compare
    lossily — use a scaled or split key for such columns); key/tie must
    be numeric (numpy lexsort)."""
    kk = int(k)

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # keep the empty block's schema identical to the non-empty
            # output (val cast to float64), or the downstream shuffle
            # sees heterogeneous block schemas
            return pa.table(
                {
                    key_col: batch[key_col],
                    val_col: pc.cast(batch[val_col], pa.float64()),
                    tie_col: batch[tie_col],
                }
            )
        key = batch[key_col].to_numpy(zero_copy_only=False)
        val = batch[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        tie = batch[tie_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, -val, key))
        key_s = key[order]
        runs = np.r_[True, key_s[1:] != key_s[:-1]]
        starts = np.flatnonzero(runs)
        pos = np.arange(len(key_s)) - np.repeat(starts, np.diff(np.r_[starts, len(key_s)]))
        keep = order[pos < kk]
        return pa.table(
            {key_col: pa.array(key[keep]), val_col: pa.array(val[keep], pa.float64()),
             tie_col: pa.array(tie[keep])}
        )

    def _final(group: pa.Table) -> pa.Table:
        val = group[val_col].to_numpy(zero_copy_only=False)
        tie = group[tie_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, -val))[:kk]
        return pa.table(
            {
                key_col: group[key_col].take(pa.array(order)),
                tie_col: pa.array(tie[order]),
                val_col: pa.array(val[order], pa.float64()),
                "rn": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(_final, batch_format="pyarrow")
    )


def sessionize(
    ds,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    n_buckets: int = 256,
):
    """Gap-based sessionization of an event log: one row per (user, session)
    with (user_id, session_no, n_events, start_ts, end_ts).

    session_no numbers a user's sessions in time order from 0; a new
    session starts when the gap from the previous event exceeds
    `gap_minutes`.  One keyed exchange: events hash-bucket by
    fmix64(user) (the bucketed_group_agg shuffle, not a full sort of the
    log), and inside each partition EVERY user's sessions come out of a
    single (user, ts) lexsort + boundary-flag pass — no per-user Python
    calls, which at corpus scale would mean one call per user."""
    gap_us = np.int64(gap_minutes * 60 * 1_000_000)

    def _sessions(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table(
                {
                    user_col: pa.array([], pa.int64()),
                    "session_no": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "start_us": pa.array([], pa.int64()),
                    "end_us": pa.array([], pa.int64()),
                }
            )
        uid = part[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = part[ts_col].to_numpy(zero_copy_only=False)
        ts_i = ts.astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts_i, uid))
        uid, ts_i = uid[order], ts_i[order]
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        new_session = new_user | np.r_[True, (ts_i[1:] - ts_i[:-1]) > gap_us]
        sess = np.cumsum(new_session) - 1  # global session index
        s_starts = np.flatnonzero(new_session)
        counts = np.diff(np.r_[s_starts, len(sess)])
        # per-user session_no: global session index minus the first global
        # session index of the owning user's segment
        sess_user_start = np.flatnonzero(new_user)
        owner = np.searchsorted(sess_user_start, s_starts, side="right") - 1
        first_sess_of_owner = sess[sess_user_start][owner]
        session_no = sess[s_starts] - first_sess_of_owner
        ends = ts_i[np.r_[s_starts[1:] - 1, len(ts_i) - 1]]
        # timestamps as epoch microseconds: int64 hashes identically across
        # engines (datetime dtype canonicalization does not)
        return pa.table(
            {
                user_col: pa.array(uid[s_starts]),
                "session_no": pa.array(session_no.astype(np.int64)),
                "n_events": pa.array(counts.astype(np.int64)),
                "start_us": pa.array(ts_i[s_starts]),
                "end_us": pa.array(ends),
            }
        )

    return (
        _bucket_by_int_key(ds, user_col, n_buckets)
        .groupby("_pk")
        .map_groups(_sessions, batch_format="pyarrow")
    )


def _per_key_value_counts(ds, key_col: str, val_col: str):
    """The shared histogram shuffle for the per-key order statistics ops:
    per-batch partial (key, value) counts -> one groupby shuffle of
    DISTINCT (key, value) pairs.  The shuffle moves one row per distinct
    pair, never the corpus."""

    def _partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table({key_col: batch[key_col], "v": batch[val_col]})
            .group_by([key_col, "v"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns([key_col, "v", "partial"])

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby([key_col, "v"])
        .sum("partial")
    )


def _per_key_order_stat(
    counts, key_col: str, out_col: str, finalize, max_distinct_per_key: int, op: str
):
    """Per-key CDF walk over the histogram: sort the distinct values,
    cumsum the counts, and let `finalize(v, cum, n) -> float` pick the
    statistic.  Output: (<key_col>, n, <out_col>)."""

    def _stat(group: pa.Table) -> pa.Table:
        if group.num_rows > max_distinct_per_key:
            raise RuntimeError(
                f"{op}: >{max_distinct_per_key} distinct values "
                "for one key — bin the value column first."
            )
        key = group[key_col][0]
        v = group["v"].to_numpy(zero_copy_only=False)
        c = group["sum(partial)"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(v)
        v, c = v[order], c[order]
        cum = np.cumsum(c)
        n = int(cum[-1])
        return pa.table(
            {
                key_col: pa.array([key.as_py()], group[key_col].type),
                "n": pa.array([n], pa.int64()),
                out_col: pa.array([finalize(v, cum, n)], pa.float64()),
            }
        )

    return counts.groupby(key_col).map_groups(_stat, batch_format="pyarrow")


def median_by_key(
    ds,
    key_col: str = "source",
    val_col: str = "n_chars",
    max_distinct_per_key: int = 5_000_000,
):
    """Exact per-key median (SQL median(): lower middle for odd counts,
    mean of the two middles for even) without sorting the data — the
    histogram-shuffle + CDF-walk shape shared with quantile_by_key (the
    midpoint formula (lo+hi)/2 and the unrounded output are median()'s
    exact semantics, hence not literally quantile(0.5)).

    Output: (<key_col>, n, median)."""

    def _median(v, cum, n) -> float:
        lo_pos = (n - 1) // 2  # 0-based rank of the lower middle
        hi_pos = n // 2
        lo_val = float(v[np.searchsorted(cum, lo_pos + 1)])
        hi_val = float(v[np.searchsorted(cum, hi_pos + 1)])
        return (lo_val + hi_val) / 2.0

    counts = _per_key_value_counts(ds, key_col, val_col)
    return _per_key_order_stat(
        counts, key_col, "median", _median, max_distinct_per_key, "median_by_key"
    )


def quantile_by_key(
    ds,
    q: float = 0.9,
    key_col: str = "source",
    val_col: str = "n_chars",
    max_distinct_per_key: int = 5_000_000,
):
    """Exact per-key interpolated quantile (SQL quantile_cont semantics:
    pos = q*(n-1), linear interpolation between the two bracketing
    order statistics), rounded to 6 dp — same histogram-shuffle scale
    shape as median_by_key.

    Output: (<key_col>, n, q<percent>)."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"quantile_by_key: q must be in [0,1], got {q}")
    out_col = f"q{int(round(q * 100))}"

    def _quant(v, cum, n) -> float:
        pos = q * (n - 1)  # same double math as DuckDB quantile_cont
        lo_pos, hi_pos = int(np.floor(pos)), int(np.ceil(pos))
        lo_val = float(v[np.searchsorted(cum, lo_pos + 1)])
        hi_val = float(v[np.searchsorted(cum, hi_pos + 1)])
        return round(lo_val + (hi_val - lo_val) * (pos - lo_pos), 6)

    counts = _per_key_value_counts(ds, key_col, val_col)
    return _per_key_order_stat(
        counts, key_col, out_col, _quant, max_distinct_per_key, "quantile_by_key"
    )


def funnel_count(
    ds,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
):
    """Ordered-funnel analysis: per user, how many of `steps` complete in
    order — the greedy earliest-completion walk (step k counts only if an
    event of its type occurs STRICTLY after the step k-1 completion
    time).  The standard product-analytics conversion funnel.

    One hash-bucket exchange (fmix64(user)); inside each partition the
    greedy walk runs for ALL users simultaneously — len(steps) composite
    (dense-user, ts-rank) searchsorted probes over the (user, ts)-sorted
    step rows, no per-user Python calls.  Partitioning assumption (as
    sessionize): one user's events fit in a partition alongside its
    bucket-mates.

    Output: (user_id, steps_completed, converted)."""

    def _walk(part: pa.Table) -> pa.Table:
        utype = part.schema.field(user_col).type
        if part.num_rows == 0:
            return pa.table(
                {
                    user_col: pa.array([], utype),
                    "steps_completed": pa.array([], pa.int64()),
                    "converted": pa.array([], pa.int64()),
                }
            )
        uid = part[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = part[ts_col].to_numpy(zero_copy_only=False)
        ts_i = ts.astype("datetime64[us]").astype(np.int64)
        tcol = part[type_col]
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        enc = tcol.dictionary_encode()
        step_code = {v: i for i, v in enumerate(enc.dictionary.to_pylist())}
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ts_i, uid))
        uid, ts_i, codes = uid[order], ts_i[order], codes[order]
        users, uidx = np.unique(uid, return_inverse=True)
        nu = len(users)
        # ts ranks (1-based) so "strictly after t_prev" is an integer
        # probe; every t_prev is -inf or an actual ts, so ranks suffice
        T = np.unique(ts_i)
        M = np.int64(len(T) + 2)
        rts = np.searchsorted(T, ts_i, side="left").astype(np.int64) + 1
        done = np.zeros(nu, np.int64)
        prev_rank = np.zeros(nu, np.int64)  # rank of t_prev; 0 = -inf
        alive = np.ones(nu, bool)
        for step in steps:
            c = step_code.get(step)
            if c is None:
                break
            m = codes == c
            if not m.any():
                break
            u_s, r_s, t_s = uidx[m], rts[m], ts_i[m]
            comp = u_s * M + r_s  # sorted: extracted from the (uid, ts) order
            au = np.flatnonzero(alive)
            if len(au) == 0:
                break
            probes = au.astype(np.int64) * M + prev_rank[au] + 1
            pos = np.searchsorted(comp, probes, side="left")
            hit = (pos < len(comp)) & (u_s[np.minimum(pos, len(comp) - 1)] == au)
            won = au[hit]
            done[won] += 1
            src = pos[hit]
            prev_rank[won] = r_s[src]
            alive[au[~hit]] = False
            if not hit.any():
                break
        return pa.table(
            {
                user_col: pa.array(users.tolist(), utype),
                "steps_completed": pa.array(done),
                "converted": pa.array(
                    (done == len(steps)).astype(np.int64)
                ),
            }
        )

    return _bucket_by_int_key(ds, user_col).groupby("_pk").map_groups(
        _walk, batch_format="pyarrow"
    )


def hopping_window(
    ds,
    *,
    width_minutes: int = 60,
    hop_minutes: int | None = None,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
):
    """Tumbling / hopping time-window aggregate over an event stream:
    per (window_start, key) event count and value sum, where an event at
    time t lands in every window [w, w+width) with w a multiple of `hop`
    (hop == width, the default, is the tumbling case; hop < width makes
    overlapping windows, each event in ceil(width/hop) of them).

    The streaming-window counterpart of SQL's time_bucket GROUP BY —
    window assignment is a pure vectorized map (no ordering dependence),
    so the op is: flat-map each event to its window starts, per-batch
    partial aggregation, then one small groupby over (window, key) rows —
    the shuffle moves one row per (batch, window, key), never the events.

    Values are quantized to integer micro-units before any summation
    (the group_quality_filter convention) so cross-partition sums are
    order-independent and bit-identical to the SQL oracle.

    Output: (window_start_us, <key_col>, n_events, sum_value)."""
    from ray.data.aggregate import Sum

    width_us = int(width_minutes) * 60_000_000
    hop_us = width_us if hop_minutes is None else int(hop_minutes) * 60_000_000
    if hop_us <= 0 or width_us <= 0:
        raise ValueError("width_minutes and hop_minutes must be positive")
    k = -(-width_us // hop_us)  # windows per event (ceil)

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # key type derived from the batch (a hardcoded string()
            # diverges on large_string/dictionary keys and Ray warns on
            # mixed-schema RefBundles)
            return pa.table(
                {
                    "window_start_us": pa.array([], pa.int64()),
                    key_col: batch[key_col],
                    "n": pa.array([], pa.int64()),
                    "vmicro": pa.array([], pa.int64()),
                }
            )
        us = _to_epoch_us(batch[ts_col], ts_col).to_numpy(zero_copy_only=False)
        vmicro = np.round(
            batch[val_col].to_numpy(zero_copy_only=False).astype(np.float64) * 1e6
        ).astype(np.int64)
        base = us // hop_us  # hop index of the latest window containing t
        j = np.arange(k, dtype=np.int64)
        wstart = ((base[:, None] - j[None, :]) * hop_us).reshape(-1)
        us_rep = np.repeat(us, k)
        keep = us_rep < wstart + width_us  # only when width % hop != 0
        t = pa.table(
            {
                "window_start_us": pa.array(wstart[keep]),
                key_col: batch[key_col].take(pa.array(np.repeat(np.arange(len(us)), k)[keep])),
                "n": pa.array(np.ones(int(keep.sum()), np.int64)),
                "vmicro": pa.array(np.repeat(vmicro, k)[keep]),
            }
        )
        g = t.group_by(["window_start_us", key_col]).aggregate(
            [("n", "sum"), ("vmicro", "sum")]
        )
        return g.rename_columns(["window_start_us", key_col, "n", "vmicro"])

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["window_start_us", key_col])
        .aggregate(
            Sum("n", alias_name="n_events"), Sum("vmicro", alias_name="vmicro")
        )
    )

    def _final(batch: pa.Table) -> pa.Table:
        sv = np.round(
            batch["vmicro"].to_numpy(zero_copy_only=False).astype(np.float64) / 1e6, 6
        )
        return pa.table(
            {
                "window_start_us": batch["window_start_us"],
                key_col: batch[key_col],
                "n_events": batch["n_events"],
                "sum_value": pa.array(sv, pa.float64()),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def broadcast_join(
    big,
    small,
    on: str,
    small_on: str | None = None,
    small_cols: list[str] | None = None,
    max_small_rows: int = 5_000_000,
):
    """Broadcast dimension join: enrich a large streaming dataset with
    columns from a SMALL unique-keyed table without any shuffle — the
    canonical small-side pattern (ray.put once, searchsorted gather per
    batch).  Inner join; the small side's key must be unique (it is a
    dimension table — duplicate keys raise).

    `small` is a Ray Dataset or pyarrow Table; collected to the driver
    under `max_small_rows` (loud error above — a big small-side needs
    hash_equi_join instead).  Output: all big columns + `small_cols`
    (default: every non-key small column), big-side row order preserved
    within batches."""
    key_r = small_on or on
    if isinstance(small, pa.Table):
        st = small
    else:
        parts = []
        n = 0
        for b in small.iter_batches(batch_format="pyarrow"):
            n += b.num_rows
            if n > max_small_rows:
                raise RuntimeError(
                    f"broadcast_join: small side exceeds {max_small_rows} rows "
                    "— broadcast no longer fits; use hash_equi_join"
                )
            parts.append(b)
        st = pa.concat_tables(parts) if parts else None
    if st is None or st.num_rows == 0:
        raise ValueError("broadcast_join: empty small side")
    cols = small_cols or [c for c in st.column_names if c != key_r]
    if st[key_r].null_count:
        raise TypeError(
            f"broadcast_join: null values in small-side key {key_r!r} — "
            "filter or fill nulls upstream"
        )
    sk = st[key_r].to_numpy(zero_copy_only=False)
    order = np.argsort(sk, kind="stable")
    sk = sk[order]
    if len(sk) > 1 and (sk[1:] == sk[:-1]).any():
        raise ValueError(f"broadcast_join: duplicate keys in small side ({key_r})")
    payload = {c: st[c].take(pa.array(order)) for c in cols}
    ref = ray.put((sk, payload))

    def _batch(batch: pa.Table) -> pa.Table:
        sk_, payload_ = ray.get(ref)
        if batch.num_rows == 0:
            out = batch
            for c in cols:
                out = out.append_column(c, payload_[c].slice(0, 0))
            return out
        if batch[on].null_count:
            raise TypeError(
                f"broadcast_join: null values in big-side key {on!r} — "
                "filter or fill nulls upstream"
            )
        bk = batch[on].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(sk_, bk)
        idx_c = np.minimum(idx, len(sk_) - 1)
        hit = sk_[idx_c] == bk
        out = batch.filter(pa.array(hit))
        take = pa.array(idx_c[hit])
        for c in cols:
            out = out.append_column(c, payload_[c].take(take))
        return out

    return big.map_batches(_batch, batch_format="pyarrow")


def hash_equi_join(
    left,
    right,
    on: str,
    right_on: str | None = None,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    num_partitions: int | None = None,
    how: str = "inner",
):
    """Large-large equi-join (`how` = 'inner' or 'left') WITHOUT Ray's
    `Dataset.join` (whose
    hash aggregator crashes on the schema-less empty blocks that upstream
    map_groups stages emit — the round-2 minhash regression; this repo's
    rule is: never feed Ray's join operator, do the join as a groupby).

    Shape: both sides are tagged and reduced to (key, payload columns),
    hash-partitioned on fmix64(key) % P in ONE union dataset (a single
    shuffle over the two inputs combined), then each partition builds the
    match vectorized: sort the right rows by key, searchsorted the left
    keys into them, emit repeat/take cross-matches (many-to-many
    supported).  Every empty block carries its full typed schema — the
    whole point.

    Skew: all rows of one key land in one partition (inherent to exact
    equi-join); a Zipf-hot key should be pre-aggregated or broadcast
    (broadcast_join) instead.  Output columns: left_cols + right_cols
    (key included once, from the left); 'left' keeps unmatched left rows
    with typed-null right columns; 'full' additionally keeps unmatched
    RIGHT rows with typed-null left columns — their key value fills the
    `on` column (SQL COALESCE(l.key, r.key) semantics)."""
    if how not in ("inner", "left", "full"):
        raise ValueError(f"how must be 'inner', 'left' or 'full', got {how!r}")
    key_r = right_on or on
    l_schema, left = schema_no_reexec(left)
    r_schema, right = schema_no_reexec(right)
    for side_name, sch, kc in (("left", l_schema, on), ("right", r_schema, key_r)):
        kt = dict(zip(sch.names, sch.types)).get(kc)
        if kt is None or not pa.types.is_integer(kt):
            raise TypeError(
                f"hash_equi_join: {side_name} key {kc!r} must be an integer "
                f"column (got {kt}); hash string keys to int64 upstream"
            )
    l_cols = left_cols or list(l_schema.names)
    r_cols = right_cols or [c for c in r_schema.names if c != key_r]
    if on not in l_cols:
        l_cols = [on] + l_cols
    l_types = {n: t for n, t in zip(l_schema.names, l_schema.types)}
    r_types = {n: t for n, t in zip(r_schema.names, r_schema.types)}
    # fail loud when an EXPLICITLY requested right column collides with a
    # left name: silently serving the LEFT values for a requested RIGHT
    # column is a wrong-answer trap.  The join key itself is documented
    # as emitted once, from the left; with right_cols unset the default
    # simply takes the non-colliding right columns.
    if right_cols is not None:
        collide = [c for c in r_cols if c in l_cols and not (c == on and key_r == on)]
        if collide:
            raise ValueError(
                f"hash_equi_join: requested right column(s) {collide} collide "
                "with left column names — rename or drop them (only the join "
                "key is deduplicated, and it is taken from the left)"
            )
    out_fields = [(c, l_types[c]) for c in l_cols] + [
        (c, r_types[c]) for c in r_cols if c not in l_cols
    ]
    r_out = [c for c in r_cols if c not in l_cols]
    if num_partitions is None:
        num_partitions = _join_parts()

    def _mk_empty() -> pa.Table:
        return pa.table({c: pa.array([], t) for c, t in out_fields})

    def _tag(side: int, keep: list[str], key_col: str):
        def _f(batch: pa.Table) -> pa.Table:
            key_arr = batch[key_col]
            if key_arr.null_count:
                # a null integer key becomes float NaN in to_numpy and
                # then a garbage uint64 hash — mis-partitioned / spurious
                # matches.  Mirror _norm_payload's loud null rejection.
                raise TypeError(
                    f"hash_equi_join: null values in join key {key_col!r} "
                    f"({'right' if side else 'left'} side) — filter or "
                    "fill nulls upstream"
                )
            k = key_arr.to_numpy(zero_copy_only=False).astype(np.uint64)
            pk = (_fmix64(k) % np.uint64(num_partitions)).astype(np.int64)
            cols = {"_pk": pa.array(pk), "_src": pa.array(np.full(len(k), side, np.int8))}
            # union schema: both sides carry every output column, the
            # other side's as typed nulls — blocks always unify
            for c, t in out_fields:
                if c == on and side == 1:
                    cols[c] = batch[key_r].cast(t)
                elif c in keep and c in batch.column_names:
                    cols[c] = batch[c].cast(t)
                else:
                    cols[c] = pa.nulls(len(k), t)
            return pa.table(cols)

        return _f

    tagged = left.map_batches(_tag(0, l_cols, on), batch_format="pyarrow").union(
        right.map_batches(_tag(1, r_out, key_r), batch_format="pyarrow")
    )

    r_null_types = {c: t for c, t in out_fields if c in r_out}

    l_null_types = {c: t for c, t in out_fields if c in l_cols}

    def _left_only(block: pa.Table, idx: np.ndarray) -> pa.Table:
        take = pa.array(idx)
        cols = {c: block[c].take(take) for c in l_cols}
        for c in r_out:
            cols[c] = pa.nulls(len(idx), r_null_types[c])
        return pa.table(cols)

    def _right_only(block: pa.Table, idx: np.ndarray) -> pa.Table:
        # unmatched right rows ('full'): the key travels in the `on`
        # column (written from key_r at tag time), other left columns null
        take = pa.array(idx)
        cols = {}
        for c in l_cols:
            cols[c] = (
                block[c].take(take) if c == on else pa.nulls(len(idx), l_null_types[c])
            )
        for c in r_out:
            cols[c] = block[c].take(take)
        return pa.table(cols)

    def _join_group(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _mk_empty()
        src = block["_src"].to_numpy(zero_copy_only=False)
        keys = block[on].to_numpy(zero_copy_only=False)
        li = np.flatnonzero(src == 0)
        ri = np.flatnonzero(src == 1)
        if len(li) == 0:
            return _right_only(block, ri) if how == "full" and len(ri) else _mk_empty()
        if len(ri) == 0:
            return _left_only(block, li) if how in ("left", "full") else _mk_empty()
        rk = keys[ri]
        r_order = np.argsort(rk, kind="stable")
        rk = rk[r_order]
        lk = keys[li]
        lo = np.searchsorted(rk, lk, side="left")
        hi = np.searchsorted(rk, lk, side="right")
        cnt = hi - lo
        sel = cnt > 0
        parts = []
        if how in ("left", "full") and (~sel).any():
            parts.append(_left_only(block, li[~sel]))
        if how == "full":
            # right rows never matched by any left key
            delta = np.zeros(len(ri) + 1, np.int64)
            if sel.any():
                np.add.at(delta, lo[sel], 1)
                np.add.at(delta, hi[sel], -1)
            r_hit = np.cumsum(delta[:-1]) > 0
            if not r_hit.all():
                parts.append(_right_only(block, ri[r_order[~r_hit]]))
        miss = None
        if parts:
            miss = parts[0] if len(parts) == 1 else pa.concat_tables(
                [parts[0]] + [p.cast(parts[0].schema) for p in parts[1:]]
            )
        if not sel.any():
            return miss if miss is not None else _mk_empty()
        li, lo, cnt = li[sel], lo[sel], cnt[sel]
        l_take = pa.array(np.repeat(li, cnt))
        # right match indices: for each left row, rows lo..lo+cnt
        r_flat = (
            np.repeat(lo, cnt)
            + np.arange(int(cnt.sum()))
            - np.repeat(np.cumsum(cnt) - cnt, cnt)
        )
        r_take = pa.array(ri[r_order[r_flat]])
        cols = {}
        for c in l_cols:
            cols[c] = block[c].take(l_take)
        for c in r_out:
            cols[c] = block[c].take(r_take)
        hit = pa.table(cols)
        if miss is not None:
            hit = pa.concat_tables([hit, miss.cast(hit.schema)])
        return hit

    joined = tagged.groupby("_pk", num_partitions=num_partitions).map_groups(
        _join_group, batch_format="pyarrow"
    )
    # anchor the output schema with one explicit typed empty block: when
    # every partition matches nothing, Ray's groupby otherwise yields only
    # schema-less empties and the result would lose its columns
    import ray.data as _rd

    return _rd.from_arrow(_mk_empty()).union(joined)


def hash_semi_join(
    left,
    right,
    on: str,
    right_on: str | None = None,
    how: str = "semi",
    num_partitions: int | None = None,
):
    """Distributed semi / anti join: keep the left rows whose key does
    ('semi', SQL EXISTS) or does not ('anti', SQL NOT EXISTS) appear in
    the right dataset.  Neither side is collected to the driver.

    Scale shape: the right side is reduced to DISTINCT keys per batch
    before the shuffle — the exchange moves the left rows plus one row
    per (right batch, distinct key), never the right payload.  Both
    sides hash-partition on fmix64(key) in ONE union dataset (the
    hash_equi_join pattern); each partition sorts its right keys once
    and answers membership for its left rows with a vectorized
    searchsorted.  Output: the left columns, unchanged.

    Keys must be integer and non-null (loud errors, matching
    hash_equi_join); hash string keys to int64 upstream."""
    if how not in ("semi", "anti"):
        raise ValueError(f"how must be 'semi' or 'anti', got {how!r}")
    key_r = right_on or on
    l_schema, left = schema_no_reexec(left)
    if l_schema is None:
        raise ValueError(
            "hash_semi_join: left schema is unknown (lazy row filter "
            "upstream?) — the output schema anchor needs it; materialize "
            "the schema or reorder the filter after the join"
        )
    r_schema, right = schema_no_reexec(right)
    for side_name, sch, kc in (("left", l_schema, on), ("right", r_schema, key_r)):
        if sch is None:
            continue  # lazily-unknown schema (e.g. after a row filter):
            # the runtime integer check in _keys_np still applies
        kt = dict(zip(sch.names, sch.types)).get(kc)
        if kt is None or not pa.types.is_integer(kt):
            raise TypeError(
                f"hash_semi_join: {side_name} key {kc!r} must be an integer "
                f"column (got {kt}); hash string keys to int64 upstream"
            )
    l_cols = list(l_schema.names)
    l_types = {n: t for n, t in zip(l_schema.names, l_schema.types)}
    if num_partitions is None:
        num_partitions = _join_parts()

    def _mk_empty() -> pa.Table:
        return pa.table({c: pa.array([], l_types[c]) for c in l_cols})

    def _keys_np(arr: pa.ChunkedArray, kc: str, side: str) -> np.ndarray:
        if not pa.types.is_integer(arr.type):
            raise TypeError(
                f"hash_semi_join: {side} key {kc!r} must be an integer "
                f"column (got {arr.type}); hash string keys to int64 upstream"
            )
        if arr.null_count:
            raise TypeError(
                f"hash_semi_join: null values in join key {kc!r} ({side} "
                "side) — filter or fill nulls upstream"
            )
        return arr.to_numpy(zero_copy_only=False).astype(np.uint64)

    def _tag_left(batch: pa.Table) -> pa.Table:
        k = _keys_np(batch[on], on, "left")
        pk = (_fmix64(k) % np.uint64(num_partitions)).astype(np.int64)
        cols = {
            "_pk": pa.array(pk),
            "_src": pa.array(np.zeros(len(k), np.int8)),
            "_k": pa.array(k.astype(np.int64)),
        }
        for c in l_cols:
            cols[c] = batch[c]
        return pa.table(cols)

    def _tag_right(batch: pa.Table) -> pa.Table:
        k = np.unique(_keys_np(batch[key_r], key_r, "right"))
        pk = (_fmix64(k) % np.uint64(num_partitions)).astype(np.int64)
        cols = {
            "_pk": pa.array(pk),
            "_src": pa.array(np.ones(len(k), np.int8)),
            "_k": pa.array(k.astype(np.int64)),
        }
        for c in l_cols:
            cols[c] = pa.nulls(len(k), l_types[c])
        return pa.table(cols)

    tagged = left.map_batches(_tag_left, batch_format="pyarrow").union(
        right.map_batches(_tag_right, batch_format="pyarrow")
    )
    want_hit = how == "semi"

    def _group(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _mk_empty()
        src = block["_src"].to_numpy(zero_copy_only=False)
        keys = block["_k"].to_numpy(zero_copy_only=False)
        li = np.flatnonzero(src == 0)
        if len(li) == 0:
            return _mk_empty()
        rk = np.unique(keys[src == 1])
        if len(rk) == 0:
            hit = np.zeros(len(li), bool)
        else:
            lk = keys[li]
            idx = np.minimum(np.searchsorted(rk, lk), len(rk) - 1)
            hit = rk[idx] == lk
        take = pa.array(li[hit == want_hit])
        return pa.table({c: block[c].take(take) for c in l_cols})

    joined = tagged.groupby("_pk", num_partitions=num_partitions).map_groups(
        _group, batch_format="pyarrow"
    )
    import ray.data as _rd

    # anchor the output schema: all-filtered partitions otherwise yield
    # only schema-less empty blocks
    return _rd.from_arrow(_mk_empty()).union(joined)


def _bucket_by_int_key(ds, key_col: str, n_buckets: int = 256):
    """Append ``_pk = fmix64(key) % n_buckets`` for the hash-bucketed
    per-key ops (sessionize / event_deltas / cumsum_by_key): one hash
    exchange instead of a full sort of the log, all keys of a bucket
    processed vectorized in one partition."""
    from .dedup import U64, _fmix64_vec

    def _key(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("_pk", pa.array([], pa.int64()))
        u = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = (_fmix64_vec(u.astype(U64)) % U64(n_buckets)).view(np.int64)
        return batch.append_column("_pk", pa.array(pk))

    return ds.map_batches(_key, batch_format="pyarrow")


def event_deltas(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
):
    """Per-key LAG: time since the previous event for every event —
    SQL's ``ts - lag(ts) OVER (PARTITION BY key ORDER BY ts, id)``.
    The first event of a key gets a NULL delta.

    One hash-bucket exchange (fmix64(key), not a full sort of the log);
    inside each partition EVERY key's deltas come from a single
    (key, ts, id) lexsort + shifted diff.  Output: (<id_col>,
    <key_col>, ts_us, delta_us), timestamps as epoch microseconds."""

    def _part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    key_col: pa.array([], pa.int64()),
                    "ts_us": pa.array([], pa.int64()),
                    "delta_us": pa.array([], pa.int64()),
                }
            )
        us = _to_epoch_us(part[ts_col], ts_col).to_numpy(zero_copy_only=False)
        ids = part[id_col].to_numpy(zero_copy_only=False)
        keys = part[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # every key's events vectorized in ONE (key, ts, id) lexsort —
        # no per-key Python calls (sessionize's conversion rationale)
        order = np.lexsort((ids, us, keys))
        us_s, keys_s = us[order], keys[order]
        new_key = np.r_[True, keys_s[1:] != keys_s[:-1]]
        delta = np.zeros(len(us_s), np.int64)
        if len(us_s) > 1:
            delta[1:] = us_s[1:] - us_s[:-1]
        delta[new_key] = 0
        take = pa.array(order)
        return pa.table(
            {
                id_col: part[id_col].take(take),
                key_col: part[key_col].take(take),
                "ts_us": pa.array(us_s),
                "delta_us": pa.array(delta, pa.int64(), mask=new_key),
            }
        )

    return _bucket_by_int_key(ds, key_col).groupby("_pk").map_groups(
        _part, batch_format="pyarrow"
    )


def cumsum_by_key(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
):
    """Per-key running total in time order — SQL's ``SUM(v) OVER
    (PARTITION BY key ORDER BY ts, id ROWS UNBOUNDED PRECEDING)``.

    Values are quantized to integer micro-units BEFORE the cumulative
    sum (the hopping_window convention) so the running total is exact
    and bit-identical to the SQL oracle regardless of summation order.
    One hash-bucket exchange; inside each partition every key's running
    total comes from ONE global cumsum re-based at key boundaries
    (c - c[segment_start] + v[segment_start] — exact int64 arithmetic).
    Output: (<id_col>, <key_col>, ts_us, cum_value)."""

    def _part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    key_col: pa.array([], pa.int64()),
                    "ts_us": pa.array([], pa.int64()),
                    "cum_value": pa.array([], pa.float64()),
                }
            )
        us = _to_epoch_us(part[ts_col], ts_col).to_numpy(zero_copy_only=False)
        ids = part[id_col].to_numpy(zero_copy_only=False)
        keys = part[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vmicro = np.round(
            part[val_col].to_numpy(zero_copy_only=False).astype(np.float64) * 1e6
        ).astype(np.int64)
        order = np.lexsort((ids, us, keys))
        keys_s, v_s = keys[order], vmicro[order]
        new_key = np.r_[True, keys_s[1:] != keys_s[:-1]]
        c = np.cumsum(v_s)
        starts = np.flatnonzero(new_key)
        seg = np.cumsum(new_key) - 1
        base = (c[starts] - v_s[starts])[seg]
        cum = c - base
        take = pa.array(order)
        return pa.table(
            {
                id_col: part[id_col].take(take),
                key_col: part[key_col].take(take),
                "ts_us": pa.array(us[order]),
                "cum_value": pa.array(np.round(cum / 1e6, 6), pa.float64()),
            }
        )

    return _bucket_by_int_key(ds, key_col).groupby("_pk").map_groups(
        _part, batch_format="pyarrow"
    )


def pivot_counts(
    ds,
    categories: list[str],
    *,
    key_col: str = "user_id",
    cat_col: str = "event_type",
):
    """Pivot a categorical column into per-key count columns — SQL's
    ``count(*) FILTER (WHERE cat = 'x')`` per key, one output row per
    key with a ``n_<category>`` column per category.

    The category domain is an explicit argument (it defines the output
    schema, so it cannot be data-driven); a value outside it raises.
    Scale shape: per-batch bincount over (key × category) codes — the
    shuffle moves one PARTIAL row per (batch, key), already pivoted —
    then one groupby summing the count columns."""
    from ray.data.aggregate import Sum

    cats = list(categories)
    ncat = len(cats)
    if ncat == 0 or len(set(cats)) != ncat:
        raise ValueError("categories must be a non-empty list of distinct values")
    cat_set = pa.array(cats)
    out_names = [f"n_{c}" for c in cats]

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            cols = {key_col: batch[key_col]}
            for n in out_names:
                cols[n] = pa.array([], pa.int64())
            return pa.table(cols)
        codes_arr = pc.index_in(batch[cat_col], value_set=cat_set)
        if codes_arr.null_count:
            bad = pc.unique(
                pc.drop_null(
                    pc.filter(batch[cat_col], pc.is_null(codes_arr))
                )
            ).to_pylist()
            raise ValueError(
                f"pivot_counts: value(s) {bad[:5]} in {cat_col!r} outside the "
                f"declared categories {cats}"
            )
        codes = codes_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        key = batch[key_col].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(key, return_inverse=True)
        m = np.bincount(inv * ncat + codes, minlength=len(uk) * ncat).reshape(
            len(uk), ncat
        )
        cols = {key_col: pa.array(uk)}
        for j, n in enumerate(out_names):
            cols[n] = pa.array(m[:, j].astype(np.int64))
        return pa.table(cols)

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(*[Sum(n, alias_name=n) for n in out_names])
    )


def distinct_by_key(ds, *, key_col: str = "event_type", val_col: str = "user_id"):
    """Exact count-distinct per key — SQL's ``count(DISTINCT val) GROUP
    BY key`` (G4/G5-family statistics at the event-log level).

    Scale shape: per-batch distinct (key, value) pairs -> ONE groupby
    shuffle of distinct pairs (the _per_key_value_counts histogram
    machinery, moving one row per distinct pair, never the corpus) ->
    per-batch partial pair-counts per key -> a tiny second groupby over
    one row per (batch, key).  Output: (<key_col>, n_distinct)."""
    counts = _per_key_value_counts(ds, key_col, val_col)

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {key_col: batch[key_col], "partial": pa.array([], pa.int64())}
            )
        g = (
            pa.table({key_col: batch[key_col]})
            .group_by(key_col)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns([key_col, "partial"])

    agg = (
        counts.map_batches(_partial, batch_format="pyarrow")
        .groupby(key_col)
        .sum("partial")
    )

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch[key_col],
                "n_distinct": batch["sum(partial)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def rank_with_ties(
    ds,
    *,
    key_col: str = "o_custkey",
    val_col: str = "o_totalprice",
    id_col: str = "o_orderkey",
    k: int = 2,
):
    """Top-k rows per key under SQL RANK() semantics — ties share a rank
    and ALL boundary-tied rows are kept: ``rank() OVER (PARTITION BY key
    ORDER BY val DESC) <= k`` (contrast topk_per_group's row_number(),
    which cuts ties arbitrarily).

    Scale path: the per-batch combiner keeps a row only if fewer than k
    STRICTLY GREATER values precede it within its (key, batch) slice —
    a row's global rank can only be >= its batch-local rank, so pruned
    rows can never re-enter the global top-k; tied runs survive intact.
    The shuffle then moves O(k + ties) rows per (key, batch).  Rank is
    recomputed exactly per key group (sorted distinct values +
    searchsorted).  Output: (<key_col>, <id_col>, <val_col>, rank)."""
    kk = int(k)
    if kk <= 0:
        raise ValueError("k must be positive")

    def _strict_rank(key: np.ndarray, val: np.ndarray) -> np.ndarray:
        """1 + #strictly-greater values within the same key, vectorized
        over a (key-major, value-desc) sorted view."""
        order = np.lexsort((-val, key))
        key_s, val_s = key[order], val[order]
        starts = np.flatnonzero(np.r_[True, key_s[1:] != key_s[:-1]])
        seg = np.repeat(np.arange(len(starts)), np.diff(np.r_[starts, len(key_s)]))
        pos = np.arange(len(key_s)) - starts[seg]
        # every element of an equal-value run shares the rank of the
        # run's first element
        new_run = np.r_[True, (key_s[1:] != key_s[:-1]) | (val_s[1:] != val_s[:-1])]
        run_id = np.cumsum(new_run) - 1
        run_first_pos = pos[np.flatnonzero(new_run)][run_id]
        rank_sorted = run_first_pos + 1
        rank = np.empty(len(key_s), np.int64)
        rank[order] = rank_sorted
        return rank

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    key_col: batch[key_col],
                    id_col: batch[id_col],
                    val_col: pc.cast(batch[val_col], pa.float64()),
                }
            )
        key = batch[key_col].to_numpy(zero_copy_only=False)
        val = batch[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = _strict_rank(key, val) <= kk
        t = batch.filter(pa.array(keep))
        return pa.table(
            {
                key_col: t[key_col],
                id_col: t[id_col],
                val_col: pc.cast(t[val_col], pa.float64()),
            }
        )

    def _final(group: pa.Table) -> pa.Table:
        key = group[key_col].to_numpy(zero_copy_only=False)
        val = group[val_col].to_numpy(zero_copy_only=False)
        rank = _strict_rank(key, val)
        keep = rank <= kk
        take = pa.array(np.flatnonzero(keep))
        return pa.table(
            {
                key_col: group[key_col].take(take),
                id_col: group[id_col].take(take),
                val_col: group[val_col].take(take),
                "rank": pa.array(rank[keep]),
            }
        )

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(_final, batch_format="pyarrow")
    )


def value_histogram(
    ds,
    *,
    key_col: str = "event_type",
    val_col: str = "value",
    bin_width: float = 5.0,
):
    """Fixed-width value histogram per key: (key, bin, n) with
    bin = floor(value / bin_width) — the distribution-profiling pass a
    curation pipeline runs before choosing filter thresholds.

    floor of an IEEE double is exact, so the binning is bit-identical
    to the SQL oracle.  Per-batch partial (key, bin) counts -> one
    groupby shuffle of distinct (key, bin) rows, never the events."""
    bw = float(bin_width)
    if not (bw > 0):
        raise ValueError("bin_width must be positive")

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    key_col: batch[key_col],
                    "bin": pa.array([], pa.int64()),
                    "partial": pa.array([], pa.int64()),
                }
            )
        if batch[val_col].null_count:
            raise TypeError(
                f"value_histogram: null values in {val_col!r} — a null "
                "becomes NaN and floor(NaN) is undefined; filter or fill "
                "nulls upstream"
            )
        v = batch[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if np.isnan(v).any():
            raise TypeError(
                f"value_histogram: NaN values in {val_col!r} — "
                "floor(NaN) is undefined; filter them upstream"
            )
        b = np.floor(v / bw).astype(np.int64)
        t = pa.table({key_col: batch[key_col], "bin": pa.array(b)})
        g = t.group_by([key_col, "bin"]).aggregate([([], "count_all")])
        return g.rename_columns([key_col, "bin", "partial"])

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby([key_col, "bin"])
        .sum("partial")
    )

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch[key_col],
                "bin": batch["bin"].cast(pa.int64()),
                "n": batch["sum(partial)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def _fmix64(x: np.ndarray) -> np.ndarray:
    x = x.copy()
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return x


def _join_parts() -> int:
    import ray as _ray

    try:
        return max(2, min(64, int(_ray.cluster_resources().get("CPU", 8)) // 2))
    except Exception:
        return 8


def cohort_retention(
    ds,
    ts_col: str = "ts",
    user_col: str = "user_id",
    num_partitions: int | None = None,
):
    """Weekly cohort retention — the standard analytics matrix a
    training-data/telemetry pipeline reports: a user's cohort is the
    epoch-week of their FIRST event; for every (cohort_week, week_offset)
    cell, count the distinct users active offset weeks after their cohort
    week.

    Scale shape: pass 1 reduces each batch to distinct (user, week) pairs
    (vectorized lexsort dedup) and hash-partitions them on fmix64(user)
    — ONE shuffle of two-int64 rows, never the event payload.  Each
    partition block holds all of a user's weeks, so cohort assignment and
    offset dedup are a vectorized segment pass (sorted runs, no per-user
    Python); blocks emit per-(cohort, offset) partial counts and one
    small groupby sums them.

    Output: (cohort_week, week_offset, n_users), weeks as epoch-week
    integers (epoch_us // 604800e6)."""
    week_us = 604_800_000_000
    if num_partitions is None:
        num_partitions = _join_parts()

    def _pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "_pk": pa.array([], pa.int64()),
                    "u": pa.array([], pa.int64()),
                    "w": pa.array([], pa.int64()),
                }
            )
        u = batch[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            batch[ts_col]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        w = ts // week_us
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        keep = np.r_[True, (u[1:] != u[:-1]) | (w[1:] != w[:-1])]
        u, w = u[keep], w[keep]
        pk = (_fmix64(u.astype(np.uint64)) % np.uint64(num_partitions)).astype(
            np.int64
        )
        return pa.table(
            {"_pk": pa.array(pk), "u": pa.array(u), "w": pa.array(w)}
        )

    def _block(block: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cohort_week": pa.array([], pa.int64()),
                "week_offset": pa.array([], pa.int64()),
                "partial": pa.array([], pa.int64()),
            }
        )
        if block.num_rows == 0:
            return empty
        u = block["u"].to_numpy(zero_copy_only=False)
        w = block["w"].to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        # cross-batch distinct (u, w)
        keep = np.r_[True, (u[1:] != u[:-1]) | (w[1:] != w[:-1])]
        u, w = u[keep], w[keep]
        if len(u) == 0:
            return empty
        first = np.r_[True, u[1:] != u[:-1]]
        gid = np.cumsum(first) - 1
        cw = w[first][gid]  # per-user min week (w sorted within user)
        k = w - cw
        t = pa.table(
            {"cohort_week": pa.array(cw), "week_offset": pa.array(k)}
        )
        g = t.group_by(["cohort_week", "week_offset"]).aggregate([([], "count_all")])
        return g.rename_columns(["cohort_week", "week_offset", "partial"])

    agg = (
        ds.map_batches(_pairs, batch_format="pyarrow")
        .groupby("_pk", num_partitions=num_partitions)
        .map_groups(_block, batch_format="pyarrow")
        .groupby(["cohort_week", "week_offset"])
        .sum("partial")
    )

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_week": batch["cohort_week"].cast(pa.int64()),
                "week_offset": batch["week_offset"].cast(pa.int64()),
                "n_users": batch["sum(partial)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def mode_by_key(
    ds,
    *,
    key_col: str = "user_id",
    val_col: str = "event_type",
):
    """Exact per-key mode — the most frequent value per key, ties broken
    by the smallest value (SQL ``arg_min(v, (-n, v))`` shape; the
    per-user dominant-event profile a curation pipeline derives from
    event logs).

    Scale path: the shared histogram shuffle (_per_key_value_counts —
    one row per DISTINCT (key, value) pair, never the corpus), then a
    per-batch vectorized prune to the best row per key per block (the
    global argmax must be its block's argmax), then one groupby(key)
    reduce over <= n_blocks rows per key.
    Output: (<key_col>, mode, n_mode)."""
    counts = _per_key_value_counts(ds, key_col, val_col)

    def _best_per_key(t: pa.Table, cnt_col: str) -> pa.Table:
        if t.num_rows == 0:
            return t
        s = t.sort_by(
            [(key_col, "ascending"), (cnt_col, "descending"), ("v", "ascending")]
        )
        k = s[key_col].to_numpy(zero_copy_only=False)
        first = np.r_[True, k[1:] != k[:-1]]
        return s.take(pa.array(np.flatnonzero(first)))

    pruned = counts.map_batches(
        lambda b: _best_per_key(b, "sum(partial)"), batch_format="pyarrow"
    )

    def _final(group: pa.Table) -> pa.Table:
        best = _best_per_key(group, "sum(partial)")
        return pa.table(
            {
                key_col: best[key_col],
                "mode": best["v"],
                "n_mode": best["sum(partial)"].cast(pa.int64()),
            }
        )

    return pruned.groupby(key_col).map_groups(_final, batch_format="pyarrow")


def ntile_buckets(
    ds,
    *,
    n: int = 4,
    key_col: str = "o_custkey",
    val_col: str = "o_totalprice",
    id_col: str = "o_orderkey",
):
    """SQL NTILE(n) per key — equi-depth bucketing of each key's rows in
    (val, id) order, with the standard remainder rule: the first
    ``cnt % n`` buckets hold ``cnt // n + 1`` rows, the rest ``cnt //
    n`` (DuckDB / ANSI semantics, ties broken deterministically by
    id_col so the assignment is total-order exact).

    One hash-bucket exchange (fmix64(key)); partitioning assumption:
    one key's rows fit in a partition alongside its bucket-mates (same
    contract as rank_with_ties / sessionize — per-customer order lists,
    not global sorts).  Output: (<key_col>, <id_col>, <val_col>,
    bucket)."""
    nn = int(n)
    if nn <= 0:
        raise ValueError("ntile_buckets: n must be positive")

    def _final(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    val_col: pa.array([], pa.float64()),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        val = part[val_col].to_numpy(zero_copy_only=False)
        gid = part[id_col].to_numpy(zero_copy_only=False)
        keys = part[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # every key's ntile in ONE (key, val, id) lexsort: per-segment
        # rank + the remainder rule evaluated with per-row segment params
        order = np.lexsort((gid, val, keys))
        keys_s = keys[order]
        new_key = np.r_[True, keys_s[1:] != keys_s[:-1]]
        starts = np.flatnonzero(new_key)
        seg = np.cumsum(new_key) - 1
        rn0 = np.arange(len(order)) - starts[seg]
        cnt = np.diff(np.r_[starts, len(order)])[seg]
        size = cnt // nn
        big = cnt % nn
        size_safe = np.maximum(size, 1)
        threshold = big * (size + 1)
        bucket0 = np.where(
            size == 0,
            rn0,  # cnt < n: one row per bucket
            np.where(
                rn0 < threshold,
                rn0 // (size + 1),
                big + (rn0 - threshold) // size_safe,
            ),
        )
        take = pa.array(order)
        return pa.table(
            {
                key_col: part[key_col].take(take),
                id_col: part[id_col].take(take),
                val_col: part[val_col].take(take),
                "bucket": pa.array(bucket0 + 1, pa.int64()),
            }
        )

    return _bucket_by_int_key(ds, key_col).groupby("_pk").map_groups(
        _final, batch_format="pyarrow"
    )


def window_unique_users(
    ds,
    *,
    width_minutes: int = 60,
    ts_col: str = "ts",
    user_col: str = "user_id",
):
    """Distinct users per tumbling window — ``count(DISTINCT user)`` per
    floor-aligned time bucket, the uniques-per-hour trend every event
    pipeline dashboards.

    Per-batch distinct (window, user) pairs -> the count-distinct
    machinery of distinct_by_key (one shuffle of distinct pairs).
    Output: (win_us, n_users)."""
    width_us = int(width_minutes) * 60_000_000
    if width_us <= 0:
        raise ValueError("window_unique_users: width_minutes must be positive")

    def _win(batch: pa.Table) -> pa.Table:
        us = _to_epoch_us(batch[ts_col], ts_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                # numpy // floors like SQL integer division (pre-epoch safe)
                "win_us": pa.array(us // width_us * width_us),
                user_col: batch[user_col],
            }
        )

    per_win = distinct_by_key(
        ds.map_batches(_win, batch_format="pyarrow"),
        key_col="win_us",
        val_col=user_col,
    )
    return per_win.map_batches(
        lambda b: b.rename_columns(["win_us", "n_users"]), batch_format="pyarrow"
    )


def activity_streaks(
    ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
):
    """Gaps-and-islands: per user, the number of distinct active days
    and the longest run of CONSECUTIVE active days (day = floor of the
    epoch-us timestamp / 86400e6, matching SQL integer floor division).

    Per-batch distinct (user, day) pairs (the combiner — volume is one
    row per user-day, never the events) -> one groupby(user) shuffle ->
    vectorized in-group dedup + run-length scan.
    Output: (<user_col>, n_days, max_streak)."""
    day_us = 86_400_000_000

    def _days(batch: pa.Table) -> pa.Table:
        us = _to_epoch_us(batch[ts_col], ts_col).to_numpy(zero_copy_only=False)
        t = pa.table({user_col: batch[user_col], "day": pa.array(us // day_us)})
        return t.group_by([user_col, "day"]).aggregate([])

    def _final(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table(
                {
                    user_col: pa.array([], pa.int64()),
                    "n_days": pa.array([], pa.int64()),
                    "max_streak": pa.array([], pa.int64()),
                }
            )
        uid = part[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        day = part["day"].to_numpy(zero_copy_only=False)
        # every user's streaks in ONE (user, day) lexsort: cross-batch
        # duplicate user-days dedup, then runs break at a user change or
        # a day gap != 1; per-user aggregation via two reduceat levels
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        keep = np.r_[True, (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])]
        uid, day = uid[keep], day[keep]
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        new_run = new_user | np.r_[True, np.diff(day) != 1]
        run_starts = np.flatnonzero(new_run)
        run_len = np.diff(np.r_[run_starts, len(day)])
        user_starts = np.flatnonzero(new_user)
        n_days = np.diff(np.r_[user_starts, len(day)])
        # first run of each user = index of its segment start among runs
        user_first_run = np.searchsorted(run_starts, user_starts)
        max_streak = np.maximum.reduceat(run_len, user_first_run)
        return pa.table(
            {
                user_col: pa.array(uid[user_starts]),
                "n_days": pa.array(n_days.astype(np.int64)),
                "max_streak": pa.array(max_streak.astype(np.int64)),
            }
        )

    return (
        _bucket_by_int_key(
            ds.map_batches(_days, batch_format="pyarrow"), user_col
        )
        .groupby("_pk")
        .map_groups(_final, batch_format="pyarrow")
    )


def string_agg_by_key(
    ds,
    *,
    key_col: str = "s_nationkey",
    val_col: str = "s_name",
    sep: str = ",",
):
    """SQL ``string_agg(val, sep ORDER BY val)`` per key — the sorted
    concatenation makes the output deterministic and oracle-comparable
    (unordered string_agg is nondeterministic under parallelism).

    One groupby(key) shuffle; assumption: one key's values fit in a
    group (the reference's SiteWords-style per-domain term rollups are
    exactly this shape).  Output: (<key_col>, n, agg)."""

    def _final(group: pa.Table) -> pa.Table:
        vals = sorted(group[val_col].to_pylist())
        return pa.table(
            {
                key_col: group[key_col][:1],
                "n": pa.array([len(vals)], pa.int64()),
                "agg": pa.array([sep.join(vals)], pa.string()),
            }
        )

    return ds.groupby(key_col).map_groups(_final, batch_format="pyarrow")


def benford_digits(
    ds,
    *,
    val_col: str = "o_totalprice",
):
    """First-significant-digit profile (Benford's-law check) — the
    quick data-quality screen for numeric columns: counts per leading
    digit of floor(value).

    Exactness: the digit is taken from the DECIMAL STRING of the
    int64 floor (Arrow cast + utf8 slice), not float log10 — so it is
    bit-identical to the SQL substr(cast(...)) oracle.  Per-batch
    partial counts (<= 9 rows) -> one tiny groupby.
    Output: (digit, n)."""

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "digit": pa.array([], pa.string()),
                    "partial": pa.array([], pa.int64()),
                }
            )
        col = batch[val_col]
        if col.null_count:
            raise TypeError(f"benford_digits: null values in {val_col!r}")
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        if not np.isfinite(v).all() or (v < 1).any():
            raise ValueError(
                f"benford_digits: {val_col!r} must be finite and >= 1 "
                "(leading digit of |value| < 1 is scale-dependent)"
            )
        if (v >= float(2**63)).any():
            raise ValueError(
                f"benford_digits: {val_col!r} exceeds int64 — np.floor"
                ".astype would wrap negative and emit a bogus '-' digit"
            )
        digits = pc.utf8_slice_codeunits(
            pc.cast(pa.array(np.floor(v).astype(np.int64)), pa.string()), 0, 1
        )
        g = pa.table({"digit": digits}).group_by("digit").aggregate([([], "count_all")])
        return g.rename_columns(["digit", "partial"])

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("digit")
        .sum("partial")
    )

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "digit": batch["digit"],
                "n": batch["sum(partial)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def percent_rank_by_key(
    ds,
    *,
    key_col: str = "o_custkey",
    val_col: str = "o_totalprice",
    id_col: str = "o_orderkey",
):
    """SQL percent_rank() and cume_dist() per key — the normalized
    position stats a curation pipeline uses to compare a row against
    its key's distribution: percent_rank = (rank-1)/(cnt-1) with
    RANK() tie semantics (0.0 when cnt = 1), cume_dist = #(<= val)/cnt.

    Both are single divisions of small exact integers rounded to 6 dp —
    bit-reproducible against the SQL oracle.  One hash-bucket exchange
    with every key's rank scan vectorized per partition (same
    partitioning contract as rank_with_ties).  Output: (<key_col>,
    <id_col>, <val_col>, percent_rank, cume_dist)."""

    def _final(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    val_col: pa.array([], pa.float64()),
                    "percent_rank": pa.array([], pa.float64()),
                    "cume_dist": pa.array([], pa.float64()),
                }
            )
        val = part[val_col].to_numpy(zero_copy_only=False)
        keys = part[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n_rows = len(val)
        # every key's ranks in ONE (key, val) lexsort; a tie run can
        # never cross a key segment because a key change starts a run
        order = np.lexsort((val, keys))
        keys_s, val_s = keys[order], val[order]
        new_key = np.r_[True, keys_s[1:] != keys_s[:-1]]
        starts = np.flatnonzero(new_key)
        seg = np.cumsum(new_key) - 1
        seg_start = starts[seg]
        n = np.diff(np.r_[starts, n_rows])[seg]  # key size per row
        new_run = new_key | np.r_[True, val_s[1:] != val_s[:-1]]
        run_id = np.cumsum(new_run) - 1
        run_first = np.flatnonzero(new_run)
        run_last = np.r_[run_first[1:], n_rows] - 1
        rank = run_first[run_id] - seg_start + 1  # min position of the tie run
        cume = run_last[run_id] - seg_start + 1  # max position of the tie run
        pr = np.where(n > 1, (rank - 1) / np.maximum(n - 1, 1), 0.0)
        take = pa.array(order)
        return pa.table(
            {
                key_col: part[key_col].take(take),
                id_col: part[id_col].take(take),
                val_col: part[val_col].take(take),
                "percent_rank": pa.array(np.round(pr, 6)),
                "cume_dist": pa.array(np.round(cume / n, 6)),
            }
        )

    return _bucket_by_int_key(ds, key_col).groupby("_pk").map_groups(
        _final, batch_format="pyarrow"
    )


def weekly_revenue_delta(
    ds,
    *,
    ts_col: str = "o_orderdate",
    val_col: str = "o_totalprice",
    max_weeks: int = 1_000_000,
):
    """Weekly revenue with week-over-week delta — LAG over the
    AGGREGATED series (contrast event_deltas' per-row LAG): revenue in
    integer cents so the distributed sum is exact regardless of
    addition order.

    Per-batch integer partial sums -> one tiny groupby (one row per
    week) -> the week series (bounded by calendar time, never data
    volume; loud cap) is finalized in one pass.  Output:
    (week, revenue_cents, delta_cents) with NULL delta on the first
    week."""
    week_us = 7 * 86_400_000_000

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "week": pa.array([], pa.int64()),
                    "partial": pa.array([], pa.int64()),
                }
            )
        us = _to_epoch_us(batch[ts_col], ts_col).to_numpy(zero_copy_only=False)
        cents = _money_cents(batch[val_col])
        t = pa.table({"week": pa.array(us // week_us), "c": pa.array(cents)})
        g = t.group_by("week").aggregate([("c", "sum")])
        return g.rename_columns(["week", "partial"])

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("week")
        .sum("partial")
    )
    rows = agg.take_all()  # one row per calendar week — bounded small
    if len(rows) > max_weeks:
        raise RuntimeError(
            f"weekly_revenue_delta: {len(rows)} weeks exceeds max_weeks="
            f"{max_weeks} — the series no longer fits the driver"
        )
    rows.sort(key=lambda r: r["week"])
    weeks = [int(r["week"]) for r in rows]
    rev = [int(r["sum(partial)"]) for r in rows]
    delta = [None] + [rev[i] - rev[i - 1] for i in range(1, len(rev))]
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "week": pa.array(weeks, pa.int64()),
                "revenue_cents": pa.array(rev, pa.int64()),
                "delta_cents": pa.array(delta, pa.int64()),
            }
        )
    )


def _per_key_broadcast_lookup(keys: pa.Array, arrays: tuple, op: str):
    """ray.put a small per-key value table ONCE; returns gather(col) ->
    tuple of the arrays gathered row-aligned to the column, raising
    loudly if a key is missing from the broadcast pass.  The shared
    machinery of zscore_outliers and mad_by_key (broadcast_join's
    put-once / read-per-task convention)."""
    ref = ray.put((keys, arrays))

    def gather(col):
        keys_b, arrays_b = ray.get(ref)
        idx = pc.index_in(col, keys_b)
        if idx.null_count:
            raise RuntimeError(f"{op}: key missing from broadcast pass")
        ix = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        return tuple(a[ix] for a in arrays_b)

    return gather


def _money_cents(col, scale: int = 100) -> np.ndarray:
    """round(value * scale) as int64 — THE money-to-integer-units
    conversion every integer-exact op and its SQL oracle share.
    np.round is half-to-even vs SQL round's half-away, but 2-dp source
    doubles times 100 never land exactly on .5, so parity holds; keep
    the convention in ONE place so it can never fork."""
    v = col.to_numpy(zero_copy_only=False).astype(np.float64)
    return np.round(v * scale).astype(np.int64)


def zscore_outliers(
    ds,
    *,
    key_col: str = "source",
    val_col: str = "n_chars",
    id_col: str = "doc_id",
    z: float = 2.0,
):
    """Per-key z-score outlier flagging over an INTEGER column: rows
    whose |(x - mean)/stddev_pop| exceeds `z` — the length-anomaly
    screen a curation pipeline runs per source.

    Exactness: per-key sum and sum-of-squares are int64 partials (no
    float accumulation-order drift); mean/variance/z are then computed
    in doubles with the SAME expression tree as the SQL oracle, and the
    filter compares the 6-dp-ROUNDED score so engines can't disagree at
    the boundary.  Two passes: one tiny stats groupby, then a broadcast
    (ray.put once, read per task) of the O(#keys) stats arrays into a
    streaming vectorized filter map.
    Output: (<id_col>, <key_col>, <val_col>, zscore)."""

    def _stats(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    key_col: batch[key_col],
                    "s": pa.array([], pa.int64()),
                    "q": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        col = batch[val_col]
        if not pa.types.is_integer(col.type):
            raise TypeError(
                f"zscore_outliers: {val_col!r} must be integer (exact sums); "
                f"got {col.type} — scale to micro-units upstream"
            )
        v = col.to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {key_col: batch[key_col], "s": pa.array(v), "q": pa.array(v * v)}
        )
        g = t.group_by(key_col).aggregate(
            [("s", "sum"), ("q", "sum"), ([], "count_all")]
        )
        return g.rename_columns([key_col, "s", "q", "n"])

    agg = (
        ds.map_batches(_stats, batch_format="pyarrow")
        .groupby(key_col)
        .sum(["s", "q", "n"])
    )
    stats_rows = agg.take_all()  # O(#keys)
    keys_list = [r[key_col] for r in stats_rows]
    S = np.array([r["sum(s)"] for r in stats_rows], np.float64)
    Q = np.array([r["sum(q)"] for r in stats_rows], np.float64)
    N = np.array([r["sum(n)"] for r in stats_rows], np.float64)
    mean = S / N
    var = (Q - S * S / N) / N
    with np.errstate(invalid="ignore"):
        std = np.sqrt(np.where(var > 0, var, np.nan))  # zero-variance key -> no outliers
    gather = _per_key_broadcast_lookup(
        pa.array(keys_list), (mean, std), "zscore_outliers"
    )

    def _flag(batch: pa.Table) -> pa.Table:
        mean_b, std_b = gather(batch[key_col])  # already row-aligned
        x = batch[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        zs = np.round((x - mean_b) / std_b, 6)
        keep = np.abs(zs) > z  # NaN compares False: zero-variance keys drop
        take = pa.array(np.flatnonzero(keep))
        return pa.table(
            {
                id_col: batch[id_col].take(take),
                key_col: batch[key_col].take(take),
                val_col: batch[val_col].take(take),
                "zscore": pa.array(zs[keep]),
            }
        )

    return ds.map_batches(_flag, batch_format="pyarrow")


def first_last_by_key(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
):
    """First and last event per key under a deterministic (ts, id) total
    order — SQL's arg_min/arg_max with an explicit tie-break (bare
    arg_min is nondeterministic on ts ties under parallelism).

    Scale path: per-batch vectorized prune to each key's two extreme
    rows (a key's global extremes must be its block's extremes), then
    one groupby(key) reduce over <= 2·n_blocks rows per key.
    Output: (<key_col>, first_<id>, first_ts_us, last_<id>,
    last_ts_us)."""

    def _extremes(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False)
        us = _to_epoch_us(t[ts_col], ts_col).to_numpy(zero_copy_only=False)
        i = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, us, k))
        k_s = k[order]
        first = np.r_[True, k_s[1:] != k_s[:-1]]
        last = np.r_[k_s[1:] != k_s[:-1], True]
        keep = np.unique(order[np.flatnonzero(first | last)])
        return pa.table(
            {
                key_col: t[key_col].take(pa.array(keep)),
                id_col: t[id_col].take(pa.array(keep)),
                "ts_us": pa.array(us[keep]),
            }
        )

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    key_col: batch[key_col],
                    id_col: batch[id_col],
                    "ts_us": pa.array([], pa.int64()),
                }
            )
        return _extremes(batch)

    def _final(group: pa.Table) -> pa.Table:
        us = group["ts_us"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, us))
        lo, hi = order[0], order[-1]
        return pa.table(
            {
                key_col: group[key_col][:1],
                f"first_{id_col}": pa.array([int(ids[lo])], pa.int64()),
                "first_ts_us": pa.array([int(us[lo])], pa.int64()),
                f"last_{id_col}": pa.array([int(ids[hi])], pa.int64()),
                "last_ts_us": pa.array([int(us[hi])], pa.int64()),
            }
        )

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(_final, batch_format="pyarrow")
    )


def session_duration_histogram(
    ds,
    *,
    gap_minutes: int = 30,
    bin_minutes: int = 5,
    user_col: str = "user_id",
    ts_col: str = "ts",
):
    """Distribution of session lengths: sessionize (gap-based), then a
    fixed-width histogram over floor(duration / bin) — the engagement
    profile derived from event logs.

    Adds only aggregate-sized work on top of sessionize's one shuffle:
    per-batch partial counts per bin -> a tiny groupby.
    Output: (bin, n) with bin = floor((end-start) / bin_minutes)."""
    bin_us = int(bin_minutes) * 60_000_000
    if bin_us <= 0:
        raise ValueError("session_duration_histogram: bin_minutes must be positive")
    sess = sessionize(ds, gap_minutes=gap_minutes, user_col=user_col, ts_col=ts_col)

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"bin": pa.array([], pa.int64()), "partial": pa.array([], pa.int64())}
            )
        dur = (
            batch["end_us"].to_numpy(zero_copy_only=False)
            - batch["start_us"].to_numpy(zero_copy_only=False)
        )
        b = dur // bin_us
        t = pa.table({"bin": pa.array(b)})
        g = t.group_by("bin").aggregate([([], "count_all")])
        return g.rename_columns(["bin", "partial"])

    agg = (
        sess.map_batches(_partial, batch_format="pyarrow").groupby("bin").sum("partial")
    )

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bin": batch["bin"].cast(pa.int64()),
                "n": batch["sum(partial)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def mad_by_key(
    ds,
    key_col: str = "source",
    val_col: str = "n_chars",
    max_distinct_per_key: int = 5_000_000,
):
    """Exact per-key median absolute deviation — SQL mad():
    median(|x - median(x)|), the robust spread statistic curation
    thresholds are usually anchored to.

    Two histogram shuffles of DISTINCT (key, value) rows (never the
    corpus): the first yields per-key medians via the shared CDF walk;
    the medians (O(#keys)) broadcast into a second pass that histograms
    the absolute deviations, walked the same way.  Deviations of int
    values from a k-or-k.5 median are exact doubles, so the result is
    bit-identical to the oracle.  Output: (<key_col>, n, mad)."""
    meds = median_by_key(
        ds, key_col=key_col, val_col=val_col,
        max_distinct_per_key=max_distinct_per_key,
    )
    med_rows = meds.take_all()  # O(#keys)
    med_keys = pa.array([r[key_col] for r in med_rows])
    med_vals = np.array([r["median"] for r in med_rows], np.float64)
    gather = _per_key_broadcast_lookup(med_keys, (med_vals,), "mad_by_key")

    def _dev(batch: pa.Table) -> pa.Table:
        (vals_b,) = gather(batch[key_col])  # already row-aligned
        x = batch[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {key_col: batch[key_col], "dev": pa.array(np.abs(x - vals_b))}
        )

    devs = ds.map_batches(_dev, batch_format="pyarrow")
    counts = _per_key_value_counts(devs, key_col, "dev")

    def _median(v, cum, n) -> float:
        lo_pos = (n - 1) // 2
        hi_pos = n // 2
        lo_val = float(v[np.searchsorted(cum, lo_pos + 1)])
        hi_val = float(v[np.searchsorted(cum, hi_pos + 1)])
        return (lo_val + hi_val) / 2.0

    return _per_key_order_stat(
        counts, key_col, "mad", _median, max_distinct_per_key, "mad_by_key"
    )


def revenue_by_nation(
    orders,
    customer,
    nation,
    *,
    max_nations: int = 5_000_000,
):
    """Multi-join rollup (TPC-H Q5 shape): total order revenue per
    customer nation — orders ⋈ customer (large-large hash partition)
    ⋈ nation (broadcast dimension), aggregated in exact integer cents.

    The join order is the scale-correct one: the big fact table is
    reduced to (custkey, cents) partials FIRST, the large-large join
    moves only those, and the 25-row nation table never shuffles.
    Output: (n_name, revenue_cents)."""

    def _fact(batch: pa.Table) -> pa.Table:
        cents = _money_cents(batch["o_totalprice"])
        t = pa.table({"o_custkey": batch["o_custkey"], "c": pa.array(cents)})
        g = t.group_by("o_custkey").aggregate([("c", "sum")])
        return g.rename_columns(["o_custkey", "cents"])

    per_cust = bucketed_group_agg(
        orders.map_batches(_fact, batch_format="pyarrow"),
        ["o_custkey"], ["cents"],
    )
    cust_nat = hash_equi_join(
        per_cust,
        customer,
        on="o_custkey",
        right_on="c_custkey",
        left_cols=["o_custkey", "sum(cents)"],
        right_cols=["c_nationkey"],
    )
    with_name = broadcast_join(
        cust_nat,
        nation,
        on="c_nationkey",
        small_on="n_nationkey",
        small_cols=["n_name"],
        max_small_rows=max_nations,
    )

    def _partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"n_name": batch["n_name"], "c": batch["sum(cents)"]})
        g = t.group_by("n_name").aggregate([("c", "sum")])
        return g.rename_columns(["n_name", "partial"])

    agg = bucketed_group_agg(
        with_name.map_batches(_partial, batch_format="pyarrow"),
        ["n_name"], ["partial"],
    )

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": batch["n_name"],
                "revenue_cents": batch["sum(partial)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def pricing_summary(ds):
    """TPC-H Q1 shape — the canonical scan-heavy groupby report over the
    biggest fact table: per (returnflag, linestatus), sums and means of
    quantity / base price / discounted price / charge.

    Exactness: every monetary term is converted to integer units PER ROW
    (cents; discount/tax to whole percent), so the three product terms
    price·(1-disc) and price·(1-disc)·(1+tax) are exact int64 partial
    sums in cents×100 / cents×10000 — no float accumulation order
    anywhere.  Magnitude bound: ~2e11 per row, int64-safe to ~4e7 rows
    per group; beyond that the partials would move to decimal128 (the
    Arrow kernel exists) — documented, not needed at bench scale.
    Averages are single double divisions of the exact sums, rounded.
    Output: (l_returnflag, l_linestatus, sum_qty, sum_base_cents,
    sum_disc_c2, sum_charge_c4, avg_qty, avg_price_cents, avg_disc_pct,
    n)."""

    def _partial(batch: pa.Table) -> pa.Table:
        q = _money_cents(batch["l_quantity"], scale=1)
        pc_ = _money_cents(batch["l_extendedprice"])
        dp = _money_cents(batch["l_discount"])
        tp = _money_cents(batch["l_tax"])
        disc_c2 = pc_ * (100 - dp)
        charge_c4 = disc_c2 * (100 + tp)
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sq": pa.array(q),
                "sb": pa.array(pc_),
                "sd": pa.array(disc_c2),
                "sc": pa.array(charge_c4),
                "sp": pa.array(dp),
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("sq", "sum"), ("sb", "sum"), ("sd", "sum"), ("sc", "sum"),
             ("sp", "sum"), ([], "count_all")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sq", "sb", "sd", "sc", "sp", "n"]
        )

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .sum(["sq", "sb", "sd", "sc", "sp", "n"])
    )

    def _final(batch: pa.Table) -> pa.Table:
        sq = batch["sum(sq)"].to_numpy(zero_copy_only=False).astype(np.int64)
        sb = batch["sum(sb)"].to_numpy(zero_copy_only=False).astype(np.int64)
        sp = batch["sum(sp)"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": pa.array(sq),
                "sum_base_cents": pa.array(sb),
                "sum_disc_c2": batch["sum(sd)"].cast(pa.int64()),
                "sum_charge_c4": batch["sum(sc)"].cast(pa.int64()),
                "avg_qty": pa.array(np.round(sq / n, 6)),
                "avg_price_cents": pa.array(np.round(sb / n, 6)),
                "avg_disc_pct": pa.array(np.round(sp / n, 6)),
                "n": pa.array(n),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def ship_delay_histogram(lineitem, orders):
    """Order-to-ship latency distribution: days between o_orderdate and
    l_shipdate per line item, as a day histogram — the fulfilment-lag
    profile, and the repo's large-large join exercised at the biggest
    table.

    The join is inherent (per-row dates on both sides), done with the
    repo's hash_equi_join (one keyed shuffle of both inputs, never
    Dataset.join); the histogram then moves <= #distinct-days rows per
    batch.  Output: (delay_days, n)."""
    day_us = 86_400_000_000

    def _li(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "ship_us": pa.array(
                    _to_epoch_us(batch["l_shipdate"], "l_shipdate")
                ),
            }
        )

    def _ord(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "order_us": pa.array(
                    _to_epoch_us(batch["o_orderdate"], "o_orderdate")
                ),
            }
        )

    li = lineitem.map_batches(_li, batch_format="pyarrow")
    od = orders.map_batches(_ord, batch_format="pyarrow")
    joined = hash_equi_join(
        li, od, on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_orderkey", "ship_us"], right_cols=["order_us"],
    )

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "delay_days": pa.array([], pa.int64()),
                    "partial": pa.array([], pa.int64()),
                }
            )
        d = (
            batch["ship_us"].to_numpy(zero_copy_only=False)
            - batch["order_us"].to_numpy(zero_copy_only=False)
        ) // day_us
        g = (
            pa.table({"delay_days": pa.array(d)})
            .group_by("delay_days")
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["delay_days", "partial"])

    agg = (
        joined.map_batches(_partial, batch_format="pyarrow")
        .groupby("delay_days")
        .sum("partial")
    )

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "delay_days": batch["delay_days"].cast(pa.int64()),
                "n": batch["sum(partial)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def json_field_stats(
    ds,
    *,
    key_col: str = "event_type",
    json_col: str = "props",
    field: str = "k",
):
    """Semi-structured extraction + rollup: pull an integer field out of
    a JSON payload column (the event-properties pattern) and aggregate
    it per key — sum/min/max/count and mean.

    The extraction is ONE vectorized RE2 kernel (pc.extract_regex) per
    batch — no per-row json.loads; the field must be a BARE JSON
    integer: missing fields AND non-integer values (floats, quoted
    numbers) fail loudly rather than silently skewing the sums (RE2 has
    no lookahead, so the value is captured to its delimiter and
    validated as ^-?\\d+$ in a second vectorized match).  Exact int64
    partial sums; one aggregate-sized groupby.
    Output: (<key_col>, sum_v, min_v, max_v, n, avg_v)."""
    pattern = f'"{field}":\\s*(?P<v>[^,}}\\s]+)'

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    key_col: batch[key_col],
                    "s": pa.array([], pa.int64()),
                    "mn": pa.array([], pa.int64()),
                    "mx": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        col = batch[json_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        st = pc.extract_regex(col, pattern)
        if st.null_count:
            raise ValueError(
                f"json_field_stats: {st.null_count} rows in {json_col!r} lack an "
                f"integer field {field!r} — fix or filter upstream"
            )
        raw = pc.struct_field(st, "v")
        bad = pc.sum(
            pc.cast(pc.invert(pc.match_substring_regex(raw, r"^-?\d+$")), pa.int64())
        ).as_py()
        if bad:
            raise ValueError(
                f"json_field_stats: {bad} rows in {json_col!r} hold a "
                f"non-integer value for field {field!r} (float/quoted/other) "
                "— a silent truncation would skew the sums; fix upstream"
            )
        v = pc.cast(raw, pa.int64())
        t = pa.table({key_col: batch[key_col], "v": v})
        g = t.group_by(key_col).aggregate(
            [("v", "sum"), ("v", "min"), ("v", "max"), ([], "count_all")]
        )
        return g.rename_columns([key_col, "s", "mn", "mx", "n"])

    from ray.data.aggregate import Max, Min, Sum

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("s"), Min("mn"), Max("mx"), Sum("n"))
    )

    def _final(batch: pa.Table) -> pa.Table:
        s = batch["sum(s)"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                key_col: batch[key_col],
                "sum_v": pa.array(s),
                "min_v": batch["min(mn)"].cast(pa.int64()),
                "max_v": batch["max(mx)"].cast(pa.int64()),
                "n": pa.array(n),
                "avg_v": pa.array(np.round(s / n, 6)),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def column_profile(ds, cols: list[str] | None = None):
    """Data-quality column profiler: per column, row count, null count,
    empty-string count and EXACT distinct count — the first pass a
    pipeline runs on an unfamiliar table.

    All columns ride ONE distinct shuffle: values are stringified per
    batch (nulls kept separate as counters) into (column, value) pairs,
    per-batch deduped, then globally deduped and counted per column;
    null/empty/row counters are aggregate-sized partials.
    Output: (column, n, n_null, n_empty, n_distinct)."""

    def _pairs(batch: pa.Table) -> pa.Table:
        names = cols or batch.column_names
        col_out, val_out = [], []
        meta = {"column": [], "rows": [], "nulls": [], "empties": []}
        for name in names:
            c = batch[name]
            s = pc.cast(c, pa.string())
            nn = c.null_count
            ne = 0
            if pa.types.is_string(c.type) or pa.types.is_large_string(c.type):
                ne = pc.sum(
                    pc.cast(pc.equal(c, ""), pa.int64())
                ).as_py() or 0
            vals = pc.drop_null(s).unique()
            col_out.append(pa.array([name] * len(vals), pa.string()))
            val_out.append(vals)
            meta["column"].append(name)
            meta["rows"].append(batch.num_rows)
            meta["nulls"].append(nn)
            meta["empties"].append(ne)
        pairs = pa.table(
            {
                "column": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in col_out]),
                "value": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in val_out]),
                "rows": pa.array([0] * sum(len(a) for a in col_out), pa.int64()),
                "nulls": pa.array([0] * sum(len(a) for a in col_out), pa.int64()),
                "empties": pa.array([0] * sum(len(a) for a in col_out), pa.int64()),
            }
        )
        counters = pa.table(
            {
                "column": pa.array(meta["column"], pa.string()),
                "value": pa.array([""] * len(names), pa.string()),
                "rows": pa.array(meta["rows"], pa.int64()),
                "nulls": pa.array(meta["nulls"], pa.int64()),
                "empties": pa.array(meta["empties"], pa.int64()),
            }
        )
        # is_counter joins the group key so a real "" value can't collide
        pairs = pairs.append_column("is_counter", pa.array([0] * pairs.num_rows, pa.int64()))
        counters = counters.append_column("is_counter", pa.array([1] * len(names), pa.int64()))
        return pa.concat_tables([pairs, counters])

    # one shuffle: distinct (column, value) rows + summed counter rows
    agg = bucketed_group_agg(
        ds.map_batches(_pairs, batch_format="pyarrow"),
        ["column", "value", "is_counter"],
        ["rows", "nulls", "empties"],
    )

    def _per_col(batch: pa.Table) -> pa.Table:
        # distinct rows have value != null and zero counters; counter
        # rows have value == null — both collapse per column here
        is_counter = pc.equal(batch["is_counter"], 1)
        d = pa.table(
            {
                "column": batch["column"],
                "dist": pc.cast(pc.invert(is_counter), pa.int64()),
                "n": batch["sum(rows)"].cast(pa.int64()),
                "n_null": batch["sum(nulls)"].cast(pa.int64()),
                "n_empty": batch["sum(empties)"].cast(pa.int64()),
            }
        )
        g = d.group_by("column").aggregate(
            [("dist", "sum"), ("n", "sum"), ("n_null", "sum"), ("n_empty", "sum")]
        )
        return g.rename_columns(["column", "dist", "n", "n_null", "n_empty"])

    agg2 = bucketed_group_agg(
        agg.map_batches(_per_col, batch_format="pyarrow"),
        ["column"],
        ["dist", "n", "n_null", "n_empty"],
    )

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "column": batch["column"],
                "n": batch["sum(n)"].cast(pa.int64()),
                "n_null": batch["sum(n_null)"].cast(pa.int64()),
                "n_empty": batch["sum(n_empty)"].cast(pa.int64()),
                "n_distinct": batch["sum(dist)"].cast(pa.int64()),
            }
        )

    return agg2.map_batches(_final, batch_format="pyarrow")


def global_quantiles(
    ds,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    val_col: str = "n_chars",
    max_distinct: int = 5_000_000,
):
    """Exact global interpolated quantiles (SQL quantile_cont) for a
    column, several q at once — the threshold-picking pass behind
    length/quality filters, done without sorting the data.

    The histogram-CDF shape of quantile_by_key with a constant key: one
    shuffle of DISTINCT values, one CDF walk emitting every requested q.
    Output: (q, value)."""
    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError("global_quantiles: each q must be in [0, 1]")

    def _partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table({"v": batch[val_col]})
            .group_by("v")
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["v", "partial"])

    counts = (
        ds.map_batches(_partial, batch_format="pyarrow").groupby("v").sum("partial")
    )
    # enforce the distinct cap WHILE collecting (like broadcast_join's
    # small-side cap): the driver never holds more than max_distinct
    # rows + one batch, instead of materializing first and checking after
    v_parts, c_parts, total = [], [], 0
    for b in counts.iter_batches(batch_format="pyarrow"):
        total += b.num_rows
        if total > max_distinct:
            raise RuntimeError(
                f"global_quantiles: > {max_distinct} distinct values "
                "(max_distinct) — bin the column first"
            )
        v_parts.append(b["v"].to_numpy(zero_copy_only=False))
        c_parts.append(b["sum(partial)"].to_numpy(zero_copy_only=False))
    import ray.data

    if total == 0:
        return ray.data.from_arrow(
            pa.table(
                {"q": pa.array([], pa.float64()), "value": pa.array([], pa.float64())}
            )
        )
    # keep v in its NATIVE dtype (int64 > 2^53 would lose exactness in a
    # float64 roundtrip); interpolation goes through float only at the end
    v = np.concatenate(v_parts)
    c = np.concatenate(c_parts).astype(np.int64)
    order = np.argsort(v)
    v, c = v[order], c[order]
    cum = np.cumsum(c)
    n = int(cum[-1])
    integral = np.issubdtype(v.dtype, np.integer)
    out_q, out_v = [], []
    for q in qs:
        pos = q * (n - 1)  # same double math as DuckDB quantile_cont
        lo_pos, hi_pos = int(np.floor(pos)), int(np.ceil(pos))
        lo_val = v[np.searchsorted(cum, lo_pos + 1)]
        hi_val = v[np.searchsorted(cum, hi_pos + 1)]
        if integral:
            lo_val, hi_val = int(lo_val), int(hi_val)  # exact int subtract
        else:
            lo_val, hi_val = float(lo_val), float(hi_val)
        out_q.append(round(q, 6))
        out_v.append(round(lo_val + (hi_val - lo_val) * (pos - lo_pos), 6))

    return ray.data.from_arrow(
        pa.table({"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.float64())})
    )


def mutual_information(
    ds,
    x_col: str = "source",
    y_col: str = "lang",
    max_cells: int = 1_000_000,
):
    """Pointwise and total mutual information between two CATEGORICAL
    columns — the association test behind feature selection and
    source-vs-language contamination checks.

    One (x, y) count shuffle (per-batch partial counts first), then the
    marginals and PMI are computed over the contingency cells alone —
    never the rows.  The cell table is |X|x|Y|, tiny for categorical
    inputs by definition; `max_cells` guards the single-block finalize
    with a loud error if a high-cardinality column sneaks in.

    Output: (x, y, n, pmi, contrib) where pmi = ln(n*N/(nx*ny)) and
    contrib = (n/N)*pmi, both rounded to 6 dp; sum(contrib) is the MI."""

    def _partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table({"x": batch[x_col], "y": batch[y_col]})
            .group_by(["x", "y"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["x", "y", "partial"])

    cells = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["x", "y"])
        .sum("partial")
        .repartition(1)
    )

    def _final(block: pa.Table) -> pa.Table:
        if block.num_rows > max_cells:
            raise RuntimeError(
                f"mutual_information: {block.num_rows} contingency cells "
                f"exceeds max_cells={max_cells} — the columns are not "
                "categorical; bin them first"
            )
        if block.num_rows == 0:
            return pa.table(
                {
                    x_col: pa.array([], block["x"].type),
                    y_col: pa.array([], block["y"].type),
                    "n": pa.array([], pa.int64()),
                    "pmi": pa.array([], pa.float64()),
                    "contrib": pa.array([], pa.float64()),
                }
            )
        n = block["sum(partial)"].to_numpy(zero_copy_only=False).astype(np.int64)
        xs = block["x"]
        ys = block["y"]
        gx = pa.table({"x": xs, "n": pa.array(n)}).group_by("x").aggregate([("n", "sum")])
        gy = pa.table({"y": ys, "n": pa.array(n)}).group_by("y").aggregate([("n", "sum")])
        ix = pc.index_in(xs, gx["x"]).to_numpy(zero_copy_only=False).astype(np.int64)
        iy = pc.index_in(ys, gy["y"]).to_numpy(zero_copy_only=False).astype(np.int64)
        nx = gx["n_sum"].to_numpy(zero_copy_only=False).astype(np.float64)[ix]
        ny = gy["n_sum"].to_numpy(zero_copy_only=False).astype(np.float64)[iy]
        N = float(n.sum())
        nf = n.astype(np.float64)
        pmi = np.log(nf * N / (nx * ny))
        contrib = (nf / N) * pmi
        return pa.table(
            {
                x_col: xs,
                y_col: ys,
                "n": pa.array(n),
                "pmi": pa.array(np.round(pmi, 6), pa.float64()),
                "contrib": pa.array(np.round(contrib, 6), pa.float64()),
            }
        )

    return cells.map_batches(_final, batch_format="pyarrow", batch_size=None)


def event_transitions(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
):
    """First-order Markov transition counts over per-key event streams:
    how often event type A is immediately followed by type B for the
    same key — the funnel/path-mining primitive (and the bigram model
    over user journeys).

    One shuffle co-locates each key's events (same partitioning
    assumption as sessionize/event_deltas: one key's events fit in one
    group); within the group a vectorized lexsort by (ts, id) and an
    Arrow slice-shift produce the adjacent pairs, which are PRE-COUNTED
    per group so only (prev, next, partial) rows — bounded by the
    |types|^2 contingency size, not the event count — enter the final
    tiny groupby.

    Output: (prev_type, next_type, n), one row per observed ordered
    pair."""

    def _g(group: pa.Table) -> pa.Table:
        us = _to_epoch_us(group[ts_col], ts_col).to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, us))
        types = group[type_col].take(pa.array(order))
        if len(types) < 2:
            return pa.table(
                {
                    "prev_type": pa.array([], types.type),
                    "next_type": pa.array([], types.type),
                    "partial": pa.array([], pa.int64()),
                }
            )
        pairs = pa.table(
            {"prev_type": types.slice(0, len(types) - 1), "next_type": types.slice(1)}
        )
        g = pairs.combine_chunks().group_by(["prev_type", "next_type"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["prev_type", "next_type", "partial"])

    counts = (
        ds.groupby(key_col)
        .map_groups(_g, batch_format="pyarrow")
        .groupby(["prev_type", "next_type"])
        .sum("partial")
    )

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "prev_type": batch["prev_type"],
                "next_type": batch["next_type"],
                "n": batch["sum(partial)"].cast(pa.int64()),
            }
        )

    return counts.map_batches(_final, batch_format="pyarrow")


def correlation_matrix(
    ds,
    cols: list[str],
    *,
    max_abs: int = 1 << 20,
):
    """Pairwise Pearson correlation over INTEGER-unit columns — the
    feature-association profile (quantity vs discount vs tax ...) a
    curation pipeline computes before weighting or stratifying.

    Exactness: one streaming map computes per-batch int64 moments
    (count, per-column sums, and the k x k product matrix V'V via one
    numpy matmul); blocks reduce to a single moment vector through
    ``Dataset.sum`` (no accumulation-order drift because every partial
    is an exact integer).  The O(k^2) correlations are then evaluated
    in doubles with the SAME expression tree as the SQL oracle and
    rounded to 6 dp; all intermediates stay below 2^53 for inputs
    within `max_abs` (guarded per batch with a loud error), so the
    doubles are exact.

    Output: (col_x, col_y, corr) for each unordered pair x < y (by
    position in `cols`)."""

    if len(cols) < 2:
        raise ValueError("correlation_matrix: need at least two columns")
    k = len(cols)
    s_names = [f"s{i}" for i in range(k)]
    q_names = [f"q{i}_{j}" for i in range(k) for j in range(i, k)]

    def _partial(batch: pa.Table) -> pa.Table:
        vs = []
        for c in cols:
            col = batch[c]
            if not pa.types.is_integer(col.type):
                raise TypeError(
                    f"correlation_matrix: {c!r} must be integer (exact "
                    f"moments); got {col.type} — scale to units upstream"
                )
            if col.null_count:
                raise TypeError(f"correlation_matrix: {c!r} has nulls")
            v = col.to_numpy(zero_copy_only=False).astype(np.int64)
            if len(v) and np.abs(v).max() >= max_abs:
                raise ValueError(
                    f"correlation_matrix: |{c}| >= {max_abs} would risk "
                    "int64/double overflow in the moment sums"
                )
            vs.append(v)
        V = np.stack(vs, axis=1) if vs[0].size else np.zeros((0, k), np.int64)
        Q = V.T @ V
        out = {"n": pa.array([batch.num_rows], pa.int64())}
        for i in range(k):
            out[s_names[i]] = pa.array([int(V[:, i].sum())], pa.int64())
        for i in range(k):
            for j in range(i, k):
                out[f"q{i}_{j}"] = pa.array([int(Q[i, j])], pa.int64())
        return pa.table(out)

    moments = ds.map_batches(_partial, batch_format="pyarrow").sum(
        ["n", *s_names, *q_names]
    )

    # post-hoc global overflow certificate: every true |moment| is
    # bounded by n_rows * max_abs^2, so if that bound fits in int64 the
    # Arrow sums above cannot have wrapped; n itself (a row count)
    # cannot overflow first
    n_rows = int(moments["sum(n)"])
    if n_rows * max_abs * max_abs >= (1 << 62):
        raise ValueError(
            f"correlation_matrix: {n_rows} rows x max_abs^2 ({max_abs}^2) "
            "exceeds the int64-safe moment bound — lower max_abs (and "
            "pre-scale the columns) for corpora this large"
        )
    n = float(moments["sum(n)"])
    S = [float(moments[f"sum(s{i})"]) for i in range(k)]
    Q = {
        (i, j): float(moments[f"sum(q{i}_{j})"])
        for i in range(k)
        for j in range(i, k)
    }
    xs, ys, cs = [], [], []
    for i in range(k):
        for j in range(i + 1, k):
            num = n * Q[(i, j)] - S[i] * S[j]
            den = math.sqrt((n * Q[(i, i)] - S[i] * S[i]) * (n * Q[(j, j)] - S[j] * S[j]))
            xs.append(cols[i])
            ys.append(cols[j])
            cs.append(round(num / den, 6) if den > 0 else None)
    return ray.data.from_arrow(
        pa.table(
            {
                "col_x": pa.array(xs, pa.string()),
                "col_y": pa.array(ys, pa.string()),
                "corr": pa.array(cs, pa.float64()),
            }
        )
    )


def ks_statistic(
    ds,
    *,
    group_col: str = "source",
    val_col: str = "n_chars",
    group_a: str,
    group_b: str,
    max_distinct: int = 5_000_000,
):
    """Two-sample Kolmogorov-Smirnov statistic between the value
    distributions of two groups — the distribution-drift test a
    curation pipeline runs between sources / snapshots before mixing.

    Exact, not sampled: one streaming map pre-counts (value, group)
    occurrences per batch, one groupby reduces to the DISTINCT-VALUE
    contingency (the same move as global_quantiles — the shuffle moves
    #distinct rows, never #input rows), and a single-block finalize
    sorts the values and takes max |ECDF_a - ECDF_b| over the exact
    integer cumulative counts.  `max_distinct` guards the finalize
    block with a loud error for continuous-valued columns (bin first).

    Output: one row (group_a, group_b, n_a, n_b, ks), ks rounded to
    6 dp with the division/abs expression shared with the SQL oracle."""

    def _partial(batch: pa.Table) -> pa.Table:
        col = batch[val_col]
        if not pa.types.is_integer(col.type):
            raise TypeError(
                f"ks_statistic: {val_col!r} must be integer-valued; got "
                f"{col.type} — bin or scale to units upstream"
            )
        g = batch[group_col]
        in_a = pc.equal(g, group_a)
        in_b = pc.equal(g, group_b)
        keep = pc.or_kleene(in_a, in_b)
        t = pa.table(
            {
                "v": col,
                "ca": pc.cast(in_a, pa.int64()),
                "cb": pc.cast(in_b, pa.int64()),
            }
        ).filter(keep)
        agg = t.group_by("v").aggregate([("ca", "sum"), ("cb", "sum")])
        return agg.rename_columns(["v", "ca", "cb"])

    counts = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("v")
        .sum(["ca", "cb"])
        .repartition(1)
    )

    def _final(block: pa.Table) -> pa.Table:
        if block.num_rows > max_distinct:
            raise RuntimeError(
                f"ks_statistic: {block.num_rows} distinct values exceeds "
                f"max_distinct={max_distinct} — bin the column first"
            )
        out_schema = {
            "group_a": pa.string(),
            "group_b": pa.string(),
            "n_a": pa.int64(),
            "n_b": pa.int64(),
            "ks": pa.float64(),
        }
        if block.num_rows == 0:
            return pa.table({k: pa.array([], t) for k, t in out_schema.items()})
        v = block["v"].to_numpy(zero_copy_only=False)
        ca = block["sum(ca)"].to_numpy(zero_copy_only=False).astype(np.int64)
        cb = block["sum(cb)"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(v, kind="stable")
        cum_a = np.cumsum(ca[order])
        cum_b = np.cumsum(cb[order])
        na, nb = int(cum_a[-1]), int(cum_b[-1])
        if na == 0 or nb == 0:
            raise ValueError(
                f"ks_statistic: group {'a' if na == 0 else 'b'} has no rows"
            )
        d = np.abs(cum_a.astype(np.float64) / float(na) - cum_b.astype(np.float64) / float(nb))
        return pa.table(
            {
                "group_a": pa.array([group_a], pa.string()),
                "group_b": pa.array([group_b], pa.string()),
                "n_a": pa.array([na], pa.int64()),
                "n_b": pa.array([nb], pa.int64()),
                "ks": pa.array([round(float(d.max()), 6)], pa.float64()),
            }
        )

    return counts.map_batches(_final, batch_format="pyarrow", batch_size=None)


def diversity_by_key(
    ds,
    *,
    key_col: str = "source",
    cat_col: str = "lang",
    max_cells: int = 5_000_000,
):
    """Per-key diversity profile of a categorical column: Shannon
    entropy (nats), Simpson index (1 - sum p^2) and distinct count —
    the per-source language/topic balance screen a mixture designer
    reads before weighting.

    One (key, category) count shuffle (per-batch partials first); the
    finalize works over the contingency cells alone, grouped per key
    with vectorized segment sums — never the input rows.

    Exactness: float sums across cells are accumulation-ORDER-dependent,
    so neither side sums doubles.  Simpson comes from the exact integer
    sum of n_i^2; entropy uses ln(N) - sum(round(n_i*ln(n_i)*1e6))/1e6/N
    — the inner terms are scaled to int64 micro-units before the sum, so
    both engines add identical integers in any order; doubles appear
    only per cell and in the final O(#keys) expression (shared with the
    SQL oracle), rounded to 6 dp.

    Output: (<key_col>, n, n_distinct, entropy, simpson)."""

    def _partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table({"k": batch[key_col], "c": batch[cat_col]})
            .group_by(["k", "c"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["k", "c", "partial"])

    cells = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["k", "c"])
        .sum("partial")
        .repartition(1)
    )

    def _final(block: pa.Table) -> pa.Table:
        if block.num_rows > max_cells:
            raise RuntimeError(
                f"diversity_by_key: {block.num_rows} contingency cells "
                f"exceeds max_cells={max_cells} — the category column is "
                "not categorical; bin it first"
            )
        if block.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], block["k"].type),
                    "n": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                    "entropy": pa.array([], pa.float64()),
                    "simpson": pa.array([], pa.float64()),
                }
            )
        block = block.sort_by([("k", "ascending"), ("c", "ascending")])
        keys = block["k"]
        n = block["sum(partial)"].to_numpy(zero_copy_only=False).astype(np.int64)
        kn = keys.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, kn[1:] != kn[:-1]])
        totals = np.add.reduceat(n, starts)
        # per-KEY total bound: sum(n_i^2) <= total^2, so total < 3e9
        # certifies the int64 sums below (the entropy micro-unit sum is
        # bounded by total * ln(total) * 1e6 ~ 6.6e16, far safer)
        if int(totals.max()) >= 3_000_000_000:
            raise RuntimeError(
                "diversity_by_key: a key exceeds 3e9 rows — its sum of "
                "n^2 would overflow int64; shard the key upstream"
            )
        nf = n.astype(np.float64)
        # int64 micro-unit entropy terms: order-independent exact sums
        t_us = np.round(nf * np.log(nf) * 1e6).astype(np.int64)
        T = np.add.reduceat(t_us, starts)
        sq = np.add.reduceat(n * n, starts)
        Nf = totals.astype(np.float64)
        ent = np.log(Nf) - (T.astype(np.float64) / 1e6) / Nf
        simp = 1.0 - sq.astype(np.float64) / (Nf * Nf)
        n_dist = np.diff(np.r_[starts, len(n)]).astype(np.int64)
        return pa.table(
            {
                key_col: keys.take(pa.array(starts)),
                "n": pa.array(totals),
                "n_distinct": pa.array(n_dist),
                "entropy": pa.array(np.round(ent, 6), pa.float64()),
                "simpson": pa.array(np.round(simp, 6), pa.float64()),
            }
        )

    return cells.map_batches(_final, batch_format="pyarrow", batch_size=None)


def chi_squared(
    ds,
    x_col: str = "source",
    y_col: str = "lang",
    max_cells: int = 1_000_000,
):
    """Pearson chi-squared independence test between two CATEGORICAL
    columns — the significance-test companion to mutual_information
    (same one-contingency-shuffle plan).

    Exactness: cell terms (n - e)^2 / e are doubles from exact integer
    counts with the expression tree shared with the SQL oracle, then
    scaled to int64 micro-units BEFORE summation so both engines add
    identical integers in any order (no float accumulation drift).
    UNOBSERVED cells (n = 0) contribute their expected count e each;
    rather than materializing the full |X| x |Y| grid, the identity
    sum_all(e) = N turns that into N - sum_observed(e), accumulated in
    the same micro-units.

    Output: one row (chi2, dof, n_cells, n), chi2 rounded to 6 dp;
    n_cells counts OBSERVED cells."""

    def _partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table({"x": batch[x_col], "y": batch[y_col]})
            .group_by(["x", "y"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["x", "y", "partial"])

    cells = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["x", "y"])
        .sum("partial")
        .repartition(1)
    )

    def _final(block: pa.Table) -> pa.Table:
        if block.num_rows > max_cells:
            raise RuntimeError(
                f"chi_squared: {block.num_rows} contingency cells exceeds "
                f"max_cells={max_cells} — the columns are not categorical"
            )
        schema = {
            "chi2": pa.float64(),
            "dof": pa.int64(),
            "n_cells": pa.int64(),
            "n": pa.int64(),
        }
        if block.num_rows == 0:
            return pa.table({k: pa.array([], t) for k, t in schema.items()})
        n = block["sum(partial)"].to_numpy(zero_copy_only=False).astype(np.int64)
        xs, ys = block["x"], block["y"]
        gx = pa.table({"x": xs, "n": pa.array(n)}).group_by("x").aggregate([("n", "sum")])
        gy = pa.table({"y": ys, "n": pa.array(n)}).group_by("y").aggregate([("n", "sum")])
        ix = pc.index_in(xs, gx["x"]).to_numpy(zero_copy_only=False).astype(np.int64)
        iy = pc.index_in(ys, gy["y"]).to_numpy(zero_copy_only=False).astype(np.int64)
        nx = gx["n_sum"].to_numpy(zero_copy_only=False).astype(np.float64)[ix]
        ny = gy["n_sum"].to_numpy(zero_copy_only=False).astype(np.float64)[iy]
        N = float(n.sum())
        e = nx * ny / N
        term = (n.astype(np.float64) - e) ** 2 / e
        term_u = np.round(term * 1e6)
        e_u = np.round(e * 1e6)
        if term_u.sum() + N * 1e6 >= float(1 << 62):
            raise RuntimeError(
                "chi_squared: micro-unit term sum would overflow int64 — "
                "statistic too large for exact-sum mode"
            )
        # unobserved cells contribute sum(e) over the missing grid =
        # N - sum_observed(e), in the same exact micro-units
        chi2_u = (
            int(term_u.astype(np.int64).sum())
            + int(round(N)) * 1_000_000
            - int(e_u.astype(np.int64).sum())
        )
        chi2 = float(chi2_u) / 1e6
        dof = (len(gx) - 1) * (len(gy) - 1)
        return pa.table(
            {
                "chi2": pa.array([round(chi2, 6)], pa.float64()),
                "dof": pa.array([dof], pa.int64()),
                "n_cells": pa.array([block.num_rows], pa.int64()),
                "n": pa.array([int(n.sum())], pa.int64()),
            }
        )

    return cells.map_batches(_final, batch_format="pyarrow", batch_size=None)


def shipping_priority(
    customer,
    orders,
    lineitem,
    *,
    segment: str = "BUILDING",
    cutoff: str = "1998-07-01",
    k: int = 10,
):
    """TPC-H Q3 shape — the classic three-table top-k report: revenue of
    not-yet-shipped lineitems for orders of one market segment, top-k
    orders by revenue.

    Scale shape: the big fact table is reduced FIRST — lineitem is
    filtered on shipdate and partially aggregated to one (l_orderkey,
    rev_c2) row per order per batch before any exchange; the orders
    side is filtered on orderdate and semi-joined against the segment's
    customers (hash-partition semi join, no customer payload moves);
    the two order-level tables then meet in ONE hash_equi_join.  The
    top-k is a per-batch combiner (each batch keeps its k best) before
    a driver-size final sort of ≤ k·n_blocks rows.

    Exactness: revenue = Σ extendedprice·(1−discount) in cents×100
    integer units per row (the pricing_summary convention) — no float
    accumulation anywhere.  Ordering ties broken by (o_orderdate asc,
    l_orderkey asc) so the result is total-ordered.

    Output: (l_orderkey, revenue_c2, o_orderdate, o_orderpriority)."""
    cutoff_ts = np.datetime64(cutoff, "us")

    cust_keys = customer.filter(
        expr=f"c_mktsegment == '{segment}'"
    ).select_columns(["c_custkey"])

    def _ord_filter(batch: pa.Table) -> pa.Table:
        m = pc.less(batch["o_orderdate"], pa.scalar(cutoff_ts))
        return batch.filter(m)

    ord_f = orders.map_batches(_ord_filter, batch_format="pyarrow")
    ord_f = hash_semi_join(ord_f, cust_keys, on="o_custkey", right_on="c_custkey")

    def _li_partial(batch: pa.Table) -> pa.Table:
        m = pc.greater(batch["l_shipdate"], pa.scalar(cutoff_ts))
        b = batch.filter(m)
        p = _money_cents(b["l_extendedprice"])
        d = _money_cents(b["l_discount"])
        t = pa.table(
            {"l_orderkey": b["l_orderkey"], "r": pa.array(p * (100 - d))}
        )
        g = t.group_by("l_orderkey").aggregate([("r", "sum")])
        return g.rename_columns(["l_orderkey", "rev"])

    per_order = bucketed_group_agg(
        lineitem.map_batches(_li_partial, batch_format="pyarrow"),
        ["l_orderkey"], ["rev"],
    )
    joined = hash_equi_join(
        per_order,
        ord_f,
        on="l_orderkey",
        right_on="o_orderkey",
        left_cols=["l_orderkey", "sum(rev)"],
        right_cols=["o_orderdate", "o_orderpriority"],
    )

    def _topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        rev = batch["sum(rev)"].to_numpy(zero_copy_only=False)
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, od, -rev))[:k]
        return batch.take(pa.array(np.sort(order)))

    trimmed = joined.map_batches(_topk, batch_format="pyarrow")
    final = trimmed.sort(
        ["sum(rev)", "o_orderdate", "l_orderkey"], descending=[True, False, False]
    ).limit(k)

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "revenue_c2": batch["sum(rev)"].cast(pa.int64()),
                "o_orderdate": batch["o_orderdate"],
                "o_orderpriority": batch["o_orderpriority"],
            }
        )

    return final.map_batches(_final, batch_format="pyarrow")


def promo_revenue(
    lineitem,
    part,
    *,
    promo_type: str = "PROMO",
):
    """TPC-H Q14 shape — promotion revenue share per ship month: the
    fraction of discounted revenue attributable to parts of one type.

    Scale shape: lineitem is partially aggregated to (l_partkey, month,
    rev_c2) per batch BEFORE the exchange; the (partkey, month) partials
    then hash-join the part dimension for its type flag (large-large
    safe — no assumption that part fits in memory), and the final
    groupby(month) moves one row per distinct (partkey, month).

    Exactness: rev = Σ price·(100−discount) int64 cents×100; the ratio
    promo/total is one double division of exact sums, rounded to 1e-6.

    Output: (month, promo_c2, total_c2, promo_pct), month = 'YYYY-MM'."""

    def _li_partial(batch: pa.Table) -> pa.Table:
        p = _money_cents(batch["l_extendedprice"])
        d = _money_cents(batch["l_discount"])
        month = pc.strftime(batch["l_shipdate"], format="%Y-%m")
        t = pa.table(
            {
                "l_partkey": batch["l_partkey"],
                "month": month,
                "r": pa.array(p * (100 - d)),
            }
        )
        g = t.group_by(["l_partkey", "month"]).aggregate([("r", "sum")])
        return g.rename_columns(["l_partkey", "month", "rev"])

    per_pm = bucketed_group_agg(
        lineitem.map_batches(_li_partial, batch_format="pyarrow"),
        ["l_partkey", "month"], ["rev"],
    )
    with_type = hash_equi_join(
        per_pm,
        part,
        on="l_partkey",
        right_on="p_partkey",
        left_cols=["l_partkey", "month", "sum(rev)"],
        right_cols=["p_type"],
    )

    def _partial(batch: pa.Table) -> pa.Table:
        rev = batch["sum(rev)"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_promo = pc.equal(batch["p_type"], promo_type).to_numpy(
            zero_copy_only=False
        )
        t = pa.table(
            {
                "month": batch["month"],
                "p": pa.array(np.where(is_promo, rev, 0)),
                "t": pa.array(rev),
            }
        )
        g = t.group_by("month").aggregate([("p", "sum"), ("t", "sum")])
        return g.rename_columns(["month", "p", "t"])

    agg = (
        with_type.map_batches(_partial, batch_format="pyarrow")
        .groupby("month")
        .sum(["p", "t"])
    )

    def _final(batch: pa.Table) -> pa.Table:
        p = batch["sum(p)"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch["sum(t)"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "month": batch["month"],
                "promo_c2": pa.array(p),
                "total_c2": pa.array(t),
                "promo_pct": pa.array(
                    np.round(np.where(t > 0, 100.0 * p / np.maximum(t, 1), 0.0), 6)
                ),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def rollup_revenue(
    orders,
    customer,
    nation,
    *,
    max_nations: int = 5_000_000,
    max_cells: int = 5_000_000,
):
    """GROUPING SETS / ROLLUP aggregation — revenue at three levels in
    one pass: (nation, year), (nation, ALL), (ALL, ALL).

    Scale shape: ONE exchange computes the finest level — orders reduced
    per (o_custkey, year) per batch, custkey→nation via hash join +
    broadcast nation names, groupby (n_name, year).  The coarser levels
    are derived from the finest aggregate (|nations|·|years| rows — tiny
    by construction), collapsed in a single final task; max_cells guards
    the assumption loudly.  This is how a warehouse rollup should run on
    Ray Data: never re-scan the fact table per grouping set.

    Exactness: int64 cents.  ALL levels are encoded as the literal
    'ALL' (both grouping columns are strings) so the output needs no
    NULL-semantics agreement with SQL.

    Output: (n_name, o_year, revenue_cents, n_orders)."""

    def _fact(batch: pa.Table) -> pa.Table:
        cents = _money_cents(batch["o_totalprice"])
        year = pc.strftime(batch["o_orderdate"], format="%Y")
        t = pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "o_year": year,
                "c": pa.array(cents),
                "one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )
        g = t.group_by(["o_custkey", "o_year"]).aggregate(
            [("c", "sum"), ("one", "sum")]
        )
        return g.rename_columns(["o_custkey", "o_year", "c", "n"])

    per_cy = bucketed_group_agg(
        orders.map_batches(_fact, batch_format="pyarrow"),
        ["o_custkey", "o_year"], ["c", "n"],
    )
    cust_nat = hash_equi_join(
        per_cy,
        customer,
        on="o_custkey",
        right_on="c_custkey",
        left_cols=["o_custkey", "o_year", "sum(c)", "sum(n)"],
        right_cols=["c_nationkey"],
    )
    with_name = broadcast_join(
        cust_nat,
        nation,
        on="c_nationkey",
        small_on="n_nationkey",
        small_cols=["n_name"],
        max_small_rows=max_nations,
    )

    def _partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "n_name": batch["n_name"],
                "o_year": batch["o_year"],
                "c": batch["sum(c)"],
                "n": batch["sum(n)"],
            }
        )
        g = t.group_by(["n_name", "o_year"]).aggregate([("c", "sum"), ("n", "sum")])
        return g.rename_columns(["n_name", "o_year", "c", "n"])

    finest = (
        bucketed_group_agg(
            with_name.map_batches(_partial, batch_format="pyarrow"),
            ["n_name", "o_year"], ["c", "n"],
        )
        .repartition(1)
    )

    def _levels(batch: pa.Table) -> pa.Table:
        if batch.num_rows > max_cells:
            raise RuntimeError(
                f"rollup_revenue: {batch.num_rows} finest-level cells exceed "
                f"max_cells={max_cells} — the grouping keys are not low-card"
            )
        names = batch["n_name"]
        years = batch["o_year"]
        c = batch["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
        if batch.num_rows == 0:
            return pa.table(
                {
                    "n_name": pa.array([], pa.string()),
                    "o_year": pa.array([], pa.string()),
                    "revenue_cents": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                }
            )
        lvl1 = (
            pa.table({"n_name": names, "c": pa.array(c), "n": pa.array(n)})
            .group_by("n_name")
            .aggregate([("c", "sum"), ("n", "sum")])
        )
        parts = [
            pa.table(
                {
                    "n_name": names.combine_chunks() if isinstance(names, pa.ChunkedArray) else names,
                    "o_year": years.combine_chunks() if isinstance(years, pa.ChunkedArray) else years,
                    "revenue_cents": pa.array(c),
                    "n_orders": pa.array(n),
                }
            ),
            pa.table(
                {
                    "n_name": lvl1["n_name"],
                    "o_year": pa.array(["ALL"] * len(lvl1), pa.string()),
                    "revenue_cents": lvl1["c_sum"].cast(pa.int64()),
                    "n_orders": lvl1["n_sum"].cast(pa.int64()),
                }
            ),
            pa.table(
                {
                    "n_name": pa.array(["ALL"], pa.string()),
                    "o_year": pa.array(["ALL"], pa.string()),
                    "revenue_cents": pa.array([int(c.sum())], pa.int64()),
                    "n_orders": pa.array([int(n.sum())], pa.int64()),
                }
            ),
        ]
        return pa.concat_tables([p.cast(parts[0].schema) for p in parts])

    return finest.map_batches(_levels, batch_format="pyarrow", batch_size=None)


def gini_by_key(
    ds,
    key_col: str = "source",
    val_col: str = "n_chars",
    max_distinct_per_key: int = 5_000_000,
):
    """Exact per-key Gini coefficient of a non-negative integer value —
    the inequality profile of document lengths / token counts per
    source, a corpus-skew diagnostic (is one template dominating a
    crawl?).

    Same scale shape as median_by_key: ONE groupby shuffle of the
    distinct (key, value) histogram, then a per-key vectorized walk.
    Gini via the order-statistic identity G = (2·Σ i·x_(i) − (n+1)·Σx)
    / (n·Σx) with 1-based ranks i — computed from the histogram without
    expanding rows: a run of c equal values x starting after p rows
    contributes x·(c·p + c(c+1)/2) to Σ i·x, which is permutation-
    invariant within ties, so no tie-break agreement with SQL is
    needed.  Exactness: the numerator/denominator are emitted as int64
    (loud overflow guard at 2·n²·v_max ≥ 2^62); gini is one rounded
    double division.

    Output: (<key_col>, n, gini_num, gini_den, gini)."""

    counts = _per_key_value_counts(ds, key_col, val_col)

    def _gini(group: pa.Table) -> pa.Table:
        if group.num_rows > max_distinct_per_key:
            raise RuntimeError(
                f"gini_by_key: >{max_distinct_per_key} distinct values for "
                "one key — bin the value column first."
            )
        key = group[key_col][0]
        v = group["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = group["sum(partial)"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(v)
        v, c = v[order], c[order]
        n = int(c.sum())
        v_max = int(v[-1]) if len(v) else 0
        if v_max < 0 or int(v[0]) < 0:
            raise ValueError("gini_by_key: negative values are not defined")
        if 2 * n * n * max(v_max, 1) >= (1 << 62):
            raise RuntimeError(
                "gini_by_key: 2·n²·v_max would overflow int64 — exact mode "
                "needs a smaller key group or scaled-down values"
            )
        p = np.cumsum(c) - c  # rows strictly before each run
        six = int((v * (c * p + c * (c + 1) // 2)).sum())  # Σ i·x
        sx = int((v * c).sum())
        num = 2 * six - (n + 1) * sx
        den = n * sx
        return pa.table(
            {
                key_col: pa.array([key.as_py()], group[key_col].type),
                "n": pa.array([n], pa.int64()),
                "gini_num": pa.array([num], pa.int64()),
                "gini_den": pa.array([den], pa.int64()),
                "gini": pa.array(
                    [round(num / den, 6) if den else 0.0], pa.float64()
                ),
            }
        )

    return counts.groupby(key_col).map_groups(_gini, batch_format="pyarrow")


def spearman_by_key(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    max_group_rows: int = 30_000,
):
    """Per-key Spearman rank correlation between event time and value —
    "is this user's metric trending?", the rank-robust alternative to
    Pearson (exact under ties via average ranks, where the textbook
    1 − 6Σd²/… shortcut breaks).

    One groupby(key) shuffle (the sessionize partitioning assumption:
    one key's rows fit in one group).  Ranks are DOUBLED average ranks
    (2r is integer even for .5 average ranks), all five moment sums are
    exact int64 (n capped at 30k so n·Σuw < 2^62 — loud error above),
    and rho is the Pearson-on-ranks formula evaluated from those
    integers with the identical double ops the SQL oracle runs:
    (n·Suw − Su·Sw) / sqrt((n·Suu − Su²)·(n·Sww − Sw²)), rounded 1e-6.
    Zero-variance keys (all ts or all values tied) are dropped, not
    NaN-filled.

    Output: (<key_col>, n, rho)."""

    def _avg2_ranks(a: np.ndarray) -> np.ndarray:
        """Doubled average ranks: 2·rank_min + (tie_count − 1)."""
        order = np.argsort(a, kind="stable")
        s = a[order]
        starts = np.r_[0, np.nonzero(s[1:] != s[:-1])[0] + 1]
        run_of = np.cumsum(np.r_[0, (s[1:] != s[:-1]).astype(np.int64)])
        counts = np.r_[starts[1:], len(s)] - starts
        two_r = 2 * (starts + 1) + (counts - 1)  # per run
        out = np.empty(len(a), np.int64)
        out[order] = two_r[run_of]
        return out

    def _group(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], group[key_col].type),
                "n": pa.array([], pa.int64()),
                "rho": pa.array([], pa.float64()),
            }
        )
        n = group.num_rows
        if n > max_group_rows:
            raise RuntimeError(
                f"spearman_by_key: key group of {n} rows exceeds "
                f"{max_group_rows} — int64-exact moments would overflow; "
                "pre-aggregate per (key, coarser time bucket) first"
            )
        if n < 2:
            return empty
        ts = group[ts_col].to_numpy(zero_copy_only=False)
        ts_i = ts.astype("datetime64[us]").astype(np.int64)
        vals = group[val_col].to_numpy(zero_copy_only=False)
        u = _avg2_ranks(ts_i)
        w = _avg2_ranks(vals)
        su, sw = int(u.sum()), int(w.sum())
        suu = int((u * u).sum())
        sww = int((w * w).sum())
        suw = int((u * w).sum())
        a = n * suu - su * su
        b = n * sww - sw * sw
        if a == 0 or b == 0:
            return empty
        rho = (n * suw - su * sw) / math.sqrt(float(a) * float(b))
        return pa.table(
            {
                key_col: pa.array([group[key_col][0].as_py()], group[key_col].type),
                "n": pa.array([n], pa.int64()),
                "rho": pa.array([round(rho, 6)], pa.float64()),
            }
        )

    return ds.groupby(key_col).map_groups(_group, batch_format="pyarrow")


def max_concurrent_sessions(
    ds,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    n_buckets: int = 4096,
    max_bucket_points: int = 5_000_000,
):
    """Peak concurrency: the maximum number of sessions active at one
    instant, and the first instant it is reached — the capacity-planning
    query over an event log (sessions = gap-based, sessionize semantics,
    active on the CLOSED interval [start, end]).

    A global sweep line is inherently a prefix scan; done scalably with
    the token_budget_pack shape: (ts, ±1) boundary points are netted per
    distinct ts in one groupby shuffle, bucketed into uniform time
    ranges, and each bucket reduces ITSELF to three scalars (net total,
    internal running max, first ts achieving it) in one vectorized
    pass.  The driver combines only the n_buckets summaries: the peak
    is max over buckets of (entering offset + internal max), entering
    offsets being the exclusive prefix sum of bucket totals.  No stage
    ever sees more than one bucket's distinct timestamps
    (max_bucket_points guards the assumption loudly).

    Output: one row (peak_concurrency, peak_ts_us)."""
    sessions = sessionize(
        ds, gap_minutes=gap_minutes, user_col=user_col, ts_col=ts_col
    )

    def _points(batch: pa.Table) -> pa.Table:
        s = batch["start_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        e = batch["end_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "us": pa.array(np.concatenate([s, e + 1])),
                "d": pa.array(
                    np.concatenate(
                        [np.ones(len(s), np.int64), -np.ones(len(e), np.int64)]
                    )
                ),
            }
        )

    def _net_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("us").aggregate([("d", "sum")])
        return g.rename_columns(["us", "d"])

    net = (
        sessions.map_batches(_points, batch_format="pyarrow")
        .map_batches(_net_partial, batch_format="pyarrow")
        .groupby("us")
        .sum("d")
        .materialize()
    )
    from ray.data.aggregate import Max, Min

    lohi = net.aggregate(Min("us"), Max("us"))
    empty = pa.table(
        {
            "peak_concurrency": pa.array([], pa.int64()),
            "peak_ts_us": pa.array([], pa.int64()),
        }
    )
    if not lohi or lohi.get("min(us)") is None:
        import ray.data as _rd

        return _rd.from_arrow(empty)
    lo, hi = int(lohi["min(us)"]), int(lohi["max(us)"])
    width = max((hi - lo + n_buckets) // n_buckets, 1)

    def _bucketed(batch: pa.Table) -> pa.Table:
        us = batch["us"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array((us - lo) // width),
                "us": batch["us"],
                "d": batch["sum(d)"].cast(pa.int64()),
            }
        )

    def _summary(group: pa.Table) -> pa.Table:
        if group.num_rows > max_bucket_points:
            raise RuntimeError(
                "max_concurrent_sessions: one time bucket holds "
                f">{max_bucket_points} distinct timestamps; raise n_buckets"
            )
        us = group["us"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = group["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(us, kind="stable")
        us, d = us[order], d[order]
        run = np.cumsum(d)
        imax = int(np.argmax(run))
        return pa.table(
            {
                "bucket": pa.array([int(group["bucket"][0].as_py())], pa.int64()),
                "total": pa.array([int(run[-1])], pa.int64()),
                "bmax": pa.array([int(run[imax])], pa.int64()),
                "bmax_ts": pa.array([int(us[imax])], pa.int64()),
            }
        )

    summaries = (
        net.map_batches(_bucketed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_summary, batch_format="pyarrow")
        .sort("bucket")
        .take_all()  # n_buckets rows max — driver-size by construction
    )
    if not summaries:
        import ray.data as _rd

        return _rd.from_arrow(empty)
    offset = 0
    peak = None
    peak_ts = None
    for row in summaries:
        cand = offset + int(row["bmax"])
        if peak is None or cand > peak:
            peak, peak_ts = cand, int(row["bmax_ts"])
        offset += int(row["total"])
    import ray.data as _rd

    return _rd.from_arrow(
        pa.table(
            {
                "peak_concurrency": pa.array([peak], pa.int64()),
                "peak_ts_us": pa.array([peak_ts], pa.int64()),
            }
        )
    )
