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


CMS_SEEDS = tuple((0x9E3779B97F4A7C15 * (d + 1)) & 0xFFFFFFFFFFFFFFFF for d in range(8))

# Bloom hash seeds: a distinct family from CMS so the two sketches can
# coexist over the same keys without correlated collisions
BLOOM_SEEDS = tuple((0xC2B2AE3D27D4EB4F * (d + 1)) & 0xFFFFFFFFFFFFFFFF for d in range(8))


def bloom_filter_membership(
    build_ds,
    probe_ds,
    build_col: str,
    probe_col: str,
    n_bits: int = 1 << 16,
    k: int = 2,
    out_col: str = "maybe_member",
):
    """Bloom-filter membership (Bloom 1970) — the crawl-frontier /
    seen-URL-set primitive: build a fixed-size bit array over
    `build_ds[build_col]` (integer keys), broadcast it once, and flag
    every `probe_ds` row with whether its key MIGHT be in the build set
    (false positives possible at the textbook rate, never false
    negatives).  At 100 TB this replaces a full anti-join shuffle with a
    broadcast O(n_bits/8)-byte array when an approximate restrict is
    acceptable (e.g. "skip URLs we almost certainly crawled").

    Bit positions: pos_i(key) = fmix64(key ^ BLOOM_SEEDS[i]) % n_bits for
    i < k — deterministic, so (like HLL/CMS) the filter INCLUDING its
    false positives is a pure function of the build keys and fully
    SQL-reproducible.

    Scale shape: the build side emits ONE packed-uint64 partial bitmap
    row per batch (n_bits/8 bytes, constant in the data size); the driver
    ORs the streamed partials — driver work is O(n_blocks * n_bits/8),
    bounded by the FILTER size, never the corpus.  The probe side is a
    stateless vectorized map against the ray.put bitmap.

    Output: probe rows (all columns) + `out_col` (int64 0/1)."""
    import ray

    if n_bits % 64:
        raise ValueError("bloom_filter_membership: n_bits must be a multiple of 64")
    if k > len(BLOOM_SEEDS):
        raise ValueError(f"bloom_filter_membership: k > {len(BLOOM_SEEDS)}")
    from marginalia_ray.ops.dedup import _fmix64_vec

    seeds = np.array(BLOOM_SEEDS[:k], np.uint64)
    n_words = n_bits // 64

    def _positions(keys: np.ndarray) -> np.ndarray:
        """(len(keys), k) bit positions."""
        return (
            _fmix64_vec((keys[:, None].astype(np.uint64) ^ seeds[None, :]).reshape(-1))
            % np.uint64(n_bits)
        ).reshape(len(keys), k)

    def _partial_bitmap(batch: pa.Table) -> pa.Table:
        words = np.zeros(n_words, np.uint64)
        if batch.num_rows:
            pos = _positions(
                batch[build_col].to_numpy(zero_copy_only=False)
            ).reshape(-1)
            np.bitwise_or.at(
                words, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
        return pa.table({"bitmap": pa.array([words.tobytes()], pa.large_binary())})

    bitmap = np.zeros(n_words, np.uint64)
    for b in build_ds.map_batches(
        _partial_bitmap, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for row in b["bitmap"]:
            bitmap |= np.frombuffer(row.as_py(), np.uint64)
    bitmap_ref = ray.put(bitmap)

    def _probe(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        bm = ray.get(bitmap_ref)
        pos = _positions(batch[probe_col].to_numpy(zero_copy_only=False))
        hit = (
            (bm[(pos >> np.uint64(6)).astype(np.int64)]
             >> (pos & np.uint64(63))) & np.uint64(1)
        ).astype(bool)
        return batch.append_column(
            out_col, pa.array(hit.all(axis=1).astype(np.int64), pa.int64())
        )

    return probe_ds.map_batches(_probe, batch_format="pyarrow")


def cms_term_counts(
    ds,
    query_terms: list[str],
    width: int = 1024,
    depth: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over corpus token
    occurrences, queried for `query_terms`: estimate(t) = min over rows d
    of counter[d][bucket_d(t)], an overestimate within eN/width w.h.p.

    Row hashes: bucket_d(t) = fmix64(token_hash(t) ^ CMS_SEEDS[d]) % width
    — deterministic, so the whole sketch is a pure function of the corpus
    and (like HLL) fully SQL-reproducible; counter increments are
    order-independent sums, so the sketch merges exactly.

    Scale shape: per-batch partial counts shuffle at most depth * width
    rows per batch; the final counter table (depth * width rows — the
    sketch, not the data) is the only driver materialization.

    Output: (term, est_count) for each query term, as a pyarrow Table."""
    from marginalia_ray.ops.dedup import _fmix64_vec, _token_hash_arrow
    from marginalia_ray.ops.text_ops import explode_tokens

    if depth > len(CMS_SEEDS):
        raise ValueError(f"cms_term_counts: depth > {len(CMS_SEEDS)}")
    seeds = np.array(CMS_SEEDS[:depth], np.uint64)

    def _partial(batch: pa.Table) -> pa.Table:
        _, toks = explode_tokens(batch, text_col, id_col)
        h = _token_hash_arrow(toks)
        d_col, b_col = [], []
        for d in range(depth):
            b = (_fmix64_vec(h ^ seeds[d]) % np.uint64(width)).astype(np.int64)
            d_col.append(np.full(len(b), d, np.int64))
            b_col.append(b)
        t = pa.table(
            {
                "d": pa.array(np.concatenate(d_col) if d_col else np.zeros(0, np.int64)),
                "bucket": pa.array(np.concatenate(b_col) if b_col else np.zeros(0, np.int64)),
            }
        )
        g = t.group_by(["d", "bucket"]).aggregate([([], "count_all")])
        return g.rename_columns(["d", "bucket", "partial"])

    counters = np.zeros((depth, width), np.int64)
    for b in (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["d", "bucket"])
        .sum("partial")
        .iter_batches(batch_format="pyarrow")
    ):
        if b.num_rows:
            dd = b["d"].to_numpy(zero_copy_only=False)
            bb = b["bucket"].to_numpy(zero_copy_only=False)
            counters[dd, bb] = b["sum(partial)"].to_numpy(zero_copy_only=False)

    # query terms go through the same normalization as corpus tokens
    # (lowercase, alphanumeric-only): a term the tokenizer could never
    # emit has an exact count of 0 — hashing its raw form would instead
    # return an unrelated bucket's collision mass
    import re as _re

    norm = [t.lower() for t in query_terms]
    valid = [bool(_re.fullmatch("[a-z0-9]+", t)) for t in norm]
    qh = _token_hash_arrow(pa.array(norm, pa.string()))
    ests = []
    for i in range(len(query_terms)):
        if not valid[i]:
            ests.append(0)
            continue
        buckets = (_fmix64_vec(qh[i] ^ seeds) % np.uint64(width)).astype(np.int64)
        ests.append(int(counters[np.arange(depth), buckets].min()))
    return pa.table(
        {
            "term": pa.array(list(query_terms), pa.string()),
            "est_count": pa.array(ests, pa.int64()),
        }
    )


def heavy_hitters(
    ds,
    num: int = 1,
    den: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_candidates: int = 10_000_000,
    ngram: int = 1,
):
    """EXACT corpus-frequency heavy hitters — every token whose total
    count is >= (num/den) of all corpus tokens — found without ever
    shuffling the full vocabulary (Misra-Gries 1982 / Manku-Motwani
    lossy-counting shape: bounded candidate generation, exact confirm).

    Pass 1 (candidate generation): each batch computes its LOCAL heavy
    hitters (count_b * den >= num * tokens_b) with one in-batch pyarrow
    group_by.  By the averaging argument, any GLOBAL heavy hitter is a
    local one in at least one batch, so the union is a complete candidate
    superset — and each batch contributes at most den/num candidates, so
    the driver state is bounded by n_batches * den/num (capped loudly at
    `max_candidates`), never the vocabulary.  The same pass sums the
    global token count N from per-batch totals.

    Pass 2 (exact confirm): the candidate set is broadcast once
    (`ray.put`), each batch counts ONLY candidate occurrences, and one
    groupby(term) shuffle of those bounded partials yields exact global
    counts, filtered to cnt * den >= num * N.

    All threshold math is integer (num/den rational), so results are
    independent of batching and reproducible in SQL.  At 100 TB the
    vocabulary is billions of terms; this op's shuffle traffic is
    O(candidates), e.g. a few thousand rows per batch at den/num = 50.

    With ngram > 1 the counted unit is the space-joined n-gram of
    consecutive tokens (windows never cross documents) — frequent-phrase
    / boilerplate mining over the identical two-pass machinery; the
    averaging bound holds for any token-derived stream.

    Output: (term, cnt) with exact counts, only the heavy hitters.
    """
    import pyarrow.compute as pc
    import ray

    from marginalia_ray.ops.text_ops import explode_tokens

    if num <= 0 or den <= 0:
        raise ValueError("heavy_hitters: num and den must be positive")
    if ngram < 1:
        raise ValueError("heavy_hitters: ngram must be >= 1")

    def _stream(batch: pa.Table):
        """The counted unit stream: tokens, or space-joined n-grams."""
        if ngram == 1:
            return explode_tokens(batch, text_col, id_col)[1]
        from marginalia_ray.ops.text_ops import _flat_tokens_rows

        toks, rows = _flat_tokens_rows(batch, text_col)
        m = len(toks) - ngram + 1
        if m <= 0:
            return pa.array([], pa.large_string())
        valid = rows[:m] == rows[ngram - 1 :]
        slices = [toks.slice(k, m) for k in range(ngram)]
        grams = pc.binary_join_element_wise(
            *slices, pa.scalar(" ", pa.large_string())
        )
        return grams.filter(pa.array(valid))

    def _local_hh(batch: pa.Table) -> pa.Table:
        toks = _stream(batch)
        n_b = len(toks)
        if n_b == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "ntok": pa.array([], pa.int64())}
            )
        counts = (
            pa.table({"t": toks})
            .group_by("t")
            .aggregate([([], "count_all")])
            .rename_columns(["t", "c"])
        )
        c = counts["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = c * den >= num * n_b
        terms = counts["t"].filter(pa.array(keep)).cast(pa.string())
        # one sentinel row (null term) carries this batch's token total
        return pa.table(
            {
                "term": pa.concat_arrays([terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms, pa.array([None], pa.string())]),
                "ntok": pa.array([0] * len(terms) + [n_b], pa.int64()),
            }
        )

    n_total = 0
    cand: set[str] = set()
    for b in ds.map_batches(_local_hh, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if not b.num_rows:
            continue
        n_total += int(pc.sum(b["ntok"]).as_py() or 0)
        terms = b["term"].drop_null()
        cand.update(terms.to_pylist())
        if len(cand) > max_candidates:
            raise RuntimeError(
                f"heavy_hitters: >{max_candidates} candidates — raise the "
                "threshold (num/den) or max_candidates."
            )

    cand_ref = ray.put(pa.array(sorted(cand), pa.string()))

    def _count_cands(batch: pa.Table) -> pa.Table:
        toks = _stream(batch)
        vs = ray.get(cand_ref)
        if toks.type != vs.type:
            toks = pc.cast(toks, vs.type)
        hit = toks.filter(pc.is_in(toks, value_set=vs))
        part = pa.table({"term": hit}).group_by("term").aggregate([([], "count_all")])
        return part.rename_columns(["term", "partial"])

    summed = (
        ds.map_batches(_count_cands, batch_format="pyarrow")
        .groupby("term")
        .sum("partial")
    )

    def _finalize(batch: pa.Table) -> pa.Table:
        cnt = batch["sum(partial)"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = pa.array(cnt * den >= num * n_total)
        out = batch.filter(keep)
        return pa.table(
            {
                "term": out["term"].cast(pa.string()),
                "cnt": out["sum(partial)"].cast(pa.int64()),
            }
        )

    return summed.map_batches(_finalize, batch_format="pyarrow")


def approx_quantiles(
    ds,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    val_col: str = "n_chars",
    id_col: str = "doc_id",
    k: int = 2048,
    seed: int = 0,
):
    """Approximate global quantiles from a DETERMINISTIC bottom-k sample —
    the scale path where ``relational.global_quantiles``'s exact
    distinct-value histogram blows its cap (continuous values at corpus
    scale: #distinct ~ #rows, so the histogram shuffle IS the corpus).

    Sketch: u = fmix64(fmix64(id) ^ seed); the k rows with the smallest
    (u, id) are a uniform sample without replacement (bottom-k /
    KMV-style), EXACTLY mergeable — the global bottom-k is the bottom-k
    of any union of per-block bottom-k partials, so the result is
    independent of block layout and cluster size.  Quantile rank error
    is O(sqrt(q(1-q)/k)) with high probability (Vitter's reservoir
    bound); k=2048 gives ~1 percentile-point error.  When k >= n_rows
    the sample is the whole column and the result is exact.

    Shape: one streaming pass keeps a per-block bottom-k (np.partition,
    never a sort of the block); the O(k x #blocks) partial rows merge in
    one final task (the weighted_sample convention — add an intermediate
    bottom-k level when #blocks approaches k at full scale).  The value
    interpolation is SQL quantile_cont's: pos = (n-1)q, v = v_lo +
    (v_hi - v_lo) * frac, every term the same double expression tree as
    the DuckDB mirror.

    Output: (q, value) — value rounded to 6 dp, one row per requested q
    in ascending q order."""
    from marginalia_ray.ops.dedup import U64, _fmix64_vec

    if k <= 0:
        raise ValueError("approx_quantiles: k must be positive")
    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError("approx_quantiles: each q must be in [0, 1]")

    def _partial(batch: pa.Table) -> pa.Table:
        ids_arr = batch[id_col]
        if not pa.types.is_integer(ids_arr.type):
            raise TypeError(f"approx_quantiles: {id_col!r} must be integer")
        if ids_arr.null_count:
            raise TypeError(f"approx_quantiles: {id_col!r} has nulls")
        if batch[val_col].null_count:
            raise ValueError(f"approx_quantiles: {val_col!r} has nulls")
        ids = ids_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        u = _fmix64_vec(_fmix64_vec(ids.astype(U64)) ^ U64(seed))
        if len(u) > k:
            # bottom-k by (u, id), matching the final merge's tie-break:
            # duplicate ids hash to identical u, and an argpartition on u
            # alone would cut such ties arbitrarily at the k boundary,
            # breaking block-layout independence.  O(n) partition on u,
            # then an id-sort over only the boundary ties.
            part_idx = np.argpartition(u, k - 1)
            boundary = u[part_idx[k - 1]]
            below = np.flatnonzero(u < boundary)
            ties = np.flatnonzero(u == boundary)
            need = k - len(below)
            if len(ties) > need:
                ties = ties[np.argsort(ids[ties], kind="stable")[:need]]
            idx = np.concatenate([below, ties])
        else:
            idx = np.arange(len(u))
        return pa.table(
            {
                "u": pa.array(u[idx].view(np.int64)),
                "id": pa.array(ids[idx]),
                "v": pa.array(v[idx], pa.float64()),
            }
        )

    partials = ds.map_batches(_partial, batch_format="pyarrow").repartition(1)

    def _final(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table(
                {"q": pa.array([], pa.float64()), "value": pa.array([], pa.float64())}
            )
        u = block["u"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = block["id"].to_numpy(zero_copy_only=False)
        v = block["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, u))[:k]  # global bottom-k by (u, id)
        vals = np.sort(v[order])
        n = len(vals)
        out_q, out_v = [], []
        for q in sorted(qs):
            pos = (n - 1) * float(q)
            lo = int(np.floor(pos))
            hi = int(np.ceil(pos))
            frac = pos - lo
            val = vals[lo] + (vals[hi] - vals[lo]) * frac
            out_q.append(float(q))
            out_v.append(round(val, 6))
        return pa.table(
            {"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.float64())}
        )

    return partials.map_batches(_final, batch_format="pyarrow", batch_size=None)


def approx_quantiles_by_key(
    ds,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    key_col: str = "source",
    val_col: str = "n_chars",
    id_col: str = "doc_id",
    k: int = 256,
    seed: int = 0,
    n_buckets: int = 64,
):
    """Per-key approximate quantiles from a deterministic per-key
    bottom-k sample — the scale path where ``quantile_by_key``'s exact
    per-key distinct-value histogram blows up on continuous columns.

    Same sketch as approx_quantiles (u = fmix64(fmix64(id) ^ seed), the
    k smallest (u, id) rows PER KEY are a uniform per-key sample,
    mergeable / block-layout independent), but keyed: rows hash-bucket
    by key in ONE exchange, each partition co-locates every row of its
    keys, and sampling + SQL quantile_cont interpolation happen
    vectorized inside the partition (lexsort + segment arithmetic — no
    per-key Python calls).  The exchange moves (key, id, val, u) only —
    never payload columns.  Exact when a key has <= k rows.

    Output: (key, q, value) — value rounded to 6 dp, one row per
    (key, requested q)."""
    from marginalia_ray.ops.dedup import U64, _fmix64_vec, _token_hash_arrow

    if k <= 0:
        raise ValueError("approx_quantiles_by_key: k must be positive")
    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError("approx_quantiles_by_key: each q must be in [0, 1]")
    qs_sorted = sorted(float(q) for q in qs)

    def _hash_key(col) -> np.ndarray:
        if pa.types.is_integer(col.type):
            return _fmix64_vec(
                col.to_numpy(zero_copy_only=False).astype(U64)
            )
        return _token_hash_arrow(col)

    def _tag(batch: pa.Table) -> pa.Table:
        ids_arr = batch[id_col]
        if not pa.types.is_integer(ids_arr.type):
            raise TypeError(f"approx_quantiles_by_key: {id_col!r} must be integer")
        if ids_arr.null_count or batch[key_col].null_count:
            raise TypeError(
                f"approx_quantiles_by_key: nulls in {id_col!r}/{key_col!r}"
            )
        if batch[val_col].null_count:
            raise ValueError(f"approx_quantiles_by_key: {val_col!r} has nulls")
        ids = ids_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        u = _fmix64_vec(_fmix64_vec(ids.astype(U64)) ^ U64(seed))
        kc = batch[key_col]
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        pk = (_hash_key(kc) % U64(n_buckets)).view(np.int64)
        return pa.table(
            {
                "key": kc,
                "id": pa.array(ids),
                "v": pa.array(
                    batch[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
                ),
                "u": pa.array(u.view(np.int64)),
                "_pk": pa.array(pk),
            }
        )

    tagged = ds.map_batches(_tag, batch_format="pyarrow")

    def _np_key(col) -> np.ndarray:
        if pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
            return col.to_numpy(zero_copy_only=False)
        return np.asarray(col.to_pylist(), dtype=object)

    def _part(part: pa.Table) -> pa.Table:
        key_type = part.schema.field("key").type
        if part.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], key_type),
                    "q": pa.array([], pa.float64()),
                    "value": pa.array([], pa.float64()),
                }
            )
        kc = part["key"]
        keys = _np_key(kc.combine_chunks() if isinstance(kc, pa.ChunkedArray) else kc)
        ids = part["id"].to_numpy(zero_copy_only=False)
        v = part["v"].to_numpy(zero_copy_only=False)
        u = part["u"].to_numpy(zero_copy_only=False).view(np.uint64)
        # per-key bottom-k by (u, id): order (key, u, id), rank in segment
        order = np.lexsort((ids, u, keys))
        keys_s = keys[order]
        new_seg = np.r_[True, keys_s[1:] != keys_s[:-1]]
        starts = np.flatnonzero(new_seg)
        seg_id = np.cumsum(new_seg) - 1
        rank = np.arange(len(order)) - starts[seg_id]
        keep = rank < k
        kept_idx = order[keep]
        keys_k, v_k = keys[kept_idx], v[kept_idx]
        # per-key value sort for interpolation
        o2 = np.lexsort((v_k, keys_k))
        keys_k, v_k = keys_k[o2], v_k[o2]
        new2 = np.r_[True, keys_k[1:] != keys_k[:-1]]
        s2 = np.flatnonzero(new2)
        m = np.diff(np.r_[s2, len(keys_k)])  # sample size per key
        out_key, out_q, out_v = [], [], []
        for q in qs_sorted:
            pos = (m - 1) * q
            lo = np.floor(pos).astype(np.int64)
            hi = np.ceil(pos).astype(np.int64)
            frac = pos - lo
            vlo = v_k[s2 + lo]
            vhi = v_k[s2 + hi]
            out_key.append(keys_k[s2])
            out_q.append(np.full(len(s2), q))
            out_v.append(np.round(vlo + (vhi - vlo) * frac, 6))
        return pa.table(
            {
                key_col: pa.array(np.concatenate(out_key).tolist(), key_type),
                "q": pa.array(np.concatenate(out_q), pa.float64()),
                "value": pa.array(np.concatenate(out_v), pa.float64()),
            }
        )

    return tagged.groupby("_pk").map_groups(_part, batch_format="pyarrow")
