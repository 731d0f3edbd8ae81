"""Corpus-curation operators for LLM training-data pipelines:
benchmark decontamination, token-budget sequence packing, percentile
length filtering, and global duplicate-sentence removal.

All four follow the repo's scale rules: vectorized Arrow kernels per
batch, partial aggregation before any shuffle, small sides broadcast via
ray.put with loud caps on every driver-side collection.  Public-knowledge
semantics only (the decontamination rule is the n-gram-overlap test of
Brown et al. 2020 appendix C / Gao et al. 2020; sentence dedup is the
NeMo-Curator-style hot-sentence removal; packing is the standard
token-budget binning used to build training shards).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from marginalia_ray.ops.text_ops import TOKEN_MATCH, explode_tokens


def _doc_grams(batch: pa.Table, n: int, text_col: str, id_col: str):
    """Distinct (doc_id, n-gram) pairs of a batch, vectorized: explode
    tokens, build grams from n shifted slices joined by ' ', mask windows
    that cross a document boundary, dedup within the batch."""
    ids, toks = explode_tokens(batch, text_col, id_col)
    m = len(toks)
    if m < n:
        return (
            pa.array([], batch[id_col].type),
            pa.array([], pa.string()),
        )
    k = m - n + 1
    parts = [toks.slice(i, k) for i in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    ids_np = ids.to_numpy(zero_copy_only=False)
    valid = pa.array(ids_np[:k] == ids_np[n - 1 :])
    pairs = (
        pa.table({"d": ids.slice(0, k).filter(valid), "g": grams.filter(valid)})
        .group_by(["d", "g"])
        .aggregate([])
    )
    return pairs["d"], pairs["g"]


def decontaminate(
    ds,
    bench_ds,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bench_grams: int = 20_000_000,
):
    """Benchmark decontamination (the n-gram overlap test used to scrub
    eval sets from training corpora, Brown et al. 2020 App. C): count,
    per corpus document, how many of its DISTINCT token n-grams appear in
    the benchmark set's n-grams.

    Output: (doc_id, n_hits, contaminated) for EVERY input doc, with
    contaminated = 1 iff n_hits > 0.

    Scale shape: the benchmark side (eval sets — MMLU-sized, not
    corpus-sized) is reduced to its distinct grams and broadcast once via
    ray.put; the corpus side is a single streaming map with a vectorized
    pc.is_in probe — no shuffle, no join.  A benchmark bigger than
    max_bench_grams fails loudly rather than silently OOMing the driver.

    Sibling of ops/text_ops.ngram_overlap, kept separate deliberately:
    that op is the same-table rolling-HASH variant (compact uint64
    broadcast, per-doc contamination FRACTION); this one takes an
    arbitrary benchmark Dataset and keeps exact gram STRINGS so the
    membership test (and hence the SQL oracle) is collision-free.  Pick
    ngram_overlap when the benchmark set is huge and a 2^-64 collision
    is acceptable; pick this for exact scrubbing decisions.
    """
    gram_parts = []
    total = 0
    for b in bench_ds.map_batches(
        lambda t: pa.table({"g": _doc_grams(t, n, text_col, id_col)[1]}),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            col = b["g"]
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            gram_parts.append(pc.unique(arr))
            total += len(gram_parts[-1])
            if total > max_bench_grams:
                raise RuntimeError(
                    f"decontaminate: benchmark produced >{max_bench_grams} "
                    "distinct grams — not a benchmark-sized side. Raise "
                    "max_bench_grams or shard the benchmark."
                )
    bench = (
        pc.unique(pa.concat_arrays([a.cast(pa.string()) for a in gram_parts]))
        if gram_parts
        else pa.array([], pa.string())
    )
    bench_ref = ray.put(bench)

    def _probe(batch: pa.Table) -> pa.Table:
        doc_ids = batch[id_col]
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        out_ids = doc_ids.to_numpy(zero_copy_only=False)
        hits = np.zeros(len(out_ids), np.int64)
        d, g = _doc_grams(batch, n, text_col, id_col)
        if len(d):
            hit_mask = pc.is_in(g, value_set=ray.get(bench_ref))
            d_np = d.to_numpy(zero_copy_only=False)[
                hit_mask.to_numpy(zero_copy_only=False)
            ]
            # map hit doc ids back to batch row order (ids unique per batch)
            order = np.argsort(out_ids, kind="stable")
            pos = order[np.searchsorted(out_ids[order], d_np)]
            np.add.at(hits, pos, 1)
        return pa.table(
            {
                id_col: doc_ids,
                "n_hits": pa.array(hits),
                "contaminated": pa.array((hits > 0).astype(np.int64)),
            }
        )

    return ds.map_batches(_probe, batch_format="pyarrow")


def token_budget_pack(
    ds,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    max_bucket_docs: int = 5_000_000,
):
    """Token-budget sequence packing: assign each document (in doc_id
    order) to the training shard ("bin") in which its running token total
    starts — bin = floor(tokens_before_me / budget), where tokens_before
    is the exact prefix sum over all docs with a smaller doc_id.

    A global ordered prefix sum, done scalably in two passes with no sort:
      1. project to the tiny (doc_id, n_tokens) table, partial-aggregate
         per-range-bucket token sums (doc_id space split uniformly into
         n_buckets), prefix-sum the n_buckets bucket totals on the driver
         and broadcast the per-bucket starting offsets;
      2. groupby(bucket).map_groups: order within the bucket, local
         cumsum + the bucket's broadcast offset.
    The partitioning assumption (documented, enforced by max_bucket_docs)
    is that one doc_id range bucket's (id, count) pairs fit in one task —
    at 100 TB pick n_buckets ~ corpus_docs / 1e6.

    Output: (doc_id, n_tokens, bin).
    """

    def _tok(batch: pa.Table) -> pa.Table:
        nt = pc.count_substring_regex(pc.utf8_lower(batch[text_col]), TOKEN_MATCH)
        return pa.table({id_col: batch[id_col], "n_tokens": pc.cast(nt, pa.int64())})

    from ray.data.aggregate import Max, Min

    tok = ds.map_batches(_tok, batch_format="pyarrow").materialize()
    lohi = tok.aggregate(Min(id_col), Max(id_col))
    if not lohi or lohi.get(f"min({id_col})") is None:  # empty input
        return tok.map_batches(
            lambda t: t.append_column("bin", pa.array([], pa.int64())),
            batch_format="pyarrow",
        )
    lo, hi = int(lohi[f"min({id_col})"]), int(lohi[f"max({id_col})"])
    span = max(hi - lo + 1, 1)
    width = max((span + n_buckets - 1) // n_buckets, 1)

    def _bucket_of(ids_np: np.ndarray) -> np.ndarray:
        return (ids_np - lo) // width

    def _partial(batch: pa.Table) -> pa.Table:
        ids_np = batch[id_col].to_numpy(zero_copy_only=False)
        nt = batch["n_tokens"].to_numpy(zero_copy_only=False)
        bk = _bucket_of(ids_np)
        t = pa.table({"bucket": pa.array(bk), "s": pa.array(nt)})
        g = t.group_by("bucket").aggregate([("s", "sum")])
        return g.rename_columns(["bucket", "partial"])

    sums = np.zeros(n_buckets + 1, np.int64)
    for b in (
        tok.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .sum("partial")
        .iter_batches(batch_format="pyarrow")
    ):
        if b.num_rows:
            bks = b["bucket"].to_numpy(zero_copy_only=False)
            sums[bks + 1] = b["sum(partial)"].to_numpy(zero_copy_only=False)
    offsets_ref = ray.put(np.cumsum(sums)[:-1])  # tokens before each bucket

    def _add_bucket(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("bucket", pa.array([], pa.int64()))
        bk = _bucket_of(batch[id_col].to_numpy(zero_copy_only=False))
        return batch.append_column("bucket", pa.array(bk.astype(np.int64)))

    def _pack_group(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], batch[id_col].type if id_col in batch.column_names else pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "bin": pa.array([], pa.int64()),
                }
            )
        if batch.num_rows > max_bucket_docs:
            raise RuntimeError(
                "token_budget_pack: a doc_id range bucket holds "
                f">{max_bucket_docs} docs; raise n_buckets."
            )
        ids_np = batch[id_col].to_numpy(zero_copy_only=False)
        nt = batch["n_tokens"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids_np, kind="stable")
        before = np.zeros(len(ids_np), np.int64)
        before[order] = np.r_[0, np.cumsum(nt[order])[:-1]]
        bucket = int(batch["bucket"][0].as_py())
        before += ray.get(offsets_ref)[bucket]
        return pa.table(
            {
                id_col: pa.array(ids_np),
                "n_tokens": pa.array(nt),
                "bin": pa.array(before // budget),
            }
        )

    return (
        tok.map_batches(_add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_pack_group, batch_format="pyarrow")
    )


def length_percentile(
    ds,
    col: str = "n_chars",
    id_col: str = "doc_id",
    lo: float = 0.05,
    hi: float = 0.95,
    max_distinct: int = 4_000_000,
):
    """Exact percentile-rank length filter: pct_rank(doc) =
    (#docs with a strictly smaller value) / (N - 1) — SQL's
    percent_rank() — and keep = 1 iff lo <= pct_rank <= hi.  The standard
    'trim the length-distribution tails' curation step, exact (not
    t-digest) so it is oracle-checkable.

    Scale shape: one partial-aggregated groupby(value).count — the
    distinct-value table (bounded: document lengths, capped loudly at
    max_distinct) comes to the driver as a sorted CDF and is broadcast;
    the assignment pass is a streaming searchsorted map.

    Output: (doc_id, <col>, pct_rank rounded to 6 dp, keep).
    """

    def _partial(batch: pa.Table) -> pa.Table:
        g = pa.table({"v": batch[col]}).group_by("v").aggregate([([], "count_all")])
        return g.rename_columns(["v", "partial"])

    vals_parts, cnt_parts, total_distinct = [], [], 0
    from marginalia_ray.ops.relational import bucketed_group_agg

    for b in (
        bucketed_group_agg(
            ds.map_batches(_partial, batch_format="pyarrow"), ["v"], ["partial"]
        )
        .iter_batches(batch_format="pyarrow")
    ):
        if b.num_rows:
            vals_parts.append(b["v"].to_numpy(zero_copy_only=False))
            cnt_parts.append(b["sum(partial)"].to_numpy(zero_copy_only=False))
            total_distinct += b.num_rows
            if total_distinct > max_distinct:
                raise RuntimeError(
                    f"length_percentile: >{max_distinct} distinct values in "
                    f"'{col}' — not a bounded-domain column; bin it first."
                )
    if not vals_parts:
        return ds.map_batches(
            lambda t: pa.table(
                {
                    id_col: t[id_col],
                    col: t[col],
                    "pct_rank": pa.array([] if t.num_rows == 0 else [0.0] * t.num_rows),
                    "keep": pa.array([] if t.num_rows == 0 else [1] * t.num_rows, pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    vals = np.concatenate(vals_parts)
    cnts = np.concatenate(cnt_parts)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    below = np.r_[0, np.cumsum(cnts)[:-1]].astype(np.float64)
    n_total = int(cnts.sum())
    denom = max(n_total - 1, 1)
    cdf_ref = ray.put((vals, below))

    def _assign(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        cv, cb = ray.get(cdf_ref)
        pct = np.round(cb[np.searchsorted(cv, v)] / denom, 6)
        keep = ((pct >= lo) & (pct <= hi)).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                col: batch[col],
                "pct_rank": pa.array(pct, pa.float64()),
                "keep": pa.array(keep),
            }
        )

    return ds.map_batches(_assign, batch_format="pyarrow")


def sentence_dedup(
    ds,
    max_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hot: int = 50_000_000,
):
    """Global duplicate-sentence removal (boilerplate scrubbing à la
    NeMo-Curator / RefinedWeb): a sentence ('.'-separated span, trimmed
    of spaces) that occurs in MORE THAN max_docs distinct documents is
    removed from every document; survivors are re-joined with '. ' in
    their original order.

    Scale shape: pass 1 counts distinct docs per sentence with per-batch
    partial aggregation (docs never span batches) and one groupby(sent)
    shuffle of partial rows; ONLY the hot sentences (count > max_docs —
    boilerplate-sized, capped loudly at max_hot) come to the driver and
    are broadcast; pass 2 is a streaming map that filters each doc's
    sentence list with a vectorized pc.is_in.

    Output: (doc_id, clean_text, n_kept, n_removed).
    """

    def _split(batch: pa.Table):
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        lists = pc.split_pattern(pc.cast(txt, pa.large_string()), ".")
        flat = pc.utf8_trim(pc.list_flatten(lists), " ")
        parents = pc.list_parent_indices(lists)
        return lists, flat, parents

    def _partial(batch: pa.Table) -> pa.Table:
        _, flat, parents = _split(batch)
        ids_col = batch[id_col]
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        ids = ids_col.take(parents)
        mask = pc.not_equal(flat, "")
        pairs = (
            pa.table({"d": ids.filter(mask), "sent": flat.filter(mask)})
            .group_by(["d", "sent"])
            .aggregate([])
        )
        part = pairs.group_by("sent").aggregate([("d", "count")])
        return part.rename_columns(["sent", "partial"])

    hot_parts = []
    n_hot = 0
    from marginalia_ray.ops.relational import bucketed_group_agg

    counts = bucketed_group_agg(
        ds.map_batches(_partial, batch_format="pyarrow"), ["sent"], ["partial"]
    )
    for b in counts.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            mask = pc.greater(b["sum(partial)"], max_docs)
            hot = b["sent"].filter(mask)
            hot = hot.combine_chunks() if isinstance(hot, pa.ChunkedArray) else hot
            if len(hot):
                hot_parts.append(hot.cast(pa.string()))
                n_hot += len(hot)
                if n_hot > max_hot:
                    raise RuntimeError(
                        f"sentence_dedup: >{max_hot} hot sentences — raise "
                        "max_docs or max_hot."
                    )
    hot_arr = (
        pa.concat_arrays(hot_parts) if hot_parts else pa.array([], pa.string())
    )
    hot_ref = ray.put(hot_arr)

    def _scrub(batch: pa.Table) -> pa.Table:
        from marginalia_ray.ops.text_ops import rejoin_kept

        _, flat, parents = _split(batch)
        n_rows = batch.num_rows
        nonempty = pc.not_equal(flat, "")
        is_hot = pc.is_in(flat, value_set=ray.get(hot_ref))
        keep = pc.and_(nonempty, pc.invert(is_hot))
        ne_np = nonempty.to_numpy(zero_copy_only=False)
        par = parents.to_numpy(zero_copy_only=False)
        n_sent = (
            np.bincount(par[ne_np], minlength=n_rows).astype(np.int64)
            if len(par)
            else np.zeros(n_rows, np.int64)
        )
        clean, n_kept = rejoin_kept(flat, keep, par, n_rows, ". ")
        return pa.table(
            {
                id_col: batch[id_col],
                "clean_text": clean,
                "n_kept": pa.array(n_kept),
                "n_removed": pa.array(n_sent - n_kept),
            }
        )

    return ds.map_batches(_scrub, batch_format="pyarrow")


def bigram_perplexity(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int = 2_000_000,
    max_bigrams: int = 20_000_000,
    keep_cols: list[str] | None = None,
):
    """Language-model quality scoring: train an add-one-smoothed bigram
    model on the corpus itself and score every document by its mean
    negative log-likelihood (the perplexity-filter step of CCNet /
    Wenzek et al. 2020, with the corpus standing in for the reference
    LM).  P(w2|w1) = (C(w1 w2) + 1) / (C(w1) + V).

    Output: (doc_id, n_bigrams, nll) — nll is the mean -ln P over the
    doc's adjacent-token pairs rounded to 6 dp (0.0 for docs with < 2
    tokens).

    Scale shape: unigram/bigram counts are built with per-batch partial
    aggregation and one groupby shuffle each; both tables come to the
    driver under loud caps (the broadcast-LM regime — correct while the
    model vocabulary is node-sized, which holds for the word-level LMs
    this mirrors; a corpus whose bigram table exceeds the cap needs the
    hash-partition-join variant instead) and are broadcast once.  Scoring
    is a single streaming map: pc.index_in against the vocab, integer
    bigram keys, np.searchsorted against the sorted count table."""

    def _uni_partial(batch: pa.Table) -> pa.Table:
        _, toks = explode_tokens(batch, text_col, id_col)
        g = pa.table({"w": toks}).group_by("w").aggregate([([], "count_all")])
        return g.rename_columns(["w", "partial"])

    def _bi_partial(batch: pa.Table) -> pa.Table:
        ids, toks = explode_tokens(batch, text_col, id_col)
        m = len(toks)
        if m < 2:
            return pa.table(
                {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
                 "partial": pa.array([], pa.int64())}
            )
        par = ids.to_numpy(zero_copy_only=False)
        adj = pa.array(par[:-1] == par[1:])
        t = pa.table(
            {"w1": toks.slice(0, m - 1).filter(adj), "w2": toks.slice(1, m - 1).filter(adj)}
        )
        g = t.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return g.rename_columns(["w1", "w2", "partial"])

    uni_w, uni_c, n_uni = [], [], 0
    from marginalia_ray.ops.relational import bucketed_group_agg

    for b in (
        bucketed_group_agg(
            ds.map_batches(_uni_partial, batch_format="pyarrow"), ["w"], ["partial"]
        )
        .iter_batches(batch_format="pyarrow")
    ):
        if b.num_rows:
            col = b["w"].combine_chunks() if isinstance(b["w"], pa.ChunkedArray) else b["w"]
            uni_w.append(col.cast(pa.string()))
            uni_c.append(b["sum(partial)"].to_numpy(zero_copy_only=False))
            n_uni += b.num_rows
            if n_uni > max_vocab:
                raise RuntimeError(
                    f"bigram_perplexity: vocabulary >{max_vocab}; use the "
                    "hash-partition-join variant or pre-filter terms."
                )
    extra = list(keep_cols or [])
    if not uni_w:
        return ds.map_batches(
            lambda t: pa.table(
                {
                    id_col: t[id_col],
                    "n_bigrams": pa.array([0] * t.num_rows, pa.int64()),
                    "nll": pa.array([0.0] * t.num_rows, pa.float64()),
                    **{c: t[c] for c in extra},
                }
            ),
            batch_format="pyarrow",
        )
    vocab = pa.concat_arrays(uni_w)
    counts = np.concatenate(uni_c).astype(np.int64)
    # canonical vocab order so term ids are deterministic
    order = pc.array_sort_indices(vocab).to_numpy(zero_copy_only=False)
    vocab = vocab.take(pa.array(order))
    counts = counts[order]
    V = len(counts)

    bi_keys_parts, bi_cnt_parts, n_bi = [], [], 0
    from marginalia_ray.ops.relational import bucketed_group_agg

    for b in (
        bucketed_group_agg(
            ds.map_batches(_bi_partial, batch_format="pyarrow"),
            ["w1", "w2"], ["partial"],
        )
        .iter_batches(batch_format="pyarrow")
    ):
        if b.num_rows:
            i1 = pc.index_in(b["w1"], value_set=vocab).to_numpy(zero_copy_only=False)
            i2 = pc.index_in(b["w2"], value_set=vocab).to_numpy(zero_copy_only=False)
            bi_keys_parts.append(i1.astype(np.int64) * V + i2.astype(np.int64))
            bi_cnt_parts.append(b["sum(partial)"].to_numpy(zero_copy_only=False))
            n_bi += b.num_rows
            if n_bi > max_bigrams:
                raise RuntimeError(
                    f"bigram_perplexity: bigram table >{max_bigrams}; use "
                    "the hash-partition-join variant."
                )
    bkeys = np.concatenate(bi_keys_parts) if bi_keys_parts else np.zeros(0, np.int64)
    bcnts = np.concatenate(bi_cnt_parts) if bi_cnt_parts else np.zeros(0, np.int64)
    bo = np.argsort(bkeys)
    lm_ref = ray.put((vocab, counts, bkeys[bo], bcnts[bo].astype(np.int64)))

    def _score(batch: pa.Table) -> pa.Table:
        voc, uc, bk, bc = ray.get(lm_ref)
        doc_ids = batch[id_col]
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        out_ids = doc_ids.to_numpy(zero_copy_only=False)
        n_big = np.zeros(len(out_ids), np.int64)
        nll = np.zeros(len(out_ids), np.float64)
        ids, toks = explode_tokens(batch, text_col, id_col)
        m = len(toks)
        if m >= 2:
            par = ids.to_numpy(zero_copy_only=False)
            tid = pc.index_in(toks, value_set=voc).to_numpy(zero_copy_only=False)
            tid = tid.astype(np.int64)
            adj = par[:-1] == par[1:]
            w1, w2, bpar = tid[:-1][adj], tid[1:][adj], par[:-1][adj]
            if len(w1):
                key = w1 * V + w2
                pos = np.searchsorted(bk, key)
                pos_c = np.minimum(pos, max(len(bk) - 1, 0))
                c2 = np.where(
                    (len(bk) > 0) & (bk[pos_c] == key), bc[pos_c], 0
                ).astype(np.float64)
                c1 = np.where(w1 >= 0, uc[np.maximum(w1, 0)], 0).astype(np.float64)
                nl = -np.log((c2 + 1.0) / (c1 + V))
                # map doc ids of bigrams back to batch row order
                order_b = np.argsort(out_ids, kind="stable")
                rowpos = order_b[np.searchsorted(out_ids[order_b], bpar)]
                np.add.at(nll, rowpos, nl)
                np.add.at(n_big, rowpos, 1)
        mean = np.round(np.where(n_big > 0, nll / np.maximum(n_big, 1), 0.0), 6)
        return pa.table(
            {
                id_col: doc_ids,
                "n_bigrams": pa.array(n_big),
                "nll": pa.array(mean, pa.float64()),
                **{c: batch[c] for c in extra},
            }
        )

    return ds.map_batches(_score, batch_format="pyarrow")


def stratified_sample_n(
    ds,
    key_col: str = "lang",
    n: int = 5,
    id_col: str = "doc_id",
):
    """Exact-n deterministic stratified sample: for every key, the n rows
    with the smallest (fmix64(id), id) — a stable pseudo-random choice
    that never changes across runs, re-shards or cluster sizes (the same
    guarantee as hash_split, per-stratum).

    Scale shape: per-batch combiner keeps at most n rows per key before
    the shuffle, so the groupby moves O(n_keys * n * n_batches) rows —
    never the corpus; the final per-key merge re-ranks the survivors.

    Output: (doc_id, <key_col>, rk) with rk in 1..n per key."""
    from marginalia_ray.ops.text_ops import _FMIX_SPLIT

    def _rank_within(keys: np.ndarray, h: np.ndarray, ids: np.ndarray):
        """rank of each row within its key by (h, id): 1-based."""
        order = np.lexsort((ids, h, keys))
        k_sorted = keys[order]
        starts = np.r_[True, k_sorted[1:] != k_sorted[:-1]]
        idx = np.arange(len(order), dtype=np.int64)
        rk_sorted = idx - np.maximum.accumulate(np.where(starts, idx, -1)) + 1
        rk = np.empty(len(order), np.int64)
        rk[order] = rk_sorted
        return rk

    def _combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # derive the empty schema from the input types so empty blocks
            # unify with non-empty ones (large_string keys, int32 ids, ...)
            return pa.table(
                {
                    id_col: pa.array([], batch[id_col].type),
                    key_col: pa.array([], batch[key_col].type),
                    "h": pa.array([], pa.uint64()),
                }
            )
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        h = _FMIX_SPLIT(ids.astype(np.uint64))
        keys_col = batch[key_col]
        if isinstance(keys_col, pa.ChunkedArray):
            keys_col = keys_col.combine_chunks()
        keys = keys_col.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        rk = _rank_within(keys.astype(np.int64), h, ids)
        keep = rk <= n
        return pa.table(
            {
                id_col: pa.array(ids[keep]),
                key_col: keys_col.filter(pa.array(keep)),
                "h": pa.array(h[keep], pa.uint64()),
            }
        )

    def _final(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        h = group["h"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))[:n]
        return pa.table(
            {
                id_col: pa.array(ids[order]),
                key_col: group[key_col].take(pa.array(order)),
                "rk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return (
        ds.map_batches(_combine, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(_final, batch_format="pyarrow")
    )


def group_quality_filter(
    ds,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_mean_quality: float = -4.0,
    max_groups: int = 50_000_000,
):
    """Group-level (domain/source-level) quality gate: drop EVERY document
    of a group whose mean quality score falls below `min_mean_quality` —
    the "bad domain" filter of RefinedWeb/FineWeb-style pipelines, where
    curation decisions are made per origin, not per page (one spammy page
    is noise; a spammy domain mean is signal).

    Quality is the repo's doc_quality score, ln(n_tokens / (1 + n_chars))
    (DocumentValuator.getQuality shape), computed inline so the op is one
    pass + one tiny aggregation:

      1. per-batch PARTIAL (group, sum_q_micro, n) rows — the shuffle
         moves one row per (batch, group), never the documents;
      2. the group sums (one row per group — domains, not docs; capped at
         `max_groups` with a loud error) are collected, the failing set is
         broadcast via ray.put;
      3. a streamed anti-filter drops rows of failing groups.

    Per-doc quality is quantized to INTEGER micro-units
    (round(q * 1e6), the 6-dp convention of doc_quality) before any
    summation, so the cross-partition aggregation is integer-exact and
    order-independent — the failing-group decision
    sum_q_micro < min_mean_quality * 1e6 * n is bit-identical to the SQL
    oracle's, with no float summation-order dependence.

    Output: surviving rows, all original columns."""
    from marginalia_ray.ops.text_ops import TOKEN_MATCH as _TM

    thresh_micro = int(round(min_mean_quality * 1_000_000))

    def _partial(batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(batch[text_col])
        n_tok = np.maximum(
            pc.count_substring_regex(lower, _TM).to_numpy(zero_copy_only=False), 1
        ).astype(np.float64)
        n_chars = (
            pc.utf8_length(batch[text_col]).to_numpy(zero_copy_only=False).astype(np.float64)
        )
        q_micro = np.round(np.log(n_tok / (1.0 + n_chars)) * 1e6).astype(np.int64)
        t = pa.table(
            {group_col: batch[group_col], "sum_q": pa.array(q_micro, pa.int64())}
        )
        g = t.group_by(group_col).aggregate([("sum_q", "sum"), ("sum_q", "count")])
        return g.rename_columns([group_col, "sum_q", "n"])

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(*_sum_aggs())
    )
    bad: list = []
    n_groups = 0
    for b in agg.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        n_groups += b.num_rows
        if n_groups > max_groups:
            raise RuntimeError(
                f"group_quality_filter: >{max_groups} distinct groups — "
                "the group-mean table no longer fits the driver; raise "
                "max_groups or aggregate at a coarser key."
            )
        sum_q = b["sum_q"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        fail = sum_q < thresh_micro * n
        if fail.any():
            bad.extend(b[group_col].filter(pa.array(fail)).to_pylist())
    if not bad:
        return ds
    bad_ref = ray.put(pa.array(sorted(set(bad))))

    def _anti(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        hit = pc.is_in(batch[group_col], value_set=ray.get(bad_ref))
        return batch.filter(pc.invert(hit))

    return ds.map_batches(_anti, batch_format="pyarrow")


def _sum_aggs():
    from ray.data.aggregate import Sum

    return [Sum("sum_q", alias_name="sum_q"), Sum("n", alias_name="n")]


def mixture_sample(
    ds,
    weights: dict[str, int],
    key_col: str = "lang",
    id_col: str = "doc_id",
    max_keys: int = 1_000_000,
):
    """Rebalance the corpus to an exact integer target mixture WITHOUT
    upsampling — the data-mixture step of Pile/DoReMi-style training
    pipelines (Gao et al. 2020 §2; Xie et al. 2023 use learned weights,
    the resampling mechanics are the same).  `weights` gives integer
    mixture parts per key, e.g. {"en": 2, "de": 1, "fr": 1} = half the
    output English.  The output takes, per weighted key, exactly
    w_k * T rows where T = min_k(count_k // w_k) — the largest corpus
    achievable at the requested ratio by downsampling only.  Keys not in
    `weights` are dropped.

    Row choice per key is the stratified_sample_n rule: the target_k rows
    with the smallest (fmix64(id), id) — deterministic across runs,
    re-shards and cluster sizes, and SQL-replicable (integer-only target
    arithmetic: `count // weight` has no float boundary to disagree on).

    Scale shape: pass 1 is a count-only aggregation (one row per key,
    capped at `max_keys`; mixtures are over a handful of named strata);
    pass 2 re-reads the input with a per-batch combiner that keeps at
    most target_k rows per key before the shuffle.  When a target is
    close to its key's full count the combiner cannot reduce (exact
    sampling degenerates to a per-key sort) — inherent to exact-n
    semantics; use sample_by_key for rate-based sampling at that end.

    Output: (doc_id, <key_col>, rk) with rk in 1..target_k per key."""
    from marginalia_ray.ops.text_ops import _FMIX_SPLIT

    active = {k: int(w) for k, w in weights.items() if int(w) > 0}
    counts: dict = {}
    n_keys = 0
    for b in ds.groupby(key_col).count().iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        n_keys += b.num_rows
        if n_keys > max_keys:
            raise RuntimeError(
                f"mixture_sample: >{max_keys} distinct keys — the per-key "
                "count table no longer fits the driver; mixture weights are "
                "meant for a small set of named strata."
            )
        for k, c in zip(b[key_col].to_pylist(), b["count()"].to_pylist()):
            counts[k] = c

    t_global = min((counts.get(k, 0) // w for k, w in active.items()), default=0)
    targets = {k: w * t_global for k, w in active.items()}

    def _empty(batch: pa.Table) -> pa.Table:
        # types derived from the input batch (the stratified_sample_n
        # convention) so empty blocks unify with non-empty ones — a
        # hardcoded string() key diverges on large_string inputs
        return pa.table(
            {
                id_col: batch[id_col].slice(0, 0),
                key_col: batch[key_col].slice(0, 0),
                "h": pa.array([], pa.uint64()),
            }
        )

    if t_global <= 0:
        sch = ds.schema()
        in_types = dict(zip(sch.names, sch.types))
        final_empty = pa.table(
            {
                id_col: pa.array([], in_types[id_col]),
                key_col: pa.array([], in_types[key_col]),
                "rk": pa.array([], pa.int64()),
            }
        )
        return ray.data.from_arrow(final_empty)

    def _combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(batch)
        keys_col = batch[key_col]
        if isinstance(keys_col, pa.ChunkedArray):
            keys_col = keys_col.combine_chunks()
        enc = keys_col.dictionary_encode()
        dict_vals = enc.dictionary.to_pylist()
        tgt_by_code = np.array([targets.get(v, 0) for v in dict_vals], np.int64)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        row_tgt = tgt_by_code[codes]
        sel = row_tgt > 0
        if not sel.any():
            return _empty(batch)
        ids = batch[id_col].to_numpy(zero_copy_only=False)[sel]
        codes = codes[sel]
        row_tgt = row_tgt[sel]
        h = _FMIX_SPLIT(ids.astype(np.uint64))
        # rank within key by (h, id), keep rank <= target_k
        order = np.lexsort((ids, h, codes))
        k_sorted = codes[order]
        starts = np.r_[True, k_sorted[1:] != k_sorted[:-1]]
        idx = np.arange(len(order), dtype=np.int64)
        rk_sorted = idx - np.maximum.accumulate(np.where(starts, idx, -1)) + 1
        rk = np.empty(len(order), np.int64)
        rk[order] = rk_sorted
        keep = rk <= row_tgt
        keys_kept = keys_col.filter(pa.array(sel)).filter(pa.array(keep))
        return pa.table(
            {
                id_col: pa.array(ids[keep]),
                key_col: keys_kept,
                "h": pa.array(h[keep], pa.uint64()),
            }
        )

    def _final(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            # derive types from the (typed, possibly empty) combine output
            return pa.table(
                {
                    id_col: group[id_col],
                    key_col: group[key_col],
                    "rk": pa.array([], pa.int64()),
                }
            )
        tgt = targets.get(group[key_col][0].as_py(), 0)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        h = group["h"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))[:tgt]
        return pa.table(
            {
                id_col: pa.array(ids[order]),
                key_col: group[key_col].take(pa.array(order)),
                "rk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return (
        ds.map_batches(_combine, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(_final, batch_format="pyarrow")
    )


def pmi_collocations(
    ds,
    min_count: int = 5,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    fast_path_rows: int = 2_000_000,
):
    """Bigram collocation mining by pointwise mutual information (Church &
    Hanks 1990): pmi(x,y) = ln( p(x,y) / (p(x)p(y)) ) with p(x,y) = c_xy/M
    over adjacent-token pairs and p(x) = c_x/N over tokens.  Returns the
    top-k bigrams with c_xy >= min_count as (w1, w2, c_xy, pmi) ordered by
    (pmi desc, w1, w2), pmi rounded to 6 dp.

    Scale shape (unlike bigram_perplexity, nothing is ever collected to
    the driver — the vocabulary never needs to fit anywhere):
      * ONE corpus-sized shuffle: each batch emits combined per-batch
        partial counts — unigram rows tagged w2='' and bigram rows — into
        a single groupby((w1,w2)).sum.
      * corpus totals N/M are a tiny per-block aggregate of the count
        table.
      * c_x / c_y attach to the (min_count-filtered) bigram rows via two
        hash_equi_join passes on the fmix64 token hash — the large-large
        join path; a 64-bit hash collision between two distinct vocabulary
        terms (probability ~V^2/2^65) would double-count one bigram's
        neighbour count.
    """
    from marginalia_ray.ops.dedup import _token_hash_arrow
    from marginalia_ray.ops.relational import hash_equi_join

    def _partial(batch: pa.Table) -> pa.Table:
        ids, toks = explode_tokens(batch, text_col, id_col)
        m = len(toks)
        empty = pa.table(
            {
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "partial": pa.array([], pa.int64()),
            }
        )
        if m == 0:
            return empty
        # unigram rows: w2 = '' (a real token can never be empty —
        # explode_tokens filters empties), built without a Python loop
        uni = pa.table(
            {"w1": toks, "w2": pc.utf8_slice_codeunits(toks, 0, 0)}
        )
        tabs = [uni]
        if m >= 2:
            par = ids.to_numpy(zero_copy_only=False)
            adj = pa.array(par[:-1] == par[1:])
            tabs.append(
                pa.table(
                    {
                        "w1": toks.slice(0, m - 1).filter(adj),
                        "w2": toks.slice(1, m - 1).filter(adj),
                    }
                )
            )
        g = (
            pa.concat_tables(tabs)
            .group_by(["w1", "w2"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["w1", "w2", "partial"])

    from marginalia_ray.ops.relational import bucketed_group_agg

    counts = (
        bucketed_group_agg(
            ds.map_batches(_partial, batch_format="pyarrow"),
            ["w1", "w2"], ["partial"],
        )
        .rename_columns({"sum(partial)": "c"})
        .materialize()  # vocab+bigram-table sized (<< corpus), read 4x below
    )

    def _tot(batch: pa.Table) -> pa.Table:
        isuni = pc.equal(batch["w2"], "")
        c = batch["c"]
        zero = pa.scalar(0, pa.int64())
        n = pc.sum(pc.if_else(isuni, c, zero)).as_py() or 0
        m = pc.sum(pc.if_else(isuni, zero, c)).as_py() or 0
        return pa.table({"n_part": [n], "m_part": [m]})

    tot = counts.map_batches(_tot, batch_format="pyarrow").sum(["n_part", "m_part"])
    n_tok = float(tot["sum(n_part)"] or 0.0)
    m_big = float(tot["sum(m_part)"] or 0.0)
    n_c, m_c = max(n_tok, 1.0), max(m_big, 1.0)

    # fast path: when the COUNT TABLE (vocab + bigram types, never the
    # corpus) is small, finish on the driver in one numpy pass — the
    # bounded-collect convention of bigram_perplexity.  The join path
    # below is the scale route for corpora whose bigram-type table
    # exceeds the bound.
    if counts.count() <= fast_path_rows:
        import ray.data as _rd

        batches = list(counts.iter_batches(batch_size=None, batch_format="pyarrow"))
        if not batches:  # zero tokens in the whole corpus
            batches = [
                pa.table(
                    {
                        "w1": pa.array([], pa.string()),
                        "w2": pa.array([], pa.string()),
                        "c": pa.array([], pa.int64()),
                    }
                )
            ]
        tbl = pa.concat_tables(batches)
        w1 = tbl["w1"].combine_chunks().cast(pa.string())
        w2 = tbl["w2"].combine_chunks().cast(pa.string())
        c = tbl["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        isuni = pc.equal(w2, "").to_numpy(zero_copy_only=False)
        uni_t = np.asarray(w1.filter(pa.array(isuni)))
        uni_c = c[isuni]
        uorder = np.argsort(uni_t)
        uni_t, uni_c = uni_t[uorder], uni_c[uorder]
        bsel = (~isuni) & (c >= min_count)
        b1 = np.asarray(w1.filter(pa.array(bsel)))
        b2 = np.asarray(w2.filter(pa.array(bsel)))
        c_xy = c[bsel].astype(np.float64)
        c_x = uni_c[np.searchsorted(uni_t, b1)].astype(np.float64)
        c_y = uni_c[np.searchsorted(uni_t, b2)].astype(np.float64)
        with np.errstate(divide="ignore"):
            pmi = np.round(np.log((c_xy * n_c * n_c) / (m_c * c_x * c_y)), 6)
        res = pa.table(
            {
                "w1": pa.array(b1, pa.string()),
                "w2": pa.array(b2, pa.string()),
                "c_xy": pa.array(c[bsel], pa.int64()),
                "pmi": pa.array(pmi, pa.float64()),
            }
        ).sort_by(
            [("pmi", "descending"), ("w1", "ascending"), ("w2", "ascending")]
        )
        return _rd.from_arrow(res.slice(0, k))

    def _uni_side(alias: str):
        def _f(batch: pa.Table) -> pa.Table:
            keep = pc.equal(batch["w2"], "")
            b = batch.filter(keep)
            h = _token_hash_arrow(b["w1"]).view(np.int64)
            return pa.table({"hu": pa.array(h), alias: b["c"]})

        return counts.map_batches(_f, batch_format="pyarrow")

    def _bi_side(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.not_equal(batch["w2"], ""),
            pc.greater_equal(batch["c"], min_count),
        )
        b = batch.filter(keep)
        h1 = _token_hash_arrow(b["w1"]).view(np.int64)
        h2 = _token_hash_arrow(b["w2"]).view(np.int64)
        return pa.table(
            {
                "h1": pa.array(h1),
                "h2": pa.array(h2),
                "w1": b["w1"],
                "w2": b["w2"],
                "c_xy": b["c"],
            }
        )

    bigrams = counts.map_batches(_bi_side, batch_format="pyarrow")
    j1 = hash_equi_join(
        bigrams,
        _uni_side("c_x"),
        on="h1",
        right_on="hu",
        left_cols=["h1", "h2", "w1", "w2", "c_xy"],
        right_cols=["c_x"],
        num_partitions=num_partitions,
    )
    j2 = hash_equi_join(
        j1,
        _uni_side("c_y"),
        on="h2",
        right_on="hu",
        left_cols=["h2", "w1", "w2", "c_xy", "c_x"],
        right_cols=["c_y"],
        num_partitions=num_partitions,
    )

    # same float association as the oracle SQL:
    # ln((c_xy * n * n) / ((m * c_x) * c_y))
    def _pmi(batch: pa.Table) -> pa.Table:
        c_xy = batch["c_xy"].to_numpy(zero_copy_only=False).astype(np.float64)
        c_x = batch["c_x"].to_numpy(zero_copy_only=False).astype(np.float64)
        c_y = batch["c_y"].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore"):
            pmi = np.round(np.log((c_xy * n_c * n_c) / (m_c * c_x * c_y)), 6)
        return pa.table(
            {
                "w1": batch["w1"],
                "w2": batch["w2"],
                "c_xy": batch["c_xy"],
                "pmi": pa.array(pmi, pa.float64()),
            }
        )

    return (
        j2.map_batches(_pmi, batch_format="pyarrow")
        .sort(["pmi", "w1", "w2"], descending=[True, False, False])
        .limit(k)
    )


_MD5_BUCKET_MEMO: dict = {}  # n_buckets -> {feature bytes: bucket}


def _md5_buckets(col, n_buckets: int) -> np.ndarray:
    """md5-prefix bucket per string: int(hexdigest[:15], 16) % n_buckets —
    the ('0x' || substr(md5(f), 1, 15))::UBIGINT % B chain DuckDB can
    reproduce.  Hashes the utf8 column's data buffer in place (offset
    slices), no per-row .as_py()."""
    import hashlib

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    arr = col if pa.types.is_large_string(col.type) else pc.cast(col, pa.large_string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + n + 1]
    buf = memoryview(arr.buffers()[2])
    md5 = hashlib.md5
    out = np.empty(n, dtype=np.int64)
    # Zipfian repeats dominate real text: memoize per feature bytes (the
    # _NPARTS convention — capped, process-global, pure function)
    memo = _MD5_BUCKET_MEMO.setdefault(n_buckets, {})
    mget = memo.get
    for i in range(n):
        key = bytes(buf[offs[i] : offs[i + 1]])
        v = mget(key)
        if v is None:
            d = md5(key).digest()
            v = (int.from_bytes(d[:8], "big") >> 4) % n_buckets
            if len(memo) > 2_000_000:
                memo.clear()
            memo[key] = v
        out[i] = v
    return out


def dsir_weights(
    raw_ds,
    target_ds,
    n_buckets: int = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): unigram+bigram features
    hashed into ``n_buckets``, add-one-smoothed bucket distributions for
    the target and raw corpora, and per-document importance
    ``logw = sum_feats [ln p_target(bucket) - ln q_raw(bucket)]`` —
    resample the raw corpus by logw to match the target distribution.

    Output over the RAW corpus: (doc_id, n_feats, logw); logw rounded
    half-up to 6 dp, 0.0 (n_feats 0) for token-less docs.

    Scale shape: both distributions are FIXED-SIZE (n_buckets) count
    vectors accumulated from per-batch partial bincounts — driver state
    is a hyperparameter-sized array, never data-sized; the log-ratio
    table broadcasts once via ray.put and scoring is a single streaming
    map over the raw corpus.  No shuffle anywhere.
    """
    import ray

    from marginalia_ray.ops.text_ops import explode_tokens

    def _feat_buckets(batch: pa.Table):
        """(doc_ids, buckets) for the batch's unigram+bigram features,
        grouped contiguously per document."""
        ids, toks = explode_tokens(batch, text_col, id_col)
        ub = _md5_buckets(toks, n_buckets)
        par = ids.to_numpy(zero_copy_only=False)
        m = len(par)
        if m >= 2:
            adj = pa.array(par[:-1] == par[1:])
            w1 = toks.slice(0, m - 1).filter(adj)
            w2 = toks.slice(1, m - 1).filter(adj)
            bigrams = pc.binary_join_element_wise(w1, w2, " ")
            bb = _md5_buckets(bigrams, n_buckets)
            bpar = par[:-1][par[:-1] == par[1:]]
        else:
            bb = np.zeros(0, dtype=np.int64)
            bpar = par[:0]
        return np.concatenate([par, bpar]), np.concatenate([ub, bb])

    def _partial_counts(batch: pa.Table) -> pa.Table:
        _, b = _feat_buckets(batch)
        c = np.bincount(b, minlength=n_buckets)
        nz = np.flatnonzero(c)
        return pa.table({"b": pa.array(nz), "partial": pa.array(c[nz])})

    def _accumulate(ds_) -> np.ndarray:
        acc = np.zeros(n_buckets, dtype=np.int64)
        for t in ds_.map_batches(_partial_counts, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            if t.num_rows:
                # np.add.at, NOT acc[idx] +=: iter_batches may coalesce
                # several partials into one batch, so a bucket can repeat
                # and fancy-index += would keep only the last occurrence
                np.add.at(
                    acc,
                    t["b"].to_numpy(zero_copy_only=False),
                    t["partial"].to_numpy(zero_copy_only=False),
                )
        return acc

    tc = _accumulate(target_ds)
    rc = _accumulate(raw_ds)
    T, R = int(tc.sum()), int(rc.sum())
    lr = np.log((tc + 1.0) / (T + n_buckets)) - np.log((rc + 1.0) / (R + n_buckets))
    lr_ref = ray.put(lr)

    def _score(batch: pa.Table) -> pa.Table:
        lrv = ray.get(lr_ref)
        doc_ids = batch[id_col]
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        out_n = np.zeros(batch.num_rows, dtype=np.int64)
        out_w = np.zeros(batch.num_rows, dtype=np.float64)
        par, b = _feat_buckets(batch)
        if len(par):
            # features arrive grouped per doc: run-length reduce
            starts = np.flatnonzero(np.r_[True, par[1:] != par[:-1]])
            run = np.zeros(len(par), dtype=np.int64)
            run[starts[1:]] = 1
            run = np.cumsum(run)
            sums = np.bincount(run, weights=lrv[b])
            cnts = np.bincount(run)
            run_doc = par[starts]
            # doc order in the batch == first-feature order, but map by id
            # to stay safe under empty-text gaps
            pos = {d: i for i, d in enumerate(doc_ids.to_numpy(zero_copy_only=False))}
            for rd, s, c in zip(run_doc, sums, cnts):
                i = pos[rd]
                out_n[i] += int(c)
                out_w[i] += s
        logw = np.floor(out_w * 1e6 + 0.5) / 1e6  # half-up, SQL floor(+0.5)
        return pa.table(
            {
                id_col: doc_ids,
                "n_feats": pa.array(out_n),
                "logw": pa.array(logw, pa.float64()),
            }
        )

    return raw_ds.map_batches(_score, batch_format="pyarrow")


def ccnet_buckets(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    key_col: str = "source",
    max_distinct_per_key: int = 5_000_000,
):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): score
    every document with the corpus-trained bigram LM
    (``bigram_perplexity``), then split each language/source partition
    into **head / middle / tail** thirds at the interpolated q33/q66
    nll boundaries — low nll (the LM finds the text predictable) is
    "head", the slice CCNet keeps for training.

    Output: (doc_id, <key_col>, n_bigrams, nll, bucket).

    Scale shape: the LM build/broadcast is bigram_perplexity's (caps
    documented there); the scored corpus is materialized ONCE (it is a
    4-column table, far smaller than the input) and consumed twice —
    a histogram shuffle of DISTINCT (key, nll) pairs for the per-key
    CDF walk (the quantile_by_key shape, both boundaries from one
    walk), then a single streaming label map against the broadcast
    boundary dict.  Nothing corpus-sized touches the driver."""
    from marginalia_ray.ops.relational import _per_key_value_counts

    scored = bigram_perplexity(
        ds, text_col=text_col, id_col=id_col, keep_cols=[key_col]
    ).materialize()

    def _interp(v, cum, n, q) -> float:
        pos = q * (n - 1)  # same double math as DuckDB quantile_cont
        lo_pos, hi_pos = int(np.floor(pos)), int(np.ceil(pos))
        lo_val = float(v[np.searchsorted(cum, lo_pos + 1)])
        hi_val = float(v[np.searchsorted(cum, hi_pos + 1)])
        return round(lo_val + (hi_val - lo_val) * (pos - lo_pos), 6)

    def _bounds(group: pa.Table) -> pa.Table:
        if group.num_rows > max_distinct_per_key:
            raise RuntimeError(
                f"ccnet_buckets: >{max_distinct_per_key} distinct nll "
                "values for one key — bin the value column first."
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
                "q33": pa.array([_interp(v, cum, n, 1.0 / 3.0)], pa.float64()),
                "q66": pa.array([_interp(v, cum, n, 2.0 / 3.0)], pa.float64()),
            }
        )

    bounds_tbl = (
        _per_key_value_counts(scored, key_col, "nll")
        .groupby(key_col)
        .map_groups(_bounds, batch_format="pyarrow")
        .to_pandas()  # one row per key — tiny by construction
    )
    bounds_ref = ray.put(
        {
            r[key_col]: (r["q33"], r["q66"])
            for r in bounds_tbl.to_dict("records")
        }
    )

    def _label(batch: pa.Table) -> pa.Table:
        bounds = ray.get(bounds_ref)
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        nll = batch["nll"].to_numpy(zero_copy_only=False)
        q33 = np.array([bounds[k][0] for k in keys], np.float64)
        q66 = np.array([bounds[k][1] for k in keys], np.float64)
        bucket = np.where(nll <= q33, "head", np.where(nll <= q66, "middle", "tail"))
        return pa.table(
            {
                id_col: batch[id_col],
                key_col: batch[key_col],
                "n_bigrams": batch["n_bigrams"],
                "nll": batch["nll"],
                "bucket": pa.array(bucket, pa.string()),
            }
        )

    return scored.map_batches(_label, batch_format="pyarrow")


def training_shuffle(ds, id_col: str = "doc_id", n_shards: int = 16, seed: int = 7):
    """Deterministic seeded global shuffle for training-data ordering:
    every row gets a (shard, pos) address from key = fmix64(fmix64(id) ^
    seed) — shard = key % n_shards, pos = rank of key within the shard.

    This is how a 100 TB corpus is shuffled for training WITHOUT
    random_shuffle's full materialized exchange: the key is a pure
    function of the id, so the mapping is reproducible across runs,
    restarts and cluster sizes (resumable: a re-run of one failed shard
    recomputes the identical order), and changing `seed` gives an
    independent epoch permutation.  One hash shuffle; the per-shard rank
    is a sort WITHIN each shard only — size n_shards so a shard fits a
    worker (corpus_rows / n_shards rows each; at real scale use
    thousands of shards, each one training file).

    Output: (id, shard, pos) with pos dense 0..shard_size-1."""
    from marginalia_ray.ops.dedup import _fmix64_vec

    if n_shards < 1:
        raise ValueError("training_shuffle: n_shards must be >= 1")

    def _key(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        key = _fmix64_vec(_fmix64_vec(ids) ^ np.uint64(seed))
        return pa.table(
            {
                id_col: batch[id_col],
                "_key": pa.array(key, pa.uint64()),
                "shard": pa.array((key % np.uint64(n_shards)).astype(np.int64)),
            }
        )

    keyed = ds.map_batches(_key, batch_format="pyarrow")

    def _rank(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            id_t = block[id_col].type if id_col in block.column_names else pa.int64()
            return pa.table(
                {
                    id_col: pa.array([], id_t),
                    "shard": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                }
            )
        block = block.sort_by([("_key", "ascending"), (id_col, "ascending")])
        return pa.table(
            {
                id_col: block[id_col],
                "shard": block["shard"],
                "pos": pa.array(np.arange(block.num_rows, dtype=np.int64)),
            }
        )

    return keyed.groupby("shard", num_partitions=min(n_shards, 64)).map_groups(
        _rank, batch_format="pyarrow"
    )


def weighted_sample(
    ds,
    *,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    k: int = 200,
    seed: int = 0,
):
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, the A-ES scheme): each row gets key = -ln(u)/w with a
    seeded per-id uniform u, and the k SMALLEST keys win — equivalent to
    sequential weighted draws, but embarrassingly parallel and exactly
    reproducible across runs/engines (u comes from fmix64, not an RNG).

    One streaming pass computes keys and keeps a per-block top-k; the
    O(k x #blocks) partials merge in a single final block — no shuffle
    of the corpus.  The key double is built from the same expression
    tree as the SQL oracle (uint64 -> double, +0.5, /2^64, ln), so both
    engines select the identical sample.

    Output: (<id_col>, weight, key), key rounded to 6 dp for display;
    selection and ordering use the exact double."""

    from marginalia_ray.ops.dedup import U64, _fmix64_vec

    if k <= 0:
        raise ValueError("weighted_sample: k must be positive")

    def _partial(batch: pa.Table) -> pa.Table:
        ids_arr = batch[id_col]
        if not pa.types.is_integer(ids_arr.type):
            raise TypeError(f"weighted_sample: {id_col!r} must be integer")
        if ids_arr.null_count:
            raise TypeError(f"weighted_sample: {id_col!r} has nulls")
        ids = ids_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        w_arr = batch[weight_col]
        if w_arr.null_count:
            raise ValueError(f"weighted_sample: {weight_col!r} has nulls")
        w = w_arr.to_numpy(zero_copy_only=False).astype(np.float64)
        # (w > 0).all() rejects NaN too — NaN compares False
        if len(w) and not (w > 0).all():
            raise ValueError("weighted_sample: weights must be strictly positive")
        x = _fmix64_vec(_fmix64_vec(ids.astype(U64)) ^ U64(seed))
        u = (x.astype(np.float64) + 0.5) / 18446744073709551616.0
        key = -np.log(u) / w
        if len(key) > k:
            idx = np.argpartition(key, k)[:k]
        else:
            idx = np.arange(len(key))
        take = pa.array(idx)
        return pa.table(
            {
                id_col: batch[id_col].take(take),
                "weight": pa.array(w[idx], pa.float64()),
                "_key": pa.array(key[idx], pa.float64()),
            }
        )

    partials = ds.map_batches(_partial, batch_format="pyarrow").repartition(1)

    def _final(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "weight": pa.array([], pa.float64()),
                    "key": pa.array([], pa.float64()),
                }
            )
        block = block.sort_by([("_key", "ascending"), (id_col, "ascending")])
        n = min(k, block.num_rows)
        return pa.table(
            {
                id_col: block[id_col].slice(0, n),
                "weight": block["weight"].slice(0, n),
                "key": pa.array(
                    np.round(
                        block["_key"].to_numpy(zero_copy_only=False)[:n], 6
                    ),
                    pa.float64(),
                ),
            }
        )

    return partials.map_batches(_final, batch_format="pyarrow", batch_size=None)
