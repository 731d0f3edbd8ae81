"""Text-analysis operators: tokenization, term statistics, quality scoring.

All per-batch kernels are vectorized pyarrow.compute / numpy — no Python
loop over rows in the hot path.  The "simple" tokenizer (lowercase, split
on non-alphanumeric) is deliberately SQL-replicable so every operator here
has a DuckDB oracle; the full Marginalia tokenizer lives in
marginalia_ray.stages.sentences.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

TOKEN_SPLIT = "[^a-z0-9]+"  # SQL: string_split_regex(lower(text), '[^a-z0-9]+')
TOKEN_MATCH = "[a-z0-9]+"

# fixed English-ish stopword list for ratio scoring (SQL-replicable)
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")


def explode_tokens(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"):
    """(id, token) arrays from a batch — zero-copy-ish Arrow kernels.

    Returns (ids, tokens) with empty tokens filtered out.
    """
    lower = pc.utf8_lower(batch[text_col])
    lists = pc.split_pattern_regex(lower, TOKEN_SPLIT)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    ids_col = batch[id_col]
    if isinstance(ids_col, pa.ChunkedArray):
        ids_col = ids_col.combine_chunks()
    ids = ids_col.take(parents)
    mask = pc.not_equal(flat, "")
    return ids.filter(mask), flat.filter(mask)


def _flat_tokens_rows(batch: pa.Table, text_col: str):
    """(flat_tokens, row_indices) for a batch — explode_tokens' kernels,
    but keyed by batch ROW index (contiguous runs, enabling vectorized
    per-row extents) instead of the doc-id column."""
    txt = batch[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    lists = pc.split_pattern_regex(
        pc.cast(pc.utf8_lower(txt), pa.large_string()), TOKEN_SPLIT
    )
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    mask = pc.not_equal(flat, "")
    mask_np = mask.to_numpy(zero_copy_only=False)
    return flat.filter(mask), parents[mask_np].astype(np.int64)


def token_count(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-doc token count: (doc_id, n_tokens).  One vectorized map, no
    shuffle (count of regex matches == count of non-empty split tokens)."""

    def _batch(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(pc.utf8_lower(batch[text_col]), TOKEN_MATCH)
        return pa.table({id_col: batch[id_col], "n_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(_batch, batch_format="pyarrow")


def term_doc_freq(ds, text_col: str = "text", id_col: str = "doc_id", min_df: int = 1):
    """Corpus document frequency per term (the reference's TermFrequencyDict
    extractor, SURVEY.md G9): distinct terms per doc -> groupby(term).count.

    Partial aggregation: each batch pre-deduplicates (doc, term) pairs and
    emits per-term partial counts (docs never span batches), so the global
    shuffle moves one row per (batch, term) instead of one per posting.
    """

    def _partial(batch: pa.Table) -> pa.Table:
        ids, toks = explode_tokens(batch, text_col, id_col)
        pairs = pa.table({"d": ids, "term": toks}).group_by(["d", "term"]).aggregate([])
        part = pairs.group_by("term").aggregate([("d", "count")])
        return part.rename_columns(["term", "partial"])

    from .relational import bucketed_group_agg

    out = bucketed_group_agg(
        ds.map_batches(_partial, batch_format="pyarrow"), ["term"], ["partial"]
    )
    out = out.rename_columns({"sum(partial)": "doc_freq"})
    if min_df > 1:
        out = out.filter(expr=f"doc_freq >= {min_df}")
    return out


def stopword_ratio(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-doc stopword ratio (quality / language-confidence signal):
    (doc_id, n_tokens, stop_ratio rounded to 6 dp)."""
    stop_re = r"\b(" + "|".join(STOPWORDS) + r")\b"

    def _batch(batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(batch[text_col])
        n = pc.cast(pc.count_substring_regex(lower, TOKEN_MATCH), pa.int64())
        n_stop = pc.cast(pc.count_substring_regex(lower, stop_re), pa.float64())
        denom = pc.max_element_wise(n, pa.scalar(1, pa.int64()))
        ratio = pc.round(pc.divide(n_stop, pc.cast(denom, pa.float64())), ndigits=6)
        return pa.table({id_col: batch[id_col], "n_tokens": n, "stop_ratio": ratio})

    return ds.map_batches(_batch, batch_format="pyarrow")


# fixed per-language stopword lists (public common-word lists) for the
# n-gram-free language-ID heuristic: vote by distinct stopword hits
LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "it", "that", "for", "was"),
    "es": ("el", "la", "de", "que", "los", "las", "una", "por", "con", "para"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "pour", "qui", "pas"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "den", "von"),
    "zh": ("de", "shi", "le", "zai", "you", "wo", "ta", "men", "zhe", "bu"),
}


def _langid_pred(batch: pa.Table, text_col: str):
    """Shared per-batch language predictor: stopword-list voting over the
    fixed LANG_STOPWORDS profiles.  Returns (pred object-ndarray,
    confidence float64-ndarray); one count_substring_regex per language."""
    langs = sorted(LANG_STOPWORDS)
    lower = pc.utf8_lower(batch[text_col])
    n_tok = np.maximum(
        pc.count_substring_regex(lower, TOKEN_MATCH).to_numpy(zero_copy_only=False), 1
    ).astype(np.float64)
    scores = np.stack(
        [
            pc.count_substring_regex(
                lower, r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"
            )
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            for lang in langs
        ]
    )  # (n_langs, n_docs)
    best = scores.argmax(axis=0)
    conf = np.round(scores[best, np.arange(scores.shape[1])] / n_tok, 6)
    pred = np.where(conf > 0, np.asarray(langs, dtype=object)[best], "und")
    return pred, conf


def lang_id(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Heuristic language ID: per-doc stopword-list voting over the fixed
    LANG_STOPWORDS profiles -> (doc_id, pred_lang, confidence)."""

    def _batch(batch: pa.Table) -> pa.Table:
        pred, conf = _langid_pred(batch, text_col)
        return pa.table(
            {
                id_col: batch[id_col],
                "pred_lang": pa.array(pred.tolist(), pa.string()),
                "confidence": pa.array(conf, pa.float64()),
            }
        )

    return ds.map_batches(_batch, batch_format="pyarrow")


def langid_confusion(ds, label_col: str = "lang", text_col: str = "text"):
    """Language-ID evaluation cross-tab: count docs per (labelled lang,
    predicted lang) — the confusion matrix a curation pipeline reports
    before trusting a classifier to filter a crawl.  Output: (lang,
    pred_lang, n).

    Prediction and label live in the same batch, so there is NO join:
    per-batch partial (label, pred) counts, then one groupby shuffle of
    distinct (label, pred) pairs — at most |langs|^2 rows per batch."""

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    label_col: batch[label_col],
                    "pred_lang": pa.array([], pa.string()),
                    "partial": pa.array([], pa.int64()),
                }
            )
        pred, _ = _langid_pred(batch, text_col)
        t = pa.table(
            {
                label_col: batch[label_col],
                "pred_lang": pa.array(pred.tolist(), pa.string()),
            }
        )
        g = t.group_by([label_col, "pred_lang"]).aggregate([([], "count_all")])
        return g.rename_columns([label_col, "pred_lang", "partial"])

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby([label_col, "pred_lang"])
        .sum("partial")
    )

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                label_col: batch[label_col],
                "pred_lang": batch["pred_lang"],
                "n": batch["sum(partial)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


# Fingerprint arithmetic is mod 2^32 so a SQL oracle can replicate it with
# 128-bit (HUGEINT) intermediates: token value = polynomial in the token's
# bytes (base 31), window hash = polynomial in the window's token values
# (base 1000003), fingerprint = min over all 8-token windows (winnowing).
_FP_MOD = np.uint64(1 << 32)
_FP_MASK = np.uint64((1 << 32) - 1)
_FP_TOKEN_BASE = 31
_FP_TOKEN_BASE_INV = pow(_FP_TOKEN_BASE, -1, 1 << 32)
_FP_WIN_BASE = np.uint64(1000003)
_FP_WINDOW = 8  # tokens per rolling window


def _token_value_mod32(tokens) -> np.ndarray:
    """val(t) = sum(byte_i * 31^(L-1-i)) mod 2^32, vectorized over the
    Arrow buffers via one prefix sum (mod 2^32 factors through the native
    uint64 wrap-around; 31 is odd, so 31^-1 mod 2^32 exists)."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    arr = tokens if pa.types.is_large_string(tokens.type) else pc.cast(tokens, pa.large_string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + n + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    start, end = off[:-1], off[1:]
    m = int(off[-1])
    B = np.uint64(_FP_TOKEN_BASE)
    BI = np.uint64(_FP_TOKEN_BASE_INV)
    pw = np.empty(m + 1, dtype=np.uint64)
    pw[0] = np.uint64(1)
    if m:
        np.cumprod(np.full(m, B, dtype=np.uint64), out=pw[1:])
    pinv = np.empty(m, dtype=np.uint64)
    if m:
        pinv[0] = np.uint64(1)
        if m > 1:
            np.cumprod(np.full(m - 1, BI, dtype=np.uint64), out=pinv[1:])
    S = np.zeros(m + 1, dtype=np.uint64)
    if m:
        np.cumsum(data[:m].astype(np.uint64) * pinv, out=S[1:])
    v = (S[end] - S[start]) * pw[np.maximum(end, 1) - 1]
    return v & _FP_MASK


def fingerprint(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Document fingerprint via rolling (Rabin-Karp-style) hash: the MIN of
    the polynomial window hashes over all 8-token windows — a winnowing-
    style content fingerprint robust to local edits.  (doc_id, fingerprint).
    Docs shorter than one window fold all tokens into a single polynomial.
    Arithmetic is mod 2^32 end to end (SQL-oracle replicable)."""

    def _batch(batch: pa.Table) -> pa.Table:
        # one batch-vectorized window-hash pass (shared with ngram_overlap /
        # exact_substring_pairs — the hashing contract lives in ONE kernel),
        # then a per-doc min-reduce over the (doc, window-hash) rows
        ids_np, grams = _window_hashes_batch(batch, text_col, id_col)
        if len(ids_np) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "fingerprint": pa.array([], pa.int64()),
                }
            )
        order = np.argsort(ids_np, kind="stable")
        sid, sg = ids_np[order], grams[order]
        starts = np.r_[True, sid[1:] != sid[:-1]]
        fp = np.minimum.reduceat(sg, np.flatnonzero(starts))
        return pa.table(
            {
                id_col: pa.array(sid[starts], pa.int64()),
                # values are < 2^32: int64 keeps the oracle comparison
                # type-uniform with DuckDB BIGINT
                "fingerprint": pa.array(fp.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(_batch, batch_format="pyarrow")


def _window_hashes_batch(
    batch: pa.Table,
    text_col: str,
    id_col: str,
    window: int = _FP_WINDOW,
    include_short: bool = True,
    bits64: bool = False,
):
    """Per-doc `window`-token window hashes (same base/mod arithmetic as
    `fingerprint`), vectorized ACROSS the batch: windows are computed over
    the concatenated token-value array and windows that span a document
    boundary are masked out.  With include_short, docs shorter than one
    window contribute their single folded polynomial (the `fingerprint`
    short-doc rule); otherwise they are dropped (the exact-substring-pairs
    rule, matching a SQL oracle's `len(tokens) >= window` guard).

    bits64 widens the window hash from mod 2^32 to mod 2^64 (natural
    uint64 wraparound) — needed when window hashes are compared ACROSS
    documents (pair emission): at ~10^6 distinct windows the 32-bit
    birthday term is O(100) spurious matches, while 2^64 keeps it ~1e-8.

    Returns (doc_ids, grams) as parallel int64/uint64 arrays — one row per
    (doc, window), NOT yet deduplicated."""
    ids, toks = explode_tokens(batch, text_col, id_col)
    ids_np = ids.to_numpy(zero_copy_only=False).astype(np.int64)
    th = _token_value_mod32(toks)
    n = len(th)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    W = window
    mask = np.uint64(0xFFFF_FFFF_FFFF_FFFF) if bits64 else _FP_MASK
    powers = np.empty(W, dtype=np.uint64)
    powers[0] = 1
    for k in range(1, W):
        powers[k] = (powers[k - 1] * _FP_WIN_BASE) & mask

    out_ids = [np.empty(0, np.int64)]
    out_h = [np.empty(0, np.uint64)]
    m = n - W + 1
    if m > 0:
        acc = np.zeros(m, dtype=np.uint64)
        for k in range(W):
            acc += th[k : m + k] * powers[W - 1 - k]
        valid = ids_np[:m] == ids_np[W - 1 :]
        out_ids.append(ids_np[:m][valid])
        out_h.append(acc[valid] & mask)

    if include_short:
        # short docs (< W tokens): folded polynomial over all their tokens
        bounds = np.flatnonzero(np.r_[True, ids_np[1:] != ids_np[:-1], True])
        lens = np.diff(bounds)
        short = np.flatnonzero(lens < W)
        for si in short:
            s, e = bounds[si], bounds[si + 1]
            fp = np.uint64(0)
            for v in th[s:e]:
                fp = (fp * _FP_WIN_BASE + v) & mask
            out_ids.append(ids_np[s : s + 1])
            out_h.append(np.array([fp], dtype=np.uint64))
    return np.concatenate(out_ids), np.concatenate(out_h)


def _dedupe_doc_grams(ids: np.ndarray, grams: np.ndarray):
    """Distinct (doc, gram) pairs, sorted by doc then gram."""
    if len(ids) == 0:
        return ids, grams
    order = np.lexsort((grams, ids))
    ids, grams = ids[order], grams[order]
    keep = np.r_[True, (ids[1:] != ids[:-1]) | (grams[1:] != grams[:-1])]
    return ids[keep], grams[keep]


def ngram_overlap(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_mod: int = 20,
    max_bench_grams: int = 50_000_000,
):
    """Benchmark-contamination scan (the standard pre-training
    decontamination step, e.g. GPT-3 App. C / PaLM §7): fraction of each
    document's distinct 8-token n-gram hashes that appear in a benchmark
    set.  The fixture benchmark is the deterministic subset
    `doc_id % bench_mod == 0` (in production it would be the eval suite).

    Scale shape: the benchmark side is small BY DEFINITION (it is an eval
    set) — its distinct gram hashes are reduced per-batch, merged on the
    driver under a hard cap (loud error above `max_bench_grams`, the
    minhash candidate-cap convention), and broadcast once via ray.put; the
    corpus side is one streaming vectorized map_batches with a
    searchsorted membership probe.  No shuffle.

    Output: (doc_id, n_grams, n_hits, contam_frac) for every doc with at
    least one token."""

    def _bench_batch(batch: pa.Table) -> pa.Table:
        ids_np = batch[id_col].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids_np % bench_mod == 0))
        if sub.num_rows == 0:
            return pa.table({"gram": pa.array([], pa.uint64())})
        # 64-bit hashes: these window hashes are compared ACROSS documents
        # (corpus vs benchmark membership), where 32-bit collisions at a
        # 50M-gram benchmark would fabricate ~1% spurious hits per gram
        ids, grams = _window_hashes_batch(sub, text_col, id_col, bits64=True)
        return pa.table({"gram": pa.array(np.unique(grams), pa.uint64())})

    bench_parts = [np.empty(0, np.uint64)]
    total = 0
    for b in ds.map_batches(_bench_batch, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows:
            a = b["gram"].to_numpy(zero_copy_only=False)
            total += len(a)
            if total > max_bench_grams:
                raise RuntimeError(
                    f"ngram_overlap: benchmark gram set exceeds {max_bench_grams} — "
                    "the benchmark side must be a small eval set; raise "
                    "max_bench_grams or shrink the benchmark selection"
                )
            bench_parts.append(a)
    bench = np.unique(np.concatenate(bench_parts))
    bench_ref = ray.put(bench)

    def _score(batch: pa.Table) -> pa.Table:
        ref = ray.get(bench_ref)
        ids, grams = _dedupe_doc_grams(
            *_window_hashes_batch(batch, text_col, id_col, bits64=True)
        )
        if len(ids) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_grams": pa.array([], pa.int64()),
                    "n_hits": pa.array([], pa.int64()),
                    "contam_frac": pa.array([], pa.float64()),
                }
            )
        hit = np.zeros(len(grams), dtype=bool)
        if len(ref):
            idx = np.searchsorted(ref, grams)
            idx = np.minimum(idx, len(ref) - 1)
            hit = ref[idx] == grams
        bounds = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1], True])
        doc_ids = ids[bounds[:-1]]
        n_grams = np.diff(bounds).astype(np.int64)
        n_hits = np.add.reduceat(hit.astype(np.int64), bounds[:-1])
        frac = np.round(n_hits / n_grams, 6)
        return pa.table(
            {
                id_col: pa.array(doc_ids, pa.int64()),
                "n_grams": pa.array(n_grams, pa.int64()),
                "n_hits": pa.array(n_hits, pa.int64()),
                "contam_frac": pa.array(frac, pa.float64()),
            }
        )

    return ds.map_batches(_score, batch_format="pyarrow")


# Gopher quality-rule constants (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", §A1.1 MassiveWeb filters — public paper)
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOP_HITS = 2

_WS_SPLIT = "[ \t\n\r]+"  # SQL: string_split_regex(text, '[ \t\n\r]+')


def _word_lists(batch: pa.Table, text_col: str):
    lists = pc.split_pattern_regex(batch[text_col], _WS_SPLIT)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists).to_numpy()
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return flat, parents, keep


def gopher_quality(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher/MassiveWeb document quality rules (Rae et al. 2021 §A1.1):
    per doc (doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
    stop_hits, passes) — the standard pre-training corpus filter.

    passes = 50 <= n_words <= 100k AND 3 <= mean word length <= 10 AND
    (#'#' + #'...') / n_words < 0.1 AND >= 80% of words contain a letter
    AND >= 2 distinct common stop words appear.  Fully vectorized; every
    metric is SQL-replicable for the DuckDB oracle."""

    def _batch(batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        flat, parents, keep = _word_lists(batch, text_col)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        alpha = (
            pc.match_substring_regex(flat, "[a-zA-Z]")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n_words = np.bincount(parents[keep], minlength=n_docs).astype(np.int64)
        char_sum = np.bincount(
            parents[keep], weights=lens[keep], minlength=n_docs
        )
        alpha_cnt = np.bincount(
            parents[keep], weights=alpha[keep], minlength=n_docs
        )
        denom = np.maximum(n_words, 1).astype(np.float64)
        mwl = np.round(char_sum / denom, 6)
        alpha_frac = np.round(alpha_cnt / denom, 6)

        hashes = pc.count_substring(batch[text_col], "#").to_numpy(
            zero_copy_only=False
        )
        dots = pc.count_substring(batch[text_col], "...").to_numpy(
            zero_copy_only=False
        )
        symbol_ratio = np.round((hashes + dots) / denom, 6)

        lower = pc.utf8_lower(batch[text_col])
        stop_hits = np.zeros(n_docs, dtype=np.int64)
        for w in GOPHER_STOPWORDS:
            hit = pc.match_substring_regex(lower, rf"\b{w}\b").to_numpy(
                zero_copy_only=False
            )
            stop_hits += hit.astype(np.int64)

        passes = (
            (n_words >= GOPHER_MIN_WORDS)
            & (n_words <= GOPHER_MAX_WORDS)
            & (mwl >= GOPHER_MIN_MEAN_WORD_LEN)
            & (mwl <= GOPHER_MAX_MEAN_WORD_LEN)
            & (symbol_ratio < GOPHER_MAX_SYMBOL_RATIO)
            & (alpha_frac >= GOPHER_MIN_ALPHA_FRAC)
            & (stop_hits >= GOPHER_MIN_STOP_HITS)
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "n_words": pa.array(n_words),
                "mean_word_len": pa.array(mwl, pa.float64()),
                "symbol_ratio": pa.array(symbol_ratio, pa.float64()),
                "alpha_frac": pa.array(alpha_frac, pa.float64()),
                "stop_hits": pa.array(stop_hits),
                "passes": pa.array(passes),
            }
        )

    return ds.map_batches(_batch, batch_format="pyarrow")


def repetition_metrics(ds, text_col: str = "text", id_col: str = "doc_id"):
    """C4/MassiveWeb-style repetition signals per doc:
    (doc_id, dup_line_frac, top_word_frac) — duplicate-line fraction
    (1 - distinct/total non-empty lines) and most-common-word fraction.
    Vectorized per batch (pyarrow split + per-doc numpy grouping)."""

    def _per_group_distinct_and_max(parents: np.ndarray, codes: np.ndarray, n_docs: int):
        """Given (parent, dictionary-code) pairs, return per-parent
        (total, distinct, max_run) — all via np.unique/bincount, no
        Python loop."""
        total = np.bincount(parents, minlength=n_docs)
        if len(parents) == 0:
            z = np.zeros(n_docs, dtype=np.int64)
            return total, z, z
        key = parents.astype(np.uint64) * np.uint64(int(codes.max()) + 1) + codes.astype(
            np.uint64
        )
        uniq, counts = np.unique(key, return_counts=True)
        uparents = (uniq // np.uint64(int(codes.max()) + 1)).astype(np.int64)
        distinct = np.bincount(uparents, minlength=n_docs)
        max_run = np.zeros(n_docs, dtype=np.int64)
        np.maximum.at(max_run, uparents, counts)
        return total, distinct, max_run

    def _batch(batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        # lines: dictionary-encode to integer codes, then per-doc distinct
        line_lists = pc.split_pattern(batch[text_col], "\n")
        if isinstance(line_lists, pa.ChunkedArray):
            line_lists = line_lists.combine_chunks()
        lp = pc.list_parent_indices(line_lists).to_numpy()
        lflat = pc.list_flatten(line_lists)
        lkeep = pc.not_equal(pc.utf8_trim_whitespace(lflat), "")
        lidx = np.flatnonzero(lkeep.to_numpy(zero_copy_only=False))
        lcodes_arr = pc.dictionary_encode(lflat.take(pa.array(lidx)))
        if isinstance(lcodes_arr, pa.ChunkedArray):
            lcodes_arr = lcodes_arr.combine_chunks()
        lcodes = lcodes_arr.indices.to_numpy(zero_copy_only=False)
        ltotal, ldistinct, _ = _per_group_distinct_and_max(lp[lidx], lcodes, n_docs)
        with np.errstate(divide="ignore", invalid="ignore"):
            dup_line = np.where(ltotal > 0, 1.0 - ldistinct / np.maximum(ltotal, 1), 0.0)

        # words: same trick; max_run over (doc, word-code) = top word count
        flat, parents, keep = _word_lists(batch, text_col)
        widx = np.flatnonzero(keep)
        lower = pc.utf8_lower(flat)
        if isinstance(lower, pa.ChunkedArray):
            lower = lower.combine_chunks()
        wcodes_arr = pc.dictionary_encode(lower.take(pa.array(widx)))
        if isinstance(wcodes_arr, pa.ChunkedArray):
            wcodes_arr = wcodes_arr.combine_chunks()
        wcodes = wcodes_arr.indices.to_numpy(zero_copy_only=False)
        wparents = np.asarray(parents)[widx]
        wtotal, _, wmax = _per_group_distinct_and_max(wparents, wcodes, n_docs)
        top_word = np.where(wtotal > 0, wmax / np.maximum(wtotal, 1), 0.0)

        return pa.table(
            {
                id_col: batch[id_col],
                "dup_line_frac": pa.array(np.round(dup_line, 6), pa.float64()),
                "top_word_frac": pa.array(np.round(top_word, 6), pa.float64()),
            }
        )

    return ds.map_batches(_batch, batch_format="pyarrow")


def doc_quality(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Marginalia-flavored quality score (DocumentValuator.getQuality shape,
    ref DocumentValuator.java:16-86): ln(n_tokens / (1 + n_chars)).
    Returns (doc_id, quality rounded to 6 dp)."""

    def _batch(batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(batch[text_col])
        n_tok = pc.cast(pc.count_substring_regex(lower, TOKEN_MATCH), pa.float64())
        n_chars = pc.cast(pc.utf8_length(batch[text_col]), pa.float64())
        n_tok_np = np.maximum(n_tok.to_numpy(zero_copy_only=False), 1.0)
        q = np.round(np.log(n_tok_np / (1.0 + n_chars.to_numpy(zero_copy_only=False))), 6)
        return pa.table({id_col: batch[id_col], "quality": pa.array(q, pa.float64())})

    return ds.map_batches(_batch, batch_format="pyarrow")


# ---- PII scrubbing -------------------------------------------------------

# (name, RE2 pattern, replacement) — applied IN ORDER.  RE2 is the regex
# engine on both sides of the correctness gate (Arrow's
# replace_substring_regex and DuckDB's regexp_replace are both RE2), so
# match semantics are identical by construction.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_scrub(ds, text_col: str = "text", id_col: str = "doc_id"):
    """PII redaction (the standard pre-training scrub step, e.g. BigScience
    ROOTS / Dolma): replace emails, NANP-style phone numbers and IPv4
    addresses with typed placeholders and count each category.

    One streaming vectorized map — no shuffle, no state; counts are taken
    on the ORIGINAL text (non-overlapping RE2 matches), replacements are
    applied sequentially in PII_PATTERNS order.

    Output: (doc_id, clean_text, n_email, n_phone, n_ip)."""

    def _batch(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        counts = {
            name: pc.cast(pc.count_substring_regex(txt, pat), pa.int64())
            for name, pat, _ in PII_PATTERNS
        }
        out = txt
        for _, pat, repl in PII_PATTERNS:
            out = pc.replace_substring_regex(out, pat, repl)
        return pa.table(
            {
                id_col: batch[id_col],
                "clean_text": out,
                "n_email": counts["email"],
                "n_phone": counts["phone"],
                "n_ip": counts["ip"],
            }
        )

    return ds.map_batches(_batch, batch_format="pyarrow")


# ---- deterministic train/valid/test split --------------------------------

_SPLIT_BUCKETS = 100


def hash_split(ds, id_col: str = "doc_id", train: int = 80, valid: int = 10):
    """Deterministic dataset split by hashed id (the standard train/valid/
    test assignment for training corpora): bucket = fmix64(doc_id) % 100,
    split = train if bucket < `train`, valid if bucket < train+`valid`,
    else test.  fmix64 (murmur3 finalizer) decorrelates buckets from
    sequential ids, so the split is uniform regardless of id assignment
    order — and being a pure function of the id it is stable across runs,
    re-shards and cluster sizes (a doc never migrates between splits when
    the corpus grows).  One vectorized map, no shuffle.

    Output: (doc_id, bucket, split)."""
    lo, hi = train, train + valid

    def _batch(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = (_FMIX_SPLIT(ids) % np.uint64(_SPLIT_BUCKETS)).astype(np.int64)
        split = np.where(bucket < lo, "train", np.where(bucket < hi, "valid", "test"))
        return pa.table(
            {
                id_col: batch[id_col],
                "bucket": pa.array(bucket, pa.int64()),
                "split": pa.array(split.astype(object), pa.string()),
            }
        )

    return ds.map_batches(_batch, batch_format="pyarrow")


def _FMIX_SPLIT(x: np.ndarray) -> np.ndarray:
    """murmur3 fmix64, vectorized (duplicated from ops/dedup to keep the
    module import graph acyclic; the constants are the public murmur3
    finalizer's)."""
    x = x.astype(np.uint64).copy()
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return x


# ---- per-doc TF-IDF top-k terms -------------------------------------------


def tfidf_topk(
    ds,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int = 10_000_000,
):
    """Top-k terms per document by TF-IDF (tf * ln(N / df), rounded to
    6 dp; ties broken by term ascending).

    Scale shape: document frequencies are computed with the partial-
    aggregated term_doc_freq pass (one small shuffle over the VOCABULARY,
    not the corpus), merged on the driver under a hard cap (`max_vocab`,
    loud error above — the ngram_overlap broadcast convention) and
    broadcast once via ray.put; the scoring pass is then one streaming
    map_batches per batch: per-doc tf via pyarrow group_by (docs never
    span batches), an in-process Arrow join against the broadcast df
    table, vectorized score + sort + rank.  No corpus-wide shuffle.

    Output: (doc_id, term, tf, tfidf, rank) with rank in 1..k."""
    n_docs = ds.count()

    df_parts = []
    total = 0
    for b in term_doc_freq(ds, text_col, id_col).iter_batches(batch_format="pyarrow"):
        df_parts.append(b)
        total += b.num_rows
        if total > max_vocab:
            raise ValueError(
                f"tfidf_topk: vocabulary exceeds max_vocab={max_vocab}; "
                "raise the cap or pre-filter terms (min_df)"
            )
    df_table = (
        pa.concat_tables(df_parts)
        if df_parts
        else pa.table({"term": pa.array([], pa.string()), "doc_freq": pa.array([], pa.int64())})
    )
    df_ref = ray.put(df_table)
    ln_n = float(np.log(max(n_docs, 1)))

    def _score(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "tfidf": pa.array([], pa.float64()),
                "rank": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ids, toks = explode_tokens(batch, text_col, id_col)
        if len(ids) == 0:
            return empty
        tf = (
            pa.table({id_col: ids, "term": toks})
            .group_by([id_col, "term"])
            .aggregate([([], "count_all")])
            .rename_columns([id_col, "term", "tf"])
        )
        dfs = ray.get(df_ref)
        joined = tf.join(dfs, keys="term", join_type="inner")
        score = np.round(
            joined["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
            * (ln_n - np.log(joined["doc_freq"].to_numpy(zero_copy_only=False).astype(np.float64))),
            6,
        )
        joined = joined.drop_columns(["doc_freq"]).append_column(
            "tfidf", pa.array(score, pa.float64())
        )
        joined = joined.sort_by(
            [(id_col, "ascending"), ("tfidf", "descending"), ("term", "ascending")]
        )
        gid = joined[id_col].to_numpy(zero_copy_only=False)
        n = len(gid)
        starts = np.r_[True, gid[1:] != gid[:-1]]
        idx = np.arange(n, dtype=np.int64)
        rank = idx - np.maximum.accumulate(np.where(starts, idx, -1)) + 1
        joined = joined.append_column("rank", pa.array(rank, pa.int64()))
        return joined.filter(pa.array(rank <= k))

    return ds.map_batches(_score, batch_format="pyarrow")


# ---- C4-style page cleaning -------------------------------------------------

C4_MIN_WORDS = 5  # a line must have >= 5 words (Raffel et al. 2020 §2.2)
C4_MIN_LINES = 3  # a page must retain >= 3 lines


def rejoin_kept(flat, keep, parents: np.ndarray, n_rows: int, sep: str):
    """Filter exploded list elements by a boolean mask and re-join the
    survivors per parent row with `sep` — the shared surgery behind
    c4_filter and curation.sentence_dedup.

    flat: the flattened (large_)string elements; keep: pa boolean mask;
    parents: int row index per element.  Returns (clean string array,
    n_kept int64 numpy array)."""
    keep_np = keep.to_numpy(zero_copy_only=False)
    n_kept = (
        np.bincount(parents[keep_np], minlength=n_rows).astype(np.int64)
        if len(parents)
        else np.zeros(n_rows, np.int64)
    )
    kept_vals = flat.filter(keep)
    if isinstance(kept_vals, pa.ChunkedArray):
        kept_vals = kept_vals.combine_chunks()
    offsets = pa.array(np.r_[0, np.cumsum(n_kept)], pa.int64())
    clean = pc.binary_join(
        pa.LargeListArray.from_arrays(offsets, kept_vals),
        pa.scalar(sep, pa.large_string()),
    )
    return pc.cast(clean, pa.string()), n_kept


def c4_filter(ds, text_col: str = "text", id_col: str = "doc_id"):
    """The C4 cleaning heuristics (Raffel et al. 2020, "Exploring the
    Limits of Transfer Learning...", §2.2), line-level rules vectorized
    end-to-end: keep lines that (a) end in terminal punctuation
    ('.', '!', '?', '"'), (b) have >= C4_MIN_WORDS whitespace-separated
    words, (c) don't mention 'javascript' (case-insensitive); drop whole
    pages containing '{' or 'lorem ipsum', or retaining < C4_MIN_LINES
    lines.  (The paper's bad-words list and its 3-sentence-span dedup are
    separate ops: the latter is exact_substring_pairs.)

    One streaming map, no shuffle, no Python row loop: lines explode via
    Arrow list offsets, per-line predicates are RE2 kernels, and kept
    lines reassemble through LargeListArray.from_arrays + binary_join.

    Output: (doc_id, clean_text, n_kept, n_total, keep) with keep in
    {0,1}; clean_text is the kept lines joined by newline (even for
    keep=0 rows, so the column is a pure function of the text)."""

    def _batch(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        big = pc.cast(txt, pa.large_string())
        lines = pc.split_pattern(big, "\n")
        flat = pc.list_flatten(lines)
        counts = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)

        ends = pc.match_substring_regex(flat, r'[.!?"]$')
        words = pc.count_substring_regex(flat, r"\S+")
        enough = pc.greater_equal(words, pa.scalar(C4_MIN_WORDS))
        nojs = pc.invert(pc.match_substring(pc.utf8_lower(flat), "javascript"))
        keep_line = pc.and_(pc.and_(ends, enough), nojs)

        parents = np.repeat(np.arange(len(counts)), counts)
        clean, n_kept = rejoin_kept(flat, keep_line, parents, len(counts), "\n")

        low = pc.utf8_lower(big)
        page_bad = pc.or_(
            pc.match_substring(low, "lorem ipsum"), pc.match_substring(big, "{")
        ).to_numpy(zero_copy_only=False)
        keep_doc = ((~page_bad) & (n_kept >= C4_MIN_LINES)).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "clean_text": clean,
                "n_kept": pa.array(n_kept),
                "n_total": pa.array(counts),
                "keep": pa.array(keep_doc),
            }
        )

    return ds.map_batches(_batch, batch_format="pyarrow")


def flesch_readability(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-doc Flesch reading-ease score — the classic readability
    quality signal (Flesch 1948): 206.835 - 1.015*(words/sentences) -
    84.6*(syllables/words), with vowel-group syllable counting and
    punctuation-run sentence counting (the standard cheap
    approximations).  Output: (doc_id, n_words, n_sentences,
    n_syllables, flesch).

    One vectorized map, NO shuffle — three RE2 count kernels per batch
    (pyarrow count_substring_regex), zero Python per row.  Denominators
    clamp at 1 rather than dividing by zero (an empty doc scores
    206.835 - 1.015 = 205.82); counts are reported unclamped."""

    def _batch(batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(batch[text_col])
        words = pc.count_substring_regex(lower, "[a-z]+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        syll = pc.count_substring_regex(lower, "[aeiouy]+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        sents = pc.count_substring_regex(batch[text_col], "[.!?]+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        w = np.maximum(words, 1).astype(np.float64)
        s = np.maximum(sents, 1).astype(np.float64)
        score = np.round(206.835 - 1.015 * (w / s) - 84.6 * (syll / w), 6)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_words": pa.array(words),
                "n_sentences": pa.array(sents),
                "n_syllables": pa.array(syll),
                "flesch": pa.array(score, pa.float64()),
            }
        )

    return ds.map_batches(_batch, batch_format="pyarrow")


def token_entropy(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-doc Shannon entropy of the token distribution (nats) — the
    lexical-diversity quality signal (low entropy = repetitive/template
    text, one of the MassiveWeb-family filters): (doc_id, n_tokens,
    n_distinct, entropy).

    One vectorized map, NO shuffle — entropy is per-document.  Each
    term's contribution p*ln(p) is quantized to nano-units (int64)
    before the per-doc sum, so the result is independent of term
    iteration order and matches the SQL oracle exactly (float sums over
    an unordered GROUP BY would not be).  Empty docs emit entropy 0.0."""

    def _batch(batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        if n_rows == 0:
            # derive id type from the batch so empty blocks unify with
            # non-empty ones (a hardcoded int64 diverges on int32 ids)
            return pa.table(
                {
                    id_col: batch[id_col],
                    "n_tokens": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                    "entropy": pa.array([], pa.float64()),
                }
            )
        lower = pc.utf8_lower(batch[text_col])
        lists = pc.split_pattern_regex(lower, TOKEN_SPLIT)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        parents = parents[mask]
        codes = (
            flat.filter(pa.array(mask))
            .dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        total = np.bincount(parents, minlength=n_rows).astype(np.float64)
        sum_q = np.zeros(n_rows, dtype=np.int64)
        n_distinct = np.zeros(n_rows, dtype=np.int64)
        if len(codes):
            # per-(doc, term) counts via one sort over (parent, code) pairs
            pair = parents.astype(np.int64) * (codes.max() + 1) + codes
            order = np.argsort(pair, kind="stable")
            ps = pair[order]
            starts = np.r_[True, ps[1:] != ps[:-1]]
            grp_parent = parents[order][starts]
            cnt = np.diff(np.append(np.flatnonzero(starts), len(ps)))
            p = cnt / total[grp_parent]
            # floor(x+0.5): same half-rule in numpy and SQL (np.round is
            # banker's, DuckDB round() is half-away — they disagree at .5)
            q = np.floor(p * np.log(p) * 1e9 + 0.5).astype(np.int64)
            np.add.at(sum_q, grp_parent, q)
            n_distinct = np.bincount(grp_parent, minlength=n_rows)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(total.astype(np.int64)),
                "n_distinct": pa.array(n_distinct.astype(np.int64)),
                "entropy": pa.array(
                    np.floor(-sum_q / 1e9 * 1e6 + 0.5) / 1e6 + 0.0  # floor-half, kill -0.0
                ),
            }
        )

    return ds.map_batches(_batch, batch_format="pyarrow")


# ---- winnowing ----------------------------------------------------------

_WINNOW_WINDOW = 4  # winnowing windows of 4 k-gram hashes


def winnow_fingerprints(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    winnow_window: int = _WINNOW_WINDOW,
):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD '03 — the MOSS algorithm): slide a window of `winnow_window`
    consecutive k-gram hashes (k-gram = the shared `_FP_WINDOW`-token
    polynomial window hash, mod 2^32) over each document; in every window
    select the MINIMUM hash, ties broken by the RIGHTMOST position; the
    document's fingerprint set is the distinct selected hashes.  Output
    (doc_id, fingerprint), one row per distinct selected hash.

    Guarantee (the paper's §4): any shared token run of at least
    winnow_window + _FP_WINDOW - 1 tokens between two documents yields at
    least one shared fingerprint — unlike `fingerprint`'s single global
    min, this detects LOCAL overlap, at ~1/((winnow_window+1)/2) the
    density of keeping every gram.

    Short docs: fewer grams than a window -> ONE window over all grams
    (still one fingerprint per doc); docs under _FP_WINDOW tokens use the
    folded-polynomial single gram (the `fingerprint` convention, shared
    kernel).  Per-doc selection only compares hashes WITHIN a document,
    so mod-2^32 arithmetic stays SQL-oracle replicable.
    """
    WW = int(winnow_window)
    if WW < 1:
        raise ValueError("winnow_window must be >= 1")

    def _batch(batch: pa.Table) -> pa.Table:
        ids_np, grams = _window_hashes_batch(batch, text_col, id_col)
        if len(ids_np) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "fingerprint": pa.array([], pa.int64()),
                }
            )
        # rows per doc are contiguous and in position order (long docs in
        # the windows section, short docs appended; a doc is in exactly one)
        bounds = np.flatnonzero(np.r_[True, ids_np[1:] != ids_np[:-1], True])
        out_ids = []
        out_fp = []
        swv = np.lib.stride_tricks.sliding_window_view
        for s, e in zip(bounds[:-1], bounds[1:]):
            h = grams[s:e]
            m = len(h)
            if m <= WW:
                sel = np.array([m - 1 - int(np.argmin(h[::-1]))])
            else:
                win = swv(h, WW)[:, ::-1]
                j = np.argmin(win, axis=1)
                sel = np.unique(np.arange(m - WW + 1) + (WW - 1 - j))
            fps = np.unique(h[sel])
            out_ids.append(np.full(len(fps), ids_np[s], np.int64))
            out_fp.append(fps)
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_ids)),
                # values < 2^32: int64 keeps the oracle comparison
                # type-uniform with DuckDB BIGINT
                "fingerprint": pa.array(
                    np.concatenate(out_fp).astype(np.int64), pa.int64()
                ),
            }
        )

    return ds.map_batches(_batch, batch_format="pyarrow")


def text_normalize(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Unicode canonicalization — the cleanup every hashing/dedup stage
    should run first (composed vs decomposed accents hash differently;
    CCNet/C4 normalize before dedup): NFC-normalize, collapse whitespace
    runs to one space, trim.  One streaming map, all RE2/utf8 kernels,
    no shuffle.

    Output: (doc_id, norm_text, changed) — changed marks rows the
    normalization actually altered (cheap dirty-row statistic)."""

    import unicodedata

    def _batch(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        # NFC via unicodedata, NOT pc.utf8_normalize: pyarrow's kernel
        # (utf8proc, observed on 16.1) leaves combining sequences
        # DECOMPOSED even for form="NFC", diverging from the Unicode
        # standard (and DuckDB/CPython).  ASCII is NFC-invariant, so the
        # Python call runs only on regex-flagged non-ASCII rows — ~0 cost
        # on web-scale English-heavy corpora.
        nonascii = pc.match_substring_regex(txt, r"[^\x00-\x7F]").to_numpy(
            zero_copy_only=False
        )
        if nonascii.any():
            # normalize ONLY the flagged rows and scatter back — never
            # materialize the whole (mostly-ASCII) batch as Python strings
            idx = np.flatnonzero(nonascii)
            flagged = txt.take(pa.array(idx)).to_pylist()
            nfc = unicodedata.normalize
            repl = pa.array([nfc("NFC", v) for v in flagged], txt.type)
            norm = pc.replace_with_mask(txt, pa.array(nonascii), repl)
        else:
            norm = txt
        norm = pc.replace_substring_regex(norm, r"\s+", " ")
        norm = pc.utf8_trim(norm, " ")
        return pa.table(
            {
                id_col: batch[id_col],
                "norm_text": pc.cast(norm, pa.string()),
                "changed": pc.not_equal(norm, txt),
            }
        )

    return ds.map_batches(_batch, batch_format="pyarrow")


def chunk_documents(
    ds,
    chunk_tokens: int = 128,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Fixed-size token chunking — the standard LLM preprocessing step
    that slices long documents into `chunk_tokens`-token windows, with
    `overlap` tokens carried over between consecutive chunks (RAG /
    embedding pipelines).  Chunk c covers token positions
    [c*step, c*step + chunk_tokens) with step = chunk_tokens - overlap;
    the final chunk may be short; empty docs emit nothing.

    One streaming map, no shuffle, no Python row loop: tokens explode via
    Arrow list offsets, per-token chunk memberships fan out with the
    repeat/arange trick, and chunk texts reassemble with LargeListArray +
    binary_join.

    Output: (doc_id, chunk_id, chunk_text, n_tokens)."""
    if overlap < 0 or overlap >= chunk_tokens:
        raise ValueError("chunk_documents: need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap

    def _batch(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "chunk_id": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
        toks, parents = _flat_tokens_rows(batch, text_col)
        if len(parents) == 0:
            return empty
        n_rows = batch.num_rows
        lens = np.bincount(parents, minlength=n_rows).astype(np.int64)
        starts = np.zeros(n_rows + 1, np.int64)
        np.cumsum(lens, out=starts[1:])
        j = np.arange(len(parents), dtype=np.int64) - starts[parents]  # in-doc pos
        L = lens[parents]
        n_chunks = 1 + np.maximum(0, -(-(L - chunk_tokens) // step))
        c_min = np.maximum(0, -(-(j - chunk_tokens + 1) // step))
        c_max = np.minimum(j // step, n_chunks - 1)
        cnt = c_max - c_min + 1  # >= 1 always (c_min <= j//step)
        total = int(cnt.sum())
        tok_idx = np.repeat(np.arange(len(parents)), cnt)
        chunk = (
            np.repeat(c_min, cnt)
            + np.arange(total)
            - np.repeat(np.cumsum(cnt) - cnt, cnt)
        )
        row = parents[tok_idx]
        # order by (row, chunk, position) for in-order reassembly
        order = np.lexsort((tok_idx, chunk, row))
        row, chunk, tok_idx = row[order], chunk[order], tok_idx[order]
        bounds = np.flatnonzero(
            np.r_[True, (row[1:] != row[:-1]) | (chunk[1:] != chunk[:-1]), True]
        )
        n_out = len(bounds) - 1
        offsets = pa.array(bounds, pa.int64())
        kept = toks.take(pa.array(tok_idx))
        if isinstance(kept, pa.ChunkedArray):
            kept = kept.combine_chunks()
        chunk_text = pc.binary_join(
            pa.LargeListArray.from_arrays(offsets, kept),
            pa.scalar(" ", pa.large_string()),
        )
        ids_col = batch[id_col]
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        out_rows = row[bounds[:-1]]
        return pa.table(
            {
                id_col: ids_col.take(pa.array(out_rows)).cast(pa.int64()),
                "chunk_id": pa.array(chunk[bounds[:-1]], pa.int64()),
                "chunk_text": pc.cast(chunk_text, pa.string()),
                "n_tokens": pa.array(np.diff(bounds), pa.int64()),
            }
        )

    return ds.map_batches(_batch, batch_format="pyarrow")


def bpe_pair_counts(ds, text_col: str = "text"):
    """Adjacent character-pair frequencies within tokens — the counting
    pass of the first BPE merge step (Sennrich et al.), run corpus-wide
    to seed a tokenizer vocabulary.

    Fully vectorized over the flat Arrow token buffer: one uint16
    pair-code per adjacent byte pair (tokens are [a-z0-9], pure ASCII
    by construction), token boundaries masked from the offsets array,
    np.bincount partials per batch.  The pair space is <= 36^2, so the
    groupby shuffle moves <= 1296 rows per batch regardless of corpus
    size.  Output: (pair, n)."""

    def _empty() -> pa.Table:
        return pa.table(
            {"pair": pa.array([], pa.string()), "partial": pa.array([], pa.int64())}
        )

    def _partial(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens_rows(batch, text_col)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n_tok = len(flat)
        if n_tok == 0:
            return _empty()
        off = np.frombuffer(flat.buffers()[1], dtype=np.int64)[
            flat.offset : flat.offset + n_tok + 1
        ]
        data = np.frombuffer(flat.buffers()[2], dtype=np.uint8)[off[0] : off[-1]]
        off = off - off[0]
        m = len(data)
        if m < 2:
            return _empty()
        codes = data[:-1].astype(np.uint16) * np.uint16(256) + data[1:]
        valid = np.ones(m - 1, dtype=bool)
        internal = off[1:-1]  # token starts (strictly inside the buffer)
        valid[internal - 1] = False  # pairs that straddle a token boundary
        counts = np.bincount(codes[valid], minlength=65536)
        nz = np.flatnonzero(counts)
        pairs = [chr(c >> 8) + chr(c & 255) for c in nz]
        return pa.table(
            {
                "pair": pa.array(pairs, pa.string()),
                "partial": pa.array(counts[nz], pa.int64()),
            }
        )

    from .relational import bucketed_group_agg

    agg = bucketed_group_agg(
        ds.map_batches(_partial, batch_format="pyarrow"), ["pair"], ["partial"]
    )

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"pair": batch["pair"], "n": batch["sum(partial)"].cast(pa.int64())}
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def token_length_histogram(ds, text_col: str = "text"):
    """Token-length distribution (with multiplicity) — the vocabulary
    profile checked before choosing tokenizer limits.  Per-batch
    np.bincount over the flat token offsets (no string materialization),
    <= max-token-length rows shuffled per batch.  Output: (len, n)."""

    def _partial(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens_rows(batch, text_col)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n_tok = len(flat)
        if n_tok == 0:
            return pa.table(
                {"len": pa.array([], pa.int64()), "partial": pa.array([], pa.int64())}
            )
        off = np.frombuffer(flat.buffers()[1], dtype=np.int64)[
            flat.offset : flat.offset + n_tok + 1
        ]
        lens = np.diff(off)
        counts = np.bincount(lens)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "len": pa.array(nz.astype(np.int64)),
                "partial": pa.array(counts[nz].astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow").groupby("len").sum("partial")
    )

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"len": batch["len"].cast(pa.int64()), "n": batch["sum(partial)"].cast(pa.int64())}
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def vocab_growth(
    ds,
    fractions: tuple[float, ...] = (0.25, 0.5, 0.75, 1.0),
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Heaps'-law vocabulary growth curve: |distinct tokens| among docs
    with id <= floor(max_id * f) for each fraction f — the
    diminishing-returns check run before paying for more crawl data.

    One token shuffle: per-batch (token, min doc id) partials ->
    groupby(token).min (each token reduced to its FIRST document) ->
    per-batch histogram over the threshold buckets (searchsorted) ->
    <= len(fractions) rows cumsummed on the driver.
    Output: (threshold, vocab)."""
    if not fractions or any(not (0 < f <= 1.0) for f in fractions):
        raise ValueError("vocab_growth: fractions must be in (0, 1]")
    max_id = ds.max(id_col)  # tiny aggregate
    # same double expression as the SQL floor(m * f); np.unique dedups
    # fractions that floor to the same threshold (the oracle's GROUP BY
    # yields one row per distinct threshold)
    thresholds = np.unique(
        np.array([int(np.floor(float(max_id) * f)) for f in fractions], np.int64)
    )

    def _first_doc(batch: pa.Table) -> pa.Table:
        ids, toks = explode_tokens(batch, text_col, id_col)
        t = pa.table({"tok": toks, "fd": ids})
        g = t.group_by("tok").aggregate([("fd", "min")])
        return g.rename_columns(["tok", "fd"])

    from .relational import bucketed_group_agg

    first = bucketed_group_agg(
        ds.map_batches(_first_doc, batch_format="pyarrow"),
        ["tok"], ["fd"], agg="min",
    )

    def _bucket(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"b": pa.array([], pa.int64()), "partial": pa.array([], pa.int64())}
            )
        fd = batch["min(fd)"].to_numpy(zero_copy_only=False)
        b = np.searchsorted(thresholds, fd, side="left")
        keep = b < len(thresholds)  # tokens past the last threshold count nowhere
        counts = np.bincount(b[keep], minlength=len(thresholds))
        return pa.table(
            {
                "b": pa.array(np.arange(len(thresholds), dtype=np.int64)),
                "partial": pa.array(counts.astype(np.int64)),
            }
        )

    rows = (
        first.map_batches(_bucket, batch_format="pyarrow").groupby("b").sum("partial")
    ).take_all()  # <= len(fractions) rows
    acc = np.zeros(len(thresholds), np.int64)
    for r in rows:
        acc[int(r["b"])] = int(r["sum(partial)"])
    vocab = np.cumsum(acc)
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "threshold": pa.array(thresholds),
                "vocab": pa.array(vocab),
            }
        )
    )


def skipgram_counts(
    ds,
    k: int = 2,
    min_count: int = 2,
    text_col: str = "text",
):
    """Skip-gram co-occurrence counts (word2vec-prep shape): ordered
    token pairs within a forward window of k positions inside each
    document, kept when the corpus count reaches min_count.

    Vectorized pair emission: the flat token array is shifted against
    itself once per distance d (k tiny Arrow takes, no Python over
    tokens); per-batch combining collapses repeats before the one
    (w1, w2) groupby shuffle.  The min_count filter bounds the output
    the way stop-shingle caps bound the dedup ops — `log` the dropped
    tail if it matters.  Output: (w1, w2, n)."""
    kk = int(k)
    if kk <= 0 or int(min_count) <= 0:
        raise ValueError("skipgram_counts: k and min_count must be positive")

    def _empty() -> pa.Table:
        return pa.table(
            {
                "w1": pa.array([], pa.large_string()),
                "w2": pa.array([], pa.large_string()),
                "partial": pa.array([], pa.int64()),
            }
        )

    def _partial(batch: pa.Table) -> pa.Table:
        flat, rows = _flat_tokens_rows(batch, text_col)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n = len(rows)
        parts = []
        for d in range(1, kk + 1):
            if n <= d:
                break
            same = rows[d:] == rows[:-d]
            i = np.flatnonzero(same)
            if len(i) == 0:
                continue
            parts.append(
                pa.table(
                    {"w1": flat.take(pa.array(i)), "w2": flat.take(pa.array(i + d))}
                )
            )
        if not parts:
            return _empty()
        t = pa.concat_tables(parts)
        g = t.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return g.rename_columns(["w1", "w2", "partial"])

    from .relational import bucketed_group_agg

    agg = bucketed_group_agg(
        ds.map_batches(_partial, batch_format="pyarrow"), ["w1", "w2"], ["partial"]
    )
    mc = int(min_count)

    def _final(batch: pa.Table) -> pa.Table:
        n = batch["sum(partial)"].cast(pa.int64())
        t = pa.table(
            {
                "w1": pc.cast(batch["w1"], pa.string()),
                "w2": pc.cast(batch["w2"], pa.string()),
                "n": n,
            }
        )
        return t.filter(pc.greater_equal(t["n"], mc))

    return agg.map_batches(_final, batch_format="pyarrow")


def blocklist_filter(
    ds,
    terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hits: int = 0,
):
    """Blocklist screening (the C4/Gopher "bad words" stage): count
    word-boundary occurrences of each blocklist term per document and
    flag documents exceeding `max_hits` total.

    One streaming map; each term is an RE2 `\\b<term>\\b` pattern run
    through Arrow's vectorized count_substring_regex over the lowercased
    batch — no Python over rows, no shuffle.  Term lists in practice are
    O(100s): the per-batch cost is terms x batch, all in kernels.

    Output: (<id_col>, n_blocked, keep) with keep = n_blocked <= max_hits."""

    import re as _re

    for t in terms:
        if not _re.fullmatch(r"[a-z0-9]+", t):
            raise ValueError(
                f"blocklist_filter: term {t!r} must be a lowercase "
                "[a-z0-9]+ word (word-boundary semantics)"
            )
    pats = [rf"\b{t}\b" for t in terms]

    def _count(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch[text_col])
        tot = np.zeros(batch.num_rows, np.int64)
        for p in pats:
            tot += pc.count_substring_regex(low, p).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_blocked": pa.array(tot),
                "keep": pa.array(tot <= max_hits),
            }
        )

    return ds.map_batches(_count, batch_format="pyarrow")


def zipf_slope(
    ds,
    text_col: str = "text",
    *,
    top_n: int = 500,
):
    """Zipf's-law fit over the corpus unigram distribution: OLS slope
    and intercept of ln(freq) against ln(rank) for the `top_n` most
    frequent terms — the distributional-health probe (natural text sits
    near slope -1; template/spam corpora deviate).

    One token-explode count shuffle (per-batch partials first), then a
    two-level top-N reduction (per-block prune by (n desc, term asc),
    one tiny final block) — the corpus never reaches the driver.  The
    OLS sums are int64 pico-units of per-rank doubles (ln products are
    bounded by ~900, so round(x * 1e12) sums stay far below 2^62 for
    any practical top_n), making the summation order-independent; the
    final slope/intercept doubles share their expression tree with the
    SQL oracle.

    Output: one row (n_terms, slope, intercept), rounded to 6 dp."""

    if top_n < 2:
        raise ValueError("zipf_slope: top_n must be at least 2")

    def _partial(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens_rows(batch, text_col)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if len(flat) == 0:
            return pa.table(
                {
                    "term": pa.array([], pa.large_string()),
                    "partial": pa.array([], pa.int64()),
                }
            )
        t = pa.table({"term": flat}).group_by("term").aggregate([([], "count_all")])
        return t.rename_columns(["term", "partial"])

    from .relational import bucketed_group_agg

    counts = bucketed_group_agg(
        ds.map_batches(_partial, batch_format="pyarrow"), ["term"], ["partial"]
    )

    def _prune(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table(
                {
                    "term": pa.array([], pa.large_string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        ncol = block.column_names[1]
        t = pa.table(
            {
                "term": block["term"].cast(pa.large_string()),
                "n": block[ncol].cast(pa.int64()),
            }
        )
        t = t.sort_by([("n", "descending"), ("term", "ascending")])
        return t.slice(0, top_n)

    def _final(block: pa.Table) -> pa.Table:
        schema = {
            "n_terms": pa.int64(),
            "slope": pa.float64(),
            "intercept": pa.float64(),
        }
        block = _prune(block)
        m = block.num_rows
        if m < 2:
            return pa.table({k: pa.array([], t) for k, t in schema.items()})
        n = block["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        x = np.log(np.arange(1, m + 1, dtype=np.float64))
        y = np.log(n)
        sx = int(np.round(x * 1e12).astype(np.int64).sum())
        sy = int(np.round(y * 1e12).astype(np.int64).sum())
        sxx = int(np.round(x * x * 1e12).astype(np.int64).sum())
        sxy = int(np.round(x * y * 1e12).astype(np.int64).sum())
        fm = float(m)
        fsx, fsy = sx / 1e12, sy / 1e12
        fsxx, fsxy = sxx / 1e12, sxy / 1e12
        slope = (fm * fsxy - fsx * fsy) / (fm * fsxx - fsx * fsx)
        intercept = (fsy - slope * fsx) / fm
        return pa.table(
            {
                "n_terms": pa.array([m], pa.int64()),
                "slope": pa.array([round(slope, 6)], pa.float64()),
                "intercept": pa.array([round(intercept, 6)], pa.float64()),
            }
        )

    return (
        counts.map_batches(_prune, batch_format="pyarrow")
        .repartition(1)
        .map_batches(_final, batch_format="pyarrow", batch_size=None)
    )
