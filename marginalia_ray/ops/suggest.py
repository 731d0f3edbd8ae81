"""Typeahead suggestions + spell correction — the reference's
assistant-service re-expressed as distributed vocabulary aggregation.

The reference serves both from driver-side state: a PatriciaTrie over a
word list ranked by TermFrequencyDict counts (Suggestions.java:22-150)
and an embedded SymSpell corrector (SpellChecker.java:11-22).  The
online/service half of that lives in marginalia_ray.query.suggest; the
operators here are the OFFLINE batch halves a 100 TB pipeline needs to
produce those artifacts and to run suggestion/correction sweeps over a
query log:

``suggest_terms``
    Per prefix, the reference's exact candidate semantics
    (Suggestions.java:128-150): walk matches in LEXICOGRAPHIC order,
    window to the first ``lex_window`` (=256), then rank by
    (frequency desc, term length, term) and keep ``count``.

``spell_correct``
    SymSpell-style correction of probe words against the corpus
    vocabulary: candidates within Levenshtein distance ``max_dist``,
    ranked by (distance, frequency desc, term) — the reference sorts by
    distance only (SpellChecker.java:20); the frequency/lexicographic
    tiebreak is added for determinism.

Scale shape (both ops): ONE pre-aggregated groupby builds the (term,
freq) vocabulary — per-batch token value_counts mean the shuffle moves
one row per (batch, term), never one per token.  Everything after is a
vectorized map over vocabulary blocks with driver-bounded output:
``k_prefixes × lex_window`` rows for suggestions, ``k_probes × k`` for
corrections.  Probes/prefixes ride into the tasks as plain captured
constants (tiny), not a shuffle side.

The per-batch kernels are numpy over Arrow string buffers: the padded
char matrix is built with one scatter (no per-row Python), the
bag-distance prefilter is a 36-symbol bincount lower bound on edit
distance, and the exact Levenshtein DP runs column-vectorized across
all surviving words at once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from marginalia_ray.ops.text_ops import explode_tokens

_ALPHABET = 37  # [a-z0-9] + one shared bucket for any other byte


def term_frequencies(ds, text_col: str = "text", id_col: str = "doc_id", max_len: int = 32):
    """(term, freq) vocabulary Dataset with per-batch partial counts —
    the OFFLINE artifact behind the online typeahead service: write it
    with ``.write_parquet(path)`` and load it driver-side with
    ``query.suggest.Suggestions.from_parquet(path)`` (the Ray-native
    replacement for the reference's suggestions.txt + tfreq-data.bin
    pair, Suggestions.java:44-70).

    Mirrors the reference's suggestion-file filters (Suggestions.java:
    52-55): lowercase (tokenizer already lowers), alnum-only (tokenizer
    alphabet), length < max_len.
    """

    def _partial(batch: pa.Table) -> pa.Table:
        _, toks = explode_tokens(batch, text_col, id_col)
        keep = pc.less(pc.utf8_length(toks), max_len)
        toks = toks.filter(keep)
        part = pa.table({"term": toks}).group_by("term").aggregate([("term", "count")])
        return part.rename_columns(["term", "partial"])

    vocab = (
        ds.map_batches(_partial, batch_format="pyarrow").groupby("term").sum("partial")
    )
    return vocab.rename_columns({"sum(partial)": "freq"})


def _char_matrix(terms: pa.Array):
    """(chars uint8 (n, L), lens int64) padded char matrix from an Arrow
    string array via one vectorized scatter over the value buffer —
    tokens are [a-z0-9] so bytes == codepoints."""
    terms = pc.cast(terms, pa.large_string())
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    n = len(terms)
    offs = np.frombuffer(
        terms.buffers()[1], dtype=np.int64, count=n + 1, offset=terms.offset * 8
    )
    data = np.frombuffer(terms.buffers()[2], dtype=np.uint8)
    lens = (offs[1:] - offs[:-1]).astype(np.int64)
    L = int(lens.max()) if n else 0
    if n == 0 or L == 0:
        return np.zeros((n, 0), np.uint8), lens
    pos = offs[:-1, None] + np.arange(L)[None, :]
    mask = np.arange(L)[None, :] < lens[:, None]
    chars = np.where(mask, data[np.minimum(pos, len(data) - 1)], 0).astype(np.uint8)
    return chars, lens


def _char_codes(chars: np.ndarray) -> np.ndarray:
    """Map bytes to [0, _ALPHABET): [a-z] -> 10..35, [0-9] -> 0..9, and
    EVERY other byte (space, punctuation, UTF-8 continuation bytes) to
    the shared bucket 36.  Collapsing the out-of-alphabet classes keeps
    the bag bound a true LOWER bound (merging symbol classes can only
    shrink a multiset difference), so the exact DP afterwards stays
    correct even for terms the tokenizer alphabet doesn't cover.
    Padding (0) also maps to 36 but is always masked by lens before use."""
    c = chars.astype(np.int64)
    codes = np.full(c.shape, _ALPHABET - 1, np.int64)
    lower = (c >= ord("a")) & (c <= ord("z"))
    digit = (c >= ord("0")) & (c <= ord("9"))
    codes[lower] = c[lower] - ord("a") + 10
    codes[digit] = c[digit] - ord("0")
    return codes


def _bag_lower_bound(chars, lens, probe_counts, probe_len):
    """Bag-distance lower bound on Levenshtein for every word vs one
    probe: max(|word \\ probe|, |probe \\ word|) over char multisets."""
    n, L = chars.shape
    if L == 0:
        return np.maximum(lens, probe_len) - np.minimum(lens, probe_len)
    codes = _char_codes(chars)
    mask = np.arange(L)[None, :] < lens[:, None]
    flat = (np.arange(n)[:, None] * _ALPHABET + codes)[mask]
    counts = np.bincount(flat, minlength=n * _ALPHABET).reshape(n, _ALPHABET)
    diff = counts - probe_counts[None, :]
    return np.maximum(
        np.where(diff > 0, diff, 0).sum(axis=1),
        np.where(diff < 0, -diff, 0).sum(axis=1),
    )


def _levenshtein_vec(chars, lens, probe: str) -> np.ndarray:
    """Exact Levenshtein distance of every padded word row vs ``probe``,
    column-vectorized DP: O(len(probe) * maxlen) numpy column ops, each
    O(n_words).  Matches DuckDB's levenshtein() (no transposition)."""
    n, L = chars.shape
    pb = probe.encode()
    m = len(pb)
    prev = np.tile(np.arange(L + 1, dtype=np.int64), (n, 1))
    for i in range(1, m + 1):
        cur = np.empty((n, L + 1), np.int64)
        cur[:, 0] = i
        if L:
            sub = prev[:, :-1] + (chars != pb[i - 1])
            dele = prev[:, 1:] + 1
            best = np.minimum(sub, dele)
            for j in range(1, L + 1):
                cur[:, j] = np.minimum(best[:, j - 1], cur[:, j - 1] + 1)
        prev = cur
    return prev[np.arange(n), lens]


def suggest_terms(
    ds,
    prefixes: list[str],
    count: int = 10,
    lex_window: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_len: int = 32,
):
    """Typeahead completions per prefix over the corpus vocabulary.

    Reference semantics (Suggestions.java:128-150): candidates are the
    first ``lex_window`` matches in lexicographic order (the trie
    iteration window), THEN ranked by (freq desc, length, term) and cut
    to ``count``.  Output: (prefix, rank, term, freq).

    Shape: vocab groupby (pre-aggregated) -> per-block partial
    lexicographic top-``lex_window`` per prefix (the global first-W
    lexicographic set is contained in the union of per-block first-W
    sets) -> one tiny groupby(prefix) finalize, driver-bounded at
    k_prefixes x lex_window rows.
    """
    if not prefixes or len(set(prefixes)) != len(prefixes):
        raise ValueError("prefixes must be a non-empty list of distinct strings")
    if count < 1 or lex_window < count:
        raise ValueError("need 1 <= count <= lex_window")
    vocab = term_frequencies(ds, text_col, id_col, max_len)
    plist = list(prefixes)

    def _empty() -> pa.Table:
        return pa.table(
            {
                "prefix": pa.array([], pa.large_string()),
                "term": pa.array([], pa.large_string()),
                "freq": pa.array([], pa.int64()),
            }
        )

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty()
        outs = []
        terms = batch["term"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        for p in plist:
            hit = batch.filter(pc.starts_with(terms, p))
            if hit.num_rows == 0:
                continue
            hit = hit.sort_by("term").slice(0, lex_window)
            outs.append(
                pa.table(
                    {
                        "prefix": pa.array([p] * hit.num_rows, pa.large_string()),
                        "term": pc.cast(hit["term"], pa.large_string()),
                        "freq": pc.cast(hit["freq"], pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs) if outs else _empty()

    def _finalize(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    "prefix": pa.array([], pa.large_string()),
                    "rank": pa.array([], pa.int64()),
                    "term": pa.array([], pa.large_string()),
                    "freq": pa.array([], pa.int64()),
                }
            )
        g = group.sort_by("term").slice(0, lex_window)
        freq = g["freq"].to_numpy()
        terms = np.asarray(g["term"].to_pylist(), dtype=object)
        lens = np.asarray([len(t) for t in terms], dtype=np.int64)
        order = np.lexsort((terms, lens, -freq))[:count]
        return pa.table(
            {
                "prefix": pa.array(
                    [group["prefix"][0].as_py()] * len(order), pa.large_string()
                ),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
                "term": pa.array(terms[order], pa.large_string()),
                "freq": pa.array(freq[order], pa.int64()),
            }
        )

    return (
        vocab.map_batches(_partial, batch_format="pyarrow")
        .groupby("prefix")
        .map_groups(_finalize, batch_format="pyarrow")
    )


def spell_correct(
    ds,
    probes: list[str],
    k: int = 3,
    max_dist: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_len: int = 32,
):
    """Spell-correct probe words against the corpus vocabulary
    (SpellChecker.java:19-21 / SymSpell semantics, deterministic
    tiebreak added): per probe the top-``k`` vocabulary terms within
    Levenshtein distance ``max_dist``, ranked by (distance, freq desc,
    term).  Output: (probe, rank, term, dist, freq).

    Shape: the same pre-aggregated vocab groupby, then a vectorized
    map over vocabulary blocks — per probe a length-band + bag-distance
    (char-multiset) lower-bound prefilter, exact column-vectorized
    Levenshtein DP on survivors, per-block partial top-``k`` — and one
    tiny groupby(probe) finalize.  Driver-bounded at k_probes x k.
    """
    if not probes or len(set(probes)) != len(probes):
        raise ValueError("probes must be a non-empty list of distinct strings")
    if k < 1 or max_dist < 0:
        raise ValueError("need k >= 1 and max_dist >= 0")
    bad = [p for p in probes if not p or not p.isascii()]
    if bad:
        # the DP runs over BYTES; non-ASCII probes would measure UTF-8
        # byte edits, not character edits, and diverge from levenshtein()
        raise ValueError(f"probes must be non-empty ASCII strings: {bad!r}")
    vocab = term_frequencies(ds, text_col, id_col, max_len)
    plist = list(probes)
    pmats = []
    for p in plist:
        codes = _char_codes(np.frombuffer(p.encode(), np.uint8).astype(np.uint8))
        pmats.append(np.bincount(codes, minlength=_ALPHABET))

    def _empty() -> pa.Table:
        return pa.table(
            {
                "probe": pa.array([], pa.large_string()),
                "term": pa.array([], pa.large_string()),
                "dist": pa.array([], pa.int64()),
                "freq": pa.array([], pa.int64()),
            }
        )

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty()
        terms = batch["term"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        chars, lens = _char_matrix(terms)
        freq = pc.cast(batch["freq"], pa.int64()).to_numpy()
        outs = []
        for p, pcounts in zip(plist, pmats):
            band = np.abs(lens - len(p)) <= max_dist
            if not band.any():
                continue
            idx = np.flatnonzero(band)
            bag = _bag_lower_bound(chars[idx], lens[idx], pcounts, len(p))
            idx = idx[bag <= max_dist]
            if not len(idx):
                continue
            dist = _levenshtein_vec(chars[idx], lens[idx], p)
            ok = dist <= max_dist
            idx, dist = idx[ok], dist[ok]
            if not len(idx):
                continue
            cand_terms = np.asarray(terms.take(pa.array(idx)).to_pylist(), dtype=object)
            order = np.lexsort((cand_terms, -freq[idx], dist))[:k]
            outs.append(
                pa.table(
                    {
                        "probe": pa.array([p] * len(order), pa.large_string()),
                        "term": pa.array(cand_terms[order], pa.large_string()),
                        "dist": pa.array(dist[order], pa.int64()),
                        "freq": pa.array(freq[idx][order], pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs) if outs else _empty()

    def _finalize(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    "probe": pa.array([], pa.large_string()),
                    "rank": pa.array([], pa.int64()),
                    "term": pa.array([], pa.large_string()),
                    "dist": pa.array([], pa.int64()),
                    "freq": pa.array([], pa.int64()),
                }
            )
        dist = group["dist"].to_numpy()
        freq = group["freq"].to_numpy()
        terms = np.asarray(group["term"].to_pylist(), dtype=object)
        order = np.lexsort((terms, -freq, dist))[:k]
        return pa.table(
            {
                "probe": pa.array(
                    [group["probe"][0].as_py()] * len(order), pa.large_string()
                ),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
                "term": pa.array(terms[order], pa.large_string()),
                "dist": pa.array(dist[order], pa.int64()),
                "freq": pa.array(freq[order], pa.int64()),
            }
        )

    return (
        vocab.map_batches(_partial, batch_format="pyarrow")
        .groupby("probe")
        .map_groups(_finalize, batch_format="pyarrow")
    )
