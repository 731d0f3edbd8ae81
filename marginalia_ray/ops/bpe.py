"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units").

`bpe_pair_counts` (text_ops) is the single counting pass; this module
runs the full iterative merge loop the way a cluster has to:

  * the corpus is collapsed ONCE into a (word, freq) vocabulary table —
    one token-explode shuffle; after that no stage ever touches the
    corpus again, only the distinct-word table (orders of magnitude
    smaller, the standard trick every production BPE trainer uses);
  * each round is (a) one vectorized weighted pair-count map over the
    symbol table + a pair-keyed groupby whose rows are DISTINCT PAIRS,
    not tokens, (b) a two-level top-1 reduction (per-block argmax, then
    one tiny final block), and (c) one vectorized merge-apply map that
    rewrites the flat int32 symbol buffer in place — greedy
    left-to-right within equal-symbol runs, the reference semantics;
  * driver state is the merge list only (n_merges rows) plus the
    id->string alphabet; the vocabulary stays in the object store and
    is re-materialized per round exactly like connected_components'
    edge set (an iterative algorithm on a lazy Dataset requires it);
  * vocabularies under `local_cap` distinct words take a single-task
    fast path (the same vectorized kernels, one block, no per-round
    shuffle fixed costs) — mirroring connected_components' hybrid.

Tokens are the repo-wide [a-z0-9]+ lowercase runs, so the initial
alphabet is single bytes; merged symbols get fresh ids >= 256.
Correctness oracle: tools/bpe_reference.py (independent sequential
implementation) via tests/test_bpe_train.py and the checked-in golden
(marginalia_ray/golden/bpe_train.json).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from marginalia_ray.ops.text_ops import _flat_tokens_rows

_MERGE_SCHEMA = {
    "step": pa.int64(),
    "left": pa.string(),
    "right": pa.string(),
    "merged": pa.string(),
    "n": pa.int64(),
}


def _register_merged(seen: set[str], merged: str, step: int) -> None:
    """Loud guard against a symbol-STRING collision: the engine
    identifies symbols by integer id while Sennrich semantics (and
    tools/bpe_reference.py) identify them by string, so two merge paths
    producing the same string ('a'+'bc' vs 'ab'+'c') would silently
    split pair counts here but conflate them in the reference.  Greedy
    all-positions apply makes this unreachable on normal corpora; if it
    ever fires, the corpus needs string-identified BPE."""
    if merged in seen:
        raise RuntimeError(
            f"bpe_train: step {step} merge produces symbol string "
            f"{merged!r} already learned via a different merge path — "
            "id-identified symbols diverge from string-identified "
            "Sennrich semantics on this corpus"
        )
    seen.add(merged)


def _syms_arrays(batch: pa.Table):
    """(values int64 np, offsets int64 np, freq int64 np) views of one
    vocabulary block."""
    syms = batch["syms"]
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    off = np.asarray(syms.offsets)
    vals = np.asarray(syms.values)
    freq = batch["freq"].to_numpy(zero_copy_only=False)
    return vals.astype(np.int64), off.astype(np.int64), freq.astype(np.int64)


def _syms_table(vals: np.ndarray, off: np.ndarray, freq: np.ndarray) -> pa.Table:
    lst = pa.LargeListArray.from_arrays(
        pa.array(off, pa.int64()), pa.array(vals, pa.int32())
    )
    return pa.table({"syms": lst, "freq": pa.array(freq, pa.int64())})


def _pair_positions(vals: np.ndarray, off: np.ndarray) -> np.ndarray:
    """Boolean mask over positions 0..len(vals)-2: True where the pair
    (vals[i], vals[i+1]) lies inside one word."""
    m = len(vals)
    valid = np.ones(max(m - 1, 0), dtype=bool)
    internal = off[1:-1]
    valid[internal - 1] = False
    return valid


def _weighted_pair_counts(vals, off, freq):
    """(uniq int64 pair codes, int64 counts) over one symbol block —
    code = left_id << 32 | right_id, weighted by word frequency."""
    if len(vals) < 2:
        return np.array([], np.int64), np.array([], np.int64)
    valid = _pair_positions(vals, off)
    codes = (vals[:-1] << np.int64(32)) | vals[1:]
    lens = np.diff(off)
    word_idx = np.repeat(np.arange(len(lens)), lens)
    wts = freq[word_idx[:-1]].astype(np.float64)
    codes, wts = codes[valid], wts[valid]
    if len(codes) == 0:
        return np.array([], np.int64), np.array([], np.int64)
    uniq, inv = np.unique(codes, return_inverse=True)
    cnt = np.bincount(inv, weights=wts).astype(np.int64)
    return uniq, cnt


def _apply_merge(vals, off, a: int, b: int, new_id: int):
    """Replace every greedy left-to-right occurrence of adjacent (a, b)
    with new_id — vectorized: within each maximal chain of consecutive
    candidate positions keep alternate ones (matches a sequential scan
    over equal-symbol runs like 'aaaa')."""
    if len(vals) < 2:
        return vals, off
    valid = _pair_positions(vals, off)
    cand = np.flatnonzero((vals[:-1] == a) & (vals[1:] == b) & valid)
    if len(cand) == 0:
        return vals, off
    chain = np.cumsum(np.r_[0, np.diff(cand) != 1])
    starts = np.flatnonzero(np.r_[True, np.diff(chain) != 0])
    idx_in_chain = np.arange(len(cand)) - np.repeat(
        starts, np.diff(np.r_[starts, len(cand)])
    )
    keep = cand[idx_in_chain % 2 == 0]
    vals2 = vals.copy()
    vals2[keep] = new_id
    drop = np.zeros(len(vals), dtype=bool)
    drop[keep + 1] = True
    new_vals = vals2[~drop]
    new_off = off - np.searchsorted(keep + 1, off, side="left")
    return new_vals, new_off


def _merges_table(merges: list[tuple[int, str, str, str, int]]) -> pa.Table:
    if not merges:
        return pa.table({k: pa.array([], t) for k, t in _MERGE_SCHEMA.items()})
    cols = list(zip(*merges))
    return pa.table(
        {
            "step": pa.array(cols[0], pa.int64()),
            "left": pa.array(cols[1], pa.string()),
            "right": pa.array(cols[2], pa.string()),
            "merged": pa.array(cols[3], pa.string()),
            "n": pa.array(cols[4], pa.int64()),
        }
    )


def _merge_loop_local(vals, off, freq, n_merges: int, min_count: int):
    """The full merge loop over in-memory arrays — used by the
    single-task fast path; identical kernels to the distributed path."""
    strings: dict[int, str] = {i: chr(i) for i in range(256)}
    seen: set[str] = set(strings.values())
    next_id = 256
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(n_merges):
        uniq, cnt = _weighted_pair_counts(vals, off, freq)
        if len(uniq) == 0:
            break
        best = np.lexsort((uniq, -cnt))[0]
        code, n_best = int(uniq[best]), int(cnt[best])
        if n_best < min_count:
            break
        a, b = code >> 32, code & 0xFFFFFFFF
        new_id = next_id
        next_id += 1
        strings[new_id] = strings[a] + strings[b]
        _register_merged(seen, strings[new_id], step)
        merges.append((step, strings[a], strings[b], strings[new_id], n_best))
        vals, off = _apply_merge(vals, off, a, b, new_id)
    return merges


def bpe_train(
    ds,
    text_col: str = "text",
    *,
    n_merges: int = 15,
    min_count: int = 2,
    local_cap: int = 2_000_000,
):
    """Learn `n_merges` BPE merges over the corpus; stops early when the
    best remaining pair occurs fewer than `min_count` times.

    Output: (step, left, right, merged, n) — one row per learned merge
    in order, with the symbols spelled out as strings."""

    if n_merges <= 0:
        raise ValueError("bpe_train: n_merges must be positive")

    # -- corpus -> (word, freq), then words -> byte-symbol lists --------
    def _wf_partial(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens_rows(batch, text_col)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if len(flat) == 0:
            return pa.table(
                {
                    "word": pa.array([], pa.large_string()),
                    "partial": pa.array([], pa.int64()),
                }
            )
        t = pa.table({"word": flat}).group_by("word").aggregate([([], "count_all")])
        return t.rename_columns(["word", "partial"])

    word_freq = (
        ds.map_batches(_wf_partial, batch_format="pyarrow")
        .groupby("word")
        .sum("partial")
    )

    def _to_syms(batch: pa.Table) -> pa.Table:
        w = batch["word"]
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        w = w.cast(pa.large_string())
        n = len(w)
        if n == 0:
            return _syms_table(
                np.array([], np.int64), np.array([0], np.int64), np.array([], np.int64)
            )
        off = np.frombuffer(w.buffers()[1], dtype=np.int64)[
            w.offset : w.offset + n + 1
        ]
        data = np.frombuffer(w.buffers()[2], dtype=np.uint8)[off[0] : off[-1]]
        off = off - off[0]
        freq = batch["sum(partial)"].to_numpy(zero_copy_only=False)
        return _syms_table(data.astype(np.int64), off, freq.astype(np.int64))

    vocab = word_freq.map_batches(_to_syms, batch_format="pyarrow").materialize()

    if vocab.count() <= local_cap:
        # one task runs the whole loop over the (small) vocabulary —
        # same kernels, none of the per-round shuffle fixed costs
        def _local(block: pa.Table) -> pa.Table:
            vals, off, freq = _syms_arrays(block)
            return _merges_table(
                _merge_loop_local(vals, off, freq, n_merges, min_count)
            )

        return vocab.repartition(1).map_batches(
            _local, batch_format="pyarrow", batch_size=None
        )

    strings: dict[int, str] = {i: chr(i) for i in range(256)}
    seen: set[str] = set(strings.values())
    next_id = 256
    merges: list[tuple[int, str, str, str, int]] = []

    for step in range(n_merges):
        def _pairs(batch: pa.Table) -> pa.Table:
            vals, off, freq = _syms_arrays(batch)
            uniq, cnt = _weighted_pair_counts(vals, off, freq)
            return pa.table(
                {
                    "code": pa.array(uniq, pa.int64()),
                    "partial": pa.array(cnt, pa.int64()),
                }
            )

        def _top1_block(block: pa.Table) -> pa.Table:
            if block.num_rows == 0:
                return pa.table(
                    {"code": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
                )
            code = block["code"].to_numpy(zero_copy_only=False)
            n = block[block.column_names[1]].to_numpy(zero_copy_only=False)
            best = np.lexsort((code, -n))[0]
            return pa.table(
                {
                    "code": pa.array([int(code[best])], pa.int64()),
                    "n": pa.array([int(n[best])], pa.int64()),
                }
            )

        top = (
            vocab.map_batches(_pairs, batch_format="pyarrow")
            .groupby("code")
            .sum("partial")
            .map_batches(_top1_block, batch_format="pyarrow")
            .repartition(1)
            .map_batches(_top1_block, batch_format="pyarrow", batch_size=None)
            .take_all()
        )
        if not top or top[0]["n"] < min_count:
            break
        code, n_best = int(top[0]["code"]), int(top[0]["n"])
        a, b = code >> 32, code & 0xFFFFFFFF
        new_id = next_id
        next_id += 1
        strings[new_id] = strings[a] + strings[b]
        _register_merged(seen, strings[new_id], step)
        merges.append((step, strings[a], strings[b], strings[new_id], n_best))

        def _apply(batch: pa.Table, a=a, b=b, new_id=new_id) -> pa.Table:
            vals, off, freq = _syms_arrays(batch)
            vals, off = _apply_merge(vals, off, a, b, new_id)
            return _syms_table(vals, off, freq)

        vocab = vocab.map_batches(_apply, batch_format="pyarrow").materialize()

    return ray.data.from_arrow(_merges_table(merges))
