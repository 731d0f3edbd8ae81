"""Independent pure-Python BPE reference (Sennrich et al. 2016) — the
oracle for ops/bpe.bpe_train.

Deliberately the obvious sequential algorithm: Counter-based pair
counts over a (word-tuple, freq) dict and a left-to-right greedy scan
per word for the merge apply.  Shares only the SPEC with the engine
([a-z0-9]+ lowercase tokens; tie-break by smallest (id_left, id_right)
where ids are byte values for single chars and 256+creation-order for
merged symbols), none of the vectorized implementation.

Used by tests/test_bpe_train.py for randomized parity and by
tools/regen_bpe_golden.py to produce the checked-in golden the
oracle_sql dispatches on.
"""

from __future__ import annotations

import re
from collections import Counter

_TOKEN = re.compile(r"[a-z0-9]+")


def ref_bpe(
    texts: list[str], n_merges: int, min_count: int = 2
) -> list[dict]:
    words: Counter = Counter()
    for t in texts:
        for w in _TOKEN.findall(t.lower()):
            words[w] += 1
    vocab: dict[tuple, int] = {}
    for w, c in words.items():
        key = tuple(w)
        vocab[key] = vocab.get(key, 0) + c

    ids = {chr(i): i for i in range(256)}
    next_id = 256
    merges = []
    for step in range(n_merges):
        pair_counts: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] += c
        if not pair_counts:
            break
        best, n = min(
            pair_counts.items(),
            key=lambda kv: (-kv[1], ids[kv[0][0]], ids[kv[0][1]]),
        )
        if n < min_count:
            break
        merged = best[0] + best[1]
        if merged in ids:
            # mirror ops/bpe._register_merged: a string collision between
            # merge paths would silently conflate symbols here (the ids
            # dict overwrite) while the engine keeps them distinct
            raise RuntimeError(
                f"ref_bpe: step {step} merge produces already-known "
                f"symbol string {merged!r}"
            )
        ids[merged] = next_id
        next_id += 1
        merges.append(
            {
                "step": step,
                "left": best[0],
                "right": best[1],
                "merged": merged,
                "n": n,
            }
        )
        new_vocab: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges
