"""Model-scoring ops: hashing-trick linear text classification.

The standard quality-classifier step of a pre-training pipeline (GPT-3's
WebText LR filter, CCNet's fastText scoring, FineWeb's edu classifier)
is, at execution level, "hash each token into a weight table, sum, apply
a link function" — embarrassingly parallel, ONE streaming map, no
shuffle.  This module implements that execution shape exactly:

  * token hashing reuses the repo-wide vectorized chain
    (poly-FNV over bytes -> fmix64, `ops/dedup._token_hash_arrow`) so the
    DuckDB oracle can reproduce every hash in HUGEINT arithmetic;
  * the weight table is IMPLICIT: w(token) = (fmix64(h ^ seed) % 2001)
    - 1000, an integer in [-1000, 1000].  A trained model would broadcast
    its real table via ray.put and look it up the same way — the seeded
    weights stand in for training (which is out of scope), while keeping
    the op a pure function of (corpus, seed) so it is oracle-checkable;
  * per-doc aggregation is a bincount over list_parent_indices — margins
    stay INTEGER-exact (no float summation-order dependence between Ray
    partitions and the SQL oracle).

Scale notes (100 TB): stateless map over batches, zero-copy Arrow in,
~24 bytes/doc out; weight lookups are O(tokens) numpy; nothing
materializes.  With a real (trained) weight table the only change is a
`ray.put` of the table and an actor-pool `map_batches` holding it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from marginalia_ray.ops.dedup import U64, _fmix64_vec, _token_hash_arrow
from marginalia_ray.ops.text_ops import TOKEN_SPLIT

# default weight seed — any uint64; the oracle inlines the same constant
CLF_SEED = 0x5EEDC1A55F17E500
_W_MOD = 2001  # weights span [-1000, 1000]


def linear_classifier(
    ds,
    seed: int = CLF_SEED,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Score every document with a hashing-trick linear classifier:
    (doc_id, margin, n_tokens, label) where
    margin = sum over token OCCURRENCES of w(token),
    w(t) = (fmix64(token_hash(t) ^ seed) % 2001) - 1000, and
    label = 1 if margin > 0 else 0.

    Integer-exact by construction (see module docstring); zero-token
    documents get margin 0 / label 0."""
    seed_u = U64(seed)

    def _batch(batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        lower = pc.utf8_lower(batch[text_col])
        lists = pc.split_pattern_regex(lower, TOKEN_SPLIT)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists)
        mask = pc.not_equal(flat, "")
        flat = flat.filter(mask)
        par = parents.filter(mask).to_numpy(zero_copy_only=False)

        h = _token_hash_arrow(flat)
        w = (_fmix64_vec(h ^ seed_u) % U64(_W_MOD)).astype(np.int64) - 1000
        # bincount float64 accumulation is exact here: |margin| <= 1000 *
        # n_tokens << 2^53 for any real document batch
        margin = np.bincount(par, weights=w.astype(np.float64), minlength=n_rows)
        margin = margin.astype(np.int64)
        n_tok = np.bincount(par, minlength=n_rows).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "margin": pa.array(margin, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "label": pa.array((margin > 0).astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(_batch, batch_format="pyarrow")
