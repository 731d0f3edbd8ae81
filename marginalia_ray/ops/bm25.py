"""Streaming BM25 top-k over a plain text column with the SQL-replicable
simple tokenizer.

This is the classic two-pass plan (the full Marginalia-parity BM25 with
positions/flags lives in marginalia_ray.query.engine over built segments):
  pass A: one map + tiny aggregate -> global stats (N, avgdl, df per term)
  pass B: one map with broadcast stats -> per-doc scores -> per-batch
          partial top-k -> global sort+limit over the (small) survivors.
Nothing materializes but the per-term stats and the final k rows.

BM25 formula (Robertson/Sparck-Jones, same shape as the reference's
Bm25Factor.java:9-44 with tf = term frequency):
  idf = ln(1 + (N - n + 0.5)/(n + 0.5))
  score = sum_t idf_t * tf/(tf + k1*(1 - b + b*dl/avgdl))
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from marginalia_ray.ops.text_ops import TOKEN_MATCH


def _term_counts(batch: pa.Table, terms: list[str], text_col: str) -> tuple[np.ndarray, np.ndarray]:
    """(n_docs, n_terms) tf matrix + doc lengths, fully vectorized."""
    lower = pc.utf8_lower(batch[text_col])
    dl = pc.count_substring_regex(lower, TOKEN_MATCH).to_numpy(zero_copy_only=False)
    tf = np.empty((len(batch), len(terms)), dtype=np.float64)
    for j, t in enumerate(terms):
        # token-exact: term bounded by non-alphanumerics (RE2 \b is safe
        # because terms are purely alphanumeric)
        patt = rf"\b{t}\b"
        tf[:, j] = pc.count_substring_regex(lower, patt).to_numpy(zero_copy_only=False)
    return tf, dl.astype(np.float64)


def bm25_topk(
    ds,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Top-k docs by BM25 over `terms`: (doc_id, score) with score rounded
    to 6 dp, ties broken by ascending doc id."""
    terms = [t.lower() for t in terms]

    # pass A: global stats via per-batch partials -> tiny aggregate
    def _stats(batch: pa.Table) -> pa.Table:
        tf, dl = _term_counts(batch, terms, text_col)
        row = {"n_docs": [len(batch)], "sum_dl": [float(dl.sum())]}
        for j, t in enumerate(terms):
            row[f"df_{j}"] = [float((tf[:, j] > 0).sum())]
        return pa.table(row)

    parts = ds.map_batches(_stats, batch_format="pyarrow")
    agg = parts.sum(["n_docs", "sum_dl"] + [f"df_{j}" for j in range(len(terms))])
    n_docs = agg["sum(n_docs)"]
    avgdl = agg["sum(sum_dl)"] / max(1, n_docs)
    df = np.array([agg[f"sum(df_{j})"] for j in range(len(terms))], dtype=np.float64)
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    stats_ref = ray.put((idf, avgdl))

    # pass B: score + per-batch partial top-k
    def _score(batch: pa.Table) -> pa.Table:
        idf_v, avg = ray.get(stats_ref)
        tf, dl = _term_counts(batch, terms, text_col)
        denom = tf + k1 * (1.0 - b + b * (dl[:, None] / avg))
        with np.errstate(invalid="ignore", divide="ignore"):
            s = (idf_v[None, :] * np.where(tf > 0, tf / denom, 0.0)).sum(axis=1)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        hit = s > 0
        ids, s = ids[hit], s[hit]
        order = np.lexsort((ids, -s))[:k]
        return pa.table({id_col: pa.array(ids[order]), "score": pa.array(s[order], pa.float64())})

    scored = ds.map_batches(_score, batch_format="pyarrow")

    # global top-k: survivors are <= k per input batch — a tiny sort
    def _round(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("score"),
            "score",
            pc.round(batch["score"], ndigits=6),
        )

    return scored.sort(["score", id_col], descending=[True, False]).limit(k).map_batches(
        _round, batch_format="pyarrow"
    )
