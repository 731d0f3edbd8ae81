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


def _corpus_stats(ds, terms: list[str], text_col: str):
    """Pass A shared by bm25_topk and rrf_fusion: per-batch partial
    (n_docs, sum_dl, df per term) -> tiny aggregate -> broadcast
    (idf, avgdl) via ray.put."""

    def _stats(batch: pa.Table) -> pa.Table:
        tf, dl = _term_counts(batch, terms, text_col)
        row = {"n_docs": [len(batch)], "sum_dl": [float(dl.sum())]}
        for j in range(len(terms)):
            row[f"df_{j}"] = [float((tf[:, j] > 0).sum())]
        return pa.table(row)

    parts = ds.map_batches(_stats, batch_format="pyarrow")
    agg = parts.sum(["n_docs", "sum_dl"] + [f"df_{j}" for j in range(len(terms))])
    n_docs = agg["sum(n_docs)"]
    avgdl = agg["sum(sum_dl)"] / max(1, n_docs)
    df = np.array([agg[f"sum(df_{j})"] for j in range(len(terms))], dtype=np.float64)
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return ray.put((idf, avgdl))


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
    stats_ref = _corpus_stats(ds, terms, text_col)

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


def rrf_fusion(
    ds,
    terms_a: list[str],
    terms_b: list[str],
    k: int = 10,
    n: int = 20,
    rrf_k: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of two BM25
    rankings over the same corpus: rrf(d) = sum_lists 1/(rrf_k + rank_d),
    the standard hybrid-retrieval combiner.  Returns the top-k docs as
    (doc_id, rrf_score) ordered by (rrf_score desc, doc_id), rounded 6 dp.

    Scale shape — both rankings share the passes instead of running
    bm25_topk twice (4 corpus scans -> 2):
      pass A: one map + tiny aggregate -> global stats over the UNION
        vocabulary (N, avgdl, df per term).
      pass B: one map computes the tf matrix over the union vocabulary
        once, scores BOTH lists from column slices, and emits per-batch
        partial top-n rows tagged with the list id.
      reduce: groupby(list_id).map_groups top-n — two groups, each
        holding <= n rows per input block — then the <= 2n survivors fuse
        on the driver (bounded by n, never by the corpus).
    """
    lists = [[t.lower() for t in terms_a], [t.lower() for t in terms_b]]
    union_terms = sorted({t for lst in lists for t in lst})
    col_of = {t: j for j, t in enumerate(union_terms)}

    stats_ref = _corpus_stats(ds, union_terms, text_col)

    cols_per_list = [np.array([col_of[t] for t in lst]) for lst in lists]

    def _score(batch: pa.Table) -> pa.Table:
        idf_v, avg = ray.get(stats_ref)
        tf, dl = _term_counts(batch, union_terms, text_col)
        denom = tf + k1 * (1.0 - b + b * (dl[:, None] / avg))
        with np.errstate(invalid="ignore", divide="ignore"):
            contrib = idf_v[None, :] * np.where(tf > 0, tf / denom, 0.0)
        ids_all = batch[id_col].to_numpy(zero_copy_only=False)
        out_list, out_ids, out_s = [], [], []
        for li, cols in enumerate(cols_per_list):
            # sum in the list's own term order — the oracle CTE's order
            s = contrib[:, cols].sum(axis=1)
            hit = s > 0
            ids, sv = ids_all[hit], s[hit]
            order = np.lexsort((ids, -sv))[:n]
            out_list.append(np.full(len(order), li, np.int64))
            out_ids.append(ids[order])
            out_s.append(sv[order])
        return pa.table(
            {
                "list_id": pa.array(np.concatenate(out_list)),
                id_col: pa.array(np.concatenate(out_ids)),
                "s": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    def _topn(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        s = group["s"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s))[:n]
        return pa.table(
            {
                "list_id": group["list_id"].take(pa.array(order)),
                id_col: pa.array(ids[order]),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    survivors = (
        ds.map_batches(_score, batch_format="pyarrow")
        .groupby("list_id")
        .map_groups(_topn, batch_format="pyarrow")
        .take_all()  # <= 2n rows by construction
    )
    weights: dict[int, float] = {}
    for row in survivors:
        d = int(row[id_col])
        weights[d] = weights.get(d, 0.0) + 1.0 / (rrf_k + int(row["rank"]))
    if not weights:
        return pa.table(
            {id_col: pa.array([], pa.int64()), "rrf_score": pa.array([], pa.float64())}
        )
    ids = np.array(sorted(weights), dtype=np.int64)
    sc = np.round(np.array([weights[int(d)] for d in ids]), 6)
    order = np.lexsort((ids, -sc))[:k]
    return pa.table(
        {id_col: pa.array(ids[order]), "rrf_score": pa.array(sc[order], pa.float64())}
    )
