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

    out = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("term")
        .sum("partial")
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
