"""TermFrequencyDict construction (G9 / A2): corpus document frequency per
stemmed term, the IDF source for WordsTfIdfCounts.

Reference: the term-frequency-extractor tool
(/root/reference/code/tools/term-frequency-extractor/) walks a crawl,
sentence-extracts each doc, and counts docs per stemmed term into a flat
(hash, count) file (TermFrequencyDict.java:28-65); the converter loads it
once per process (A2).

Ray-native: distinct stems per doc computed inside map_batches (a doc never
spans batches), partial counts pre-aggregated per batch, one groupby(term)
shuffle.  The result is broadcast with ray.put and fetched once per
tokenizer actor (TokenizerStage.__init__).

Keys are the reference's 61-bit polynomial hash of the stemmed term
(TermFrequencyDict.getStringHash parity via term_freq_hash_stemmed) so the
dict stays memory-bounded at web scale (no strings retained).
"""

from __future__ import annotations

import pyarrow as pa

import ray

from marginalia_ray.functions.hashing import term_freq_hash_stemmed
from marginalia_ray.stages.extract import extract_document
from marginalia_ray.stages.sentences import extract_sentences_from_string


class TermFreqStage:
    """pages batch -> (term_key u64, partial doc-count) rows."""

    def __init__(self, use_html: bool = True):
        self.use_html = use_html

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts: list[str] = []
        if self.use_html and "html" in batch.column_names:
            for h in batch["html"].to_pylist():
                s = h.decode("utf-8", "replace") if isinstance(h, (bytes, bytearray)) else h
                texts.append(extract_document(s, skip_summary=True).text)
        else:
            texts = batch["text"].to_pylist()

        counts: dict[int, int] = {}
        for text in texts:
            stems = set()
            for sent in extract_sentences_from_string(text):
                stems.update(sent.stemmed)
            for st in stems:
                k = term_freq_hash_stemmed(st)
                counts[k] = counts.get(k, 0) + 1
        return pa.table(
            {
                "term_key": pa.array(list(counts.keys()), pa.uint64()),
                "partial": pa.array(list(counts.values()), pa.int64()),
            }
        )


def build_term_freq(pages_ds, concurrency: int | None = None, use_html: bool = True):
    """pages -> Dataset(term_key, doc_freq)."""
    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 8)) - 1)
    parts = pages_ds.map_batches(
        TermFreqStage,
        fn_constructor_kwargs={"use_html": use_html},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
    )
    out = parts.groupby("term_key").sum("partial")
    return out.rename_columns({"sum(partial)": "doc_freq"})


def term_freq_dict_ref(pages_ds, min_freq: int = 2, persist_path=None, **kwargs):
    """Aggregate to a {term_key: doc_freq} dict and ray.put it (the A2
    broadcast).  min_freq prunes the hapax tail (the bulk of the keys).

    persist_path: optionally also write the pruned (term_key, doc_freq)
    table as parquet — the query frontend's TermFrequencyDict (A5): the
    reference converter writes `tfreq-data.bin` once and every service
    loads it (TermFrequencyDict.java:42-60); here the query engine picks
    up `tfreq.parquet` next to the index for the stemmed-compound probe
    in QueryVariants."""
    ds = build_term_freq(pages_ds, **kwargs)
    if min_freq > 1:
        ds = ds.filter(expr=f"doc_freq >= {min_freq}")
    freqs: dict[int, int] = {}
    for ref in ds.to_arrow_refs():
        t = ray.get(ref)
        if not t.num_columns:
            continue
        freqs.update(
            zip(t["term_key"].to_pylist(), t["doc_freq"].to_pylist())
        )
    if persist_path is not None:
        import os

        import pyarrow.parquet as pq

        keys = pa.array(list(freqs.keys()), pa.uint64())
        vals = pa.array(list(freqs.values()), pa.int64())
        os.makedirs(os.path.dirname(str(persist_path)) or ".", exist_ok=True)
        tmp = str(persist_path) + ".tmp"
        pq.write_table(pa.table({"term_key": keys, "doc_freq": vals}), tmp)
        os.replace(tmp, str(persist_path))
    return ray.put(freqs)
