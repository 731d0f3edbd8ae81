"""The factors corpus — the reference query set's index fixture (F2 in
FIXTURES.md; port of IndexQueryServiceIntegrationTest.loadData,
/root/reference/code/services-core/index-service/src/test/java/nu/marginalia/index/svc/IndexQueryServiceIntegrationTest.java:168-198):
doc i (1..511) contains keywords = decimal factors of i with
WordMetadata(positions=factor_index, {Title}); docMeta year=i%5, sets=i,
quality=i%20.  Used by the rank-parity tests and the query-latency bench."""

from __future__ import annotations

import pyarrow as pa

from marginalia_ray.functions.hashing import term_hash
from marginalia_ray.model.codecs import WordFlags, encode_doc_meta, encode_word_meta


def factors(i: int) -> list[int]:
    return [v for v in range(1, i + 1) if i % v == 0]


def make_factors_journal(with_domain: bool = False, n: int = 511) -> pa.Table:
    doc_ids, doc_metas, term_lists, meta_lists = [], [], [], []
    for i in range(1, n + 1):
        fs = factors(i)
        if with_domain:
            # loadDataWithDomain: domain = i/100, docMeta default (0)
            doc_ids.append(i | ((i // 100) << 32))
            doc_metas.append(0)
        else:
            # loadData: fullId = id | (32 - (id % 32)) << 32
            doc_ids.append(i | ((32 - (i % 32)) << 32))
            doc_metas.append(encode_doc_meta(year=i % 5, sets=i, quality=i % 20))
        term_lists.append([term_hash(str(f)) for f in fs])
        meta_lists.append(
            [encode_word_meta(idx, WordFlags.Title.bit) for idx in range(len(fs))]
        )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.uint64()),
            "doc_meta": pa.array(doc_metas, type=pa.uint64()),
            "term_hashes": pa.array(term_lists, type=pa.list_(pa.uint64())),
            "kw_metas": pa.array(meta_lists, type=pa.list_(pa.uint64())),
        }
    )


# the reference integration test's query set (file:71-165): include/exclude
# lists driven through the same SearchSpec path as production queries
REFERENCE_QUERIES: list[dict] = [
    {"include": ["3", "5", "2"], "exclude": ["4"]},
    {"include": ["7", "2"], "exclude": []},
    {"include": ["3"], "exclude": ["5"]},
    {"include": ["2"], "exclude": []},
    {"include": ["4"], "exclude": [], "year": 1998},
]
