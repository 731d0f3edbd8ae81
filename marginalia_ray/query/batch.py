"""Distributed batch query evaluation: an actor-pool of IndexSearchers
(A6 in SURVEY.md §2.3 — each query actor owns immutable segment handles)
driven by map_batches over a query table.

This is the Ray-native form of the reference's thread-per-request index
service (IndexQueryService, SURVEY.md Q9): for parity tests and batch
evaluation/benchmarks, queries are rows and results are rows.

    queries_ds: (query_id: int64, query: string)   # raw query strings
    -> (query_id, rank, url_id, domain_id, score)

Actors load the CURRENT build once in __init__ (hot-swap = new pool on a
new build id); per-term posting decodes are cached per actor.
"""

from __future__ import annotations

import pyarrow as pa

import ray


class SearcherStage:
    def __init__(self, index_root: str, limit_total: int = 10):
        from marginalia_ray.query.engine import IndexSearcher

        self.searcher = IndexSearcher(index_root)
        self.limit_total = limit_total

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["query_id"].to_pylist()
        queries = batch["query"].to_pylist()
        out = {"query_id": [], "rank": [], "url_id": [], "domain_id": [], "score": []}
        for qid, q in zip(qids, queries):
            results = self.searcher.search_query(q, limit_total=self.limit_total)
            for rank, r in enumerate(results):
                out["query_id"].append(qid)
                out["rank"].append(rank)
                out["url_id"].append(r.url_id)
                out["domain_id"].append(r.domain_id)
                out["score"].append(r.score)
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "rank": pa.array(out["rank"], pa.int32()),
                "url_id": pa.array(out["url_id"], pa.int64()),
                "domain_id": pa.array(out["domain_id"], pa.int64()),
                "score": pa.array(out["score"], pa.float64()),
            }
        )


def evaluate_queries(
    queries_ds,
    index_root: str,
    *,
    limit_total: int = 10,
    concurrency: int | None = None,
    batch_size: int = 64,
):
    """Fan queries over a searcher actor pool; returns the results Dataset."""
    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 8)) - 1)
    return queries_ds.map_batches(
        SearcherStage,
        fn_constructor_kwargs={"index_root": index_root, "limit_total": limit_total},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
