"""Distributed batch query evaluation over a searcher actor pool."""

import pytest


@pytest.fixture(scope="module")
def small_index(ray_session, tmp_path_factory):
    from marginalia_ray.pipelines.index_pipeline import run_index_pipeline
    from marginalia_ray.sources.pages import pages_parquet

    out = tmp_path_factory.mktemp("bq_idx")
    pages = pages_parquet(300, cache_dir=str(tmp_path_factory.mktemp("bq_pages")))
    run_index_pipeline(pages, str(out), n_shards=4, concurrency=2)
    return str(out)


def test_batch_matches_single(small_index, ray_session):
    import ray.data

    from marginalia_ray.query.batch import evaluate_queries
    from marginalia_ray.query.engine import IndexSearcher

    queries = ["search index", "data time", "rare10term"]
    ds = ray.data.from_items(
        [{"query_id": i, "query": q} for i, q in enumerate(queries)]
    )
    batch = evaluate_queries(ds, small_index, concurrency=2).to_pandas()

    s = IndexSearcher(small_index)
    for i, q in enumerate(queries):
        single = s.search_query(q)
        mine = batch[batch.query_id == i].sort_values("rank")
        assert mine["url_id"].tolist() == [r.url_id for r in single]
        assert mine["score"].tolist() == pytest.approx([r.score for r in single])
