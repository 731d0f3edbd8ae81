"""CrawlJobDomainExtractor port (reference cites in ops/crawlspec.py);
oracle parity for the crawl_specs query is in tests/test_oracle.py."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from marginalia_ray.ops.crawlspec import (
    calculate_crawl_depth,
    crawl_spec_id,
    crawl_specs,
)


class TestCrawlDepth:
    def test_shallow_and_growth_and_cap(self):
        # calculateCrawlDepthFromVisitedCount
        assert calculate_crawl_depth(0) == 200
        assert calculate_crawl_depth(99) == 200
        assert calculate_crawl_depth(100) == 100 + 1000 + 25
        assert calculate_crawl_depth(1000) == 1000 + 1000 + 250
        assert calculate_crawl_depth(10**9) == 100_000


class TestCrawlSpecId:
    def test_guava_murmur_shape(self):
        a = crawl_spec_id("example.com")
        b = crawl_spec_id("example.org")
        assert a != b and len(a) == 32 and int(a, 16) >= 0
        assert crawl_spec_id("example.com") == a  # deterministic


class TestCrawlSpecs:
    def _run(self, ray_session):
        domains = ray.data.from_arrow(
            pa.table(
                {
                    # 1: active+indexed, 2: EXHAUSTED with indexed=0 (the
                    # precedence quirk admits it), 3: active NOT indexed
                    # (excluded), 4: blacklisted, 5: state 2 (excluded,
                    # but queued -> included with its id)
                    "domain_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                    "domain_name": pa.array(
                        ["A.example", "b.example", "c.example", "d.example",
                         "e.example"],
                        pa.string(),
                    ),
                    "state": pa.array([0, 1, 0, 0, 2], pa.int64()),
                    "indexed": pa.array([1, 0, 0, 1, 1], pa.int64()),
                }
            )
        )
        urls = ray.data.from_arrow(
            pa.table(
                {
                    "domain_id": pa.array([1, 1, 1, 2], pa.int64()),
                    "url": pa.array(
                        ["https://a.example/z", "https://a.example/a",
                         "https://a.example/m", "https://b.example/x"],
                        pa.string(),
                    ),
                    "visited": pa.array([True, False, True, False]),
                    "has_hash": pa.array([False, True, True, False]),
                    "url_id": pa.array([1, 2, 3, 4], pa.int64()),
                }
            )
        )
        queue = ray.data.from_arrow(
            pa.table(
                {
                    "domain_name": pa.array(
                        ["E.EXAMPLE", "new.example"], pa.string()
                    )
                }
            )
        )
        df = (
            crawl_specs(domains, urls, queue, blacklist=(4,), url_limit=2,
                        first_k=2)
            .to_pandas()
            .sort_values("domain_name")
            .reset_index(drop=True)
        )
        return df

    def test_candidates_quirk_queue_and_blacklist(self, ray_session):
        df = self._run(ray_session)
        # a (active+indexed), b (EXHAUSTED quirk), e (queued, resolved id),
        # new (queued unknown, id -1); c excluded, d blacklisted
        assert df["domain_name"].tolist() == [
            "a.example", "b.example", "e.example", "new.example"
        ]
        assert df["domain_id"].tolist() == [1, 2, 5, -1]

    def test_url_selection_order_and_natural_sort(self, ray_session):
        df = self._run(ray_session).set_index("domain_name")
        # domain 1: priority (visited desc, has_hash desc, id) = urls
        # id 3 (T,T), id 1 (T,F), id 2 (F,T); limit 2 keeps {3, 1} ->
        # natural sort -> /m before /z
        assert df.loc["a.example", "url_count"] == 2
        assert df.loc["a.example", "first_urls"] == (
            "https://a.example/m,https://a.example/z"
        )
        # unvisited-only domain still lists its url
        assert df.loc["b.example", "first_urls"] == "https://b.example/x"

    def test_depth_defaults(self, ray_session):
        df = self._run(ray_session).set_index("domain_name")
        # all visited counts < 100 -> MIN_VISIT_COUNT
        assert set(df["crawl_depth"]) == {200}
        # url-less candidates get 0 urls, empty head
        assert df.loc["new.example", "url_count"] == 0
        assert df.loc["new.example", "first_urls"] == ""
