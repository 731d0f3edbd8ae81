"""API-service edge: token-bucket rate limiting, the response cache,
and the endpoint composition (reference cites in query/api.py)."""

import pytest

from marginalia_ray.query.api import (
    ApiEndpoint,
    ApiError,
    ApiLicense,
    RateLimiter,
    RateLimiterService,
    ResponseCache,
)


class Clock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


class TestRateLimiter:
    def test_burst_then_greedy_refill(self):
        clk = Clock()
        rl = RateLimiter(3, 10, clock=clk)  # 3 burst, 1 token / 10 s
        assert [rl.is_allowed("ip") for _ in range(4)] == [True, True, True, False]
        clk.t = 5.0  # half a token
        assert not rl.is_allowed("ip")
        clk.t = 10.0
        assert rl.is_allowed("ip")
        assert not rl.is_allowed("ip")

    def test_per_key_buckets_and_internal_bypass(self):
        clk = Clock()
        rl = RateLimiter(1, 10, clock=clk)
        assert rl.is_allowed("a")
        assert not rl.is_allowed("a")
        assert rl.is_allowed("b")  # separate bucket
        assert rl.is_allowed("a", public=False)  # internal bypass
        rl.clean_idle_buckets()
        assert rl.is_allowed("a")  # fresh bucket after the 30-min clear

    def test_presets(self):
        assert (RateLimiter.for_expensive_request().capacity,
                RateLimiter.for_expensive_request().refill_rate) == (5, 10)
        assert (RateLimiter.custom(25).capacity,
                RateLimiter.custom(25).refill_rate) == (25, 60)
        assert (RateLimiter.for_spam_bots().capacity,
                RateLimiter.for_spam_bots().refill_rate) == (120, 3600)
        assert (RateLimiter.for_login().capacity,
                RateLimiter.for_login().refill_rate) == (3, 15)


class TestRateLimiterService:
    def test_zero_rate_unrestricted(self):
        svc = RateLimiterService(clock=Clock())
        lic = ApiLicense("k", "CC0", "n", rate=0)
        assert all(svc.is_allowed(lic) for _ in range(1000))
        assert svc.size() == 0  # no limiter materialized

    def test_per_license_limits(self):
        clk = Clock()
        svc = RateLimiterService(clock=clk)
        a = ApiLicense("a", "CC0", "n", rate=2)
        b = ApiLicense("b", "CC0", "n", rate=2)
        assert svc.is_allowed(a) and svc.is_allowed(a)
        assert not svc.is_allowed(a)
        assert svc.is_allowed(b)
        assert svc.size() == 2
        svc.clear()
        assert svc.is_allowed(a)


class TestResponseCache:
    def test_ttl_and_key_isolation(self):
        clk = Clock()
        c = ResponseCache(clock=clk)
        a = ApiLicense("a", "CC0", "n", 0)
        b = ApiLicense("b", "CC0", "n", 0)
        c.put_results(a, "q", None, {"r": 1})
        assert c.get_results(a, "q", None) == {"r": 1}
        assert c.get_results(b, "q", None) is None  # per-license key
        assert c.get_results(a, "q", "count=5") is None  # params in key
        clk.t = 31.0
        assert c.get_results(a, "q", None) is None  # expire-after-write

    def test_lru_bound(self):
        clk = Clock()
        c = ResponseCache(max_size=2, clock=clk)
        lic = ApiLicense("a", "CC0", "n", 0)
        c.put_results(lic, "q1", None, 1)
        c.put_results(lic, "q2", None, 2)
        c.put_results(lic, "q3", None, 3)  # evicts q1
        assert c.get_results(lic, "q1", None) is None
        assert c.get_results(lic, "q2", None) == 2


class TestApiEndpoint:
    def _ep(self, rate=0, clk=None):
        clk = clk or Clock()
        calls = []

        def search(query, count, index):
            calls.append((query, count, index))
            return {"query": query, "count": count, "index": index}

        ep = ApiEndpoint(
            license_lookup=lambda k: ApiLicense(k, "CC-BY-NC-SA", "tester", rate),
            search=search,
            cache=ResponseCache(clock=clk),
            limiter=RateLimiterService(clock=clk),
        )
        return ep, calls

    def test_defaults_license_stamp_and_cache(self):
        ep, calls = self._ep()
        r = ep.handle("key", "hello world")
        assert r["count"] == 20 and r["index"] == 3
        assert r["license"] == "CC-BY-NC-SA"
        r2 = ep.handle("key", "hello world")
        assert r2 == r and len(calls) == 1  # cache hit, no second search

    def test_bad_int_param_400(self):
        ep, _ = self._ep()
        with pytest.raises(ApiError) as e:
            ep.handle("key", "q", {"count": "nope"})
        assert e.value.status == 400

    def test_rate_limit_503_but_cache_still_serves(self):
        clk = Clock()
        ep, calls = self._ep(rate=1, clk=clk)
        ep.handle("key", "q1")  # consumes the single token
        # identical repeat is served from the cache BEFORE the limiter
        assert ep.handle("key", "q1")["query"] == "q1"
        with pytest.raises(ApiError) as e:
            ep.handle("key", "q2")  # distinct query -> limiter -> 503
        assert e.value.status == 503
