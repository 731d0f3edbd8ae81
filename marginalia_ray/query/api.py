"""API-service edge: license-keyed rate limiting, the response cache,
and the search-endpoint composition.

Ports (services-satellite/api-service/src/main/java/nu/marginalia/api/
and common/service/.../server/RateLimiter.java):
  * ``RateLimiter`` (RateLimiter.java:16-70) — a token bucket per
    context key: classic bandwidth of ``capacity`` tokens with a greedy
    refill of ONE token per ``refill_seconds`` (bucket4j
    ``Refill.greedy(1, ofSeconds(n))`` — continuous fractional refill),
    full at creation.  Presets: forExpensiveRequest(5, 10),
    custom(perMinute, 60), forSpamBots(120, 3600), forLogin(3, 15).
    ``custom``'s burst-of-perMinute-then-1-per-minute sustain is the
    reference's exact behavior, kept as written.  The reference clears
    ALL buckets every 30 minutes (cleanIdleBuckets); here exposed as
    ``clean_idle_buckets()`` for the caller's scheduler.
  * ``ApiLicense`` (model/ApiLicense.java) — key/license/name/rate;
    rate <= 0 means unrestricted.
  * ``RateLimiterService`` (svc/RateLimiterService.java:10-32) — one
    custom(rate) limiter per license, created on first use.
  * ``ResponseCache`` (svc/ResponseCache.java:22-46) — 30 s
    expire-after-write AND expire-after-access, max 128 entries, key =
    ``licenseKey:query:params`` (the SearXNG shotgun-query mitigation).
  * ``ApiService.search`` (ApiService.java:69-107) — cache hit
    short-circuits BEFORE the rate limiter; misses consult the limiter
    (503 on exhaustion), parse ``count``/``index`` with defaults 20/3
    (400 on non-integer), run the search, stamp the license terms, and
    fill the cache.

Time is an injected ``clock()`` (seconds, monotonic) so every behavior
is deterministic under test; production callers pass time.monotonic.
"""

from __future__ import annotations

import time
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Any, Callable, Optional


@dataclass(frozen=True)
class ApiLicense:
    """ApiLicense.java: rate <= 0 means unrestricted."""

    key: str
    license: str
    name: str
    rate: int = 0


class ApiError(Exception):
    """Spark.halt(status, message)."""

    def __init__(self, status: int, message: str):
        super().__init__(f"{status}: {message}")
        self.status = status
        self.message = message


class _Bucket:
    """bucket4j classic bandwidth + greedy refill: starts full, refills
    ``1 / refill_seconds`` tokens per second continuously."""

    def __init__(self, capacity: int, refill_seconds: int, clock: Callable[[], float]):
        self.capacity = float(capacity)
        self.rate = 1.0 / float(refill_seconds)
        self.clock = clock
        self.tokens = self.capacity
        self.last = clock()

    def try_consume(self, n: int = 1) -> bool:
        now = self.clock()
        self.tokens = min(self.capacity, self.tokens + (now - self.last) * self.rate)
        self.last = now
        if self.tokens >= n:
            self.tokens -= n
            return True
        return False


class RateLimiter:
    """RateLimiter.java:16-70 — per-context-key buckets."""

    def __init__(self, capacity: int, refill_rate: int,
                 clock: Callable[[], float] = time.monotonic):
        self.capacity = capacity
        self.refill_rate = refill_rate
        self.clock = clock
        self._buckets: dict[str, _Bucket] = {}

    @classmethod
    def for_expensive_request(cls, clock=time.monotonic) -> "RateLimiter":
        return cls(5, 10, clock)

    @classmethod
    def custom(cls, per_minute: int, clock=time.monotonic) -> "RateLimiter":
        return cls(per_minute, 60, clock)

    @classmethod
    def for_spam_bots(cls, clock=time.monotonic) -> "RateLimiter":
        return cls(120, 3600, clock)

    @classmethod
    def for_login(cls, clock=time.monotonic) -> "RateLimiter":
        return cls(3, 15, clock)

    def is_allowed(self, context_id: str = "any", public: bool = True) -> bool:
        if not public:  # internal server->server requests bypass
            return True
        bucket = self._buckets.get(context_id)
        if bucket is None:
            bucket = self._buckets[context_id] = _Bucket(
                self.capacity, self.refill_rate, self.clock
            )
        return bucket.try_consume(1)

    def clean_idle_buckets(self) -> None:
        """The reference schedules this every 30 min and clears ALL
        buckets (cleanIdleBuckets, RateLimiter.java:47-49)."""
        self._buckets.clear()


class RateLimiterService:
    """RateLimiterService.java:10-32: one custom(rate) limiter per
    license; rate <= 0 is always allowed."""

    def __init__(self, clock: Callable[[], float] = time.monotonic):
        self.clock = clock
        self._limiters: dict[ApiLicense, RateLimiter] = {}

    def is_allowed(self, license: ApiLicense) -> bool:
        if license.rate <= 0:
            return True
        limiter = self._limiters.get(license)
        if limiter is None:
            limiter = self._limiters[license] = RateLimiter.custom(
                license.rate, self.clock
            )
        return limiter.is_allowed()

    def clear(self) -> None:
        self._limiters.clear()

    def size(self) -> int:
        return len(self._limiters)


class ResponseCache:
    """ResponseCache.java:22-46: 30 s expire-after-write and
    expire-after-access, LRU bound 128."""

    def __init__(self, ttl_seconds: float = 30.0, max_size: int = 128,
                 clock: Callable[[], float] = time.monotonic):
        self.ttl = ttl_seconds
        self.max_size = max_size
        self.clock = clock
        # key -> (value, write_time, access_time); OrderedDict as LRU
        self._cache: "OrderedDict[str, tuple[Any, float, float]]" = OrderedDict()

    @staticmethod
    def _key(license: ApiLicense, query: str, params: Optional[str]) -> str:
        return f"{license.key}:{query}:{params}"

    def _expired(self, entry: tuple[Any, float, float], now: float) -> bool:
        _v, wrote, accessed = entry
        return (now - wrote) > self.ttl or (now - accessed) > self.ttl

    def get_results(self, license: ApiLicense, query: str,
                    params: Optional[str]) -> Optional[Any]:
        k = self._key(license, query, params)
        entry = self._cache.get(k)
        if entry is None:
            return None
        now = self.clock()
        if self._expired(entry, now):
            del self._cache[k]
            return None
        self._cache[k] = (entry[0], entry[1], now)  # refresh access
        self._cache.move_to_end(k)
        return entry[0]

    def put_results(self, license: ApiLicense, query: str,
                    params: Optional[str], results: Any) -> None:
        k = self._key(license, query, params)
        now = self.clock()
        self._cache[k] = (results, now, now)
        self._cache.move_to_end(k)
        while len(self._cache) > self.max_size:
            self._cache.popitem(last=False)

    def clean_up(self) -> None:
        now = self.clock()
        for k in [k for k, e in self._cache.items() if self._expired(e, now)]:
            del self._cache[k]


@dataclass
class ApiEndpoint:
    """ApiService.search + doSearch (ApiService.java:69-107): cache-hit
    short-circuit BEFORE rate limiting, 503 on exhaustion, count/index
    defaults 20/3 with 400 on malformed ints, license terms stamped on
    the result."""

    license_lookup: Callable[[str], ApiLicense]
    search: Callable[..., dict]  # (query, count, index) -> result dict
    cache: ResponseCache = field(default_factory=ResponseCache)
    limiter: RateLimiterService = field(default_factory=RateLimiterService)

    def handle(self, key: str, query: str, params: Optional[dict] = None) -> dict:
        params = params or {}
        license = self.license_lookup(key)
        qs = "&".join(f"{k}={v}" for k, v in sorted(params.items())) or None

        cached = self.cache.get_results(license, query, qs)
        if cached is not None:
            return cached

        if not self.limiter.is_allowed(license):
            raise ApiError(503, "Slow down")

        count = self._int_param(params, "count", 20)
        index = self._int_param(params, "index", 3)
        result = dict(self.search(query, count=count, index=index))
        result["license"] = license.license  # withLicense
        self.cache.put_results(license, query, qs, result)
        return result

    @staticmethod
    def _int_param(params: dict, name: str, default: int) -> int:
        value = params.get(name)
        if value is None:
            return default
        try:
            return int(value)
        except (TypeError, ValueError):
            raise ApiError(400, f"Invalid parameter value for {name}")
