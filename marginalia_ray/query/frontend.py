"""Search-service result post-processing: the glue between raw index
results and the rendered result list.

Ports (services-core/search-service/src/main/java/nu/marginalia/search/):
  * ``SearchQueryIndexService.executeQuery`` (svc/SearchQueryIndexService.
    java:45-75): decorate -> sort by (termScore, ranking, id) -> limit +
    deduplicate (UrlDeduplicator with queryLimits.resultsByDomain, cut to
    queryLimits.resultsTotal).
  * ``SearchResultDecorator`` (results/SearchResultDecorator.java:23-115):
    the SPECIAL-domain ``statePenalty`` (+1.25) on the valuator score and
    the positions punch-card string — keyword positions AND-ed within
    each subquery, OR-ed across subqueries, rendered with the
    braille-block punch card over 56 bits.  The decorator's valuator
    re-run uses the DB-stored word count; this engine computed the same
    valuator score index-side, so the score is taken as input rather
    than recomputed (documented equivalence).
  * ``SearchQueryCountService`` (svc/SearchQueryCountService.java:13-48):
    the per-minute query counter behind the front page's
    "searches/minute" figure, with the minute-roll made explicit
    (``roll_minute``) instead of a daemon thread.

Dedup/caps are ``query/url_dedup.UrlDeduplicator`` — the screenshot,
LSH and domain-key gates ported there.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable, Optional, Sequence

from ..functions.punchcard import print_bits
from .url_dedup import ResultUrl, UrlDeduplicator

SPECIAL_STATE_PENALTY = 1.25  # SearchResultDecorator.calculateTermScore


@dataclass(frozen=True)
class KeywordScore:
    """The SearchResultKeywordScore fields the decorator reads."""

    subquery: int
    positions: int  # WordMetadata positions mask
    is_regular: bool = True  # isKeywordRegular (not a synthetic keyword)


@dataclass
class DecoratedResult:
    """UrlDetails after decoration, pre-dedup."""

    url: str
    url_id: int
    ranking: int
    term_score: float
    title: Optional[str] = None
    data_hash: int = 0
    special_domain: bool = False
    keyword_scores: Sequence[KeywordScore] = field(default_factory=tuple)
    positions_card: str = ""


def positions_string(keyword_scores: Iterable[KeywordScore]) -> str:
    """SearchResultDecorator.getPositionsString: AND regular keywords'
    position masks within each subquery, OR across subqueries, punch-card
    the low 56 bits."""
    per_set: dict[int, int] = {}
    for score in keyword_scores:
        if not score.is_regular:
            continue
        if score.subquery in per_set:
            per_set[score.subquery] &= score.positions
        else:
            per_set[score.subquery] = score.positions
    bits = 0
    for v in per_set.values():
        bits |= v
    return print_bits(bits, 56)


def decorate(
    result: DecoratedResult, *, valuator_score: Optional[float] = None
) -> DecoratedResult:
    """Apply the decorator's score adjustment + positions card in place."""
    score = result.term_score if valuator_score is None else valuator_score
    if result.special_domain:
        score += SPECIAL_STATE_PENALTY
    result.term_score = score
    result.positions_card = positions_string(result.keyword_scores)
    return result


def rank_and_deduplicate(
    results: Iterable[DecoratedResult],
    *,
    results_by_domain: int,
    results_total: int,
) -> list[DecoratedResult]:
    """executeQuery + limitAndDeduplicateResults: sort by (termScore asc,
    ranking, id), run the UrlDeduplicator gates in that order, cut to
    ``results_total``."""
    ordered = sorted(
        results, key=lambda r: (r.term_score, r.ranking, r.url_id)
    )
    dedup = UrlDeduplicator(results_by_domain)
    out: list[DecoratedResult] = []
    for r in ordered:
        if len(out) >= results_total:
            break
        if dedup.filter(
            ResultUrl(r.url, r.title, r.data_hash, r.special_domain)
        ):
            out.append(r)
    return out


def frontend_results(
    results: Iterable[DecoratedResult],
    *,
    results_by_domain: int = 5,
    results_total: int = 100,
) -> list[DecoratedResult]:
    """The full service pass: decorate every result, then rank + dedup."""
    return rank_and_deduplicate(
        [decorate(r) for r in results],
        results_by_domain=results_by_domain,
        results_total=results_total,
    )


class QueryCounter:
    """SearchQueryCountService: queries-per-minute for the front page.
    The reference rolls the counter from a daemon thread once a minute;
    here ``roll_minute`` is explicit so callers own the clock."""

    def __init__(self) -> None:
        self._current = 0
        self._last_minute = 0

    def register_query(self) -> None:
        self._current += 1

    def roll_minute(self) -> None:
        self._last_minute = self._current
        self._current = 0

    @property
    def queries_per_minute(self) -> int:
        return self._last_minute
