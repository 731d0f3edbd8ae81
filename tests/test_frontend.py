"""Search-service result post-processing (reference cites in
query/frontend.py)."""

from marginalia_ray.functions.punchcard import print_bits
from marginalia_ray.query.frontend import (
    DecoratedResult,
    KeywordScore,
    QueryCounter,
    SPECIAL_STATE_PENALTY,
    decorate,
    frontend_results,
    positions_string,
)


def _r(i, score, url=None, **kw):
    return DecoratedResult(
        url=url or f"http://d{i}.example/p{i}",
        url_id=i,
        ranking=1,
        term_score=score,
        title=f"t{i}",
        data_hash=1 << (8 + (i % 40)),  # pairwise hamming 2
        **kw,
    )


class TestPositionsString:
    def test_and_within_or_across_subqueries(self):
        scores = [
            KeywordScore(0, 0b1110),
            KeywordScore(0, 0b0111),  # AND within subquery 0 -> 0b0110
            KeywordScore(1, 0b1000_0000),  # OR across -> 0b1000_0110
        ]
        assert positions_string(scores) == print_bits(0b1000_0110, 56)

    def test_synthetic_keywords_skipped(self):
        scores = [
            KeywordScore(0, 0b1), KeywordScore(0, 0b1111, is_regular=False),
        ]
        assert positions_string(scores) == print_bits(0b1, 56)

    def test_empty(self):
        assert positions_string([]) == print_bits(0, 56)


class TestDecorate:
    def test_special_state_penalty(self):
        plain = decorate(_r(1, 2.0))
        special = decorate(_r(2, 2.0, special_domain=True))
        assert plain.term_score == 2.0
        assert special.term_score == 2.0 + SPECIAL_STATE_PENALTY


class TestFrontendResults:
    def test_sort_dedup_and_caps(self):
        # scores ascending = better first (reference comparator is natural
        # order on termScore); same-domain results capped by the
        # deduplicator's strict < (2 kept at results_by_domain=3)
        results = [
            _r(3, 3.0, url="http://a.example/3"),
            _r(1, 1.0, url="http://a.example/1"),
            _r(2, 2.0, url="http://a.example/2"),
            _r(4, 4.0, url="http://b.example/4"),
        ]
        got = frontend_results(results, results_by_domain=3, results_total=10)
        assert [r.url_id for r in got] == [1, 2, 4]  # a/3 eaten by the cap

    def test_results_total_cut(self):
        results = [_r(i, float(i), url=f"http://d{i}.example/") for i in range(6)]
        got = frontend_results(results, results_by_domain=5, results_total=3)
        assert [r.url_id for r in got] == [0, 1, 2]

    def test_positions_card_attached(self):
        r = _r(1, 1.0, keyword_scores=[KeywordScore(0, 0b11)])
        got = frontend_results([r], results_by_domain=5, results_total=5)
        assert got[0].positions_card == print_bits(0b11, 56)


class TestQueryCounter:
    def test_minute_roll(self):
        c = QueryCounter()
        assert c.queries_per_minute == 0
        c.register_query(); c.register_query()
        assert c.queries_per_minute == 0  # still last minute's figure
        c.roll_minute()
        assert c.queries_per_minute == 2
        c.roll_minute()
        assert c.queries_per_minute == 0
