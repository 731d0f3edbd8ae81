"""Golden mirrors for the round-4 summary upgrade:

- HeuristicTextUtilTest.java:12-48 (the B A Baracus word-boundary cases)
- SummarizingDOMFilter branch selection (DomFilterHeuristic) semantics
- TagDensityHeuristic block qualification
"""

from marginalia_ray.stages.extract import parse_html
from marginalia_ray.stages.summary import extract_summary
from marginalia_ray.stages.summary_dom import (
    count_occurrences_of_any_word,
    dom_filter_summary,
    tag_density_summary,
)

SENTENCE = "B A Baracus was an expert with the Abacus"


class TestHeuristicTextUtil:
    """HeuristicTextUtilTest mirrored."""

    def test_count_occurrences_of_any_word(self):
        assert (
            count_occurrences_of_any_word(SENTENCE, {"b", "a", "baracus", "abacus"})
            == 4
        )

    def test_word_boundaries(self):
        for w in ("b", "a", "baracus", "abacus"):
            assert count_occurrences_of_any_word(SENTENCE, [w]) == 1
        # "cus" appears only inside words -> no match
        assert count_occurrences_of_any_word(SENTENCE, ["cus"]) == 0

    def test_all_lowercase_path(self):
        s = SENTENCE.lower()
        assert count_occurrences_of_any_word(s, ["baracus", "cus"]) == 1


ARTICLE = " ".join(
    f"word{i} article prose sentence continues with plenty of letters"
    for i in range(4)
)
LINKS = "".join(f'<a href="/{i}">link text {i}</a>' for i in range(30))


class TestDomFilterSummary:
    def test_picks_high_ratio_branch_over_link_farm(self):
        html = f"""<html><body>
        <div id="nav-ish">{LINKS}</div>
        <div id="art"><p>{ARTICLE}</p></div>
        </body></html>"""
        s = dom_filter_summary(parse_html(html))
        assert "article prose" in s
        assert "link text" not in s

    def test_importance_rerank_prefers_matching_branch(self):
        a = "alpha " * 30 + "this branch talks about zebras exclusively"
        b = "beta " * 30 + "this branch talks about llamas exclusively"
        html = f"<html><body><div><p>{a}</p></div><div><p>{b}</p></div></body></html>"
        s_z = dom_filter_summary(parse_html(html), ["zebras"])
        s_l = dom_filter_summary(parse_html(html), ["llamas"])
        assert "zebras" in s_z
        assert "llamas" in s_l

    def test_bad_words_penalize(self):
        good = "genuine article content " * 8
        legal = ("copyright rights reserved terms conditions cookie cookies " * 4
                 + "filler words to reach the size threshold easily here")
        html = f"<html><body><p>{legal}</p><p>{good}</p></body></html>"
        s = dom_filter_summary(parse_html(html), ["genuine"])
        assert "genuine article" in s

    def test_h1_excluded_from_branch_text(self):
        html = f"""<html><body><div>
        <h1>HEADLINE SHOUTING LOUDLY WITH MANY CAPITALIZED LETTERS HERE</h1>
        <p>{ARTICLE}</p></div></body></html>"""
        s = dom_filter_summary(parse_html(html))
        assert "HEADLINE" not in s
        assert "article prose" in s


class TestTagDensitySummary:
    def test_link_dense_block_skipped(self):
        html = f"""<html><body>
        <div>{LINKS}</div>
        <p>{ARTICLE}</p>
        </body></html>"""
        s = tag_density_summary(parse_html(html))
        assert "article prose" in s
        assert "link text" not in s

    def test_short_p_skipped_but_short_div_kept(self):
        html = """<html><body><p>tiny</p>
        <div>thirty-three characters of prose go right here</div></body></html>"""
        s = tag_density_summary(parse_html(html))
        assert "tiny" not in s
        assert "characters of prose" in s

    def test_under_32_chars_returns_empty(self):
        html = "<html><body><div>short prose only here</div></body></html>"
        assert tag_density_summary(parse_html(html)) == ""


class TestChainIntegration:
    def test_dom_filter_first_in_default_chain(self):
        html = f"""<html>
        <head><meta name="description" content="Meta says otherwise."></head>
        <body><div><p>{ARTICLE}</p></div></body></html>"""
        s = extract_summary(html)
        assert "article prose" in s
        assert "Meta says" not in s
