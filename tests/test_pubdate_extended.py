"""M18 round 2: the newly ported pubdate heuristics (article time tag,
DOM passes, two-pass URL pattern, parser semantics)."""

from marginalia_ray.stages.extract import extract_document, parse_html
from marginalia_ray.stages.pubdate import (
    attempt_parse_date,
    guess_year,
    h_article_time,
    h_dom_pass1,
    h_dom_pass2,
    h_url_pattern_pass1,
    h_url_pattern_pass2,
    is_guess_plausible,
    sniff_pub_year,
    year_from_substrings,
)


class TestParser:
    def test_attempt_parse_iso(self):
        assert attempt_parse_date("2019-05-04") == 2019
        assert attempt_parse_date("2019-05-04T11:00:00Z") == 2019

    def test_attempt_parse_rfc1123(self):
        assert attempt_parse_date("Sat, 04 May 2019 11:00:00 GMT") == 2019

    def test_attempt_parse_substring_fallback(self):
        assert attempt_parse_date("Sun Oct 03, 2010 5:37 pm") == 2010

    def test_attempt_parse_rejects_lengths(self):
        assert attempt_parse_date("201") is None
        assert attempt_parse_date("x" * 40) is None

    def test_year_spread_resolves_by_guess(self):
        # min=1998 max=2016 -> (max+min)//2 without a standard
        assert year_from_substrings("from 1998 to 2016") == 2007

    def test_guess_year_educated(self):
        assert guess_year(2000, 2020, 2018) == 2014  # ((2010)+2018)//2
        assert guess_year(2000, 2002, 2018) == 2000  # spread < 3 -> min

    def test_plausibility(self):
        assert not is_guess_plausible("HTML5", 1998)
        assert is_guess_plausible("HTML5", 2018)
        assert not is_guess_plausible("HTML123", 2015)


class TestNewHeuristics:
    def test_article_time_pubdate_attr(self):
        html = '<time pubdate="pubdate" datetime="2011-04-20">x</time>'
        assert h_article_time(html, "", "HTML5") == 2011

    def test_url_pass1_excludes_1990s(self):
        url = "https://a.example/1997/story"
        assert h_url_pattern_pass1("", url, "UNKNOWN") is None
        assert h_url_pattern_pass2("", url, "UNKNOWN") == 1997
        assert h_url_pattern_pass1("", "https://a.example/2014/story", "UNKNOWN") == 2014

    def test_dom_pass1_copyright_text(self):
        root = parse_html("<footer>Copyright 2009</footer>")
        assert h_dom_pass1("", "", "UNKNOWN", root) == 2009

    def test_dom_pass1_byline_class(self):
        root = parse_html('<div class="entry-meta">Posted on June 2, 2013 by someone</div>')
        assert h_dom_pass1("", "", "UNKNOWN", root) == 2013

    def test_dom_pass1_phpbb_posted(self):
        root = parse_html("<div><b>Posted:</b> Sun Oct 03, 2010 5:37 pm</div>")
        assert h_dom_pass1("", "", "UNKNOWN", root) == 2010

    def test_dom_pass2_plain_year_text(self):
        root = parse_html("<p>Written back in 2004-ish.</p>")
        assert h_dom_pass2("", "", "UNKNOWN", root) == 2004

    def test_dom_pass2_requires_delimited_year(self):
        root = parse_html("<p>item no 20041234 in stock</p>")
        assert h_dom_pass2("", "", "UNKNOWN", root) is None


class TestChainOrder:
    def test_meta_beats_dom(self):
        html = (
            '<meta property="article:published_time" content="2015-01-01">'
            "<p>Copyright 2003</p>"
        )
        assert sniff_pub_year(html, "https://x/", "HTML5", parse_html(html)) == 2015

    def test_dom_pass1_beats_time_tag(self):
        html = (
            "<div><b>Posted:</b> Sun Oct 03, 2010 5:37 pm</div>"
            '<time datetime="2021-01-01">x</time>'
        )
        assert sniff_pub_year(html, "https://x/", "UNKNOWN", parse_html(html)) == 2010

    def test_extract_document_carries_pub_year(self):
        html = (
            "<html><body><div><b>Posted:</b> Sun Oct 03, 2010 5:37 pm</div>"
            "<p>" + "forum post text here. " * 30 + "</p></body></html>"
        )
        doc = extract_document(html, base_url="https://f.example/viewtopic.php?t=1")
        assert doc.pub_year == 2010
