"""Golden mirrors of the reference's remaining keyword-extractor tests
(the NameLike/SubjectLike pair lives in test_rdr.py):

- TitleKeywordsTest.java:15-207 — full HTML document through the parser,
  title spans must come out exactly as the reference's expected set.
- ArtifactKeywordsTest.java:9-22 — e-mail artifact keywords.
- UrlKeywordsTest.java:11-39 — domain/path stemmed keyword sets.

These run the honest RDR stand-in tagger end-to-end, so they guard the
POS-dependent span construction against rule-data drift."""

from marginalia_ray.functions.stemmer import stem
from marginalia_ray.stages.extract import body_text, extract_title, parse_html
from marginalia_ray.stages.keywords import (
    artifact_keywords,
    title_keywords,
    url_keywords,
)
from marginalia_ray.stages.sentences import extract_dld

# TitleKeywordsTest.java:17-187, abbreviated to the structural skeleton:
# the <title>, headers, nav and the opening body paragraphs.  The expected
# set only depends on the title sentence, but we go through the HTML parse
# like the reference does (Jsoup.parse -> extractSentences).
TITLE_DOC = """<!DOCTYPE html>
<html>
<head>
    <meta charset="UTF-8">
    <title>MEMEX - Creepy Website Similarity [ 2022-12-26 ]</title>
</head>
<body class="double" lang="en">
<header>
    <nav>
        <a href="http://www.marginalia.nu/">Marginalia</a>
        <a href="http://search.marginalia.nu/">Search Engine</a>
    </nav>
</header>
<article>
<section id="memex-node">
<h1 id="1">Creepy Website Similarity [ 2022-12-26 ]</h1>
<br>
This is a write-up about an experiment from a few months ago, in how to
find websites that are similar to each other. Website similarity is
useful for many things, including discovering new websites to crawl, as
well as suggesting similar websites in the Marginalia Search random
exploration mode.<br>
</section>
</article>
</body>
</html>"""


class TestTitleKeywords:
    """TitleKeywordsTest.java:189-206 mirrored."""

    def test_extract_title_words(self):
        root = parse_html(TITLE_DOC)
        title = extract_title(root)
        dld = extract_dld(body_text(root), title)
        reps, _ = title_keywords(dld)
        words = {w for w, _ in reps}
        expected = {
            "creepy",
            "website",
            "similarity",
            "creepy_website",
            "website_similarity",
            "creepy_website_similarity",
            "memex",
            "2022-12-26",
        }
        assert words == expected


class TestArtifactKeywords:
    """ArtifactKeywordsTest.java:11-21 mirrored."""

    def test_extract_artifacts(self):
        dld = extract_dld("Hello I'm <vlofgren@marginalia.nu>, what's up?", "hello!")
        words = artifact_keywords(dld)
        assert "vlofgren" in words
        assert "marginalia.nu" in words
        assert "@marginalia.nu" in words
        assert "vlofgren@marginalia.nu" in words


class TestUrlKeywords:
    """UrlKeywordsTest.java:14-38 mirrored."""

    def test_contains_domain(self):
        _, dom = url_keywords(
            "/log/69-creepy-website-similarity.gmi", "memex.marginalia.nu"
        )
        assert stem("memex") in dom
        assert stem("marginalia") in dom

    def test_contains_domain_no_www_no_com(self):
        _, dom = url_keywords(
            "/log/69-creepy-website-similarity.gmi", "www.example.com"
        )
        assert stem("example") in dom
        assert stem("www") not in dom
        assert stem("com") not in dom

    def test_path_fragments(self):
        url, _ = url_keywords(
            "/log/69-creepy-website-similarity.gmi", "memex.marginalia.nu"
        )
        for w in ["creepy", "website", "similarity", "69", "log"]:
            assert stem(w) in url
        assert stem("memex") not in url


class TestHtmlTagCleaner:
    """SentenceExtractorHtmlTagCleanerTest.java:19-27 mirrored: brief
    <code> tags inline with junk trimmed; the junk regex is the
    reference's codeTagJunkPattern verbatim (extract.py _CODE_JUNK)."""

    def _clean(self, html: str) -> str:
        import re

        from marginalia_ray.stages.extract import clean_tags

        root = parse_html(f"<html><body>{html}</body></html>")
        clean_tags(root)
        return re.sub(r"\s+", " ", root.get_text()).strip()

    def test_brief_code_tag(self):
        assert self._clean("<code>hello</code>") == "hello"
        assert self._clean("<code>System.out.println</code>") == "System out println"
        assert self._clean("<code>hello()</code>") == "hello"
        assert self._clean("<code>&lt;hello&gt;</code>") == "hello"
        assert self._clean("<code>hello(p,q)</code>") == "hello"
        assert self._clean("<code>hello(p,q);</code>") == "hello"

    def test_long_code_tag_removed(self):
        body = "x" * 40
        assert self._clean(f"keep <code>{body}</code> this") == "keep this"


class TestUrlBlocklist:
    """UrlBlocklist.java semantics (the converter's LinkProcessor veto)."""

    def test_bad_domains(self):
        from marginalia_ray.functions.url_blocklist import is_url_blocked

        assert is_url_blocked("https://www.facebook.com/somepage")
        assert is_url_blocked("https://t.co/abc")
        assert is_url_blocked("https://youtu.be/xyz")
        assert not is_url_blocked("https://example.com/page")

    def test_github_depth(self):
        from marginalia_ray.functions.url_blocklist import is_url_blocked

        assert not is_url_blocked("https://github.com/marginalia")
        assert not is_url_blocked("https://github.com/marginalia/search")
        assert is_url_blocked("https://github.com/marginalia/search/blob/main/x.java")

    def test_path_patterns(self):
        from marginalia_ray.functions.url_blocklist import is_url_blocked

        assert is_url_blocked("https://x.com/repo/.git/config")
        assert is_url_blocked("https://x.com/wp-content/upload/x.png")
        assert is_url_blocked("https://x.com/thing-download-free")
        assert is_url_blocked(
            "https://x.com/download-alpha-beta-gamma-delta.html"
        )
        assert not is_url_blocked("https://x.com/download-alpha.html")

    def test_hash_runs(self):
        from marginalia_ray.functions.url_blocklist import hash_test, is_url_blocked

        assert hash_test("/commit/" + "0123456789abcdef" * 2 + "/file")
        assert not hash_test("/short/0123abc")
        assert is_url_blocked("https://x.com/commit/" + "a" * 40)

    def test_mailing_list(self):
        from marginalia_ray.functions.url_blocklist import is_mailing_list_link

        assert is_mailing_list_link("https://x.com/lists/announce/2024")
        assert is_mailing_list_link("https://x.com/the-mailinglist-archive")
        assert not is_mailing_list_link("https://x.com/blog/post")

    def test_admit_links_caps_and_order(self):
        from marginalia_ray.functions.url_blocklist import admit_links

        internal = [f"https://base.com/p{i}" for i in range(300)]
        external = [f"https://other{i}.com/x" for i in range(150)]
        mixed = internal + ["https://www.facebook.com/x"] + external
        kept = admit_links(mixed, "base.com")
        assert len([u for u in kept if u.startswith("https://base.com")]) == 250
        assert len([u for u in kept if not u.startswith("https://base.com")]) == 100
        assert "https://www.facebook.com/x" not in kept
        # document order preserved
        assert kept[0] == "https://base.com/p0"


class TestLinkExtractionAdmission:
    def test_blocked_links_never_reach_the_link_list(self):
        from marginalia_ray.stages.extract import extract_links, parse_html

        html = """<html><body>
        <a href="https://example.com/fine">ok</a>
        <a href="https://www.facebook.com/nope">blocked domain</a>
        <a href="/repo/.git/config">blocked path</a>
        <a href="/lists/announce">mailing list</a>
        </body></html>"""
        links = extract_links(parse_html(html), "https://base.com/")
        assert links == ["https://example.com/fine"]


class TestLinkResolution:
    """LinkParserTest.java:29-56 mirrored through extract_links."""

    def _one(self, href: str, rel_base: str) -> str | None:
        from marginalia_ray.stages.extract import extract_links, parse_html

        root = parse_html(f"<html><body><a href='{href}'>test</a></body></html>")
        links = extract_links(root, "http://www.marginalia.nu" + rel_base)
        return links[0] if links else None

    def test_renormalization(self):
        assert self._one("http://www.marginalia.nu/../test", "/") == (
            "http://www.marginalia.nu/test"
        )

    def test_anchor_skipped(self):
        assert self._one("#test", "/") is None

    def test_relative(self):
        assert self._one("//search.marginalia.nu", "/") == "http://search.marginalia.nu/"
        assert self._one("../test", "/") == "http://www.marginalia.nu/test"
        assert self._one("test", "/") == "http://www.marginalia.nu/test"
        assert self._one("test", "/foo/index.html") == "http://www.marginalia.nu/foo/test"
        assert self._one("../test", "/foo/index.html") == "http://www.marginalia.nu/test"
        assert self._one("/test", "/foo/index.html") == "http://www.marginalia.nu/test"

    def test_base_href_overrides(self):
        from marginalia_ray.stages.extract import extract_links, parse_html

        html = """<html><head><base href="/base/"></head>
        <body><a href="page.html">x</a></body></html>"""
        links = extract_links(parse_html(html), "https://www.marginalia.nu/test/foo.bar")
        assert links == ["https://www.marginalia.nu/base/page.html"]


class TestLinkRenormQueryAndHost:
    """Round-4 review fixes: query strings survive dot-segment renorm,
    and link admission classifies against the DOCUMENT host even under a
    <base href> override (LinkProcessor is built with the document url
    before getBaseLink rebinds it)."""

    def _links(self, html: str, base: str):
        from marginalia_ray.stages.extract import extract_links, parse_html

        return extract_links(parse_html(html), base)

    def test_query_not_treated_as_path_segments(self):
        # URI.normalize never touches the query; EdgeUrl(URI) then runs
        # queryParamsSanitizer, so a non-whitelisted param is DROPPED
        # rather than dot-normalized (EdgeUrl.java:112)
        out = self._links(
            "<a href='http://h.example/p?back=/..'>x</a>", "http://h.example/"
        )
        assert out == ["http://h.example/p"]
        # a whitelisted param survives verbatim, dot segments and all
        out = self._links(
            "<a href='http://h.example/p?id=/..'>x</a>", "http://h.example/"
        )
        assert out == ["http://h.example/p?id=/.."]

    def test_dot_segments_in_path_still_resolve_with_query(self):
        out = self._links(
            "<a href='http://h.example/a/../b?t=/./y'>x</a>", "http://h.example/"
        )
        assert out == ["http://h.example/b?t=/./y"]

    def test_query_params_sanitized_and_sorted(self):
        # EdgeUrl sanitizer: whitelist filter + natural sort of survivors
        out = self._links(
            "<a href='http://h.example/p?utm_source=x&t=2&id=1'>x</a>",
            "http://h.example/",
        )
        assert out == ["http://h.example/p?id=1&t=2"]

    def test_empty_path_slash_inserted_before_query(self):
        out = self._links(
            "<a href='http://h.example?id=1'>x</a>", "http://other.example/"
        )
        assert out == ["http://h.example/?id=1"]

    def test_base_href_does_not_flip_internal_classification(self):
        # 260 same-site links under a cross-domain <base href>: the
        # internal cap (250) must apply to site.example links, so some are
        # dropped; all cdn.example links would be "internal" only under
        # the buggy overridden-host classification
        anchors = "".join(
            f"<a href='http://site.example/p{i}'>x</a>" for i in range(260)
        )
        html = f"<html><head><base href='http://cdn.example/'></head><body>{anchors}</body></html>"
        out = self._links(html, "http://site.example/")
        assert len(out) == 250  # internal cap bound on the DOCUMENT's host
        assert all(u.startswith("http://site.example/") for u in out)


class TestIPv6HostClassification:
    def test_ipv6_same_host_links_are_internal(self):
        from marginalia_ray.stages.extract import extract_links, parse_html

        anchors = "".join(
            f"<a href='http://[2001:db8::1]/p{i}'>x</a>" for i in range(120)
        )
        out = extract_links(parse_html(anchors), "http://[2001:db8::1]/")
        # internal cap is 250, external 100: all 120 survive only if they
        # classify as internal (bracket conventions agree on both sides)
        assert len(out) == 120


class TestMatchesWordPattern:
    """DocumentKeywordExtractorTest.java:21-35 — the reference's own
    assertion vectors for matchesWordPattern, including the two cases
    (std::vector, c++) where the unrolled Java loop diverges from the
    regex in its comment (empty alnum run after a separator is legal)."""

    def test_reference_vectors(self):
        from marginalia_ray.stages.keywords import matches_word_pattern as m

        assert m("test")
        assert m("1234567890abcde")
        assert not m("1234567890abcdef")
        assert m("test-test-test-test-test")
        assert not m("test-test-test-test-test-test")
        assert m("192.168.1.100/24")
        assert m("std::vector")
        assert m("c++")
        assert m("m*a*s*h")
        assert not m("Stulpnagelstrasse")

    def test_loop_quirks(self):
        from marginalia_ray.stages.keywords import matches_word_pattern as m

        assert m("test-")  # trailing separator: the loop accepts it
        assert m("a..b")  # empty run between separators
        assert not m("-test")  # must start with >=1 alnum
        assert not m("")
