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
