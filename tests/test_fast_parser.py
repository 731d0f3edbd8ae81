"""Equivalence of the regex-scanner HTML tree builder with the stdlib
HTMLParser path, over the fixture corpus and crafted edge cases."""

from marginalia_ray.sources.pages import make_page
from marginalia_ray.stages.extract import parse_html, parse_html_fast


def tree_eq(a, b, path="root"):
    assert a.tag == b.tag, (path, a.tag, b.tag)
    assert a.attrs == b.attrs, (path, a.attrs, b.attrs)
    assert a.text == b.text, (path, repr(a.text)[:60], repr(b.text)[:60])
    assert len(a.children) == len(b.children), (path, a.tag)
    for i, (x, y) in enumerate(zip(a.children, b.children)):
        tree_eq(x, y, f"{path}/{a.tag}[{i}]")


def test_fixture_corpus_equivalence():
    for i in range(100):
        html = make_page(i, 300)["html"].decode()
        tree_eq(parse_html(html, fast=False), parse_html_fast(html))


def test_edge_cases():
    cases = [
        "<p>a &amp; b &lt;c&gt;</p>",
        '<a href="/x?a=1&amp;b=2">link</a>',
        "<br><hr/><img src=x>",
        "<div><p>unclosed<div>nested</div>",
        "<!-- comment --><p>after</p>",
        "<!DOCTYPE html><html><body>x</body></html>",
        "<script>if (a<b && c>d) {}</script><p>after</p>",
        "<style>a>b{color:red}</style><p>x</p>",
        "<p class='single' data-x>attrs</p>",
        "<P>Upper<B>case</B></P>",
        "text only, no tags",
        "",
    ]
    for html in cases:
        tree_eq(parse_html(html, fast=False), parse_html_fast(html))


class TestHtmlStandard:
    """M16: HtmlStandardExtractor.parseDocType + sniffHtmlStandard port
    (HtmlStandardExtractor.java:15-85)."""

    def _detect(self, html):
        from marginalia_ray.stages.extract import detect_standard, parse_html

        return detect_standard(html, parse_html(html))

    def test_html5_bare_doctype(self):
        assert self._detect("<!DOCTYPE html><body><p>x</p></body>") == "HTML5"

    def test_xhtml_public_id(self):
        h = ('<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Strict//EN" '
             '"http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd"><body/>')
        assert self._detect(h) == "XHTML"

    def test_html4_public_id(self):
        h = ('<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01 Transitional//EN" '
             '"http://www.w3.org/TR/html4/loose.dtd"><body/>')
        assert self._detect(h) == "HTML4"

    def test_html123_ietf(self):
        h = '<!DOCTYPE HTML PUBLIC "-//IETF//DTD HTML 2.0//EN"><body/>'
        assert self._detect(h) == "HTML123"

    def test_softquad_html4(self):
        h = '<!DOCTYPE HTML PUBLIC "-//SoftQuad Software//DTD HoTMetaL PRO 6.0::19990601::extensions to HTML 4.0//EN"><body/>'
        assert self._detect(h) == "HTML4"

    def test_sniff_html5_structural(self):
        h = "<html><body><article><p>x</p></article></body></html>"
        assert self._detect(h) == "HTML5"

    def test_sniff_html4_stylesheet(self):
        h = '<html><head><link rel="stylesheet" href="a.css"></head><body><p>x</p></body></html>'
        assert self._detect(h) == "HTML4"

    def test_sniff_html123_fallback(self):
        h = "<html><body><p>x</p></body></html>"
        assert self._detect(h) == "HTML123"

    def test_unknown_public_id_sniffs(self):
        h = '<!DOCTYPE HTML PUBLIC "-//MADEUP//DTD SOMETHING//EN"><html><body><video></video></body></html>'
        assert self._detect(h) == "HTML5"
