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
