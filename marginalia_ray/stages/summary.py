"""Summary / description extraction (M19): a pluggable heuristic chain.

Ports of /root/reference/code/features-convert/summary-extraction/src/main/java/nu/marginalia/summary/:
  - SummaryExtractor.extractSummary (chain dispatch, nav/header/list strip,
    truncated-character cleanup, abbreviation): SummaryExtractor.java:38-54
  - MetaDescriptionHeuristic / OpenGraphDescriptionHeuristic (meta tags)
  - FallbackHeuristic (a-tag-density subtree removal): FallbackHeuristic.java
  - DomFilterHeuristic / TagDensityHeuristic (full ports, round 4):
    stages/summary_dom.py — SummarizingDOMFilter statistics walk with the
    importantWords relevance re-rank, and the block density scan.
The chain is a plain list of callables — the reference's user-extension
surface (SURVEY.md §2.11)."""

from __future__ import annotations

import re
from collections.abc import Callable, Collection

from marginalia_ray.stages.extract import Node, dom_mutated, parse_html

MAX_SUMMARY_LENGTH = 255
_TRUNCATED = re.compile(r"[^a-zA-Z0-9]{3,}")

_STRIP_TAGS = {"header", "nav", "ul", "li"}
_STRIP_IDS = {"header", "nav", "navigation"}
_STRIP_CLASSES = {"header", "nav", "navigation"}


def _strip_nav(root: Node) -> None:
    """SummaryExtractor: `header,nav,#header,#nav,#navigation,.header,.nav,
    .navigation,ul,li` removed before any heuristic."""

    def walk(node: Node):
        kept = []
        for c in node.children:
            if not c.is_text():
                if (
                    c.tag in _STRIP_TAGS
                    or c.attrs.get("id", "").lower() in _STRIP_IDS
                    or (c.classes() & _STRIP_CLASSES)
                ):
                    continue
                walk(c)
            kept.append(c)
        node.children = kept

    walk(root)
    dom_mutated()


def meta_description(root: Node, important_words: Collection[str]) -> str:
    for m in root.find_all("meta"):
        if m.attrs.get("name", "").lower() == "description":
            return m.attrs.get("content", "")
    return ""


def open_graph_description(root: Node, important_words: Collection[str]) -> str:
    for m in root.find_all("meta"):
        if m.attrs.get("name", "").lower() == "og:description" or m.attrs.get(
            "property", ""
        ).lower() == "og:description":
            return m.attrs.get("content", "")
    return ""


def _a_text_len(node: Node) -> int:
    return sum(len(a.get_text()) for a in node.find_all("a"))


def fallback_summary(root: Node, important_words: Collection[str]) -> str:
    """FallbackHeuristic: drop <a>, drop link-farm-ish subtrees (text
    shorter than half the body with a-tag density > 0.25), return body
    text."""
    body = root.first("body") or root
    body_len = len(body.get_text())

    def walk(node: Node):
        kept = []
        for c in node.children:
            if c.is_text():
                kept.append(c)
                continue
            if c.tag == "a":
                continue
            if c.tag in ("p", "div", "section", "article", "font", "center",
                         "td", "h1", "h2", "h3", "h4", "h5", "h6", "tr", "th"):
                text_len = len(c.get_text())
                if text_len and text_len < body_len / 2:
                    if _a_text_len(c) / text_len > 0.25:
                        continue
            walk(c)
            kept.append(c)
        node.children = kept

    walk(body)
    dom_mutated()
    return body.get_text()


def dom_filter_heuristic(root: Node, important_words: Collection[str]) -> str:
    from marginalia_ray.stages.summary_dom import dom_filter_summary

    return dom_filter_summary(root, important_words, MAX_SUMMARY_LENGTH)


def tag_density_heuristic(root: Node, important_words: Collection[str]) -> str:
    from marginalia_ray.stages.summary_dom import tag_density_summary

    return tag_density_summary(root, important_words, MAX_SUMMARY_LENGTH)


# the reference chain order: SummaryExtractor.java:31-36
DEFAULT_HEURISTICS: list[Callable[[Node, Collection[str]], str]] = [
    dom_filter_heuristic,
    tag_density_heuristic,
    open_graph_description,
    meta_description,
    fallback_summary,
]


def extract_summary(
    html_or_root: str | Node,
    important_words: Collection[str] = (),
    heuristics: list[Callable[[Node, Collection[str]], str]] | None = None,
    max_length: int = MAX_SUMMARY_LENGTH,
) -> str:
    root = parse_html(html_or_root) if isinstance(html_or_root, str) else html_or_root
    _strip_nav(root)
    for h in heuristics or DEFAULT_HEURISTICS:
        maybe = h(root, important_words)
        if maybe and maybe.strip():
            cleaned = _TRUNCATED.sub(" ", maybe)
            # StringUtils.abbreviate with empty marker == hard truncate
            return cleaned[:max_length]
    return ""
