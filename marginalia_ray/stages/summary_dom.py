"""DOM-statistics summary heuristics (M19, full-parity upgrade): ports of
the reference's two text-density heuristics that previously had an
a-tag-density stand-in:

  - SummarizingDOMFilter (text-to-tag-ratio branch selection,
    importantWords relevance re-rank):
    features-convert/summary-extraction/src/main/java/nu/marginalia/
    summary/heuristic/SummarizingDOMFilter.java:21-303
  - DomFilterHeuristic.java:9-31 (maxLength+32 abbreviation)
  - TagDensityHeuristic.java:19-55 (per-block a-density / html-density)
  - HeuristicTextUtil.java:17-173 (boundary-checked any-word counting)

Pure per-document functions over the already-parsed Node tree — they run
inside the tokenizer actor's per-batch loop, so the only concession to
the Ray context is avoiding tree mutation (the reference clones the
Jsoup document; we aggregate as if h1-h3 were removed instead)."""

from __future__ import annotations

from collections.abc import Collection

from marginalia_ray.stages.extract import Node

# SummarizingDOMFilter.badWords (line 91-93)
BAD_WORDS = (
    "copyright", "rights", "reserved", "post", "posted", "author",
    "published", "publish", "cookie", "cookies", "©", "terms",
    "conditions",
)

_INAPPROPRIATE_TAGS = frozenset(
    ("blockquote", "tt", "ol", "ul", "li", "h1", "h2", "h3", "th", "td",
     "tbody", "html", "title", "#root")
)
_PRUNE_TAGS = frozenset(("h1", "h2", "h3"))


def _contains_word(text_lc: str, word_lc: str) -> bool:
    """HeuristicTextUtil.containsWordAllLowerCase: word present with
    non-alphanumeric boundaries."""
    wl = len(word_lc)
    if wl == 0:
        return True
    pos = text_lc.find(word_lc)
    n = len(text_lc)
    while pos >= 0:
        if (pos == 0 or not text_lc[pos - 1].isalnum()) and (
            pos + wl >= n or not text_lc[pos + wl].isalnum()
        ):
            return True
        pos = text_lc.find(word_lc, pos + 1)
    return False


def count_occurrences_of_any_word(text: str, words_lc: Collection[str]) -> int:
    """HeuristicTextUtil.countOccurrencesOfAnyWord: how many of the
    (lower-case) words occur in the text, case-insensitively, bounded by
    non-alphanumerics.  Membership per word, not occurrence count."""
    tl = text.lower()
    return sum(1 for w in words_lc if _contains_word(tl, w))


_NON_ALPHA_BYTES = bytes(
    b for b in range(256) if not (65 <= b <= 90 or 97 <= b <= 122)
)


def _ascii_alpha_len(s: str) -> int:
    """SummarizingDOMFilter.textLength: ASCII alphabetic codepoints only
    (whitespace normalization can never contribute — whitespace is never
    alphabetic).  C-speed: drop non-ASCII, delete non-letters, count."""
    return len(s.encode("ascii", "ignore").translate(None, _NON_ALPHA_BYTES))


class _Stats:
    __slots__ = ("node", "tag_len", "text_len", "pos", "parent_is_a", "pruned")

    def __init__(self, node, tag_len, text_len, pos, parent_is_a, pruned=False):
        self.node = node
        self.tag_len = tag_len
        self.text_len = text_len
        self.pos = pos
        self.parent_is_a = parent_is_a
        self.pruned = pruned

    def ratio(self) -> float:
        if self.text_len == 0:
            return 1.0
        return self.text_len / (self.tag_len + self.text_len)

    def is_body(self) -> bool:
        return self.node.tag == "body"

    def appropriate(self) -> bool:
        if self.node.tag in _INAPPROPRIATE_TAGS or self.pruned:
            return False
        return not self.parent_is_a


def _collect_stats(root: Node) -> list[_Stats]:
    """One post-order walk computing the reference's NodeStatistics for
    every element; h1-h3 subtrees are aggregated for themselves but
    excluded from their ancestors (the clone-then-REMOVE behavior)."""
    out: list[_Stats] = []
    counter = [0]

    def walk(node: Node, parent_tag: str | None):
        my_pos = counter[0]
        counter[0] += 1
        if node.is_text():
            return (0, _ascii_alpha_len(node.text), False, False)
        tag_len = 0
        tag = node.tag or ""
        if tag not in ("br", "p"):
            tag_len += len(tag)
        n_attrs = len(node.attrs)
        tag_len += max(n_attrs - 1, 0)
        for k, v in node.attrs.items():
            tag_len += len(k) if not v else 3 + len(k) + len(v)
        text_len = 0
        is_a = tag == "a"
        for c in node.children:
            c_tag, c_text, c_is_link, c_pruned = walk(c, tag)
            if c_pruned:
                continue  # removed from the (virtual) clone
            if is_a or c_is_link:
                tag_len += c_tag + c_text
            else:
                text_len += c_text
                tag_len += c_tag
        pruned = tag in _PRUNE_TAGS
        out.append(_Stats(node, tag_len, text_len, my_pos, parent_tag == "a", pruned))
        return (tag_len, text_len, is_a, pruned)

    walk(root, None)
    return out


def _descendant_text_nodes(node: Node, skip_pruned: bool):
    stack = list(reversed(node.children))
    while stack:
        n = stack.pop()
        if n.is_text():
            yield n.text
            continue
        if skip_pruned and n.tag in _PRUNE_TAGS:
            continue
        stack.extend(reversed(n.children))


def dom_filter_summary(
    root: Node,
    important_words: Collection[str] = (),
    max_summary_length: int = 255,
) -> str:
    """DomFilterHeuristic.summarize: pick the best article-like branch by
    text-to-tag ratio, position, and importantWords relevance."""
    stats = _collect_stats(root)
    ret = [
        s
        for s in stats
        if s.ratio() >= 0.75
        and s.appropriate()
        and s.text_len >= 64
        and s.node.tag != "a"
    ]
    ret.sort(key=lambda s: -s.text_len)
    del ret[32:]
    ret.sort(key=lambda s: s.pos)
    del ret[16:]

    if important_words:
        words_lc = [w.lower() for w in important_words]
        keys = {}
        for s in ret:
            cnt = 0
            for t in _descendant_text_nodes(s.node, skip_pruned=True):
                cnt += count_occurrences_of_any_word(t, words_lc)
                cnt -= count_occurrences_of_any_word(t, BAD_WORDS)
            if cnt > 0:
                keys[id(s)] = -cnt
        if keys:
            ret.sort(key=lambda s: keys.get(id(s), 0))
    del ret[8:]
    ret.sort(key=lambda s: s.is_body())

    if not ret:
        return ""
    # the reference's element.text() with pruned h1-h3 excluded
    parts = []
    for t in _descendant_text_nodes(ret[0].node, skip_pruned=True):
        tt = t.strip()
        if tt:
            parts.append(" ".join(tt.split()))
    return " ".join(parts)[: max_summary_length + 32]


def _approx_outer_html_len(node: Node) -> int:
    """Approximate Jsoup Element.html() serialized length (our parser does
    not keep the raw markup): <tag attrs>children</tag>."""
    if node.is_text():
        return len(node.text)
    tag = node.tag or ""
    n = 2 * len(tag) + 5  # <tag> + </tag>
    for k, v in node.attrs.items():
        n += len(k) + len(v) + 4  # space + k="v"
    for c in node.children:
        n += _approx_outer_html_len(c)
    return n


def tag_density_summary(
    root: Node,
    important_words: Collection[str] = (),
    max_summary_length: int = 255,
) -> str:
    """TagDensityHeuristic.summarize: concatenate document-order blocks
    whose a-tag density < 0.1 and text/html density > 0.85.  The html
    length is approximated from the tree (documented divergence: our
    parser normalizes markup, Jsoup keeps it)."""
    content: list[str] = []
    total = 0
    for elem in root.find_all("p", "div", "section", "article", "font", "center"):
        if total >= max_summary_length:
            break
        text = elem.get_text()
        if elem.tag in ("p", "center", "font") and len(text) < 16:
            continue
        tl = len(text)
        if tl == 0:
            continue
        a_len = sum(len(a.get_text()) for a in elem.find_all("a"))
        inner = sum(_approx_outer_html_len(c) for c in elem.children)
        if a_len / tl < 0.1 and inner > 0 and tl / inner > 0.85:
            content.append(text)
            total += tl + 1
    # the reference appends a trailing space per block and gates on that
    # builder length (TagDensityHeuristic.java:36-40), so the 32-char test
    # counts one separator per block — `total` tracks exactly that
    joined = " ".join(content)
    if total > 32:
        return joined
    return ""
