"""Per-CMS processor specializations (M17).

Port of HtmlProcessorSpecializations + the five strategies
(/root/reference/code/processes/converting-process/src/main/java/nu/marginalia/converting/processor/plugin/specialization/HtmlProcessorSpecializations.java:33-49,
 DefaultSpecialization.java:23-48, JavadocSpecialization.java:21-41,
 LemmySpecialization.java:18-60, XenForoSpecialization.java:17-65,
 PhpBBSpecialization.java:14-22):

  select(generator keywords) -> strategy with
    prune(root)           # replaces the generic DomPruningFilter call
    get_summary(root, important_words)
    should_index(url_path)
    length_modifier

Reference quirk reproduced verbatim: the 'phpbb' keyword selects the
XenForo strategy (HtmlProcessorSpecializations.java:41-43), leaving
PhpBBSpecialization.shouldIndex unreachable from select(); the class is
still provided for direct use.
"""

from __future__ import annotations

from marginalia_ray.stages.extract import Node, dom_mutated, prune_dom
from marginalia_ray.stages.summary import MAX_SUMMARY_LENGTH, _TRUNCATED


def abbreviate_summary(s: str) -> str:
    """SummaryExtractor.abbreivateSummary (sic)."""
    return _TRUNCATED.sub(" ", s)[:MAX_SUMMARY_LENGTH].strip()


def _remove_tags(root: Node, *tags: str) -> None:
    def walk(node: Node):
        node.children = [c for c in node.children if c.tag not in tags]
        for c in node.children:
            if not c.is_text():
                walk(c)

    walk(root)
    dom_mutated()


def _find_by_class(root: Node, cls: str) -> list[Node]:
    out = []
    stack = [root]
    while stack:
        n = stack.pop()
        if n.tag is not None and cls in (n.attrs.get("class") or "").split():
            out.append(n)
        stack.extend(reversed(n.children))
    return out


class DefaultSpecialization:
    """svg removal + DomPruningFilter(0.5); summary via the standard
    chain with n-grams dropped from the important words."""

    def prune(self, root: Node) -> Node:
        _remove_tags(root, "svg")
        prune_dom(root)
        return root

    def get_summary(self, root: Node, important_words: set[str]) -> str:
        from marginalia_ray.stages.summary import extract_summary

        cleaned = [w for w in important_words if "_" not in w]
        return extract_summary(root, cleaned)

    def should_index(self, url_path: str) -> bool:
        return True

    length_modifier: float = 1.0


class JavadocSpecialization(DefaultSpecialization):
    def prune(self, root: Node) -> Node:
        super().prune(root)
        _remove_tags(root, "noscript")
        return root

    def get_summary(self, root: Node, important_words: set[str]) -> str:
        blocks = _find_by_class(root, "block")
        if blocks:
            return abbreviate_summary(blocks[0].get_text())
        return super().get_summary(root, important_words)


class LemmySpecialization(DefaultSpecialization):
    """Strip down to just the <p> comment texts; 1.5x length modifier
    compensates for the removed chaff."""

    length_modifier = 1.5

    def prune(self, root: Node) -> Node:
        body = Node("body")
        for p in root.find_all("p"):
            body.children.append(Node("p", children=[Node(None, text=p.get_text())]))
        new_root = Node("#root")
        new_root.children.append(body)
        return new_root

    def get_summary(self, root: Node, important_words: set[str]) -> str:
        parts: list[str] = []
        total = 0
        for p in root.find_all("p"):
            if total > 512:
                break
            text = p.get_text()
            if not text.strip():
                continue
            parts.append(text)
            total += len(text) + 1
        return abbreviate_summary(" ".join(parts) + (" " if parts else ""))


class XenForoSpecialization(DefaultSpecialization):
    """Rebuild the page as '<user>: <post>' paragraphs; keep the first
    <time datetime=...> so the pubdate sniffer still fires."""

    length_modifier = 1.25

    def prune(self, root: Node) -> Node:
        body = Node("body")
        article = Node("article")
        body.children.append(article)
        times = root.find_all("time")
        if times:
            dt = times[0].attrs.get("datetime") or ""
            t = Node("time", attrs={"datetime": dt, "pubdate": "pubdate"})
            t.children.append(Node(None, text=dt))
            article.children.append(t)
        for post in _find_by_class(root, "message-inner"):
            user = " ".join(n.get_text() for n in _find_by_class(post, "message-name"))
            text = " ".join(n.get_text() for n in _find_by_class(post, "bbWrapper"))
            article.children.append(
                Node("p", children=[Node(None, text=f"{user}: {text}")])
            )
        new_root = Node("#root")
        new_root.children.append(body)
        return new_root

    def get_summary(self, root: Node, important_words: set[str]) -> str:
        parts: list[str] = []
        total = 0
        for w in _find_by_class(root, "bbWrapper"):
            if total > 512:
                break
            text = w.get_text()
            if not text.strip():
                continue
            parts.append(text)
            total += len(text) + 1
        return abbreviate_summary(" ".join(parts) + (" " if parts else ""))


class PhpBBSpecialization(DefaultSpecialization):
    """Only index the actual topic pages."""

    def should_index(self, url_path: str) -> bool:
        return "viewtopic.php" in url_path


_DEFAULT = DefaultSpecialization()
_JAVADOC = JavadocSpecialization()
_LEMMY = LemmySpecialization()
_XENFORO = XenForoSpecialization()
PHPBB = PhpBBSpecialization()


def select(generator_keywords: list[str]) -> DefaultSpecialization:
    """HtmlProcessorSpecializations.select — keyword dispatch, including
    the reference's phpbb -> XenForo mapping."""
    kws = set(generator_keywords)
    if "lemmy" in kws:
        return _LEMMY
    if "xenforo" in kws:
        return _XENFORO
    if "phpbb" in kws:
        return _XENFORO
    if "javadoc" in kws:
        return _JAVADOC
    return _DEFAULT
