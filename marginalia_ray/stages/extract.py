"""HTML -> clean text extraction (M2-M4, M13, M14, M22 in SURVEY.md §2).

Reference semantics:
  - DomPruningFilter (signal-rate pruning, nav/footer/header/aria purge,
    <a> text counts as noise):
      /root/reference/code/processes/converting-process/src/main/java/nu/marginalia/converting/processor/logic/dom/DomPruningFilter.java:17-126
  - SentenceExtractorHtmlTagCleaner (code-tag handling, ". " sentence aids):
      /root/reference/code/libraries/language-processing/src/main/java/nu/marginalia/language/sentence/SentenceExtractorHtmlTagCleaner.java:12-40
  - SentenceExtractor.asText (body text, 95% truncation):
      .../sentence/SentenceExtractor.java:210-214
  - SentenceExtractor.getTitle: .../sentence/SentenceExtractor.java:85-105
  - MetaRobotsTag noindex: .../processor/MetaRobotsTag.java
  - DocumentValuator quality: .../processor/logic/DocumentValuator.java:16-86

The DOM is a minimal tree built on Python's stdlib html.parser (no Jsoup /
bs4 in this environment).  The synthetic-pages generator
(marginalia_ray.sources.pages) renders well-formed HTML through the same
element model, so per-url byte-identity between generated `text` and
extracted text is exact and asserted in tests (the BASELINE.json invariant).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

PRUNE_THRESHOLD = 0.5  # HtmlDocumentProcessorPlugin passes 0.5

_BAD_CLASSES = {
    "cookie-banner", "cookie", "cookie-notice", "cookie-policy", "nav",
    "navigation", "footer", "header", "menu", "toolbar", "tooltip", "alert",
    "alertdialog", "banner", "onetrust-consent-sdk",
}
_BAD_ROLES = {"alert", "alertdialog", "navigation", "banner", "dialog", "menu", "toolbar", "tooltip"}

_BLOCKY = {"li", "h1", "h2", "h3", "h4", "h5", "h6", "td", "th", "p", "div", "title"}

_CODE_JUNK = re.compile(r"(\.|&lt;|&gt;|<|>|\([^)]*\)[;]?$)")

_WS = re.compile(r"\s+")


# DOM mutation epoch: find_all caches a by-tag preorder index per node;
# any structural mutation (prune/clean/strip) bumps the epoch, which
# conservatively invalidates every cached index process-wide.  Converter
# actors are single-threaded per process, so a global counter is safe.
_DOM_EPOCH = 0


def dom_mutated() -> None:
    global _DOM_EPOCH
    _DOM_EPOCH += 1


@dataclass(slots=True)
class Node:
    tag: str | None  # None = text node
    attrs: dict = field(default_factory=dict)
    children: list = field(default_factory=list)
    text: str = ""
    _fa_all: list | None = field(default=None, repr=False, compare=False)
    _fa_tag: dict | None = field(default=None, repr=False, compare=False)
    _fa_epoch: int = field(default=-1, repr=False, compare=False)

    def is_text(self) -> bool:
        return self.tag is None

    def classes(self) -> set[str]:
        return set(self.attrs.get("class", "").lower().split())

    def _fa_index(self):
        """Preorder node list + by-tag buckets, cached until the next DOM
        mutation anywhere in the process (one walk serves the ~16
        find_all calls per document instead of 16 walks)."""
        if self._fa_all is None or self._fa_epoch != _DOM_EPOCH:
            nodes: list = []
            append = nodes.append
            stack = [self]
            pop = stack.pop
            extend = stack.extend
            while stack:
                n = pop()
                append(n)
                c = n.children
                if c:
                    extend(reversed(c))
            by_tag: dict = {}
            for n in nodes:
                t = n.tag
                b = by_tag.get(t)
                if b is None:
                    by_tag[t] = [n]
                else:
                    b.append(n)
            self._fa_all = nodes
            self._fa_tag = by_tag
            self._fa_epoch = _DOM_EPOCH
        return self._fa_all, self._fa_tag

    def find_all(self, *tags: str):
        all_nodes, by_tag = self._fa_index()
        if len(tags) == 1:
            return list(by_tag.get(tags[0], ()))
        ts = set(tags)
        return [n for n in all_nodes if n.tag in ts]

    def first(self, tag: str):
        for n in self.find_all(tag):
            return n
        return None

    def get_text(self) -> str:
        """Jsoup Element.text() equivalent: whitespace-normalized."""
        parts: list[str] = []

        def walk(n: Node):
            if n.is_text():
                parts.append(n.text)
                return
            if n.tag in ("script", "style"):
                return
            for c in n.children:
                walk(c)

        walk(self)
        return _WS.sub(" ", "".join(parts)).strip()


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs))
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # mismatched end tag: ignore

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(Node(None, text=data))


_TAG_RE = re.compile(
    r"<!--.*?-->"                      # comments
    r"|<!\[CDATA\[.*?\]\]>"            # CDATA
    r"|<!(?:[^>])*>"                    # doctype / declarations
    r"|<\?(?:[^>])*>"                   # processing instructions
    r"|<(/?)([a-zA-Z][a-zA-Z0-9:-]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)(/?)>",
    re.DOTALL,
)
_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*("[^"]*"|'[^']*'|[^\s>]*))?"""
)
_RAWTEXT = {"script", "style"}
_HAS_ENTITY = "&"


def _parse_attrs(s: str) -> dict:
    if not s or s.isspace():
        return {}
    out = {}
    for m in _ATTR_RE.finditer(s):
        name = m.group(1).lower()
        v = m.group(2)
        # valueless attributes stay None, matching html.parser
        if v is not None:
            if v[:1] in "\"'":
                v = v[1:-1]
            if _HAS_ENTITY in v:
                import html as _html

                v = _html.unescape(v)
        out.setdefault(name, v)
    return out


def clone_node(node: Node) -> Node:
    """Deep-copy a parsed tree (iterative) — the pre-prune snapshot the
    summary chain mutates (nav strip) the way the reference's
    ``doc.clone()`` isolates Jsoup mutations.  Attrs dicts are copied;
    strings are shared (immutable)."""
    root_copy = Node(node.tag, dict(node.attrs), [], node.text)
    stack = [(node, root_copy)]
    while stack:
        src, dst = stack.pop()
        for c in src.children:
            cc = Node(c.tag, dict(c.attrs) if c.attrs else {}, [], c.text)
            dst.children.append(cc)
            if c.children:
                stack.append((c, cc))
    return root_copy


def parse_html_fast(html: str) -> Node:
    """Regex-scanner tree builder — same tree semantics as the stdlib
    HTMLParser path (entities unescaped in text/attrs, void elements not
    pushed, mismatched end tags ignored, script/style content treated as
    raw text).  ~3x faster, fewer allocations; equivalence with
    parse_html is asserted in tests over the fixture corpus."""
    from html import unescape

    root = Node("#root")
    stack = [root]
    pos = 0
    n = len(html)
    while pos < n:
        m = _TAG_RE.search(html, pos)
        if not m:
            text = html[pos:]
            if text:
                if _HAS_ENTITY in text:
                    text = unescape(text)
                stack[-1].children.append(Node(None, text=text))
            break
        if m.start() > pos:
            text = html[pos : m.start()]
            if _HAS_ENTITY in text:
                text = unescape(text)
            stack[-1].children.append(Node(None, text=text))
        pos = m.end()
        closing, tag, attrs_s, selfclose = (
            m.group(1), m.group(2), m.group(3), m.group(4),
        )
        if tag is None:
            continue  # comment/doctype/PI
        tag = tag.lower()
        if closing:
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    break
            continue
        node = Node(tag, _parse_attrs(attrs_s))
        stack[-1].children.append(node)
        if selfclose or tag in VOID_ELEMENTS:
            continue
        if tag in _RAWTEXT:
            # raw-text elements: consume verbatim until the closing tag
            end = html.find(f"</{tag}", pos)
            if end == -1:
                end = n
            if end > pos:
                node.children.append(Node(None, text=html[pos:end]))
            close = html.find(">", end)
            pos = n if close == -1 else close + 1
            continue
        stack.append(node)
    return root


def parse_html(html: str, fast: bool = True) -> Node:
    """fast=True (default) uses the regex-scanner builder — equivalent trees
    (tests/test_fast_parser.py), ~1.8x faster and far fewer per-node
    allocations, which matters under memory-bandwidth contention at high
    actor counts.  fast=False keeps the stdlib HTMLParser reference path."""
    if fast:
        return parse_html_fast(html)
    b = _TreeBuilder()
    b.feed(html)
    b.close()
    return b.root


# ---- meta robots (M22) -------------------------------------------------


def is_noindex(root: Node) -> bool:
    for m in root.find_all("meta"):
        if m.attrs.get("name", "").lower() == "robots":
            content = m.attrs.get("content", "").lower()
            if "noindex" in content or "none" in content:
                return True
    return False


# ---- DomPruningFilter (M3) --------------------------------------------


@dataclass(slots=True)
class _NodeData:
    depth: int
    signal: int
    noise: int
    tree_size: int = 1


def prune_dom(root: Node, threshold: float = PRUNE_THRESHOLD) -> None:
    """Bottom-up signal-rate pruning, in place.  Reproduces DomPruningFilter:
    <a> subtree text counts as noise; remove subtrees (depth>1) with zero
    signal, or signal rate below threshold with tree size > 3; plus the
    always-purge tag/class/role rules."""

    def should_remove(node: Node, d: _NodeData) -> bool:
        if d.depth <= 1:
            return False
        if d.signal == 0:
            return True
        if d.noise > 0 and d.tree_size > 3 and d.signal / (d.signal + d.noise) < threshold:
            return True
        if node.tag is not None and _always_purge(node):
            return True
        return False

    # single bottom-up pass with removal on the way up (equivalent to the
    # reference's NodeFilter tail() REMOVE results)
    def walk(node: Node, depth: int) -> _NodeData | None:
        if node.is_text():
            return _NodeData(depth, len(node.text.strip()), 0)
        d = _NodeData(depth, 0, 0)
        keep = []
        for child in node.children:
            cd = walk(child, depth + 1)
            if cd is None:
                continue
            keep.append(child)
            if _is_signal(child):
                d.signal += cd.signal
                d.noise += cd.noise
            else:
                d.noise += cd.noise + cd.signal
            d.tree_size += cd.tree_size
        node.children = keep
        if should_remove(node, d):
            return None
        return d

    kept = []
    for child in root.children:
        if walk(child, 1) is not None:
            kept.append(child)
    root.children = kept
    dom_mutated()


def _is_signal(node: Node) -> bool:
    return node.tag != "a"


def _always_purge(el: Node) -> bool:
    if el.tag in ("nav", "footer", "header"):
        return True
    if el.classes() & _BAD_CLASSES:
        return True
    if el.attrs.get("role", "").lower() in _BAD_ROLES:
        return True
    if el.attrs.get("aria-hidden", "").lower() == "true":
        return True
    return False


# ---- tag cleaner (M4) --------------------------------------------------


def clean_tags(root: Node) -> None:
    """SentenceExtractorHtmlTagCleaner.clean, in place."""
    # code tags: inline if short (junk-trimmed), else remove
    def clean_code(node: Node):
        new_children = []
        for c in node.children:
            if c.tag == "code":
                text = c.get_text()
                if len(text) <= 32:
                    new_children.append(Node(None, text=_CODE_JUNK.sub(" ", text)))
                # else: drop
            else:
                if not c.is_text():
                    clean_code(c)
                new_children.append(c)
        node.children = new_children

    clean_code(root)

    # remove nav, form, input and body>title
    def remove_tags(node: Node, inside_body: bool):
        kept = []
        for c in node.children:
            if c.tag in ("nav", "form", "input"):
                continue
            if c.tag == "title" and inside_body and node.tag == "body":
                continue
            if not c.is_text():
                remove_tags(c, inside_body or c.tag == "body")
            kept.append(c)
        node.children = kept

    remove_tags(root, False)

    # append ". " to block elements; prepend to br/hr
    def sentence_aids(node: Node):
        for c in node.children:
            if c.is_text():
                continue
            sentence_aids(c)
            if c.tag in _BLOCKY:
                c.children.append(Node(None, text=". "))
            elif c.tag in ("br", "hr"):
                c.children.insert(0, Node(None, text=". "))

    sentence_aids(root)
    dom_mutated()


# ---- text + title ------------------------------------------------------


def body_text(root: Node) -> str:
    """SentenceExtractor.asText: body().text() truncated to 95%."""
    body = root.first("body") or root
    text = body.get_text()
    return text[: int(len(text) * 0.95)]


def extract_title(root: Node, sentences_first: str | None = None) -> str:
    """SentenceExtractor.getTitle: <title> + first h1, else h2, else first
    sentence."""
    title_el = root.first("title")
    h1 = root.first("h1")
    title = (title_el.get_text() if title_el else "") + " . " + (h1.get_text() if h1 else "")
    if len(title.strip()) < 3:
        h2s = root.find_all("h2")
        title = " ".join(h.get_text() for h in h2s)
    if len(title.strip()) < 3 and sentences_first:
        title = sentences_first.lower()
    return title


# ---- quality (M14) -----------------------------------------------------

# HtmlStandard scale/offset (converting-process model/HtmlStandard.java)
HTML_STANDARD_PARAMS = {
    "PLAIN": (1.0, 1.0),
    "UNKNOWN": (1.0, -1.0),
    "HTML123": (1.0, 1.0),
    "HTML4": (1.0, -0.1),
    "XHTML": (1.0, -0.1),
    "HTML5": (1.0, -0.15),
}


def script_penalty(root: Node) -> int:
    """DocumentValuator.getScriptPenalty."""
    penalty = 0.0
    script_len = 0
    has_bad = False
    for s in root.find_all("script"):
        src = s.attrs.get("src", "")
        if "wp-content" in src or "wp-includes" in src or "jquery" in src:
            penalty += 0.49
        elif src.strip():
            penalty += 1
        text = "".join(c.text for c in s.children if c.is_text())
        script_len += len(text)
        if ".createElement(" in text:
            has_bad = True
    head = root.first("head")
    if head is not None:
        for link in head.find_all("link"):
            if "onerror" in link.attrs or "onload" in link.attrs:
                penalty += 1
    return int(penalty + (1 if has_bad else 0) + script_len / 1000.0)


def quality(text_length: int, raw_length: int, standard: str, script_pen: int) -> float:
    """DocumentValuator.getQuality."""
    scale, offset = HTML_STANDARD_PARAMS.get(standard, (1.0, -1.0))
    if text_length == 0:
        return -100.0
    return math.log(text_length / (1 + raw_length)) * scale + offset - script_pen


_DOCTYPE_RE = re.compile(r"<!doctype\b([^>]*)>", re.I | re.S)
_PUBLIC_ID_RE = re.compile(r"public\s+(['\"])(.*?)\1", re.I | re.S)

# publicId prefix -> standard, in the reference's check order
# (HtmlStandardExtractor.parseDocType:25-58; the SOFTQUAD rules carry an
# extra contains() condition handled below)
_PUBLIC_ID_PREFIXES = (
    ("-//INTERNET/RFC XXXX//EN", "HTML123"),
    ("-//NETSCAPE COMM. CORP", "HTML123"),
    ("-//SQ//DTD HTML 2", "HTML123"),
    ("-//SOFTQUAD//DTD HTML 2", "HTML123"),
    ("-//W3O//DTD W3 HTML 2", "HTML123"),
    ("-//IETF//DTD HTML 2", "HTML123"),
    ("-//IETF//DTD HTML//EN", "HTML123"),
    ("-/W3C//DTD HTML 3", "HTML123"),
    ("-/W3C/DTD HTML 3", "HTML123"),
    ("-//IETF//DTD HTML 3", "HTML123"),
    ("-//W3C//DTD XHTML", "XHTML"),
    ("ISO/IEC 15445:2000//DTD", "XHTML"),
    ("-//W3C//DTD HTML", "HTML4"),
)


def parse_doctype_standard(html: str) -> str:
    """HtmlStandardExtractor.parseDocType, ported verbatim: classify the
    doctype's publicId by prefix."""
    m = _DOCTYPE_RE.search(html, 0, 2048)
    if not m:
        return "UNKNOWN"
    pid_m = _PUBLIC_ID_RE.search(m.group(1))
    public_id = (pid_m.group(2) if pid_m else "").strip()
    if not public_id:
        return "HTML5"
    public_id = public_id.upper()
    if public_id.startswith("-//SOFTQUAD SOFTWARE//DTD"):
        if "HTML 4" in public_id:
            return "HTML4"
        if "HTML 3" in public_id:
            return "HTML123"
    for prefix, std in _PUBLIC_ID_PREFIXES:
        if public_id.startswith(prefix):
            return std
    return "UNKNOWN"


def sniff_html_standard(root) -> str:
    """HtmlStandardExtractor.sniffHtmlStandard: HTML5 structural tags beat
    a stylesheet link beats nothing."""
    if root.find_all("article", "header", "footer", "video", "audio", "canvas"):
        return "HTML5"
    for link in root.find_all("link"):
        # jsoup attribute selectors match case-insensitively
        if (link.attrs.get("rel") or "").lower() == "stylesheet":
            return "HTML4"
    return "HTML123"


def detect_standard(html: str, root=None) -> str:
    """HtmlDocumentProcessorPlugin.getHtmlStandard
    (HtmlDocumentProcessorPlugin.java:275-277): doctype first, DOM sniff
    when the doctype is absent or unrecognized."""
    std = parse_doctype_standard(html)
    if std == "UNKNOWN" and root is not None:
        return sniff_html_standard(root)
    return std


# ---- the whole extraction (M2, condensed) ------------------------------


@dataclass
class ExtractedDocument:
    text: str
    title: str
    standard: str
    quality: float
    noindex: bool
    raw_length: int
    features: set[str]
    links: list[str] = field(default_factory=list)
    description: str = ""
    # M17: generator dispatch + specialization outcome
    generator_type: str = "unknown"
    generators: list[str] = field(default_factory=list)
    length_modifier: float = 1.0
    should_index: bool = True
    # M24: <link rel=canonical>, resolved absolute ("" when absent)
    canonical: str = ""
    # M18: sniffed publication year (None when no heuristic fires)
    pub_year: int | None = None
    # pre-prune tree snapshot + active specialization for the late,
    # keyword-aware summary (never serialized; consumed in-process by
    # the tokenizer when defer_summary=True)
    summary_root: "Node | None" = field(default=None, repr=False, compare=False)
    summary_spec: object = field(default=None, repr=False, compare=False)


_SKIP_SCHEMES = ("javascript:", "mailto:", "tel:", "data:", "#")


def _remove_dot_segments(url: str) -> str:
    """RFC 3986 remove_dot_segments over an absolute http(s) url's path."""
    scheme_end = url.find("://") + 3
    slash = url.find("/", scheme_end)
    if slash < 0:
        return url
    host, path = url[:slash], url[slash:]
    segs: list[str] = []
    for s in path.split("/")[1:]:
        if s == ".":
            continue
        if s == "..":
            if segs:
                segs.pop()
            continue
        segs.append(s)
    return host + "/" + "/".join(segs)


def extract_links(root: Node, base_url: str) -> list[str]:
    """getLinks (HtmlDocumentProcessorPlugin.java:227-262, simplified
    permissive parse): absolute urls from <a href>, <frame src>,
    <iframe src>, resolved against the base url; fragments/js/mailto
    skipped; order preserved, deduplicated.  A <base href> overrides the
    document url for relative resolution (LinkParser.getBaseLink)."""
    from urllib.parse import urljoin, urlsplit

    # the admission chain classifies internal/external against the
    # DOCUMENT's host, captured before any <base href> override — the
    # reference constructs LinkProcessor(ret, baseUrl) BEFORE
    # linkParser.getBaseLink rebinds baseUrl (HtmlDocumentProcessorPlugin
    # getLinks); urlsplit().hostname also strips userinfo and brackets
    doc_host = (urlsplit(base_url).hostname or "") if base_url else ""

    base = root.first("base")
    if base is not None:
        href = (base.attrs.get("href") or "").strip()
        if href:
            base_url = urljoin(base_url, href)

    out: list[str] = []
    seen: set[str] = set()
    # precompute the base origin once: root-relative hrefs (the common case
    # on real pages) then resolve with one concat instead of urljoin
    bs = urlsplit(base_url)
    origin = f"{bs.scheme}://{bs.netloc}" if bs.scheme in ("http", "https") else None

    def accept(href: str | None):
        if not href:
            return
        href = href.strip()
        if not href or any(href.lower().startswith(s) for s in _SKIP_SCHEMES):
            return
        # fast paths: absolute http(s) and root-relative urls — drop the
        # fragment with string ops; urljoin/urlsplit cost ~3x the rest
        if href.startswith(("http://", "https://")):
            url = href.partition("#")[0]
        elif origin and href.startswith("/") and not href.startswith("//"):
            url = origin + href.partition("#")[0]
        else:
            url = urljoin(base_url, href)
            parts = urlsplit(url)
            if parts.scheme not in ("http", "https"):
                return
            url = parts._replace(fragment="").geturl()
        # LinkParser renormalization: dot segments resolved in the PATH
        # only (URI.normalize never touches the query), empty path becomes
        # "/" (EdgeUrl semantics — LinkParserTest.java:29-56)
        qpos = url.find("?")
        head, query = (url[:qpos], url[qpos:]) if qpos >= 0 else (url, "")
        if "/../" in head or "/./" in head or head.endswith(("/..", "/.")):
            head = _remove_dot_segments(head)
        scheme_end = head.find("://") + 3
        if scheme_end >= 3 and head.find("/", scheme_end) < 0:
            head += "/"
        if query:
            # EdgeUrl(URI) sanitizes EVERY query (EdgeUrl.java:112 →
            # QueryParams.queryParamsSanitizer): whitelisted params only,
            # sorted, else dropped entirely
            from marginalia_ray.functions.link_parser import query_params_sanitizer

            slash = head.find("/", scheme_end)
            path = head[slash:] if slash >= 0 else "/"
            sq = query_params_sanitizer(path, query[1:])
            query = f"?{sq}" if sq else ""
        url = head + query
        if url not in seen:
            seen.add(url)
            out.append(url)

    for a in root.find_all("a"):
        accept(a.attrs.get("href"))
    for fr in root.find_all("frame", "iframe"):
        accept(fr.attrs.get("src"))

    # round-4 parity: the LinkProcessor admission chain (blocklist,
    # mailing-list veto, per-class caps) runs over the collected list
    from marginalia_ray.functions.url_blocklist import admit_links

    return admit_links(out, doc_host)


def extract_document(
    html: str,
    base_url: str | None = None,
    headers: str = "",
    defer_summary: bool = False,
    skip_summary: bool = False,
) -> ExtractedDocument:
    """The HtmlDocumentProcessorPlugin.createDetails core path:
    parse -> robots check -> links -> prune -> tag-clean -> text + title +
    quality.  Links are collected pre-prune (the reference parses them off
    the full DOM)."""
    root = parse_html(html)
    noindex = is_noindex(root)
    standard = detect_standard(html, root)
    s_pen = script_penalty(root)
    # M20/M21: DOM-side HtmlFeatures (JS / tracking / affiliate / media /
    # ads / gaspam); the topic categories need the DLD and are added by the
    # tokenizer stage (stages/features.py)
    from marginalia_ray.stages.features import FEATURE_JS, extract_dom_features

    features = extract_dom_features(root)
    has_js = FEATURE_JS in features
    links = extract_links(root, base_url) if base_url else []

    # M17: generator dispatch -> per-CMS specialization
    from marginalia_ray.stages.generator import extract_generator
    from marginalia_ray.stages.specialization import select

    gen_type, gen_keywords = extract_generator(root, html)
    spec = select(gen_keywords)

    should_index = True
    canonical = ""
    if base_url:
        from urllib.parse import urljoin, urlsplit

        should_index = spec.should_index(urlsplit(base_url).path)
        # M24: <link rel=canonical> (CrawlerRetreiver.java:318 stores it on
        # the crawled doc; the domain stage repairs blanket/cross-domain
        # values via fixBadCanonicalTags)
        for link in root.find_all("link"):
            if (link.attrs.get("rel") or "").lower() == "canonical":
                href = (link.attrs.get("href") or "").strip()
                if href:
                    canonical = urljoin(base_url, href)
                break

    # M18: pubdate sniffing on the full (pre-prune) tree — the DOM-walking
    # heuristics need the byline/footer nodes pruning would drop
    from marginalia_ray.stages.pubdate import sniff_pub_year

    pub_year = sniff_pub_year(html, base_url or "", standard, root=root, headers=headers)

    # description (M19): the reference computes it AFTER keyword
    # extraction, passing words.importantWords through the active
    # specialization (HtmlDocumentProcessorPlugin.java:156-158) whose
    # default routes to SummaryExtractor (nav/ul/li strip + the
    # domFilter/tagDensity/og/meta/fallback chain, relevance re-rank).
    # The chain's strip mutates its tree, so it runs on a pre-prune
    # CLONE; with defer_summary the caller (the tokenizer, which knows
    # the important words) invokes spec.get_summary(summary_root, words)
    # itself and nothing is computed twice.  Disqualified docs (noindex /
    # shouldIndex false) never reach the summary in the reference
    # (DisqualifiedException), and .text-only callers opt out entirely
    # (skip_summary) — neither pays the clone.
    do_summary = not noindex and should_index and not skip_summary
    summary_root = clone_node(root) if do_summary else None
    description = ""
    if do_summary and not defer_summary:
        description = spec.get_summary(summary_root, set())
        summary_root = None  # consumed — don't retain the cloned DOM

    root = spec.prune(root)
    clean_tags(root)

    text = body_text(root)
    title = extract_title(root)
    # length here is len(body_text); the reference's "best effort"
    # MeasureLengthVisitor (MeasureLengthVisitor.java:22-51) collapses
    # whitespace per TEXT NODE and — its own quirk — never counts the
    # final non-ws char of each node.  Both are approximations of the
    # same quantity feeding the log-ratio; the visitor's quirk is not
    # reproduced.
    q = quality(len(text), len(html), standard, s_pen)

    return ExtractedDocument(
        text=text,
        title=title,
        standard=standard,
        quality=q,
        noindex=noindex,
        raw_length=len(html),
        features=features,
        links=links,
        description=description,
        generator_type=gen_type.value,
        generators=gen_keywords,
        length_modifier=spec.length_modifier,
        should_index=should_index,
        canonical=canonical,
        pub_year=pub_year,
        summary_root=summary_root,
        summary_spec=spec,
    )
