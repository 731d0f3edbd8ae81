"""Publication-date sniffing (M18): the full ordered heuristic chain.

Port of /root/reference/code/features-convert/pubdate/src/main/java/nu/marginalia/pubdate/
(PubDateSniffer.java:15-38 order, PubDateParser.java, PubDateFromHtmlStandard.java,
heuristic/*.java — 13 of the 14 heuristics; PubDateHeuristicLastModified
needs the HTTP response headers, which our page table does not carry).

Chain, in the reference's order:
  1. JSON-LD datePublished            (PubDateHeuristicJSONLD)
  2. Microdata/itemprop datePublished (PubDateHeuristicMicrodata + Html5Itemprop)
  3. OpenGraph / RDFa / DC meta tags  (PubDateHeuristicOpenGraph + RDFaTag)
  4. <time pubdate="pubdate">         (PubDateHeuristicHtml5ArticleDateTag)
  5. URL year pattern, 2000+          (PubDateHeuristicUrlPatternPass1)
  6. DOM scan: copyright notices, byline/date classes, phpBB "Posted:"
                                      (PubDateHeuristicDOMParsingPass1)
  7. any <time datetime=...>          (PubDateHeuristicHtml5AnyTimeTag)
  8. DOM scan: any year-looking text  (PubDateHeuristicDOMParsingPass2)
  9. URL year pattern, 1995+          (PubDateHeuristicUrlPatternPass2)
 10. guess from HTML standard era     (PubDateHeuristicGuessFromHtmlStandard;
     the reference adds gaussian jitter — pinned era midpoints here for
     determinism)

Each heuristic returns a year (int) or None; years must be plausible
(PubDate.MIN_YEAR=1995 .. MAX_YEAR=2030)."""

from __future__ import annotations

import json
import re
from collections.abc import Callable

MIN_YEAR = 1995
MAX_YEAR = 2030

_YEAR4 = re.compile(r"\d{4}")
_ISO_YEAR = re.compile(r"\b(19\d{2}|20\d{2})\b")
_META_DATE = re.compile(
    r'<meta[^>]+(?:property|name)=["\'](?:article:published_time|datePublished|'
    r"dc\.date(?:\.issued)?|dcterms\.(?:date|issued|created))[\"'][^>]*"
    r'content=["\']([^"\']+)["\']',
    re.IGNORECASE,
)
_META_DATE_REV = re.compile(
    r'<meta[^>]+content=["\']([^"\']+)["\'][^>]*(?:property|name)=["\']'
    r"(?:article:published_time|datePublished|dc\.date(?:\.issued)?|"
    r"dcterms\.(?:date|issued|created))[\"']",
    re.IGNORECASE,
)
_JSONLD = re.compile(
    r'<script[^>]+type=["\']application/ld\+json["\'][^>]*>(.*?)</script>',
    re.IGNORECASE | re.DOTALL,
)
_ITEMPROP = re.compile(
    r'itemprop=["\']datePublished["\'][^>]*(?:content|datetime)=["\']([^"\']+)["\']',
    re.IGNORECASE,
)
_TIME_TAG = re.compile(r'<time[^>]+datetime=["\']([^"\']+)["\']', re.IGNORECASE)
_TIME_PUBDATE = re.compile(
    r'<time[^>]*\bpubdate\b[^>]*\bdatetime=["\']([^"\']+)["\']'
    r'|<time[^>]*\bdatetime=["\']([^"\']+)["\'][^>]*\bpubdate\b',
    re.IGNORECASE,
)
_URL_YEAR = re.compile(r"/(\d{4})/")


# ---- PubDateParser ------------------------------------------------------


def blind_guess(standard: str) -> int:
    """PubDateFromHtmlStandard.blindGuess."""
    return {
        "PLAIN": 1993, "HTML123": 1997, "HTML4": 2006, "XHTML": 2006,
        "HTML5": 2018,
    }.get(standard, 2000)


def is_guess_plausible(standard: str, year: int) -> bool:
    """PubDateFromHtmlStandard.isGuessPlausible."""
    if standard == "HTML123":
        return year <= 2000
    if standard in ("XHTML", "HTML4"):
        return year >= 2000
    if standard == "HTML5":
        return year >= 2014
    return True


def guess_year(lo: int, hi: int, educated: int | None = None) -> int:
    """PubDateParser.guessYear (2- and 3-arg forms)."""
    if educated is None:
        return (hi + lo) // 2
    if hi - lo < 3:
        return lo
    avg = (hi + lo) // 2
    guess = (avg + educated) // 2
    return min(max(guess, lo), hi)


def year_from_substrings(text: str, standard: str | None = None) -> int | None:
    """dateFromHighestYearLookingSubstring[WithGuess]: min/max of all valid
    4-digit years; a spread resolves via guessYear, else the max."""
    lo, hi = MAX_YEAR + 1, MIN_YEAR - 1
    for m in _YEAR4.finditer(text):
        y = int(m.group(0))
        if MIN_YEAR <= y <= MAX_YEAR:
            lo, hi = min(lo, y), max(hi, y)
    if hi != lo and lo <= MAX_YEAR and hi >= MIN_YEAR:
        if standard is not None and standard != "UNKNOWN":
            return guess_year(lo, hi, blind_guess(standard))
        return guess_year(lo, hi)
    if hi >= MIN_YEAR:
        return hi
    return None


def _parse_8601_or_1123(s: str) -> int | None:
    from datetime import datetime
    from email.utils import parsedate_to_datetime

    for fn in (datetime.fromisoformat,):
        try:
            return fn(s.replace("Z", "+00:00")).year
        except ValueError:
            pass
    try:
        return parsedate_to_datetime(s).year
    except (ValueError, TypeError):
        return None


def attempt_parse_date(s: str | None, standard: str | None = None) -> int | None:
    """PubDateParser.attemptParseDate: ISO-8601, RFC-1123, then the
    year-substring fallback; 4..31 chars; validated against the range."""
    if not s or not (4 <= len(s) < 32):
        return None
    y = _parse_8601_or_1123(s.strip())
    if y is None:
        y = year_from_substrings(s, standard)
    if y is not None and MIN_YEAR <= y <= MAX_YEAR:
        return y
    return None


def _year_of(s: str | None) -> int | None:
    if not s:
        return None
    m = _ISO_YEAR.search(s)
    if not m:
        return None
    y = int(m.group(1))
    return y if MIN_YEAR <= y <= MAX_YEAR else None


def _url_path(url: str) -> str:
    i = url.find("://")
    j = url.find("/", i + 3 if i >= 0 else 0)
    return url[j:] if j >= 0 else ""


# ---- regex heuristics (html string) ------------------------------------


def h_json_ld(html: str, url: str, standard: str, root=None) -> int | None:
    for m in _JSONLD.finditer(html):
        try:
            data = json.loads(m.group(1))
        except (json.JSONDecodeError, ValueError):
            continue
        items = data if isinstance(data, list) else [data]
        for item in items:
            if isinstance(item, dict):
                y = _year_of(str(item.get("datePublished", "")))
                if y:
                    return y
    return None


def h_microdata(html: str, url: str, standard: str, root=None) -> int | None:
    m = _ITEMPROP.search(html)
    return _year_of(m.group(1)) if m else None


def h_meta_tags(html: str, url: str, standard: str, root=None) -> int | None:
    m = _META_DATE.search(html) or _META_DATE_REV.search(html)
    return _year_of(m.group(1)) if m else None


def h_article_time(html: str, url: str, standard: str, root=None) -> int | None:
    """PubDateHeuristicHtml5ArticleDateTag: time[pubdate="pubdate"]."""
    for m in _TIME_PUBDATE.finditer(html):
        y = attempt_parse_date(m.group(1) or m.group(2), standard)
        if y:
            return y
    return None


def h_url_pattern_pass1(html: str, url: str, standard: str, root=None) -> int | None:
    """Year-in-path, 2000+ only (1990s false-positive guard)."""
    for m in _URL_YEAR.finditer(_url_path(url)):
        y = int(m.group(1))
        if 2000 <= y <= MAX_YEAR:
            return y
    return None


def h_time_tag(html: str, url: str, standard: str, root=None) -> int | None:
    m = _TIME_TAG.search(html)
    return _year_of(m.group(1)) if m else None


def h_url_pattern_pass2(html: str, url: str, standard: str, root=None) -> int | None:
    for m in _URL_YEAR.finditer(_url_path(url)):
        y = int(m.group(1))
        if MIN_YEAR <= y <= MAX_YEAR:
            return y
    return None


def h_html_standard(html: str, url: str, standard: str, root=None) -> int | None:
    if standard in ("UNKNOWN", "PLAIN"):
        return None
    return blind_guess(standard)


# ---- DOM heuristics -----------------------------------------------------

_COPYRIGHT_MARKS = ("ublished", "opyright", "Posted on", "&copy;", "(c)")
_COMMON_CLASSES = {"entry-meta", "byline", "author", "submitted", "date", "datey"}


_PASS1_HTML_MARKS = (
    "ublished", "opyright", "Posted on", "&copy;", "(c)", "Posted:",
    "entry-meta", "byline", "author", "submitted", "date",
    "footer-info-lastmod",
)


def h_dom_pass1(html: str, url: str, standard: str, root=None) -> int | None:
    """DOMParsingPass1: short copyright-ish text nodes, byline/date-class
    elements, and the phpBB '<b>Posted:</b> <date>' shape.

    Cheap precheck: if none of the trigger substrings appear anywhere in
    the raw HTML, no node can match — skip the tree walk entirely."""
    if root is None:
        return None
    if html and not any(m in html for m in _PASS1_HTML_MARKS):
        return None
    std = standard if standard != "UNKNOWN" else None

    def parse(text: str) -> int | None:
        return year_from_substrings(text, std)

    stack = [root]
    while stack:
        n = stack.pop()
        if n.is_text():
            t = n.text
            if len(t) < 32 and any(mark in t for mark in _COPYRIGHT_MARKS):
                y = parse(t)
                if y:
                    return y
            continue
        cls = set((n.attrs.get("class") or "").split()) if n.attrs else set()
        if (cls & _COMMON_CLASSES) or "footer-info-lastmod" in (n.attrs.get("id") or ""):
            y = parse(n.get_text())
            if y:
                return y
        # phpBB: <b>Posted:</b> followed by a text sibling with the date
        kids = n.children
        for i, c in enumerate(kids):
            if (
                c.tag == "b"
                and len(c.children) == 1
                and c.children[0].is_text()
                and c.children[0].text == "Posted:"
                and i + 1 < len(kids)
                and kids[i + 1].is_text()
            ):
                y = parse(kids[i + 1].text)
                if y:
                    return y
        stack.extend(reversed(kids))
    return None


def _is_possible_year_text(text: str) -> bool:
    """DOMParsingPass2.isPossibleCandidate: (^|[ ./-])dddd([ ./-]|$)."""
    for m in _YEAR4.finditer(text):
        s, e = m.start(), m.end()
        if (s == 0 or text[s - 1] in " ./-") and (e == len(text) or text[e] in " ./-"):
            return True
    return False


def h_dom_pass2(html: str, url: str, standard: str, root=None) -> int | None:
    """DOMParsingPass2: any year-looking text node; keeps overwriting the
    candidate until one is plausible for the HTML standard, returns the
    last candidate otherwise.

    Cheap precheck: a year-looking candidate needs a 4-digit run somewhere
    in the raw HTML — skip the walk when there is none."""
    if root is None:
        return None
    if html and not _YEAR4.search(html):
        return None
    std = standard if standard != "UNKNOWN" else None
    pub: int | None = None
    stack = [root]
    while stack:
        n = stack.pop()
        if n.is_text():
            if _is_possible_year_text(n.text):
                y = year_from_substrings(n.text, std)
                if y:
                    pub = y
                    if is_guess_plausible(standard, y):
                        return pub
            continue
        stack.extend(reversed(n.children))
    return pub


def h_last_modified(headers: str) -> int | None:
    """PubDateHeuristicLastModified.java:17-27: parse the Last-Modified
    HTTP response header.  Needs the raw header block, which the input
    pages table carries in an optional `headers` column; absent -> no-op
    (the reference always has headers because it consumes its own crawl
    WARCs)."""
    if not headers:
        return None
    key = "last-modified: "
    off = headers.lower().find(key)
    if off < 0:
        return None
    end = headers.find("\n", off)
    if end < 0:
        end = len(headers)
    return attempt_parse_date(headers[off + len(key) : end])


DEFAULT_CHAIN: list[Callable] = [
    h_json_ld,
    h_microdata,
    h_meta_tags,
    h_article_time,
    h_url_pattern_pass1,
    h_dom_pass1,
    h_time_tag,
    h_dom_pass2,
    h_url_pattern_pass2,
    h_last_modified,  # PubDateSniffer.java:34, just before the standard guess
    h_html_standard,
]


def sniff_pub_year(
    html: str,
    url: str,
    standard: str = "UNKNOWN",
    root=None,
    chain: list[Callable] | None = None,
    headers: str = "",
) -> int | None:
    for h in chain or DEFAULT_CHAIN:
        if h is h_last_modified:
            y = h(headers)
        else:
            y = h(html, url, standard, root)
        if y is not None:
            return y
    return None
