"""Publication-date sniffing (M18): ordered heuristic chain.

Port of /root/reference/code/features-convert/pubdate/src/main/java/nu/marginalia/pubdate/
(PubDateSniffer.java + heuristic/*.java, 14 files).  Implemented chain, in
the reference's order where the signal exists in our input:
  1. OpenGraph / article meta tags (PubDateHeuristicOpenGraph)
  2. JSON-LD datePublished (PubDateHeuristicJSONLD)
  3. Microdata itemprop=datePublished (PubDateHeuristicMicrodata)
  4. RDFa / Dublin Core meta (PubDateHeuristicRDFaTag, dcterms)
  5. HTML5 <time datetime=...> (PubDateHeuristicHtml5AnyTimeTag)
  6. URL path year pattern (PubDateHeuristicUrlPatternPass)
  7. Guess from HTML standard era (PubDateHeuristicGuessFromHtmlStandard)

Each heuristic returns a year (int) or None; the year must be plausible
(PubDate.MIN_YEAR=1995 .. MAX_YEAR=2030, ref model/crawl/PubDate.java)."""

from __future__ import annotations

import json
import re
from collections.abc import Callable

MIN_YEAR = 1995
MAX_YEAR = 2030

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
_URL_YEAR = re.compile(r"/((?:19|20)\d{2})/")


def _year_of(s: str | None) -> int | None:
    if not s:
        return None
    m = _ISO_YEAR.search(s)
    if not m:
        return None
    y = int(m.group(1))
    return y if MIN_YEAR <= y <= MAX_YEAR else None


def h_meta_tags(html: str, url: str, standard: str) -> int | None:
    m = _META_DATE.search(html) or _META_DATE_REV.search(html)
    return _year_of(m.group(1)) if m else None


def h_json_ld(html: str, url: str, standard: str) -> int | None:
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


def h_microdata(html: str, url: str, standard: str) -> int | None:
    m = _ITEMPROP.search(html)
    return _year_of(m.group(1)) if m else None


def h_time_tag(html: str, url: str, standard: str) -> int | None:
    m = _TIME_TAG.search(html)
    return _year_of(m.group(1)) if m else None


def h_url_pattern(html: str, url: str, standard: str) -> int | None:
    m = _URL_YEAR.search(url)
    if m:
        y = int(m.group(1))
        return y if MIN_YEAR <= y <= MAX_YEAR else None
    return None


# PubDateHeuristicGuessFromHtmlStandard: era midpoints per doctype
_STANDARD_ERA = {"HTML123": 1997, "HTML4": 2006, "XHTML": 2006, "HTML5": 2018}


def h_html_standard(html: str, url: str, standard: str) -> int | None:
    return _STANDARD_ERA.get(standard)


DEFAULT_CHAIN: list[Callable[[str, str, str], int | None]] = [
    h_meta_tags,
    h_json_ld,
    h_microdata,
    h_time_tag,
    h_url_pattern,
    h_html_standard,
]


def sniff_pub_year(
    html: str,
    url: str,
    standard: str = "UNKNOWN",
    chain: list[Callable[[str, str, str], int | None]] | None = None,
) -> int | None:
    for h in chain or DEFAULT_CHAIN:
        y = h(html, url, standard)
        if y is not None:
            return y
    return None
