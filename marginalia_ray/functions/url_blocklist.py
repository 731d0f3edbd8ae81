"""URL blocklist + link admission (the converter's LinkProcessor chain).

Ports:
  - UrlBlocklist (bad-domain set, github depth rule, link-farm path
    patterns, git-hash run detection, mailing-list paths):
    features-crawl/crawl-blocklist/src/main/java/nu/marginalia/
    ip_blocklist/UrlBlocklist.java:11-104
  - LinkProcessor admission (proto check, mailing-list/blocklist veto,
    dedup, per-class caps 250 internal / 100 external):
    processes/converting-process/src/main/java/nu/marginalia/converting/
    processor/logic/links/LinkProcessor.java:13-99

The GuardedRegexFactory.contains pairs are kept as (substring guard,
compiled regex): the guard short-circuits the regex on the overwhelming
majority of paths, same as the reference."""

from __future__ import annotations

import re

from marginalia_ray.functions.urls import _TWO_LEVEL_TLDS, ParsedUrl, parse_url

BAD_DOMAINS = frozenset(
    ("t.co", "facebook.com", "instagram.com", "youtube.com", "youtu.be", "amzn.to")
)

_FARM = r"(-([A-Za-z]+|[0-9]+))"
_GUARDED_PATTERNS: list[tuple[str, re.Pattern]] = [
    ("/download", re.compile(rf"/download{_FARM}{{4,}}\.(htm|html|php)$")),
    ("/permalink", re.compile(rf"/permalink/[a-z]+{_FARM}{{3,}}\.(htm|html|php)$")),
    ("webrx", re.compile(rf"webrx3.*/[A-Za-z]+{_FARM}{{3,}}((-[0-9]+)?/|\.(php|htm|html))$")),
    ("lib", re.compile(rf"lib.*/[A-Za-z]+{_FARM}{{3,}}((-[0-9]+)?/|\.(php|htm|html))$")),
    ("pdf", re.compile(rf"pdf.*/[A-Za-z]+{_FARM}{{3,}}((-[0-9]+)?/|\.(php|htm|html))$")),
    ("book", re.compile(rf"book.*/[A-Za-z]+{_FARM}{{3,}}((-[0-9]+)?/|\.(php|htm|html))$")),
    ("/720p", re.compile(rf"720p.*/[A-Za-z]+{_FARM}{{3,}}((-[0-9]+)?/|\.(php|htm|html))$")),
    ("/node", re.compile(r"/node/.*/[a-z]+(-[a-z0-9]+)+.htm$")),
]

# hashTest: a run of >= 32 hex chars in a path longer than minLength+2
_HEX_RUN = re.compile(r"[0-9a-f]{32}")


def hash_test(path: str) -> bool:
    """UrlBlocklist.hashTest — long hexadecimal runs (git hashes etc.)."""
    return len(path) > 34 and _HEX_RUN.search(path) is not None


def _path_blocked(path: str) -> bool:
    if ".git/" in path or "wp-content/upload" in path or "-download-free" in path:
        return True
    if hash_test(path):
        return True
    for guard, patt in _GUARDED_PATTERNS:
        if guard in path and patt.search(path):
            return True
    return False


def _blocked_by_rules(top_domain: str, path: str) -> bool:
    """The shared UrlBlocklist rule set over (top domain, path) — the one
    copy both is_url_blocked and admit_links evaluate."""
    if top_domain in BAD_DOMAINS:
        return True
    if top_domain == "github.com":
        return path.count("/") > 2
    return _path_blocked(path)


def _is_mailing_path(path: str) -> bool:
    return path.startswith("/lists/") or "mailinglist" in path


def is_url_blocked(url: str | ParsedUrl) -> bool:
    """UrlBlocklist.isUrlBlocked."""
    u = parse_url(url) if isinstance(url, str) else url
    return _blocked_by_rules(u.top_domain, u.path)


def is_mailing_list_link(url: str | ParsedUrl) -> bool:
    """UrlBlocklist.isMailingListLink."""
    return _is_mailing_path((parse_url(url) if isinstance(url, str) else url).path)


MAX_INTERNAL_LINK = 250
MAX_EXTERNAL_LINK = 100


def _host_path_of(url: str) -> tuple[str, str] | None:
    """(host, path) of a normalized absolute http(s) url with cheap string
    ops — extract_links emits exactly that shape, so the full urlsplit is
    reserved for anything unusual."""
    if url.startswith("https://"):
        rest = url[8:]
    elif url.startswith("http://"):
        rest = url[7:]
    else:
        u = parse_url(url)
        if u.proto not in ("http", "https"):
            return None
        return u.fqdn, u.path
    slash = rest.find("/")
    if slash < 0:
        host, path = rest, "/"
    else:
        host, path = rest[:slash], rest[slash:]
    q = path.find("?")
    if q >= 0:
        path = path[:q]
    host = host.lower()
    at = host.rfind("@")
    if at >= 0:
        host = host[at + 1 :]
    # IPv6 literal: strip the brackets (urlsplit().hostname convention,
    # which the admit_links base_host is derived from) — port, if any,
    # sits after the ']' and is dropped with it
    if host.startswith("["):
        end = host.find("]")
        if end > 0:
            host = host[1:end]
    else:
        colon = host.rfind(":")
        if colon >= 0 and host[colon + 1 :].isdigit():
            host = host[:colon]
    return host, path


def _top_domain_of(host: str) -> str:
    labels = host.split(".")
    if len(labels) >= 3 and ".".join(labels[-2:]) in _TWO_LEVEL_TLDS:
        return ".".join(labels[-3:])
    if len(labels) >= 2:
        return ".".join(labels[-2:])
    return host


def admit_links(
    urls: list[str],
    base_host: str,
    max_internal: int = MAX_INTERNAL_LINK,
    max_external: int = MAX_EXTERNAL_LINK,
) -> list[str]:
    """LinkProcessor.accept over an already-deduplicated, document-order
    url list: veto mailing-list and blocklisted urls, cap internal
    (same-host, EdgeDomain equality == full host equality) and external
    links separately.  Returns the surviving urls in document order."""
    out: list[str] = []
    n_int = n_ext = 0
    for url in urls:
        hp = _host_path_of(url)
        if hp is None:
            continue
        host, path = hp
        if _is_mailing_path(path):
            continue
        if _blocked_by_rules(_top_domain_of(host), path):
            continue
        if host == base_host:
            if n_int < max_internal:
                out.append(url)
                n_int += 1
        elif n_ext < max_external:
            out.append(url)
            n_ext += 1
    return out
