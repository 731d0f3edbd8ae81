"""Strict link parsing: the crawl-side LinkParser and the query-param
sanitizer it shares with the converter's permissive path.

Ports:
  * ``LinkParser`` (features-crawl/link-parser/src/main/java/nu/
    marginalia/link_parser/LinkParser.java:20-230): href cleaning
    (whitespace stripped, fragment cut when '#' is past position 0),
    admission (`shouldIndexLink`: href non-empty, <= 128 chars, not a
    blocked scheme prefix, no binary suffix; rel != "noindex" — the
    reference's comment says nofollow, the code checks noindex, the code
    wins), relative resolution against the base url (protocol detection
    by the leading-alpha-then-colon scan, scheme-relative ``//``, the
    query-param sanitizer on the split param, directory-relative
    navigation), RFC 3986 dot-segment normalization matching
    ``java.net.URI.normalize`` (leading ``..`` segments SURVIVE), and
    ``renormalize`` (null path -> "/", leading "/../" stripped).
  * ``QueryParams.queryParamsSanitizer`` (common/process/src/main/java/
    nu/marginalia/util/QueryParams.java): whitelisted params only
    (id/p/f/i/start/t/v/post + per-path forum/story exceptions, .cgi
    passthrough, posting.php rejected), sorted when more than one.

The converter's ``parseLinkPermissive`` is the same chain minus the
admission check — exposed as ``parse_link_permissive``.
"""

from __future__ import annotations

from typing import Optional

from .urls import parse_url

BLOCK_PREFIXES = ("mailto:", "javascript:", "tel:", "itpc:", "#", "file:")

BINARY_SUFFIXES = (
    ".pdf", ".mp3", ".wmv", ".avi", ".zip", ".7z",
    ".mpv", ".mp4", ".avi", ".mkv", ".tiff", ".dat", ".tar",
    ".com", ".bat", ".sh",
    ".bin", ".exe", ".tar.gz", ".tar.bz2", ".xml", ".swf",
    ".wav", ".ogg", ".jpg", ".jpeg", ".png", ".gif", ".webp",
    ".webm", ".bmp", ".doc", ".docx", ".ppt", ".pptx", ".xls", ".xlsx",
    ".gz", ".asc", ".md5", ".asf", ".mov", ".sig", ".pub", ".iso",
)

_SPACE_CHARS = " \r\n\t"


# --- QueryParams ------------------------------------------------------------


def is_permitted_param(path: str, param: str) -> bool:
    """QueryParams.isPermittedParam, branch for branch."""
    if path.endswith(".cgi"):
        return True
    if path.endswith("/posting.php"):
        return False
    if param.startswith("id="):
        return True
    if param.startswith("p=") or param.startswith("f="):
        # forum post/forum ids are non-canonical crawl traps
        if path.endswith("showthread.php") or path.endswith("viewtopic.php"):
            return False
        return True
    if param.startswith("i="):
        return True
    if param.startswith("start="):
        return True
    if param.startswith("t="):
        return True
    if param.startswith("v="):
        return True
    if param.startswith("post="):
        return True
    if path.endswith("index.php"):
        if param.startswith("showtopic=") or param.startswith("showforum="):
            return True
    if path.endswith("StoryView.py"):  # folklore.org is neat
        return param.startswith("project=") or param.startswith("story=")
    return False


def query_params_sanitizer(path: str, query_params: Optional[str]) -> Optional[str]:
    """QueryParams.queryParamsSanitizer: keep whitelisted params, sorted
    when several; empty results collapse to None."""
    if query_params is None:
        return None
    if "&" in query_params:
        parts = [
            p
            for p in query_params.split("&")
            if p and is_permitted_param(path, p)
        ]
        if len(parts) > 1:
            parts.sort()
        ret = "&".join(parts)
    elif is_permitted_param(path, query_params):
        ret = query_params
    else:
        return None
    if not ret.strip():
        return None
    return ret


# --- LinkParser -------------------------------------------------------------


def clean_href(href: str) -> str:
    """getUrl: strip space chars anywhere, cut the fragment when '#'
    appears past position 0 (a leading '#' stays and is later blocked by
    the prefix list)."""
    url = "".join(c for c in href if c not in _SPACE_CHARS)
    anchor = url.find("#")
    if anchor > 0:
        return url[:anchor]
    return url


def is_rel_relevant(rel: Optional[str]) -> bool:
    return (rel or "").lower() != "noindex"


def has_binary_suffix(s: str) -> bool:
    return any(s.endswith(suf) for suf in BINARY_SUFFIXES)


def is_url_relevant(href: Optional[str]) -> bool:
    if not href:
        return False
    if len(href) > 128:
        return False
    href = href.lower()
    if any(href.startswith(p) for p in BLOCK_PREFIXES):
        return False
    if has_binary_suffix(href):
        return False
    return True


def should_index_link(href: Optional[str], rel: Optional[str] = None) -> bool:
    return is_url_relevant(href) and is_rel_relevant(rel)


def does_url_string_have_protocol(s: str) -> bool:
    i = 0
    while i < len(s) and s[i].isalpha():
        i += 1
    if i == 0 or i == len(s):
        return False
    return s[i] == ":"


def _base_origin(base) -> str:
    port = f":{base.port}" if base.port else ""
    return f"{base.proto}://{base.fqdn}{port}"


def _with_path_and_param(base, path: str, param: Optional[str]) -> str:
    """EdgeUrl.withPathAndParam(...).toString()."""
    q = f"?{param}" if param else ""
    return f"{_base_origin(base)}{path}{q}"


def _relative_navigation(base) -> str:
    """For the base path /foo/bar return /foo/ (LinkParser.
    relativeNavigation)."""
    last_slash = base.path.rfind("/")
    if last_slash < 0:
        return "/"
    return base.path[: last_slash + 1]


def resolve_relative_url(base_url: str, s: str) -> str:
    """LinkParser.resolveRelativeUrl."""
    if does_url_string_have_protocol(s):
        return s
    base = parse_url(base_url)
    if s.startswith("//"):  # scheme-relative
        return f"{base.proto}:{s}"

    parts = s.split("?", 1)
    path = parts[0]
    param = (
        query_params_sanitizer(parts[0], parts[1]) if len(parts) > 1 else None
    )

    if path.startswith("/"):
        return _with_path_and_param(base, path, param)

    part_from_new_link = path.replace(" ", "%20")
    return _with_path_and_param(
        base, _relative_navigation(base) + part_from_new_link, param
    )


def normalize_path(path: str) -> str:
    """java.net.URI.normalize's remove-dot-segments: '.' dropped, '..'
    pops the previous real segment, LEADING '..' segments survive, and a
    trailing '.'/'..' keeps the directory slash."""
    if not path:
        return path
    segs = path.split("/")
    out: list[str] = []
    for s in segs:
        if s == ".":
            continue
        if s == "..":
            if out and out[-1] not in ("..", ""):
                out.pop()
            else:
                out.append("..")
        else:
            out.append(s)
    if segs[-1] in (".", "..") and (not out or out[-1] != ""):
        out.append("")
    ret = "/".join(out)
    if not ret and path.startswith("/"):
        return "/"
    return ret


def _normalize_url(url: str) -> Optional[str]:
    """URI(s).normalize() + renormalize + EdgeUrl validation."""
    try:
        p = parse_url(url)
    except Exception:
        return None
    if p.proto not in ("http", "https") or not p.fqdn:
        return None
    path = normalize_path(p.path or "/")
    if not path:
        path = "/"
    while path.startswith("/../"):  # renormalize
        path = path[3:]
    if not path.startswith("/"):
        path = "/" + path
    port = f":{p.port}" if p.port else ""
    query = ""
    if "?" in url:
        query = "?" + url.split("?", 1)[1]
    return f"{p.proto}://{p.fqdn}{port}{path}{query}"


def parse_link_permissive(base_url: str, href: str) -> Optional[str]:
    """parseLinkPermissive: clean + resolve + normalize, NO admission
    check — the converter's path."""
    try:
        resolved = resolve_relative_url(base_url, clean_href(href))
    except Exception:
        return None
    return _normalize_url(resolved)


def parse_link(base_url: str, href: str, rel: Optional[str] = None) -> Optional[str]:
    """parseLink(Element): admission chain + the permissive pipeline."""
    cleaned = clean_href(href)
    if not should_index_link(href, rel):
        return None
    try:
        resolved = resolve_relative_url(base_url, cleaned)
    except Exception:
        return None
    return _normalize_url(resolved)
