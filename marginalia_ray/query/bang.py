"""Bang commands — the search front-end's "!g terms" external redirects
(search-service BangCommand.java:15-57).

Semantics mirrored exactly: a bang matches only as its own token — at
the start followed by a space, at the end preceded by a space, or
mid-query with spaces on both sides ("search term!g" and "!gsearch
term" do NOT match).  A mid-query match joins the text before and after
the bang with one space; terms are trimmed and URL-encoded with '+' for
spaces (java.net.URLEncoder semantics == urllib quote_plus).  The
reference signals the redirect by throwing RedirectException; here the
hit is returned as a plain string (None when no bang matches).
"""

from __future__ import annotations

import unicodedata
from urllib.parse import quote_plus


def _is_space_char(c: str) -> bool:
    """java.lang.Character.isSpaceChar — Unicode space categories
    (Zs/Zl/Zp) ONLY: '\\t' and '\\n' do NOT count, unlike str.isspace."""
    return unicodedata.category(c).startswith("Z")

BANGS_TO_PATTERN = {
    "!g": "https://www.google.com/search?q={}",
    "!ddg": "https://duckduckgo.com/search?q={}",
}


def bang_redirect(query: str) -> str | None:
    """First matching bang's redirect URL, or None (BangCommand.process)."""
    for bang, pattern in BANGS_TO_PATTERN.items():
        url = _match_bang_pattern(query, bang, pattern)
        if url is not None:
            return url
    return None


def _match_bang_pattern(query: str, bang: str, pattern: str) -> str | None:
    idx = query.find(bang)
    while idx >= 0:
        if idx > 0 and not _is_space_char(query[idx - 1]):
            idx = query.find(bang, idx + 1)
            continue
        nxt = idx + len(bang)
        if nxt >= len(query):  # "search term !b"
            return _redirect(pattern, query[:idx])
        if _is_space_char(query[nxt]):  # "!b term" / "term !b more"
            return _redirect(pattern, query[:idx].rstrip() + " " + query[nxt:].lstrip())
        idx = query.find(bang, idx + 1)
    return None


def _redirect(pattern: str, terms: str) -> str:
    return pattern.format(quote_plus(terms.strip()))
