"""Query parsing (Q1 + Q3 in SURVEY.md §2.9): raw query string ->
SearchSpec.

Ports of:
  - QueryTokenizer.tokenizeQuery:
      /root/reference/code/features-search/query-parser/src/main/java/nu/marginalia/query_parser/QueryTokenizer.java:14-63
  - QueryParser.parse transform chain (quotes, literal trim, -negation,
    ?priority, q/near/year/size/rank/qs specials, ':'-advice, paren advice):
      .../query_parser/QueryParser.java:14-105
  - QuerySearchTermsAccumulator (include/exclude/advice/priority lists,
    quoted n-gram -> advice + coherence + per-word includes, stop-word HACK,
    advice fallback to include, site: domain extraction):
      /root/reference/code/services-core/search-service/src/main/java/nu/marginalia/search/query/QuerySearchTermsAccumulator.java:28-110

Query variants (Q2, POS-based re-segmentation) are intentionally omitted:
they need the bloom-filter dictionary models; the single-subquery spec is
the reference's own behavior when no variants are found.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from marginalia_ray.functions.ascii_flatten import flatten_unicode
from marginalia_ray.functions.word_patterns import is_stop_word
from marginalia_ray.query.engine import SearchSpec, SpecLimit, Subquery

WORD_TOKEN_JOINER = "_"  # WordPatterns.WORD_TOKEN_JOINER

_NOISE = re.compile(r"[,]")
_Q_PAT = re.compile(r"q[=><]\d+")
_YEAR_PAT = re.compile(r"year[=><]\d{4}")
_SIZE_PAT = re.compile(r"size[=><]\d+")
_RANK_PAT = re.compile(r"rank[=><]\d+")


@dataclass
class Token:
    type: str
    s: str


def tokenize_query(raw: str) -> list[Token]:
    """QueryTokenizer.tokenizeQuery."""
    query = _NOISE.sub(" ", flatten_unicode(raw))
    tokens: list[Token] = []
    i = 0
    n = len(query)
    while i < n:
        c = query[i]
        if c == "(":
            tokens.append(Token("LPAREN", "("))
        elif c == ")":
            tokens.append(Token("RPAREN", ")"))
        elif c == '"':
            end = query.find('"', i + 1)
            if end == -1:
                end = n
            tokens.append(Token("QUOT", query[i + 1 : end].lower()))
            i = end
        elif c == "-":
            tokens.append(Token("MINUS", "-"))
        elif c == "?":
            tokens.append(Token("QMARK", "?"))
        elif c == " ":
            pass
        else:
            end = i + 1
            while end < n and query[end] not in (" ", ")"):
                end += 1
            tokens.append(Token("LITERAL_TERM", query[i:end].lower()))
            i = end - 1
        i += 1
    return tokens


def parse_tokens(raw: str) -> list[Token]:
    """QueryParser.parse transform chain."""
    tokens = tokenize_query(raw)

    # quotes -> QUOT_TERM with '_' joiner
    tokens = [
        Token("QUOT_TERM", re.sub(r"\s+", WORD_TOKEN_JOINER, t.s)) if t.type == "QUOT" else t
        for t in tokens
    ]
    # trim trailing ':'/'.' off literals
    for t in tokens:
        if t.type == "LITERAL_TERM" and len(t.s) > 1 and t.s[-1] in ":.":
            t.s = t.s[:-1]

    # '-' + literal -> EXCLUDE ; '?' + literal -> PRIORITY
    out: list[Token] = []
    i = 0
    while i < len(tokens):
        t = tokens[i]
        nxt = tokens[i + 1] if i + 1 < len(tokens) else None
        if t.type == "MINUS" and nxt is not None and nxt.type == "LITERAL_TERM":
            out.append(Token("EXCLUDE_TERM", nxt.s))
            i += 2
            continue
        if t.type == "QMARK" and nxt is not None and nxt.type == "LITERAL_TERM":
            out.append(Token("PRIORITY_TERM", nxt.s))
            i += 2
            continue
        out.append(t)
        i += 1
    tokens = out

    # special operations
    for t in tokens:
        if t.type != "LITERAL_TERM":
            continue
        s = t.s
        if s.startswith("q") and _Q_PAT.fullmatch(s):
            t.type, t.s = "QUALITY_TERM", s[1:]
        elif s.startswith("near:"):
            t.type, t.s = "NEAR_TERM", s[5:]
        elif s.startswith("year") and _YEAR_PAT.fullmatch(s):
            t.type, t.s = "YEAR_TERM", s[4:]
        elif s.startswith("size") and _SIZE_PAT.fullmatch(s):
            t.type, t.s = "SIZE_TERM", s[4:]
        elif s.startswith("rank") and _RANK_PAT.fullmatch(s):
            t.type, t.s = "RANK_TERM", s[4:]
        elif s.startswith("qs="):
            t.type, t.s = "QS_TERM", s[3:]
        elif ":" in s:
            t.type = "ADVICE_TERM"

    # parenthesized literals -> advice
    out = []
    depth = 0
    for t in tokens:
        if t.type == "LPAREN":
            depth += 1
            continue
        if t.type == "RPAREN":
            depth = max(0, depth - 1)
            continue
        if depth > 0 and t.type == "LITERAL_TERM":
            out.append(Token("ADVICE_TERM", t.s))
        else:
            out.append(t)
    return out


def _limit(spec_str: str) -> SpecLimit:
    op, val = spec_str[0], int(spec_str[1:])
    if op == "=":
        return SpecLimit.eq(val)
    if op == ">":
        return SpecLimit.ge(val)
    return SpecLimit.le(val)


def parse_query(raw: str, **spec_kwargs) -> SearchSpec:
    """Raw query -> SearchSpec (single subquery; the accumulator logic of
    QuerySearchTermsAccumulator)."""
    include: list[str] = []
    exclude: list[str] = []
    advice: list[str] = []
    priority: list[str] = []
    coherences: list[list[str]] = []
    limits: dict[str, SpecLimit] = {}

    for t in parse_tokens(raw):
        if t.type == "LITERAL_TERM":
            include.append(t.s)
        elif t.type == "QUOT_TERM":
            parts = t.s.split(WORD_TOKEN_JOINER)
            if len(parts) > 1 and not any(is_stop_word(p) for p in parts):
                advice.append(t.s)
                coherences.append(list(parts))
                include.extend(parts)
            else:
                include.append(t.s)
        elif t.type == "EXCLUDE_TERM":
            exclude.append(t.s)
        elif t.type == "PRIORITY_TERM":
            priority.append(t.s)
        elif t.type == "ADVICE_TERM":
            advice.append(t.s)
        elif t.type == "QUALITY_TERM":
            limits["quality"] = _limit(t.s)
        elif t.type == "YEAR_TERM":
            limits["year"] = _limit(t.s)
        elif t.type == "SIZE_TERM":
            limits["size"] = _limit(t.s)
        elif t.type == "RANK_TERM":
            limits["rank"] = _limit(t.s)
        # NEAR_TERM / QS_TERM affect profile config, out of single-node scope

    if not include and advice:
        include, advice = advice, []

    sq = Subquery(
        include=include,
        exclude=exclude,
        advice=advice,
        priority=priority,
        coherences=coherences,
    )
    return SearchSpec(subqueries=[sq], **limits, **spec_kwargs)
