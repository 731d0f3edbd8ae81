"""Document keyword extraction (M10, K1-K9, M11 in SURVEY.md §2).

Ports of:
  - KeywordExtractor span assembly (proper names / nouns / keywords / words):
      /root/reference/code/features-convert/keyword-extraction/src/main/java/nu/marginalia/keyword/KeywordExtractor.java:14-246
  - KeywordPositionBitmask: .../extractors/KeywordPositionBitmask.java:9-86
  - WordsTfIdfCounts: .../extractors/WordsTfIdfCounts.java:27-137
  - TitleKeywords: .../extractors/TitleKeywords.java:18-26
  - NameLikeKeywords: .../extractors/NameLikeKeywords.java:20-49
  - SubjectLikeKeywords: .../extractors/SubjectLikeKeywords.java:27-69
  - ArtifactKeywords: .../extractors/ArtifactKeywords.java:8-49
  - UrlKeywords: .../extractors/UrlKeywords.java:12-40
  - KeywordMetadata.getMetadataForWord: .../KeywordMetadata.java:36-62
  - DocumentKeywordExtractor.extractKeywords + matchesWordPattern:
      .../DocumentKeywordExtractor.java:27-164
  - DocumentKeywordsBuilder (1600-cap insertion-ordered map, 64-char cap):
      .../model/DocumentKeywordsBuilder.java
  - MetaTagsBuilder synthetic terms:
      /root/reference/code/processes/converting-process/src/main/java/nu/marginalia/converting/processor/plugin/AbstractDocumentProcessorPlugin.java:32-97
"""

from __future__ import annotations

import math
import re
from collections import Counter
from dataclasses import dataclass

from marginalia_ray.functions.word_patterns import is_not_junk_word
from marginalia_ray.functions.stemmer import stem
from marginalia_ray.model.codecs import WordFlags, encode_word_meta
from marginalia_ray.stages.sentences import (
    COMMA,
    DocumentLanguageData,
    DocumentSentence,
)

Span = tuple[int, int]


# ---- span assembly (KeywordExtractor) ---------------------------------


def _is_proper(sent: DocumentSentence, i: int) -> bool:
    return sent.pos_tags[i] in ("NNP", "NNPS")


def _is_noun(sent: DocumentSentence, i: int) -> bool:
    return sent.pos_tags[i].startswith("NN")


def _is_joiner(sent: DocumentSentence, i: int) -> bool:
    t = sent.pos_tags[i]
    if t == "IN" or t == "TO":
        return True
    if t == "CC":
        return sent.words_lc[i] == "and"
    return False


def _is_name(sent: DocumentSentence, i: int) -> bool:
    t = sent.pos_tags[i]
    return (t.startswith("N") or t in ("VBG", "VBN")) and not sent.stop[i]


def _is_top_adj(sent: DocumentSentence, i: int) -> bool:
    t = sent.pos_tags[i]
    return t.startswith("JJ") or t.startswith("R") or t.startswith("VBG")


def _predicates(sent: DocumentSentence):
    """Per-sentence boolean predicate arrays, computed once (the span
    extractors below otherwise re-evaluate each tag predicate up to ~6x
    per index — pure Python call overhead on the hottest path)."""
    p = sent.span_cache.get("_pred")
    if p is None:
        tags = sent.pos_tags
        stop = sent.stop
        lc = sent.words_lc
        proper = [t in ("NNP", "NNPS") for t in tags]
        noun = [t.startswith("NN") for t in tags]
        joiner = [
            t == "IN" or t == "TO" or (t == "CC" and lc[i] == "and")
            for i, t in enumerate(tags)
        ]
        name = [
            (t.startswith("N") or t in ("VBG", "VBN")) and not stop[i]
            for i, t in enumerate(tags)
        ]
        top_adj = [
            t.startswith("JJ") or t.startswith("R") or t.startswith("VBG")
            for t in tags
        ]
        p = (proper, noun, joiner, name, top_adj)
        sent.span_cache["_pred"] = p
    return p


def get_proper_names(sent: DocumentSentence) -> list[Span]:
    """KeywordExtractor.getProperNames — 1..4-gram NNP spans with
    comma-break and joiner rules."""
    cached = sent.span_cache.get("proper")
    if cached is not None:
        return cached
    proper, _, joiner, _, _ = _predicates(sent)
    tags = sent.pos_tags
    seps = sent.separators
    spans: list[Span] = []
    n = len(sent)
    for i in range(n):
        if proper[i]:
            spans.append((i, i + 1))
    for i in range(1, n):
        if seps[i - 1] == COMMA:
            continue
        if proper[i] and proper[i - 1]:
            spans.append((i - 1, i + 1))
    i = 2
    while i < n:
        if seps[i - 2] == COMMA:
            i += 1
            continue
        if seps[i - 1] == COMMA:
            i += 2
            continue
        if proper[i] and (joiner[i - 1] or proper[i - 1]) and proper[i - 2]:
            spans.append((i - 2, i + 1))
        i += 1
    i = 3
    while i < n:
        if seps[i - 3] == COMMA:
            i += 1
            continue
        if seps[i - 2] == COMMA:
            i += 2
            continue
        if seps[i - 1] == COMMA:
            i += 3
            continue
        if proper[i] and proper[i - 3]:
            if proper[i - 1] and proper[i - 2]:
                spans.append((i - 3, i + 1))
            elif joiner[i - 2] and tags[i - 1] == "DT":
                spans.append((i - 3, i + 1))
            elif (joiner[i - 1] or proper[i - 1]) and (joiner[i - 2] or proper[i - 2]):
                spans.append((i - 3, i + 1))
        i += 1
    sent.span_cache["proper"] = spans
    return spans


def get_nouns(sent: DocumentSentence) -> list[Span]:
    """KeywordExtractor.getNouns (including the reference's odd operator
    precedence in the 2- and 3-gram conditions, reproduced faithfully)."""
    cached = sent.span_cache.get("nouns")
    if cached is not None:
        return cached
    _, noun, joiner, _, _ = _predicates(sent)
    tags = sent.pos_tags
    seps = sent.separators
    spans: list[Span] = []
    n = len(sent)
    for i in range(n):
        if noun[i]:
            spans.append((i, i + 1))
    for i in range(1, n):
        if seps[i - 1] == COMMA:
            continue
        # java: isNoun(i) && (isNoun(i-1)) || "JJ".equals(tag[i-1])
        if (noun[i] and noun[i - 1]) or tags[i - 1] == "JJ":
            spans.append((i - 1, i + 1))
    i = 2
    while i < n:
        if seps[i - 2] == COMMA:
            i += 1
            continue
        if seps[i - 1] == COMMA:
            i += 2
            continue
        if (
            noun[i] and (joiner[i - 1] or noun[i - 1]) and noun[i - 2]
        ) or tags[i - 2] == "JJ":
            spans.append((i - 2, i + 1))
        i += 1
    i = 3
    while i < n:
        if seps[i - 3] == COMMA:
            i += 1
            continue
        if seps[i - 2] == COMMA:
            i += 2
            continue
        if seps[i - 1] == COMMA:
            i += 3
            continue
        if noun[i] and (noun[i - 3] or tags[i - 3] == "JJ"):
            if noun[i - 1] and noun[i - 2]:
                spans.append((i - 3, i + 1))
            elif joiner[i - 2] and tags[i - 1] == "DT":
                spans.append((i - 3, i + 1))
            elif (joiner[i - 1] or noun[i - 1]) and (joiner[i - 2] or noun[i - 2]):
                spans.append((i - 3, i + 1))
        i += 1
    sent.span_cache["nouns"] = spans
    return spans


def proper_name_forms(sent: DocumentSentence) -> list[tuple[int, int, str, str]]:
    """(start, end, word, stemmed) for every proper-name span, cached on the
    sentence — position_bitmask, name_like_keywords and the simple-words
    loop all walk the same spans, so the span-string assembly runs once."""
    cached = sent.span_cache.get("proper_forms")
    if cached is not None:
        return cached
    wfs = sent.word_from_span
    sfs = sent.stemmed_from_span
    forms = [(s, e, wfs(s, e), sfs(s, e)) for s, e in get_proper_names(sent)]
    sent.span_cache["proper_forms"] = forms
    return forms


def get_keywords_from_sentence(sent: DocumentSentence) -> list[Span]:
    """KeywordExtractor.getKeywordsFromSentence."""
    cached = sent.span_cache.get("keywords")
    if cached is not None:
        return cached
    proper, _, joiner, name, top_adj = _predicates(sent)
    tags = sent.pos_tags
    seps = sent.separators
    spans: list[Span] = []
    n = len(sent)
    for i in range(n):
        if name[i] or top_adj[i]:
            spans.append((i, i + 1))
    for i in range(1, n):
        if seps[i - 1] == COMMA:
            continue
        if name[i]:
            if name[i - 1] or top_adj[i - 1]:
                spans.append((i - 1, i + 1))
        if tags[i] == "CD" and name[i - 1]:
            spans.append((i - 1, i + 1))
    i = 2
    while i < n:
        if seps[i - 1] == COMMA:
            i += 2
            continue
        if seps[i - 2] == COMMA:
            i += 1
            continue
        if name[i]:
            if (name[i - 1] or top_adj[i - 1]) and (name[i - 2] or top_adj[i - 2]):
                spans.append((i - 2, i + 1))
            elif (proper[i - 1] or joiner[i - 1]) and proper[i - 2]:
                spans.append((i - 2, i + 1))
        elif tags[i] == "CD" and name[i - 1] and name[i - 2]:
            spans.append((i - 2, i + 1))
        i += 1
    i = 3
    while i < n:
        if seps[i - 1] == COMMA:
            i += 3
            continue
        if seps[i - 2] == COMMA:
            i += 2
            continue
        if seps[i - 3] == COMMA:
            i += 1
            continue
        if (
            name[i]
            and (name[i - 1] or top_adj[i - 1])
            and (name[i - 2] or top_adj[i - 2])
            and (name[i - 3] or top_adj[i - 3])
        ):
            spans.append((i - 3, i + 1))
        elif proper[i] and proper[i - 3]:
            if proper[i - 1] and proper[i - 2]:
                spans.append((i - 3, i + 1))
            elif joiner[i - 1] and tags[i - 2] == "DT":
                spans.append((i - 3, i + 1))
            elif (proper[i - 1] or joiner[i - 1]) and (proper[i - 2] or joiner[i - 2]):
                spans.append((i - 3, i + 1))
        i += 1
    sent.span_cache["keywords"] = spans
    return spans


def get_words_from_sentence(sent: DocumentSentence) -> list[Span]:
    """KeywordExtractor.getWordsFromSentence — all viable 1..4-gram spans."""
    cached = sent.span_cache.get("words")
    if cached is not None:
        return cached
    spans: list[Span] = []
    n = len(sent)
    for k in range(4):
        for i in range(k, n):
            w = (i - k, i + 1)
            if _viable_span(sent, w):
                spans.append(w)
    sent.span_cache["words"] = spans
    return spans


def _viable_span(sent: DocumentSentence, span: Span) -> bool:
    start, end = span
    for i in range(start, end - 1):
        if sent.separators[i] == COMMA:
            return False
    word = sent.word_from_span(start, end)
    if not word or word.isspace() or not is_not_junk_word(word):
        return False
    if sent.pos_tags[start] == "CC":
        return False
    if sent.pos_tags[end - 1] in ("IN", "DT", "CC", "TO"):
        return False
    return True


# ---- per-word metadata builders ---------------------------------------

POSITION_WIDTH = 56
UNMODULATED = 16


def position_bitmask(dld: DocumentLanguageData) -> dict[str, int]:
    """KeywordPositionBitmask — 56-bit coarse position mask per stem."""
    mask: dict[str, int] = {}
    full = (1 << POSITION_WIDTH) - 1
    mget = mask.get

    for sent in dld.title_sentences:
        for st in sent.stemmed:
            mask[st] = mget(st, 0) | 1
        for _s, _e, _w, st in proper_name_forms(sent):
            mask[st] = mget(st, 0) | 1

    line_length_ctr = 0
    bitmask_pos = 1

    def pos() -> int:
        if bitmask_pos < UNMODULATED:
            return bitmask_pos
        return UNMODULATED + (bitmask_pos - UNMODULATED) % (POSITION_WIDTH - UNMODULATED)

    for sent in dld.sentences:
        bit = (1 << pos()) & full
        for st in sent.stemmed:
            mask[st] = mget(st, 0) | bit
        for _s, _e, _w, st in proper_name_forms(sent):
            mask[st] = mget(st, 0) | bit
        # LinePosition.next
        if len(sent) > 10:
            line_length_ctr = 0
            bitmask_pos += 1
        line_length_ctr += len(sent)
        if line_length_ctr > 15:
            line_length_ctr = 0
            bitmask_pos += 1
    return mask


_LOGF_CACHE: dict[str, float] = {}
_TV_MEMO: dict = {}  # (#parts, count, max_value) -> term value (no-dict case)
_NPARTS: dict = {}  # stemmed key -> #parts (pure function of the string)
_LOGF_STATE: tuple = ()
_LOGF_DICT = None


class TfIdfCounts:
    """WordsTfIdfCounts — span counts and tf-idf values.

    `dict_freqs` maps stemmed term -> corpus doc frequency (the
    TermFrequencyDict, A2); `doc_count` is the corpus document count."""

    def __init__(self, dld: DocumentLanguageData, dict_freqs, doc_count: int):
        self.dict_freqs = dict_freqs
        self.doc_count = max(1, doc_count)
        self._bind_log_cache()
        # cross-document memo (no-dict case): the term value is a pure
        # function of (#parts, count, max_value) given a fixed doc_count —
        # keyed globally so the Zipfian repeats across documents hit too
        # (the _bind_log_cache state change clears it with _LOGF_CACHE)
        self._tv_memo: dict = _TV_MEMO
        counts: Counter = Counter()
        # (sent, [(s,e)], [key]) per sentence — reused below, one span pass
        sent_spans: list = []
        for sent in dld.sentences:
            sp = get_keywords_from_sentence(sent)
            if not sp:
                continue
            keys = sent.stemmed_for_spans(sp)
            sent_spans.append((sent, sp, keys))
            counts.update(keys)  # C-speed; same first-occurrence order
        self.counts = counts
        max_val = max(counts.values(), default=0)

        self.tfidf: dict[str, int] = {}
        high_instances = set()
        # inline the (#parts, cnt, max_val) memo hit to skip the
        # _term_value call on repeats; same values either way (the
        # key -> #parts map is itself a pure-function memo)
        memo = self._tv_memo if not self.dict_freqs else None
        mget = memo.get if memo is not None else None
        npget = _NPARTS.get
        tv = self._term_value
        for key, cnt in counts.items():
            if mget is not None:
                np_ = npget(key)
                if np_ is None:
                    if len(_NPARTS) > 1_000_000:
                        _NPARTS.clear()
                    np_ = len([p for p in key.split("_") if p]) if "_" in key else 1
                    _NPARTS[key] = np_
                v = mget((np_, cnt, max_val))
                if v is None:
                    v = tv(key, cnt, max_val)
            else:
                v = tv(key, cnt, max_val)
            self.tfidf[key] = v
            if cnt > 1 and v > 100:
                high_instances.add(key)

        # reps: (word, stemmed) pairs whose stemmed span is high-tfidf
        self.high_reps: list[tuple[str, str]] = []
        seen = set()
        if high_instances:
            for sent, sp, keys in sent_spans:
                wfs = sent.word_from_span
                for (s, e), st in zip(sp, keys):
                    if st in high_instances:
                        w = wfs(s, e)
                        if (w, st) not in seen:
                            seen.add((w, st))
                            self.high_reps.append((w, st))

    def _bind_log_cache(self):
        """Per-process memo of log(dict_freq(term)/doc_count) — the inner
        term of every tf-idf value.  Terms repeat Zipfian across documents;
        the cached float is bit-identical to recomputing, so tf-idf output
        is unchanged.  Reset when the dict/doc_count configuration changes."""
        global _LOGF_STATE, _LOGF_DICT
        state = (id(self.dict_freqs), self.doc_count)
        if state != _LOGF_STATE:
            _LOGF_CACHE.clear()
            _TV_MEMO.clear()
            _LOGF_STATE = state
            _LOGF_DICT = self.dict_freqs  # keep alive so id() stays unique

    def _logf(self, key: str) -> float:
        v = _LOGF_CACHE.get(key)
        if v is None:
            if len(_LOGF_CACHE) > 1_000_000:
                _LOGF_CACHE.clear()
            freq = self.dict_freq(key)
            if freq < 1:
                freq = 1
            v = math.log(freq / self.doc_count)
            _LOGF_CACHE[key] = v
        return v

    def dict_freq(self, stemmed: str) -> int:
        """dict_freqs is keyed by the reference's 61-bit polynomial hash of
        the stemmed term (TermFrequencyDict.getStringHash parity) — no
        strings retained in the broadcast dict."""
        if not self.dict_freqs:
            return 0
        from marginalia_ray.functions.hashing import term_freq_hash_stemmed

        return int(self.dict_freqs.get(term_freq_hash_stemmed(stemmed), 0))

    def _value(self, key: str, count: float, max_value: float) -> float:
        return (0.1 + 0.9 * count / max_value) * self._logf(key)

    def _term_value(self, key: str, count: int, max_value: int) -> int:
        if max_value <= 0:
            return 0
        # without a dict the per-part log is a constant, so the value only
        # depends on (#parts, count, max_value) — memoized globally across
        # documents (same float op sequence on first computation, so
        # results are bit-identical; cleared with _LOGF_CACHE on state change)
        memo = self._tv_memo if not self.dict_freqs else None
        if "_" in key:
            parts = [p for p in key.split("_") if p]
            if not parts:
                return 0
            if memo is not None:
                mk = (len(parts), count, max_value)
                v = memo.get(mk)
                if v is None:
                    if len(memo) > 1_000_000:
                        memo.clear()
                    total = sum(self._value(p, count, max_value) for p in parts)
                    v = int(-(total / len(parts)) * 75)
                    memo[mk] = v
                return v
            total = sum(self._value(p, count, max_value) for p in parts)
            return int(-(total / len(parts)) * 75)
        if memo is not None:
            mk = (1, count, max_value)
            v = memo.get(mk)
            if v is None:
                if len(memo) > 1_000_000:
                    memo.clear()
                v = int(-self._value(key, count, max_value) * 75)
                memo[mk] = v
            return v
        return int(-self._value(key, count, max_value) * 75)

    def get_tfidf(self, stemmed: str) -> int:
        return self.tfidf.get(stemmed, 0)


def title_keywords(dld: DocumentLanguageData) -> tuple[list[tuple[str, str]], set[str]]:
    """TitleKeywords — all word spans from title sentences, limit 100."""
    reps = []
    seen = set()
    for sent in dld.title_sentences:
        for s, e in sorted(set(get_words_from_sentence(sent))):
            w = sent.word_from_span(s, e)
            st = sent.stemmed_from_span(s, e)
            if (w, st) not in seen:
                seen.add((w, st))
                reps.append((w, st))
            if len(reps) >= 100:
                break
        if len(reps) >= 100:
            break
    return reps, {st for _, st in reps}


def name_like_keywords(dld: DocumentLanguageData, min_count: int = 2):
    """NameLikeKeywords — proper-noun spans occurring often enough, top 150."""
    counts: dict[str, int] = {}
    instances: dict[str, set[tuple[str, str]]] = {}
    order: dict[str, int] = {}
    for sent in dld.sentences:
        for s, e, w, st in proper_name_forms(sent):
            if e - s <= 1 and sent.words[s].isupper():
                continue
            counts[st] = counts.get(st, 0) + 1
            order.setdefault(st, len(order))
            instances.setdefault(st, set()).add((w, st))

    def has_enough(st: str) -> bool:
        c = counts[st]
        return c >= min_count if "_" in st else c >= min_count + 1

    chosen = sorted(
        (st for st in counts if has_enough(st)),
        key=lambda st: (-counts[st], order[st]),
    )[:150]
    reps = [rep for st in chosen for rep in sorted(instances[st])]
    return reps, {st for _, st in reps}


def subject_like_keywords(dld: DocumentLanguageData, tfidf: TfIdfCounts):
    """SubjectLikeKeywords — noun spans followed by verb + DT/RB/VB/JJ/P/NN."""
    instances: dict[str, set[tuple[str, str]]] = {}
    for sent in dld.sentences:
        n = len(sent)
        seps = sent.separators
        tags = sent.pos_tags
        for s, e in get_nouns(sent):
            if e + 2 >= n:
                continue
            if seps[e] == COMMA or seps[e + 1] == COMMA:
                continue
            nt = tags[e]
            nnt = tags[e + 1]
            if _is_verb(nt) and _is_det_adv_verb_noun(nnt):
                st = sent.stemmed_from_span(s, e)
                instances.setdefault(st, set()).add((sent.word_from_span(s, e), st))

    def score(st: str) -> int:
        if "_" in st:
            parts = [p for p in st.split("_") if p]
            if not parts:
                return 0
            return sum(tfidf.get_tfidf(p) for p in parts) // len(parts)
        return tfidf.get_tfidf(st)

    reps = [rep for st in sorted(instances) if score(st) >= 100 for rep in sorted(instances[st])]
    return reps, {st for _, st in reps}


def _is_verb(tag: str) -> bool:
    return tag.startswith("VB") and tag != "VB"


def _is_det_adv_verb_noun(tag: str) -> bool:
    return (
        tag == "DT"
        or tag.startswith("RB")
        or tag.startswith("VB")
        or tag.startswith("JJ")
        or tag.startswith("P")
        or tag.startswith("NN")
    )


_MAIL_LIKE = re.compile(r"[a-zA-Z0-9._\-]+@[a-zA-Z0-9]+(\.[a-zA-Z0-9]+)+$")
_IGNORED_DOMAINS = {"@hotmail.com", "@gmail.com", "@paypal.com"}
_IGNORED_USERS = {"info", "legal", "contact", "press", "donotreply", "noreply", "no-reply", "admin", "root"}


def artifact_keywords(dld: DocumentLanguageData) -> set[str]:
    """ArtifactKeywords — e-mail-like tokens -> user/domain keywords."""
    words: set[str] = set()
    for sent in dld.sentences:
        for lc in sent.words_lc:
            at = lc.find("@")
            if len(lc) < 6 or at < 0 or not _MAIL_LIKE.fullmatch(lc):
                continue
            words.add(lc)
            domain = lc[at:]
            user = lc[:at]
            if domain not in _IGNORED_DOMAINS:
                words.add(domain[1:])
                words.add(domain)
            if user not in _IGNORED_USERS:
                words.add(user)
    return words


_URL_SPLIT = re.compile(r"[^a-z0-9A-Z]+")


def url_keywords(path: str, domain: str) -> tuple[set[str], set[str]]:
    """UrlKeywords — stemmed path segments / domain segments (>3 chars)."""
    url_kw = {stem(p) for p in _URL_SPLIT.split(path) if p}
    dom_kw = {stem(p) for p in _URL_SPLIT.split(domain) if len(p) > 3}
    return url_kw, dom_kw


# ---- matchesWordPattern ------------------------------------------------

# NOT the regex in the reference's comment: the unrolled Java loop
# (DocumentKeywordExtractor.java:127-164) allows an EMPTY alnum run after
# each separator (so "c++" and "std::vector" match, per its own test
# vectors, DocumentKeywordExtractorTest.java:21-35), and accepts at most
# 4 COMPLETED separator groups (the return-true checkpoints sit at the
# top of j=0..4, so a fifth group is consumed but never accepted).
_WORD_PATTERN = re.compile(r"[\da-zA-Z]{1,15}([.\-_/:+*][\da-zA-Z]{0,10}){0,4}")


_WORD_PATTERN_MEMO: dict[str, bool] = {}


def matches_word_pattern(s: str) -> bool:
    """DocumentKeywordExtractor.matchesWordPattern (full-match equivalent
    of the unrolled Java loop — see _WORD_PATTERN note).  Memoized
    globally: words repeat Zipfian across documents and the match is
    pure."""
    v = _WORD_PATTERN_MEMO.get(s)
    if v is None:
        if len(_WORD_PATTERN_MEMO) > 1_000_000:
            _WORD_PATTERN_MEMO.clear()
        m = _WORD_PATTERN.match(s)
        v = m is not None and m.end() == len(s)
        _WORD_PATTERN_MEMO[s] = v
    return v


# ---- orchestration -----------------------------------------------------

MAX_WORD_LEN = 64


@dataclass
class DocumentKeywords:
    words: list[str]
    metas: list[int]


class KeywordsBuilder:
    """DocumentKeywordsBuilder: insertion-ordered word -> meta map."""

    def __init__(self):
        self.words: dict[str, int] = {}
        self.important: set[str] = set()

    def add(self, word: str, meta: int):
        if len(word) > MAX_WORD_LEN:
            return
        self.words[word] = meta

    def add_synthetic(self, word: str):
        if len(word) > MAX_WORD_LEN:
            return
        self.words.setdefault(word, WordFlags.Synthetic.bit)

    def size(self) -> int:
        return len(self.words)

    def build(self) -> DocumentKeywords:
        return DocumentKeywords(list(self.words.keys()), list(self.words.values()))


def extract_keywords(
    dld: DocumentLanguageData,
    url_path: str,
    url_domain: str,
    dict_freqs=None,
    doc_count: int = 11_820_118,  # TermFrequencyDict legacy default
) -> KeywordsBuilder:
    """DocumentKeywordExtractor.extractKeywords."""
    bitmask = position_bitmask(dld)
    tfidf = TfIdfCounts(dld, dict_freqs, doc_count)
    t_reps, t_set = title_keywords(dld)
    n_reps, n_set = name_like_keywords(dld)
    s_reps, s_set = subject_like_keywords(dld, tfidf)
    artifacts = artifact_keywords(dld)
    u_kw, d_kw = url_keywords(url_path, url_domain)

    _meta_memo: dict[str, int] = {}  # stems repeat per doc; meta is pure

    def meta_for(stemmed: str) -> int:
        m = _meta_memo.get(stemmed)
        if m is not None:
            return m
        flags = 0
        if tfidf.get_tfidf(stemmed) > 100:
            flags |= WordFlags.TfIdfHigh.bit
        if stemmed in s_set:
            flags |= WordFlags.Subjects.bit
        if stemmed in n_set:
            flags |= WordFlags.NamesWords.bit
        if stemmed in t_set:
            flags |= WordFlags.Title.bit
        if stemmed in u_kw:
            flags |= WordFlags.UrlPath.bit
        if stemmed in d_kw:
            flags |= WordFlags.UrlDomain.bit
        m = encode_word_meta(bitmask.get(stemmed, 0), flags)
        _meta_memo[stemmed] = m
        return m

    b = KeywordsBuilder()

    # createSimpleWords
    mm_get = _meta_memo.get
    for sent in dld.sentences:
        if b.size() > 1500:
            break
        stop = sent.stop
        words_lc = sent.words_lc
        stemmed = sent.stemmed
        for i in range(len(sent)):
            if stop[i]:
                continue
            w = words_lc[i]
            if matches_word_pattern(w):
                st = stemmed[i]
                m = mm_get(st)
                b.add(w, m if m is not None else meta_for(st))
        for _s, _e, w, st in proper_name_forms(sent):
            m = mm_get(st)
            b.add(w, m if m is not None else meta_for(st))

    # createWordsFromSet for tfidf-high, title, subject-like, name-like
    for reps in (tfidf.high_reps, t_reps, s_reps, n_reps):
        for word, stemmed in reps:
            if word and not word.isspace():
                b.add(word, meta_for(stemmed))

    # importantWords (top-16 by tfidf then 6 rarest with dict freq > 100)
    all_reps = list(tfidf.high_reps) + list(n_reps) + list(s_reps)
    cands = [(w, st) for w, st in all_reps if len(w) >= 3 and "_" not in w]
    cands.sort(key=lambda ws: -tfidf.get_tfidf(ws[1]))
    cands = cands[:16]
    cands = [(w, st) for w, st in cands if tfidf.dict_freq(st) > 100]
    cands.sort(key=lambda ws: tfidf.dict_freq(ws[1]))
    b.important.update(w for w, _ in cands[:6])

    for a in sorted(artifacts):
        b.add_synthetic(a)

    return b


def meta_tags(
    url_proto: str,
    url_fqdn: str,
    url_top_domain: str,
    tld: str,
    *,
    generators: list[str] = (),
    fmt: str | None = None,
    features: set[str] = frozenset(),
    has_js: bool = False,
    year: int | None = None,
    pub_iso: str | None = None,
    ip: str | None = None,
) -> set[str]:
    """MetaTagsBuilder — synthetic `key:value` discovery terms."""
    tags: set[str] = set()

    def add(k, v):
        if v is not None and v != "":
            tags.add(f"{k}:{str(v).lower()}")

    add("ip", ip)
    add("proto", url_proto)
    add("site", url_fqdn)
    add("site", url_top_domain)
    add("tld", tld)
    for g in generators:
        add("generator", g)
    add("format", fmt)
    tags.update(features)
    add("js", "true" if has_js else "false")
    if year is not None and year > 1900:
        add("year", year)
    add("pub", pub_iso)
    return tags
