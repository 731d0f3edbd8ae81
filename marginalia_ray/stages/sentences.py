"""Sentence extraction and tokenization (the converter's NLP front half).

Ports (semantics + regexes verbatim) of:
  - SentenceSegmentSplitter.splitSegment:
      /root/reference/code/libraries/language-processing/src/main/java/nu/marginalia/language/sentence/SentenceSegmentSplitter.java:26-92
  - SentenceExtractorStringUtils (sanitize / normalize / possessive):
      .../sentence/SentenceExtractorStringUtils.java
  - SentencePreCleaner: .../sentence/SentencePreCleaner.java:12-40
  - SentenceExtractor.extractSentencesFromString / calculateWordCounts:
      .../sentence/SentenceExtractor.java:63-214
    (OpenNLP sentence model unavailable here -> rule-based boundary
     detection in stages/sentdetect.py, strictly dominating the reference's
     documented '.'-split fallback (SentenceExtractor.java:137-141))
    POS tags come from the RDR evaluator port (stages/rdr.py), replacing the
    round-1/2 closed-rule tagger.

DocumentSentence mirrors the reference's parallel-array model
(.../model/DocumentSentence.java:14-130) including span construction,
junk-char trimming, joiner normalization and IN/TO/CC/DT stemming exclusion.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from marginalia_ray.functions.ascii_flatten import flatten_unicode
from marginalia_ray.functions.stemmer import stem
from marginalia_ray.functions.word_patterns import MAX_WORD_LENGTH, is_stop_word
from marginalia_ray.stages.rdr import default_tagger
from marginalia_ray.stages.sentdetect import detect_sentences

SPACE = 0  # WordSeparator.SPACE
COMMA = 1  # WordSeparator.COMMA

MAX_SENTENCE_LENGTH = 250  # SentenceExtractor.MAX_SENTENCE_LENGTH

# SentenceSegmentSplitter.wordBreakPattern, ported verbatim
_WORD_BREAK = re.compile(
    r"([^/_#@.a-zA-Z'+\-0-9À-ÖØ-öø-ÿ]+)|[|]|(\.(\s+|$))"
)
_NOISE = set("/*-")
_NOISE_STR = "/*-"  # w.strip(_NOISE_STR) == "" iff every char is noise

# SentencePreCleaner.splitPattern
# Non-capturing group: Java Pattern.split discards separators, so a
# capturing group here would inject ' -'/'- '/'|' pseudo-sentences that
# depress the avg-sentence-length doc-metadata field vs the reference.
_PRECLEAN_SPLIT = re.compile(r"(?: -|- |\|)")


# isAllowedCharacter as a character class: a-zA-Z0-9_#@. plus the three
# Latin-1 letter ranges; everything else becomes a space (C-speed sub
# instead of a per-char Python loop — same output byte-for-byte)
_DISALLOWED = re.compile(r"[^a-zA-Z0-9_#@.À-ÖØ-öø-ÿ]")


def sanitize_string(s: str) -> str:
    """SentenceExtractorStringUtils.sanitizeString: replace disallowed chars
    with space, strip one leading '.'."""
    r = _DISALLOWED.sub(" ", s)
    if r.startswith("."):
        r = r[1:]
    return "" if not r.strip() else r


def normalize_spaces(s: str) -> str:
    return s.replace("\t", " ").replace("\n", " ")


def strip_possessive(s: str) -> str:
    if s.endswith("'"):
        return s[:-1]
    if s.endswith("'s") or s.endswith("'S"):
        return s[:-2]
    return s


def to_lower_strip_possessive(s: str) -> str:
    return strip_possessive(s).lower()


def split_segment(segment: str) -> tuple[list[str], list[int]]:
    """SentenceSegmentSplitter.splitSegment — word/separator arrays."""
    flat = flatten_unicode(segment)
    ret_w: list[str] = []
    ret_s: list[int] = []

    # one C-level finditer pass (equivalent to repeated .search from each
    # match end — the pattern has no zero-width alternative), with the
    # word filters fused in: empty/whitespace, MAX_WORD_LENGTH, all-noise
    # ('/*-' only, checked via C-speed strip), and quote trimming
    pos = 0
    for m in _WORD_BREAK.finditer(flat):
        start = m.start()
        end = m.end()
        if pos != start:
            w = flat[pos:start]
            # all-noise test: strip can only empty w when the first (and
            # last) chars are noise — skip the per-word strip alloc otherwise
            if len(w) < MAX_WORD_LENGTH and (
                w[0] not in _NOISE or w.strip(_NOISE_STR)
            ):
                if len(w) > 1:
                    if w[0] == "'":
                        w = w[1:]
                    if len(w) > 1 and w[-1] == "'":
                        w = w[:-1]
                ret_w.append(w)
                # dominant case: a single-space separator (C-level == check
                # before the substring+strip fallback; same classification)
                if end - start == 1 and flat[start] == " ":
                    ret_s.append(SPACE)
                else:
                    ret_s.append(SPACE if flat[start:end].strip() == "" else COMMA)
        pos = end
    if pos <= len(flat):
        w = flat[pos:]
        if w and not w.isspace() and len(w) < MAX_WORD_LENGTH and w.strip(_NOISE_STR):
            if len(w) > 1:
                if w[0] == "'":
                    w = w[1:]
                if len(w) > 1 and w[-1] == "'":
                    w = w[:-1]
            ret_w.append(w)
            ret_s.append(SPACE)

    return ret_w, ret_s


def preclean(sentences: list[str]) -> list[str]:
    """SentencePreCleaner.clean."""
    max_count = 250
    max_total = 20 * max_count
    total = 0
    count = 0
    out: list[str] = []
    for s in sentences:
        if not s.strip():
            continue
        total += len(s)
        count += 1
        if total > max_total and count > max_count:
            break
        if "-" in s or "|" in s:
            out.extend(p for p in _PRECLEAN_SPLIT.split(s) if p.strip())
        else:
            out.append(s)
    return out


@dataclass(slots=True)
class DocumentSentence:
    original: str
    words: list[str]
    separators: list[int]
    words_lc: list[str]
    pos_tags: list[str]
    stemmed: list[str]
    stop: list[bool] = field(default_factory=list)
    # hot-path caches (the reference keeps a per-sentence span cache,
    # KeywordExtractor.java:108-110; we extend it to span-string assembly)
    _stemmed_norm: list[str] | None = field(default=None, repr=False, compare=False)
    _span_words: dict = field(default_factory=dict, repr=False, compare=False)
    _span_stems: dict = field(default_factory=dict, repr=False, compare=False)
    span_cache: dict = field(default_factory=dict, repr=False, compare=False)

    def __post_init__(self):
        if not self.stop:
            self.stop = [is_stop_word(w) for w in self.words]

    def __len__(self):
        return len(self.words)

    # DocumentSentence.constructWordFromSpan
    def word_from_span(self, start: int, end: int) -> str:
        key = start * 1024 + end
        w = self._span_words.get(key)
        if w is None:
            if end - start == 1:
                w = _trim_junk(self.words_lc[start])
            else:
                w = _trim_junk("_".join(self.words_lc[start:end]))
            self._span_words[key] = w
        return w

    # DocumentSentence.constructStemmedWordFromSpan
    def stemmed_from_span(self, start: int, end: int) -> str:
        key = start * 1024 + end
        st = self._span_stems.get(key)
        if st is None:
            if self._stemmed_norm is None:
                tags = self.pos_tags
                self._stemmed_norm = [
                    None
                    if tags[i] in _STEM_EXCLUDED
                    else s.replace("+", "_").replace(".", "_").replace("-", "_")
                    for i, s in enumerate(self.stemmed)
                ]
            norm = self._stemmed_norm
            if end - start > 1:
                st = "_".join([p for p in norm[start:end] if p is not None])
            else:
                st = norm[start] if norm[start] is not None else ""
            self._span_stems[key] = st
        return st

    def stemmed_for_spans(self, spans) -> list[str]:
        """Bulk stemmed_from_span over a span list — one cache/locals bind
        instead of a method call per span (the TfIdfCounts hot path asks for
        every keyword span of every sentence; spans are ~97% first-seen, so
        the per-call dispatch dominated the memo).  Identical results."""
        if self._stemmed_norm is None:
            tags = self.pos_tags
            self._stemmed_norm = [
                None
                if tags[i] in _STEM_EXCLUDED
                else s.replace("+", "_").replace(".", "_").replace("-", "_")
                for i, s in enumerate(self.stemmed)
            ]
        norm = self._stemmed_norm
        cache = self._span_stems
        cget = cache.get
        out = []
        ap = out.append
        for s, e in spans:
            key = s * 1024 + e
            st = cget(key)
            if st is None:
                if e - s > 1:
                    st = "_".join([p for p in norm[s:e] if p is not None])
                else:
                    st = norm[s] if norm[s] is not None else ""
                cache[key] = st
            ap(st)
        return out

    def _include_in_stemming(self, i: int) -> bool:
        return self.pos_tags[i] not in _STEM_EXCLUDED


_STEM_EXCLUDED = frozenset(("IN", "TO", "CC", "DT"))


def _trim_junk(s: str) -> str:
    return s.strip("\"'_*")


def _normalize_joiner(s: str) -> str:
    return s.replace("+", "_").replace(".", "_").replace("-", "_")


# Global per-word memo for the lc+stem chain below — words repeat Zipfian
# across documents, and (lc, stem) is a pure function of the surface word,
# so the cached pair is bit-identical to recomputing.
_WORD_FORMS: dict[str, tuple[str, str]] = {}


def _word_forms(w: str) -> tuple[str, str]:
    v = _WORD_FORMS.get(w)
    if v is None:
        if len(_WORD_FORMS) > 1_000_000:
            _WORD_FORMS.clear()
        lc = to_lower_strip_possessive(w)
        v = (lc, stem(strip_possessive(lc)) or "NN")
        _WORD_FORMS[w] = v
    return v


def make_sentence(raw: str, keep_original: bool) -> DocumentSentence:
    words, seps = split_segment(raw)
    if len(words) > MAX_SENTENCE_LENGTH:
        words = words[:MAX_SENTENCE_LENGTH]
        seps = seps[:MAX_SENTENCE_LENGTH]
    # strip trailing dots (SentenceExtractor.java:166-169)
    words = [w.rstrip(".") if w.endswith(".") else w for w in words]
    tags = default_tagger().tag_sentence(words)
    lc = []
    stems = []
    wf = _word_forms
    for w in words:
        a, b = wf(w)
        lc.append(a)
        stems.append(b)
    return DocumentSentence(
        original=sanitize_string(raw) if keep_original else "",
        words=words,
        separators=seps,
        words_lc=lc,
        pos_tags=tags,
        stemmed=stems,
    )


def extract_sentences_from_string(text: str) -> list[DocumentSentence]:
    """SentenceExtractor.extractSentencesFromString with rule-based
    boundary detection (stages/sentdetect.py) in place of OpenNLP."""
    normalized = normalize_spaces(text)
    raw = detect_sentences(normalized)
    raw = preclean(raw)
    return [make_sentence(s, keep_original=(i == 0)) for i, s in enumerate(raw)]


def calculate_word_counts(sentences: list[DocumentSentence]) -> dict[str, int]:
    counts: dict[str, int] = {}
    for sent in sentences:
        for w in sent.stemmed:
            counts[w] = counts.get(w, 0) + 1
    return counts


@dataclass
class DocumentLanguageData:
    """DocumentLanguageData.java:15-18."""

    sentences: list[DocumentSentence]
    title_sentences: list[DocumentSentence]
    word_counts: dict[str, int]

    @property
    def total_num_words(self) -> int:
        return sum(len(s) for s in self.sentences)


def extract_dld(text: str, title: str) -> DocumentLanguageData:
    """SentenceExtractor.extractSentences(String text, String title)."""
    sents = extract_sentences_from_string(text)
    counts = calculate_word_counts(sents)
    title_sents = extract_sentences_from_string(title.lower())
    return DocumentLanguageData(sents, title_sents, counts)
