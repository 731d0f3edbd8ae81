"""Q2: full query-variant generation.

Port of QueryVariants / QueryPermutation / EnglishDictionary
(/root/reference/code/features-search/query-parser/src/main/java/nu/marginalia/query_parser/QueryVariants.java:40-151,227-358,
 QueryPermutation.java:44-82, .../language/EnglishDictionary.java:45-100):

  1. the query is run through the sentence pipeline, POS tags coerced
     (N*/V* -> NNP; JJ/CD/P* -> NNP and not-stopword) so the keyword span
     extractor segments it like a noun phrase;
  2. all maximal span segmentations covering the query become candidate
     term lists ("faithful": with omittable function words dropped,
     dash-combined and digit-split re-spellings when the n-gram is known);
  3. "alternative" variants join adjacent words into one known compound
     and swap the last word for English singular/plural variants;
  4. every variant is scored by inverse term rarity and deduplicated;
     rarer variants sort first (ascending value).

The reference's NGramBloomFilter / TermFrequencyDict / EnglishDictionary
back the presence and frequency tests; this port takes them as callables
so the index's own term directory can stand in (SURVEY §2 Q2 note).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from marginalia_ray.functions.stemmer import stem
from marginalia_ray.stages.keywords import get_keywords_from_sentence
from marginalia_ray.stages.langfilter import EN_DICT
from marginalia_ray.stages.sentences import make_sentence

# createTokens' droppable function words (QueryVariants.isOmittableWord)
_OMITTABLE = frozenset(
    ("vs", "or", "and", "versus", "is", "the", "why", "when", "if", "who", "are", "am")
)

MAX_LATTICE_PATHS = 64  # safety cap; reference queries are a few words


@dataclass
class Word:
    stemmed: str
    word: str
    original: str  # blank for multi-word spans


@dataclass
class QueryVariantSet:
    faithful: list[list[str]] = field(default_factory=list)
    alternative: list[list[str]] = field(default_factory=list)


def _has_dash(w: str) -> bool:
    return "-" in w


def _num_boundaries(w: str) -> list[int]:
    """Positions i where w[i], w[i+1] cross a digit/letter boundary."""
    out = []
    for i in range(len(w) - 1):
        a, b = w[i], w[i + 1]
        if (a.isdigit() and b.isalpha()) or (a.isalpha() and b.isdigit()):
            out.append(i)
    return out


class QueryVariants:
    def __init__(
        self,
        is_known_ngram: Callable[[str], bool] | None = None,
        term_freq: Callable[[str], float] | None = None,
        term_freq_stemmed: Callable[[str], float] | None = None,
        is_word: Callable[[str], bool] | None = None,
    ):
        self.is_known_ngram = is_known_ngram or (lambda s: False)
        self.term_freq = term_freq or (lambda w: 0.0)
        self.term_freq_stemmed = term_freq_stemmed or (lambda s: 0.0)
        self.is_word = is_word or (lambda w: w in EN_DICT)

    # ---- EnglishDictionary ---------------------------------------------

    def find_word_variants(self, s: str) -> list[str]:
        """EnglishDictionary.findWordVariants: plural/singular and
        -sm/-st alternations, gated on dictionary membership."""
        sl = len(s)
        if sl < 2:
            return []
        candidates: list[tuple[str, str]] = []
        if s.endswith("s"):
            candidates.append((s[:-1], s + "es"))
        if s.endswith("sm"):
            candidates.append((s[:-1] + "t", s[:-1] + "ts"))
        if s.endswith("st"):
            candidates.append((s[:-1] + "m", s + "s"))
        for a, b in candidates:
            wa, wb = self.is_word(a), self.is_word(b)
            if wa and wb:
                return [a, b]
            if wa:
                return [a]
            if wb:
                return [b]
        if not s.endswith("s"):
            p = s + "s"
            if self.is_word(p):
                return [p]
        return []

    def get_word_variants(self, s: str) -> list[str]:
        """getWordVariants: frequency-gated, plus the famous recipe →
        category:food special case."""
        ret = [v for v in self.find_word_variants(s) if self.term_freq(v) > 100]
        if s in ("recipe", "recipes"):
            ret.append("category:food")
        return ret

    # ---- the lattice ----------------------------------------------------

    def get_query_variants(self, words: list[str]) -> QueryVariantSet:
        joined = " ".join(words)
        sent = make_sentence(joined, keep_original=False)
        n = len(sent)
        if n == 0:
            return QueryVariantSet()

        # POS coercion (QueryVariants.java:56-66)
        for i, t in enumerate(sent.pos_tags):
            if t.startswith("N") or t.startswith("V"):
                sent.pos_tags[i] = "NNP"
            elif t == "JJ" or t == "CD" or t.startswith("P"):
                sent.pos_tags[i] = "NNP"
                sent.stop[i] = False
        sent.span_cache.clear()  # predicates derive from the coerced tags

        by_start: dict[int, list[tuple[int, int]]] = {}
        for s, e in get_keywords_from_sentence(sent):
            by_start.setdefault(s, []).append((s, e))

        if not by_start:
            by_start[0] = [(0, n)]
        elif min(by_start) > 0:
            first = by_start[min(by_start)]
            by_start[0] = [(0, sp[0]) for sp in first] + [(0, sp[1]) for sp in first]

        living: list[list[tuple[int, int]]] = [[sp] for sp in by_start.get(0, [])]
        good: list[list[tuple[int, int]]] = []
        while living:
            new_living: list[list[tuple[int, int]]] = []
            for path in living:
                end = path[-1][1]
                if end == n:
                    good.append(path)
                next_keys = [k for k in by_start if k >= end]
                if not next_keys:
                    continue
                nk = min(next_keys)
                for nxt in by_start[nk]:
                    new_living.append(path + [nxt])
            living = new_living[:MAX_LATTICE_PATHS]

        good_words: list[list[Word]] = []
        for path in good:
            ws = []
            for s, e in path:
                if e <= s:
                    continue
                ws.append(
                    Word(
                        stemmed=sent.stemmed_from_span(s, e),
                        word=sent.word_from_span(s, e),
                        original=sent.words[s] if e - s == 1 else "",
                    )
                )
            if ws:
                good_words.append(ws)

        faithful: list[list[str]] = []
        alternative: list[list[str]] = []
        for ls in good_words:
            faithful.extend(self._create_tokens(ls))
        for ls in good_words:
            alternative.extend(self._join_terms(ls))
        for ls in good_words:
            last = ls[-1]
            if last.original and not last.original[:1].isupper():
                for v in self.get_word_variants(last.word):
                    alternative.append([w.word for w in ls[:-1]] + [v])

        return QueryVariantSet(
            faithful=self._evaluate(faithful),
            alternative=self._evaluate(alternative),
        )

    # ---- createTokens ---------------------------------------------------

    def _create_tokens(self, ls: list[Word]) -> list[list[str]]:
        as_tokens: list[str] = []
        ret: list[list[str]] = []
        dash = num = False
        for span in ls:
            dash |= _has_dash(span.word)
            num |= bool(_num_boundaries(span.word))
            if len(ls) == 1 or span.word not in _OMITTABLE:
                as_tokens.append(span.word)
        ret.append(as_tokens)
        if dash:
            ret.extend(self._combine_dash_words(ls))
        if num:
            ret.extend(self._split_word_num(ls))
        return ret

    def _combine_dash_words(self, ls: list[Word]) -> list[list[str]]:
        out: list[str] = []
        dash = False
        for span in ls:
            if "-" in span.word and self.is_known_ngram(stem(span.word.replace("-", ""))):
                dash = True
                out.append(span.word.replace("-", ""))
            else:
                out.append(span.word)
        return [out] if dash else []

    def _split_word_num(self, ls: list[Word]) -> list[list[str]]:
        out: list[str] = []
        num = False
        for span in ls:
            did = False
            for i in _num_boundaries(span.word):
                cand_us = span.word[: i + 1] + "_" + span.word[i + 1 :]
                cand_dash = span.word[: i + 1] + "-" + span.word[i + 1 :]
                if self.is_known_ngram(cand_us) or self.is_known_ngram(cand_dash):
                    out.append(cand_us)
                    did = num = True
                    break
            if not did:
                out.append(span.word)
        return [out] if num else []

    # ---- joinTerms ------------------------------------------------------

    def _join_terms(self, span: list[Word]) -> list[list[str]]:
        ret: list[list[str]] = []
        for i in range(len(span) - 1):
            a, b = span[i], span[i + 1]
            stemmed = stem(a.word + b.word)
            if self.term_freq_stemmed(stemmed) > 0:
                joined = a.word + b.word
                ret.append(
                    [w.word for w in span[:i]] + [joined] + [w.word for w in span[i + 2 :]]
                )
        return ret

    # ---- evaluateQueries ------------------------------------------------

    def _evaluate(self, queries: list[list[str]]) -> list[list[str]]:
        seen: set[tuple[str, ...]] = set()
        scored: list[tuple[float, int, list[str]]] = []
        for order, lst in enumerate(queries):
            key = tuple(lst)
            if key in seen:
                continue
            seen.add(key)
            q = 0.0
            for word in lst:
                parts = [p for p in word.split("_") if p]
                qp = sum(1.0 / (1 + self.term_freq(p)) for p in parts)
                if qp > 0:
                    q += 1.0 / qp
            scored.append((q, order, lst))
        scored.sort(key=lambda t: (t[0], t[1]))
        return [lst for _, _, lst in scored]
