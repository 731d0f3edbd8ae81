"""Online typeahead suggestions + spell checker — the reference's
assistant-service driver-side state (Suggestions.java, SpellChecker.java).

The reference keeps a PatriciaTrie of suggestion words valued by
TermFrequencyDict counts and an embedded SymSpell corrector; a query
front-end asks for completions of the partially-typed search box.  Here
the trie is a SORTED numpy string array + searchsorted (same
lexicographic-iteration semantics, O(log n) select), built once on the
driver (or once per actor) from any (term, freq) vocabulary table —
e.g. ops.suggest._vocab output or pipelines.term_freq's persisted dict.

Reference semantics mirrored:
- suggestion filter ``^[a-z0-9]+( [a-z0-9]+)*$`` + length < 32,
  lowercased (Suggestions.java:27,52-55);
- HtmlFeature keywords and their negations are always suggestible
  (Suggestions.java:58-64);
- MIN_SUGGEST_LENGTH = 3: shorter inputs return [] (Suggestions.java:30,75);
- completions walk matches in lexicographic order, window to the FIRST
  256, then sort by (freq desc, length, term) and cut to count
  (Suggestions.java:128-150 — including the trie-window quirk where a
  frequent term lexicographically past the window is not returned);
- getSuggestions composes three streams — whole-phrase completion,
  last-word completion carrying the typed prefix, spell correction of
  the last word — concatenated then cut to count (Suggestions.java:74-88;
  deviation: duplicates across streams are dropped here, where the
  reference's flat limit(count) can repeat an entry);
- SpellChecker sorts candidates by distance (SpellChecker.java:19-21);
  (freq desc, term) tiebreaks are added for determinism.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from marginalia_ray.ops.suggest import (
    _bag_lower_bound,
    _char_codes,
    _char_matrix,
    _levenshtein_vec,
    _ALPHABET,
)
from marginalia_ray.stages.features import (
    FEATURE_ADS,
    FEATURE_AFFILIATE,
    FEATURE_COOKIES,
    FEATURE_CRAFTS,
    FEATURE_FOOD,
    FEATURE_GA_SPAM,
    FEATURE_JS,
    FEATURE_MEDIA,
    FEATURE_TRACKING,
)

FEATURE_KEYWORDS = (
    FEATURE_MEDIA,
    FEATURE_JS,
    FEATURE_AFFILIATE,
    FEATURE_TRACKING,
    FEATURE_COOKIES,
    FEATURE_FOOD,
    FEATURE_ADS,
    FEATURE_CRAFTS,
    FEATURE_GA_SPAM,
)

_SUGGESTION_PATTERN = re.compile(r"^[a-z0-9]+( [a-z0-9]+)*$")
MIN_SUGGEST_LENGTH = 3
LEX_WINDOW = 256


class SpellChecker:
    """SymSpell-style corrector over an in-memory vocabulary: candidates
    within ``max_dist`` Levenshtein, sorted (distance, freq desc, term).

    Uses the same vectorized kernels as the distributed op: length-band
    + bag-distance prefilter, then exact column-vectorized DP — no
    per-word Python in the lookup.
    """

    def __init__(self, terms, freqs, max_dist: int = 2):
        terms = np.asarray(terms, dtype=object)
        freqs = np.asarray(freqs, dtype=np.int64)
        # the DP kernels run over BYTES: keep the dictionary ASCII so
        # byte edits == character edits (the SymSpell dictionary is
        # plain words; anything else is dropped, not mis-measured)
        keep = np.asarray([bool(t) and t.isascii() for t in terms], dtype=bool)
        terms, freqs = terms[keep], freqs[keep]
        order = np.argsort(terms, kind="stable")
        self.terms = terms[order]
        self.freqs = freqs[order]
        self.max_dist = max_dist
        arr = pa.array(self.terms, pa.large_string())
        self._chars, self._lens = _char_matrix(arr)

    def correct(self, word: str) -> list[str]:
        word = word.lower()
        # single plain words only (the SymSpell dictionary unit); also
        # keeps the byte-DP exact — non-ASCII would measure byte edits
        if not word or not re.fullmatch(r"[a-z0-9]+", word):
            return []
        band = np.abs(self._lens - len(word)) <= self.max_dist
        idx = np.flatnonzero(band)
        if not len(idx):
            return []
        codes = _char_codes(np.frombuffer(word.encode(), np.uint8).astype(np.uint8))
        pcounts = np.bincount(codes, minlength=_ALPHABET)
        bag = _bag_lower_bound(self._chars[idx], self._lens[idx], pcounts, len(word))
        idx = idx[bag <= self.max_dist]
        if not len(idx):
            return []
        dist = _levenshtein_vec(self._chars[idx], self._lens[idx], word)
        ok = dist <= self.max_dist
        idx, dist = idx[ok], dist[ok]
        order = np.lexsort((self.terms[idx], -self.freqs[idx], dist))
        return list(self.terms[idx][order])


class Suggestions:
    """Typeahead completion service (Suggestions.java)."""

    @classmethod
    def from_parquet(cls, path, **kwargs) -> "Suggestions":
        """Load the (term, freq) vocabulary artifact written by
        ``ops.suggest.term_frequencies(...).write_parquet(path)`` — the
        Ray-native stand-in for the reference's suggestions.txt +
        tfreq-data.bin pair (Suggestions.java:44-70)."""
        import pyarrow.dataset as pads

        t = pads.dataset(str(path)).to_table(columns=["term", "freq"])
        return cls(t["term"].to_pylist(), t["freq"].to_pylist(), **kwargs)

    def __init__(self, terms, freqs, extra_keywords=FEATURE_KEYWORDS):
        terms = [str(t).lower() for t in terms]
        freqs = list(freqs)
        keep = [
            i
            for i, t in enumerate(terms)
            if len(t) < 32 and _SUGGESTION_PATTERN.match(t)
        ]
        vocab: dict[str, int] = {terms[i]: int(freqs[i]) for i in keep}
        # feature keywords + negations are always present (:58-64); they
        # rank by their corpus frequency if present, else 0
        for kw in extra_keywords:
            vocab.setdefault(kw, 0)
            vocab.setdefault("-" + kw, 0)
        self.terms = np.asarray(sorted(vocab), dtype=object)
        self.freqs = np.asarray([vocab[t] for t in self.terms], dtype=np.int64)
        # spell checker over the plain-word subset (SymSpell dictionary)
        # spell checker over SINGLE plain words only (the SymSpell
        # dictionary unit — multi-word suggestion phrases stay in the
        # trie but are not correction targets)
        plain = np.asarray(
            [bool(re.fullmatch(r"[a-z0-9]+", t)) for t in self.terms], dtype=bool
        )
        self.spell = SpellChecker(self.terms[plain], self.freqs[plain])

    def suggestions_for_keyword(self, count: int, prefix: str) -> list[str]:
        """First LEX_WINDOW lexicographic matches, ranked (freq desc,
        length, term), cut to count (Suggestions.java:128-150)."""
        if len(prefix) < MIN_SUGGEST_LENGTH:
            return []
        lo = np.searchsorted(self.terms, prefix, side="left")
        window = []
        for i in range(lo, min(lo + LEX_WINDOW, len(self.terms))):
            t = self.terms[i]
            if not t.startswith(prefix):
                break
            window.append(i)
        if not window:
            return []
        idx = np.asarray(window)
        lens = np.asarray([len(self.terms[i]) for i in idx], dtype=np.int64)
        order = np.lexsort((self.terms[idx], lens, -self.freqs[idx]))[:count]
        return list(self.terms[idx][order])

    def get_suggestions(self, count: int, search_word: str) -> list[str]:
        """Compose whole-phrase, last-word, and spell-check streams,
        limit to count (Suggestions.java:74-88)."""
        if len(search_word) < MIN_SUGGEST_LENGTH:
            return []
        search_word = search_word.lower().lstrip(" ")
        out: list[str] = []

        def _extend(items):
            for s in items:
                if len(out) >= count:
                    return
                if s not in out:
                    out.append(s)

        _extend(self.suggestions_for_keyword(count, search_word))
        sp = search_word.rfind(" ")
        prefix, last = ("", search_word) if sp < 0 else (
            search_word[: sp + 1],
            search_word[sp + 1 :],
        )
        if sp >= 0:
            _extend(prefix + s for s in self.suggestions_for_keyword(count, last))
        if len(last) >= MIN_SUGGEST_LENGTH:
            _extend(prefix + s for s in self.spell.correct(last))
        return out
