"""Word eligibility rules + stop words.

Port of WordPatterns
(/root/reference/code/libraries/language-processing/src/main/java/nu/marginalia/language/WordPatterns.java:12-83):
junk rules (>4 '-', >2 '+', leading/trailing '-', >16 digits), min/max word
length 1/64, and an English stop-word dictionary.

The stop-word list is our own standard English list (the reference ships a
~170-entry resource file `dictionary/en-stopwords`; any fixed list satisfies
the same contract since our fixture generator and extractor share this
module).  Includes the reference's notable entries ("e.g", "i.e",
contractions with apostrophes).
"""

from __future__ import annotations

MIN_WORD_LENGTH = 1
MAX_WORD_LENGTH = 64
WORD_TOKEN_JOINER = "_"

STOP_WORDS = frozenset(
    """
    i a e.g i.e the of and in to was is for on as with by he that at from his
    it an were we've we're which are this also or has had first their its new
    after but who not they have

    be been being am do does did done will would can could shall should may
    might must her she him them these those there then than when where why how
    what all any both each few more most other some such only own same so too
    very just because while during before about against between into through
    above below up down out off over under again further once here if each's
    you your yours yourself we us our ours ourselves they're they've i'm i've
    i'll i'd you're you've you'll you'd he's she's it's we'll we'd they'll
    they'd isn't aren't wasn't weren't hasn't haven't hadn't doesn't don't
    didn't won't wouldn't can't couldn't shouldn't mustn't let's that's who's
    what's here's there's when's where's why's how's
    """.split()
)


def has_more_than_n(s: str, c: str, maxn: int) -> bool:
    return s.count(c) > maxn


def _is_not_junk_word_uncached(word: str) -> bool:
    if not word or word.isspace():
        return False
    if has_more_than_n(word, "-", 4):
        return False
    if has_more_than_n(word, "+", 2):
        return False
    if word.startswith("-") or word.endswith("-"):
        return False
    digits = sum(ch.isdigit() for ch in word)
    if digits > 16:
        return False
    return True


# word-shape predicates repeat heavily on Zipfian corpora: plain-dict memos
# (string keys are not GC-tracked, so large caches add no gen2 scan cost)
_JUNK_CACHE: dict[str, bool] = {}
_STOP_CACHE: dict[str, bool] = {}


def is_not_junk_word(word: str) -> bool:
    """WordPatterns.isNotJunkWord."""
    v = _JUNK_CACHE.get(word)
    if v is None:
        if len(_JUNK_CACHE) > 1_000_000:
            _JUNK_CACHE.clear()
        v = _is_not_junk_word_uncached(word)
        _JUNK_CACHE[word] = v
    return v


def is_stop_word(s: str) -> bool:
    """WordPatterns.isStopWord: short, junk, or in the dictionary."""
    v = _STOP_CACHE.get(s)
    if v is None:
        if len(_STOP_CACHE) > 1_000_000:
            _STOP_CACHE.clear()
        v = (
            len(s) < MIN_WORD_LENGTH
            or not is_not_junk_word(s)
            or s.lower() in STOP_WORDS
        )
        _STOP_CACHE[s] = v
    return v
