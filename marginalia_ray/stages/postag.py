"""Deterministic rule-based English POS tagger.

Stands in for the reference's RDRPOSTagger rule tree + OpenNLP models
(/root/reference/code/libraries/language-processing/src/main/java/nu/marginalia/language/sentence/SentenceExtractor.java:41-61,
 /root/reference/third-party/rdrpostagger/).  The model files are not
available in this environment, so this module implements a small closed-rule
tagger producing the Penn-Treebank-style tags the keyword extractors consume
(NN/NNS/NNP/NNPS, VB/VBD/VBG/VBN/VBP/VBZ, JJ, RB, IN, TO, CC, DT, CD, PRP).
It is loaded once per tokenizer actor (A1 in SURVEY.md §2.3) and is pure:
tag(words) depends only on the token strings.

The fixture generator and golden tests share these rules, so keyword/flag
assertions are exact; parity with RDRPOSTagger itself is structural, not
bitwise (documented deviation)."""

from __future__ import annotations

DETERMINERS = frozenset("the a an this that these those each every no some any another".split())
PREPOSITIONS = frozenset(
    """of in on at by with from into over under between through during against
    about above below across behind beyond near without within upon among
    around since until after before as per via if because while""".split()
)
CONJUNCTIONS = frozenset("and or but nor yet".split())
PRONOUNS = frozenset("i you he she it we they me him us them who whom".split())
ADVERBS = frozenset("very not never always often quickly slowly really quite almost".split())
MODALS = frozenset("can could will would shall should may might must".split())
BE_VERBS = {"is": "VBZ", "are": "VBP", "was": "VBD", "were": "VBD", "be": "VB", "been": "VBN", "being": "VBG", "am": "VBP"}
COMMON_VERBS_BASE = frozenset(
    """run make take give find use build write read show keep hold bring
    drive bear wear serve host store index crawl search rank fetch parse
    render extract filter sort merge split scale stream process load save
    deploy contains contain provides provide offers offer describes describe
    covers cover explains explain presents present drove bore""".split()
)


def _is_number(w: str) -> bool:
    return any(c.isdigit() for c in w) and all(c.isdigit() or c in ".,-/" for c in w)


def tag_word(word: str, is_sentence_start: bool) -> str:
    if not word:
        return "NN"
    lw = word.lower()
    if _is_number(word):
        return "CD"
    if lw in DETERMINERS:
        return "DT"
    if lw == "to":
        return "TO"
    if lw in PREPOSITIONS:
        return "IN"
    if lw in CONJUNCTIONS:
        return "CC"
    if lw in PRONOUNS:
        return "PRP"
    if lw in BE_VERBS:
        return BE_VERBS[lw]
    if lw in MODALS:
        return "MD"
    if lw in ADVERBS or (lw.endswith("ly") and len(lw) > 4):
        return "RB"

    cap = word[0].isupper()
    if cap and not is_sentence_start:
        return "NNPS" if lw.endswith("s") and not lw.endswith("ss") else "NNP"

    if lw.endswith("ing") and len(lw) > 5:
        return "VBG"
    if lw in COMMON_VERBS_BASE:
        # crude agreement: 3rd-person -s forms in the list keep VBZ
        return "VBZ" if lw.endswith("s") and not lw.endswith("ss") else "VB"
    if lw.endswith("ed") and len(lw) > 4:
        return "VBN"
    if lw.endswith(("ous", "ful", "ive", "able", "ible", "al", "ic")) and len(lw) > 4:
        return "JJ"
    if cap and is_sentence_start:
        # sentence-initial capital: treat as proper noun only if it doesn't
        # look like a common word (heuristic: contains another capital)
        if any(c.isupper() for c in word[1:]):
            return "NNP"
    if lw.endswith("s") and not lw.endswith(("ss", "us", "is")) and len(lw) > 3:
        return "NNS"
    return "NN"


# separate caches for sentence-start vs mid-sentence: plain-string keys are
# not GC-tracked objects, so a million cached entries add no gen2 scan cost
# (tuple keys would)
_TAG_CACHE_START: dict[str, str] = {}
_TAG_CACHE_MID: dict[str, str] = {}


def tag_sentence(words: list[str]) -> list[str]:
    # word-shape tags repeat heavily (Zipfian corpora): memoize per process
    if len(_TAG_CACHE_MID) > 1_000_000:
        _TAG_CACHE_MID.clear()
        _TAG_CACHE_START.clear()
    out = []
    for i, w in enumerate(words):
        cache = _TAG_CACHE_START if i == 0 else _TAG_CACHE_MID
        t = cache.get(w)
        if t is None:
            t = tag_word(w, i == 0)
            cache[w] = t
        out.append(t)
    return out
