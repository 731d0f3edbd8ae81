"""Language filter (M9): unicode-block rejection + dictionary agreement.

Port of LanguageFilter
(/root/reference/code/processes/converting-process/src/main/java/nu/marginalia/converting/language/LanguageFilter.java:16-80)
and UnicodeRanges (.../converting/language/UnicodeRanges.java:5-85):

  * is_blocked_unicode(text): >=102 chars (>=17 for CJK-family "sensitive"
    ranges) of a non-Latin script among the first 2000 chars blocks the
    page (the reference's `count++ > max` fires on the max+2'th hit).
  * dictionary_agreement(dld): |distinct words in the top-English list| /
    min(|distinct words|, |list|); < 0.1 disqualifies
    (AbstractDocumentProcessorPlugin.checkDocumentLanguage:25-30).

The reference ships a 1000-word resource file (dictionary/en-1000); any
fixed common-English list satisfies the same contract — this one merges
the standard Ogden/most-frequent words with the stop-word list the
fixture generator shares.
"""

from __future__ import annotations

import numpy as np

from marginalia_ray.functions.word_patterns import STOP_WORDS

# (sensitive, lo, hi) — UnicodeRanges.java values verbatim
_RANGES = (
    (False, 0x0370, 0x03FF), (False, 0x0400, 0x04FF), (False, 0x0500, 0x052F),
    (False, 0x0530, 0x058F), (False, 0x0590, 0x05FF), (False, 0x0600, 0x06FF),
    (False, 0x0700, 0x074F), (False, 0x0780, 0x07BF), (False, 0x0900, 0x097F),
    (False, 0x0980, 0x09FF), (False, 0x0A00, 0x0A7F), (False, 0x0A80, 0x0AFF),
    (False, 0x0B00, 0x0B7F), (False, 0x0B80, 0x0BFF), (False, 0x0C00, 0x0C7F),
    (False, 0x0C80, 0x0CFF), (False, 0x0D00, 0x0D7F), (False, 0x0D80, 0x0DFF),
    (False, 0x0E00, 0x0E7F), (False, 0x0E80, 0x0EFF), (False, 0x0F00, 0x0FFF),
    (False, 0x1000, 0x109F), (False, 0x10A0, 0x10FF), (False, 0x1100, 0x11FF),
    (False, 0x1200, 0x137F), (False, 0x13A0, 0x13FF), (False, 0x1400, 0x167F),
    (False, 0x1680, 0x169F), (False, 0x16A0, 0x16FF), (False, 0x1700, 0x171F),
    (False, 0x1720, 0x173F), (False, 0x1740, 0x175F), (False, 0x1760, 0x177F),
    (False, 0x1780, 0x17FF), (False, 0x1800, 0x18AF), (False, 0x1900, 0x194F),
    (False, 0x1950, 0x197F), (False, 0x19E0, 0x19FF),
    (True, 0x2E80, 0x2EFF), (True, 0x2F00, 0x2FDF), (True, 0x2FF0, 0x2FFF),
    (True, 0x3000, 0x303F), (True, 0x3040, 0x309F), (True, 0x30A0, 0x30FF),
    (True, 0x3100, 0x312F), (True, 0x3130, 0x318F), (True, 0x3190, 0x319F),
    (True, 0x31A0, 0x31BF), (True, 0x31F0, 0x31FF), (True, 0x3200, 0x32FF),
    (True, 0x3300, 0x33FF), (True, 0x3400, 0x4DBF), (True, 0x4DC0, 0x4DFF),
    (True, 0x4E00, 0x9FFF), (True, 0xA000, 0xA48F), (True, 0xA490, 0xA4CF),
    (True, 0xAC00, 0xD7AF),
)
_LO = np.array([r[1] for r in _RANGES], dtype=np.uint32)
_HI = np.array([r[2] for r in _RANGES], dtype=np.uint32)
# blocked at count >= max+2 matching chars (see docstring)
_LIMIT = np.array([17 if r[0] else 102 for r in _RANGES], dtype=np.int64)


def is_blocked_unicode(text: str) -> bool:
    """UnicodeRanges.test over the first 2000 chars, all ranges at once."""
    head = text[:2000]
    if not head:
        return False
    codes = np.frombuffer(head.encode("utf-32-le"), dtype=np.uint32)
    if codes.max(initial=0) < int(_LO.min()):
        return False  # pure-ASCII fast path
    counts = ((codes[:, None] >= _LO[None, :]) & (codes[:, None] <= _HI[None, :])).sum(
        axis=0
    )
    return bool((counts >= _LIMIT).any())


_INTERESTING_LANGS = frozenset({"en", "en-us", "en-gb", "eng", "english"})

# ~1000-common-English stand-in for dictionary/en-1000 (see module doc)
EN_DICT = frozenset(STOP_WORDS) | frozenset(
    """
    time year people way day man thing woman life child world school state
    family student group country problem hand part place case week company
    system program question work government number night point home water
    room mother area money story fact month lot right study book eye job
    word business issue side kind head house service friend father power
    hour game line end member law car city community name president team
    minute idea body information back parent face others level office door
    health person art war history party result change morning reason
    research girl guy moment air teacher force education

    new good high old great big american small large national young
    different black long little important political bad white real best
    sure low early able human local late hard major better economic strong
    possible whole free military true federal international full special
    easy clear recent certain personal open red difficult available likely
    short single medical current wrong private past foreign fine common
    poor natural significant similar hot dead central happy serious ready
    simple left physical general environmental financial blue democratic
    dark various entire close legal religious cold final main green nice
    huge popular traditional cultural

    be have do say get make go know take see come think look want give use
    find tell ask seem feel try leave call put mean become show hear play
    run move like live believe hold bring happen must write provide sit
    stand lose pay meet include continue set learn lead understand watch
    follow stop create speak read allow add spend grow open walk win offer
    remember love consider appear buy wait serve die send expect build stay
    fall cut reach kill remain suggest raise pass sell require report
    decide pull

    search index web page site link file data code user query result text
    image server email internet online computer software program network
    database table key value type list item field record error test run
    start help find home click view open save load print copy edit delete
    news article post blog comment date title author content section
    category tag archive contact about privacy policy terms login logout
    register password username profile settings account member forum thread
    reply message board topic

    one two three four five six seven eight nine ten first second third
    last next many much more most some any every other another such own
    same both few several all no yes not now then here there today
    tomorrow yesterday always never often sometimes usually really very
    quite just only even still also too well far away back down up out
    off on in at by for with from into over under between through during
    before after above below again further than

    and or but so because if when while where what which who whom whose
    why how that this these those it its they them their theirs we us our
    you your he she him his her i me my a an the of to is are was were
    been being am has had does did will would can could shall should may
    might must
    """.split()
)


def dictionary_agreement(dld) -> float:
    """LanguageFilter.dictionaryAgreement: distinct lowercase words hit
    rate against the dictionary, denominator min(|seen|, |dict|)."""
    seen: set[str] = set()
    hits = 0
    for sent in dld.sentences:
        for w in sent.words_lc:
            if w not in seen:
                seen.add(w)
                if w in EN_DICT:
                    hits += 1
    if not seen:
        return 0.0
    return hits / min(len(seen), len(EN_DICT))


def page_interesting_by_html_tag(root) -> bool | None:
    """isPageInterestingByHtmlTag: html[lang] check, None when untagged."""
    html = root.first("html")
    if html is None:
        return None
    lang = (html.attrs.get("lang") or "").strip().lower()
    if not lang:
        return None
    return lang in _INTERESTING_LANGS


def page_interesting_by_meta(root) -> bool | None:
    """isPageInterestingByMetaLanguage: http-equiv content-language."""
    for m in root.find_all("meta"):
        if (m.attrs.get("http-equiv") or "").lower() == "content-language":
            content = (m.attrs.get("content") or "").strip().lower()
            if content:
                return content in _INTERESTING_LANGS
    return None
