"""Rule-based sentence boundary detection.

Stands in for the reference's OpenNLP ``SentenceDetectorME``
(SentenceExtractor.java:43-50,137-141): the trained opennlp-sentence.bin is a
download-time asset (run/setup.sh:25) unavailable here, so this implements
deterministic boundary rules in the style of the public pragmatic-segmenter /
Punkt heuristics:

* a boundary is a run of ``.!?`` (plus closing quotes/brackets) followed by
  whitespace and an upper-case letter, digit or opening quote;
* never inside a decimal number (no whitespace after the dot);
* not after a known abbreviation (Mr., Dr., e.g., ...) or a single-letter
  initial (``J. Smith``);
* ``!``/``?`` always end a sentence when followed by whitespace.

The reference's documented fallback when the model fails is a plain '.'
split (SentenceExtractor.java:137-141); this detector strictly dominates it.
Output sentences retain their terminators, as OpenNLP's do — the downstream
splitter treats a trailing ``.`` as a word break and the tokenizer strips
trailing dots (SentenceExtractor.java:166-169), so terminator retention is
behavior-compatible.
"""

from __future__ import annotations

import re

# Common English abbreviations that take a trailing period without ending a
# sentence (public standard list; lowercase, no trailing dot).
_ABBREVIATIONS = frozenset(
    """mr mrs ms dr prof rev gen rep sen gov lt col capt sgt adm maj st jr sr
    inc ltd co corp dept univ assn bros fig figs ref refs eq eqs ch sec secs
    no nos vol vols pp ca approx est min max vs etc al seq cf
    jan feb mar apr jun jul aug sep sept oct nov dec
    mon tue tues wed thu thur thurs fri sat sun
    e.g i.e u.s u.k u.n a.m p.m a.d b.c ph.d b.a m.a d.c""".split()
)

# candidate boundary: terminator run + optional closing punctuation, then
# whitespace, then a plausible sentence opener
_BOUNDARY = re.compile(
    r"""
    ([.!?]+)                 # terminator run
    (["'”’)\]]*)   # optional closing quote/bracket
    (\s+)                    # whitespace
    (?=["'“‘(\[]*[A-Z0-9À-Þ])  # opener: capital or digit
    """,
    re.VERBOSE,
)

_WORD_BEFORE = re.compile(r"(\S+)$")


def _is_non_boundary_period(text: str, term_start: int) -> bool:
    """True when the '.' at term_start ends an abbreviation or initial."""
    m = _WORD_BEFORE.search(text, 0, term_start)
    if not m:
        return False
    word = m.group(1)
    stripped = word.strip("(\"'“‘[")
    # single-letter initial: "J. R. R. Tolkien"
    if len(stripped) == 1 and stripped.isalpha() and stripped.isupper():
        return True
    low = stripped.lower().rstrip(".")
    return low in _ABBREVIATIONS


def detect_sentences(text: str) -> list[str]:
    """Split text into sentences; terminators are retained."""
    out: list[str] = []
    start = 0
    for m in _BOUNDARY.finditer(text):
        if m.group(1) == ".":  # lone period: apply abbreviation guards
            if _is_non_boundary_period(text, m.start(1)):
                continue
        end = m.end(2)  # include terminator + closing quote, drop whitespace
        sent = text[start:end]
        if sent.strip():
            out.append(sent)
        start = m.end(3)
    tail = text[start:]
    if tail.strip():
        out.append(tail)
    return out
