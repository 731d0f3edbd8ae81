"""ASCII flattening with reference data parity.

Port of AsciiFlattener.flattenUnicode
(/root/reference/code/libraries/language-processing/src/main/java/nu/marginalia/language/encoding/AsciiFlattener.java:5-113):
Latin diacritics fold to their base letter via fixed tables; smart double
quotes become '"'; Þ/þ -> "th", ß -> "ss"; every other non-ASCII codepoint is
DROPPED.  The tables are reproduced verbatim as data (including the
reference's ĥ..ⱨ -> 'g' quirk — don't "fix" it, byte parity depends on it).
Implemented as a str.translate map (O(n), vs the reference's per-char scans).
"""

from __future__ import annotations

_TABLES = {
    "“”": '"',
    "áâàȁăåäāǟãąą̊ḁẚⱥ": "a",
    "ḃḅḇƀɓ": "b",
    "ćĉčçḉċƈȼ": "c",
    "ɗḓďḋḍḏḑđðɖḏ": "d",
    "éêèȅěëēẽĕęėẹȇḕḗḙḛḝɇ": "e",
    "ḟƒ": "f",
    "ǵĝǧğġģɠḡǥ": "g",
    "ĥȟḧḣḥẖḩḫħⱨ": "g",  # reference quirk: 'h' table appends 'g'
    "iıíîìȉïḯīĩįịḭ": "i",
    "ĵǰɉ": "j",
    "ḱǩķḳḵƙⱪ": "k",
    "ĺłḽľļḷḹḻƚɫⱡ": "l",
    "ḿṁṃ": "m",
    "ŋńǹñṋňṅṇṉŉn̈ņ": "n",
    "óőôòȍŏȯȱöȫōṓṑõṍṏȭøǿǫǭọȏơ": "o",
    "ṕṗƥᵽ": "p",
    "ꝗ": "q",
    "ŕȑřŗṙṛṝṟɍɽ": "r",
    "śṥŝšṧşșṡṣṩ": "s",
    "ťṱẗţțŧṫṭṯⱦ": "t",
    "úùûŭưűüūṻųůũṹụṳṵṷʉ": "u",
    "ṽṿʋỽ": "v",
    "ẃŵẁẅẘẇẉⱳ": "w",
    "x̂ẍẋ": "x",
    "ƴýŷỳÿȳỹẙẏy̨ɏỿ": "y",
    "źẑžżẓẕƶȥ": "z",
    "Þþ": "th",
}

# Build codepoint -> replacement map.  NB: the Java tables contain a few
# multi-codepoint entries (combining marks, e.g. "ą̊", "n̈", "x̂", "y̨"); Java's
# indexOf(int) matches the *base* codepoint and the combining mark separately,
# so we register each codepoint of the table string individually, matching
# first-table-wins precedence.
_MAP: dict[int, str] = {}
for _chars, _repl in _TABLES.items():
    for _ch in _chars:
        _MAP.setdefault(ord(_ch), _repl)
_MAP[ord("ß")] = "ss"
# everything else non-ascii -> dropped
_DELETE_DEFAULT = None


class _FlattenMap(dict):
    def __missing__(self, cp):
        return "" if cp > 0x7F else chr(cp)


_TRANSLATE = _FlattenMap(_MAP)


def flatten_unicode(s: str) -> str:
    if s.isascii():
        return s
    return s.translate(_TRANSLATE)
