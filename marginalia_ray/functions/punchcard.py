"""Braille-block punch cards — the search UI's dot-matrix rendering of
a term-position bitmask (BrailleBlockPunchCards.java:1-52).

Each 8-bit chunk of the value becomes one U+2800-block braille char,
LSB chunk first; within a chunk the bits are permuted into braille's
historical dot order via (v & 0x87) | ((v & 0x70) >> 1) | ((v & 0x08)
<< 3).  The reference renders WordMetadata's 56-bit position mask with
printBits(positions, 56) next to each search result.
"""

from __future__ import annotations

_BRAILLE_BASE = 0x2800


def _bin2brail(v: int) -> int:
    return (v & 0x87) | ((v & 0x70) >> 1) | ((v & 0x08) << 3)


def print_bits(val: int, bits: int) -> str:
    """BrailleBlockPunchCards.printBits — one braille char per 8 bits,
    least-significant chunk first."""
    out = []
    b = 0
    while b < bits:
        out.append(chr(_BRAILLE_BASE + _bin2brail(val & 0xFF)))
        val >>= 8
        b += 8
    return "".join(out)
