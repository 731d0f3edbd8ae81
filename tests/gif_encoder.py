"""Minimal GIF89a encoder for tests: palette image -> GIF bytes with a
real variable-width LZW stream (spec appendix F), optional interlace.
Test-only counterpart of ops/multimodal._decode_gif."""

import struct

import numpy as np


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int):
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


def _lzw_encode(indices, min_code: int) -> bytes:
    clear = 1 << min_code
    eoi = clear + 1
    bw = _BitWriter()
    width = min_code + 1
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    bw.write(clear, width)
    seq = ()
    for px in indices:
        cand = seq + (int(px),)
        if cand in table:
            seq = cand
            continue
        bw.write(table[seq], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            bw.write(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        seq = (int(px),)
    if seq:
        bw.write(table[seq], width)
    bw.write(eoi, width)
    return bw.flush()


def encode_gif(px_indices: np.ndarray, palette: np.ndarray,
               interlace: bool = False, local_table: bool = False) -> bytes:
    """px_indices: (h, w) uint8 palette indices; palette: (n, 3) uint8."""
    h, w = px_indices.shape
    n = len(palette)
    bits = max(1, int(np.ceil(np.log2(max(n, 2)))))
    table_n = 1 << bits
    pal = np.zeros((table_n, 3), np.uint8)
    pal[:n] = palette
    min_code = max(2, bits)

    rows = px_indices
    if interlace:
        order = np.concatenate(
            [np.arange(0, h, 8), np.arange(4, h, 8),
             np.arange(2, h, 4), np.arange(1, h, 2)]
        )
        rows = px_indices[order]

    out = bytearray(b"GIF89a")
    gct_flag = 0 if local_table else 0x80
    out += struct.pack("<HHBBB", w, h, gct_flag | (bits - 1), 0, 0)
    if not local_table:
        out += pal.tobytes()
    # a no-op graphic control extension, to exercise the skip path
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    ipacked = (0x40 if interlace else 0) | (0x80 | (bits - 1) if local_table else 0)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    if local_table:
        out += pal.tobytes()
    out.append(min_code)
    stream = _lzw_encode(rows.ravel(), min_code)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
