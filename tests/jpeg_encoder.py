"""Test-only minimal baseline JPEG encoder (4:4:4 / grayscale, Annex K
standard tables) used to generate fixtures for the pure-numpy decoder in
marginalia_ray.ops.jpeg — no codec libraries exist in this container, so
round-trip testing requires our own encoder."""

from __future__ import annotations

import struct

import numpy as np

from marginalia_ray.ops.jpeg import _B, ZIGZAG

# ITU-T T.81 Annex K quantization tables (natural order via zigzag below)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K Huffman table specs: (bits[1..16], values)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])



def _codes(bits, values):
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, ln: int):
        self.acc = (self.acc << ln) | (code & ((1 << ln) - 1))
        self.n += ln
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.n -= 8

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int):
    """(size, code) for a signed coefficient (T.81 F.1.2.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    code = v if v > 0 else v + (1 << s) - 1
    return s, code


def _encode_plane(plane, qtab, dc_codes, ac_codes, wr, pred):
    h, w = plane.shape
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            blk = plane[by : by + 8, bx : bx + 8].astype(np.float64) - 128.0
            coef = _B @ blk @ _B.T
            q = np.round(coef.reshape(64) / qtab.reshape(8, 8).reshape(64)).astype(int)
            zz = q[ZIGZAG]
            s, code = _magnitude(int(zz[0]) - pred[0])
            pred[0] = int(zz[0])
            ln, c = dc_codes[s]
            wr.write(c, ln)
            if s:
                wr.write(code, s)
            run = 0
            last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
            for k in range(1, last_nz + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, c = ac_codes[0xF0]
                    wr.write(c, ln)
                    run -= 16
                s, code = _magnitude(v)
                ln, c = ac_codes[(run << 4) | s]
                wr.write(c, ln)
                wr.write(code, s)
                run = 0
            if last_nz < 63:
                ln, c = ac_codes[0x00]
                wr.write(c, ln)


def encode_jpeg(px: np.ndarray, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """px: HxWx3 uint8 RGB or HxW uint8 gray -> baseline JFIF bytes with
    the Annex K standard tables.  subsample=True emits 4:2:0 (2x2 luma
    blocks per MCU, box-averaged chroma); restart_interval > 0 writes DRI
    and RSTn markers every N MCUs."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    mcu = 16 if (subsample and not gray) else 8
    ph = (h + mcu - 1) & ~(mcu - 1)
    pw = (w + mcu - 1) & ~(mcu - 1)

    def pad(p):
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")

    if gray:
        planes = [pad(px.astype(np.float64))]
        samps = [(1, 1)]
    else:
        r, g, b = (px[:, :, 0].astype(np.float64), px[:, :, 1].astype(np.float64),
                   px[:, :, 2].astype(np.float64))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        y, cb, cr = pad(y), pad(cb), pad(cr)
        if subsample:
            cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload)

    seg(0xDB, bytes([0]) + bytes(QT_LUMA[ZIGZAG].astype(np.uint8)))
    if not gray:
        seg(0xDB, bytes([1]) + bytes(QT_CHROMA[ZIGZAG].astype(np.uint8)))

    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        hs, vs = samps[c]
        sof += bytes([c + 1, (hs << 4) | vs, 0 if c == 0 else 1])
    seg(0xC0, sof)

    for tc, th, (bits, values) in ((0, 0, DC_LUMA), (1, 0, AC_LUMA),
                                   (0, 1, DC_CHROMA), (1, 1, AC_CHROMA)):
        if gray and th == 1:
            continue
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(values))

    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))

    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    dc_l, ac_l = _codes(*DC_LUMA), _codes(*AC_LUMA)
    dc_c, ac_c = _codes(*DC_CHROMA), _codes(*AC_CHROMA)
    wr = _BitWriter()
    preds = [[0], [0], [0]]
    mcus_y, mcus_x = ph // mcu, pw // mcu
    mcu_no = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                wr.flush()
                out.extend(wr.buf)
                wr.buf = bytearray()
                wr.acc = 0
                wr.n = 0
                out.extend(bytes([0xFF, 0xD0 + (rst & 7)]))
                rst += 1
                preds = [[0], [0], [0]]
            for ci, plane in enumerate(planes):
                hs, vs = samps[ci]
                qtab = QT_LUMA if ci == 0 else QT_CHROMA
                dc, ac = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for byy in range(vs):
                    for bxx in range(hs):
                        by = (my * vs + byy) * 8
                        bx = (mx * hs + bxx) * 8
                        _encode_plane(plane[by : by + 8, bx : bx + 8],
                                      qtab, dc, ac, wr, preds[ci])
            mcu_no += 1
    wr.flush()
    out.extend(wr.buf)
    out.extend(b"\xff\xd9")
    return bytes(out)
