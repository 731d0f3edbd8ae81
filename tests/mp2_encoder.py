"""Minimal MPEG-1 Layer II encoder — test fixture only (the repo's
jpeg_encoder/gif_encoder convention): produces structurally valid Annex B
frames (header, bit allocation, scfsi, scalefactors, grouped/ungrouped
sample codes) that ops/mp2.py decodes, so round-trip tests validate the
decoder's bitstream walk, dequantization and synthesis for real.

Analysis filterbank is the standard ISO polyphase (512-sample window,
C[n] = prototype, Y-fold, cosine matrix) with the SAME derived prototype
the decoder's synthesis uses — see ops/mp2.py's documented deviation.
Mono only; fixed whole-frame scalefactors (scfsi=2)."""

import numpy as np

from marginalia_ray.ops.mp2 import (
    _GROUPED_BITS,
    _SCALEFACTORS,
    _code_bits,
    _pick_table,
    _prototype_window,
)

_N512 = np.arange(512)

_BITRATE_IDX = {32: 1, 48: 2, 56: 3, 64: 4, 80: 5, 96: 6, 112: 7, 128: 8,
                160: 9, 192: 10, 224: 11, 256: 12, 320: 13, 384: 14}
_RATE_IDX = {44100: 0, 48000: 1, 32000: 2}


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def tobytes(self, pad_to: int) -> bytes:
        bits = self.bits + [0] * (pad_to * 8 - len(self.bits))
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        return bytes(out)


def analyze(x: np.ndarray) -> np.ndarray:
    """mono PCM -> subband samples [n//32, 32]: direct cosine-modulated
    analysis h_k[n] = h[n] cos((2k+1)(n-16) pi/64), s_k[m] = (x*h_k)[32m]
    — the phase convention ops/mp2.py's synthesis pair inverts."""
    h = _prototype_window()
    Hk = np.stack(
        [h * np.cos((2 * k + 1) * (_N512 - 16.0) * np.pi / 64.0) for k in range(32)]
    )  # (32, 512)
    Hk_rev = Hk[:, ::-1]  # convolution: dot with reversed taps
    padded = np.concatenate([np.zeros(511), np.asarray(x, np.float64)])
    from numpy.lib.stride_tricks import sliding_window_view

    frames = sliding_window_view(padded, 512)[::32]  # frame m = x[32m-511..32m]
    return frames @ Hk_rev.T  # (n//32 + ..., 32)


def encode_mp2(
    x: np.ndarray,
    sample_rate: int = 44100,
    kbps: int = 128,
    n_active_sb: int = 8,
    nlevels: int = 15,
) -> bytes:
    """float PCM in [-1, 1] -> Layer II stream.  1-D input encodes mono;
    (n, 2) input encodes stereo (mode 0, both channels independently).
    Allocates ``nlevels`` steps uniformly across the first
    ``n_active_sb`` subbands, silence elsewhere."""
    x = np.asarray(x, np.float64)
    chans = [x] if x.ndim == 1 else [x[:, c] for c in range(x.shape[1])]
    nch = len(chans)
    table = _pick_table(sample_rate, kbps // nch)
    sblimit = len(table)
    subs = [analyze(c) for c in chans]  # per-channel [M, 32]
    n_frames = min(len(s) for s in subs) // 36
    frames = []
    flen = 144 * kbps * 1000 // sample_rate
    for f in range(n_frames):
        s = [sub[f * 36 : (f + 1) * 36] for sub in subs]  # nch x [36, 32]
        w = _BitWriter()
        # header: sync, MPEG1, Layer II, no CRC, bitrate, rate, no pad,
        # private 0, mode (mono/stereo), mode_ext 0, no copyright/
        # original, no emphasis
        w.write(0x7FF, 11)
        w.write(3, 2)  # version MPEG1
        w.write(2, 2)  # layer II
        w.write(1, 1)  # protection: none
        w.write(_BITRATE_IDX[kbps], 4)
        w.write(_RATE_IDX[sample_rate], 2)
        w.write(0, 2)  # padding, private
        w.write(3 if nch == 1 else 0, 2)  # mono / stereo
        w.write(0, 4)  # mode_ext, copyright, original
        w.write(0, 2)  # emphasis
        # bit allocation: sb-outer, ch-inner (the decoder's read order)
        allocs = []
        for sb in range(sblimit):
            nbal, steps = table[sb]
            if sb < n_active_sb and nlevels in steps:
                a = steps.index(nlevels) + 1
            else:
                a = 0
            allocs.append(a)
            for _ch in range(nch):
                w.write(a, nbal)
        # scfsi: one scalefactor for the whole frame (pattern 2)
        for sb in range(sblimit):
            for _ch in range(nch):
                if allocs[sb]:
                    w.write(2, 2)
        # scalefactors: smallest sf >= max|sample| per (subband, channel)
        sf_idx = [[0] * nch for _ in range(sblimit)]
        for sb in range(sblimit):
            for ch in range(nch):
                if not allocs[sb]:
                    continue
                peak = np.abs(s[ch][:, sb]).max()
                candidates = np.flatnonzero(_SCALEFACTORS >= max(peak, 1e-9))
                idx = int(candidates[-1]) if len(candidates) else 0
                sf_idx[sb][ch] = idx
                w.write(idx, 6)
        # samples: 12 granules x 3, gr -> sb -> ch (decoder order)
        for gr in range(12):
            for sb in range(sblimit):
                a = allocs[sb]
                if not a:
                    continue
                _nbal, steps = table[sb]
                n = steps[a - 1]
                for ch in range(nch):
                    scale = _SCALEFACTORS[sf_idx[sb][ch]]
                    tri = []
                    for k in range(3):
                        v = s[ch][gr * 3 + k, sb] / scale  # in [-1, 1]
                        c = int(np.floor((v + 1.0) * n / 2.0))
                        tri.append(min(max(c, 0), n - 1))
                    if n in _GROUPED_BITS:
                        code = tri[0] + n * tri[1] + n * n * tri[2]
                        w.write(code, _GROUPED_BITS[n])
                    else:
                        nb = _code_bits(n)
                        for c in tri:
                            w.write(c, nb)
        assert len(w.bits) <= flen * 8, "frame overflow"
        frames.append(w.tobytes(flen))
    return b"".join(frames)
