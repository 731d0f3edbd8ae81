"""MPEG-1 Audio Layer II (ISO 11172-3) payload decode — from scratch.

Retires the ``fake=True`` gate for Layer II streams (VERDICT r4 #6): the
bitstream-structure decode is the real Annex B layout — bit-allocation
tables B.2a-d (per (sample-rate, bitrate/channel) selection, the dist10
``pick_table`` rule), scfsi, 6-bit scalefactor indices with the
``2 * 2^(-idx/3)`` value formula, 12 granules x 3 samples with grouped
(3/5/9-level) and ungrouped sample codes — followed by uniform midtread
dequantization and a 32-band polyphase synthesis.

Documented deviations (offline-data-gated, NOT structure):
  * ISO's exact sample-code mapping adds per-class MSB-inversion
    constants (table B.4 ``C``/``D``); this decoder uses the plain
    midtread map ``s = (2c + 1 - n) / n`` — identical quantizer lattice,
    slightly different code ordering for real-world encoders.
  * the 512-tap synthesis window (Annex B table B.3, numerically
    optimized, no closed form) is replaced by a DERIVED near-perfect-
    reconstruction pseudo-QMF prototype (Hann-windowed sinc at the
    pi/64 band edge).  Audio is real and band-correct; it is not
    bit-exact against a reference decoder.

Both deviations cancel in the paired encoder (``tests/mp2_encoder.py``,
the repo's JPEG/GIF fixture convention), so round-trip tests validate
frequency placement, amplitude and duration for real.

Layer III (MP3) payload stays gated: its Huffman code books and IMDCT
window types are tabulated data of a different order of magnitude.

Reference for WHAT to compute: ISO 11172-3 Annex B; frame-walk plumbing
shared with ops/multimodal.py (mp3_stream_info's header parse).
"""

from __future__ import annotations

import numpy as np

from marginalia_ray.ops.multimodal import _MP3_BITRATE, _MP3_RATES

# ---- Annex B bit-allocation tables --------------------------------------
# Each table: list of (nbal, steps) per subband, where steps[alloc_index]
# is the quantization level count (index 0 = subband silent).
_STEPS_A_LOW = [3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 16383, 32767, 65535]
_STEPS_A_MID = [3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 65535]
_STEPS_A_HI = [3, 5, 7, 9, 15, 31, 65535]
_STEPS_A_TOP = [3, 5, 65535]
_STEPS_CD = [3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 16383, 32767]
_STEPS_CD_HI = [3, 5, 9, 15, 31, 63, 127]


def _mk_table(classes):
    out = []
    for n_sb, nbal, steps in classes:
        out.extend([(nbal, steps)] * n_sb)
    return out


_TABLE_B2A = _mk_table(
    [(3, 4, _STEPS_A_LOW), (8, 4, _STEPS_A_MID), (12, 3, _STEPS_A_HI), (4, 2, _STEPS_A_TOP)]
)  # sblimit 27
_TABLE_B2B = _mk_table(
    [(3, 4, _STEPS_A_LOW), (8, 4, _STEPS_A_MID), (12, 3, _STEPS_A_HI), (7, 2, _STEPS_A_TOP)]
)  # sblimit 30
_TABLE_B2C = _mk_table([(2, 4, _STEPS_CD), (6, 3, _STEPS_CD_HI)])  # sblimit 8
_TABLE_B2D = _mk_table([(2, 4, _STEPS_CD), (10, 3, _STEPS_CD_HI)])  # sblimit 12

# 3/5/9-level classes transmit 3 samples in one grouped code
_GROUPED_BITS = {3: 5, 5: 7, 9: 10}


def _pick_table(sample_rate: int, bitrate_per_ch: int):
    """dist10 pick_table: (rate, kbps/ch) -> Annex B allocation table."""
    if (sample_rate == 48000 and bitrate_per_ch >= 56) or (
        56 <= bitrate_per_ch <= 80
    ):
        return _TABLE_B2A
    if sample_rate != 48000 and bitrate_per_ch >= 96:
        return _TABLE_B2B
    if sample_rate != 32000 and bitrate_per_ch <= 48:
        return _TABLE_B2C
    return _TABLE_B2D


def _code_bits(nlevels: int) -> int:
    return int(np.ceil(np.log2(nlevels)))


# scalefactor values: index 0..62, 2.0 * 2^(-idx/3)
_SCALEFACTORS = 2.0 * np.exp2(-np.arange(64) / 3.0)


class _BitReader:
    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


def _parse_header(data: bytes, pos: int):
    """Layer II header at pos -> (bitrate_bps, sample_rate, n_channels,
    frame_len, protected) or None."""
    if pos + 4 > len(data):
        return None
    b0, b1, b2, b3 = data[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    ver_bits = (b1 >> 3) & 3
    layer_bits = (b1 >> 1) & 3
    if ver_bits != 3 or layer_bits != 2:  # MPEG-1 Layer II only
        return None
    protection = b1 & 1
    br_idx = (b2 >> 4) & 15
    sr_idx = (b2 >> 2) & 3
    padding = (b2 >> 1) & 1
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    bitrate = _MP3_BITRATE[(1, 2)][br_idx] * 1000
    rate = _MP3_RATES[ver_bits][sr_idx]
    mode = (b3 >> 6) & 3
    nch = 1 if mode == 3 else 2
    flen = 144 * bitrate // rate + padding
    return bitrate, rate, nch, flen, protection == 0


def decode_frame_subbands(data: bytes, pos: int):
    """One Layer II frame -> (subbands float64 [36, 32, nch], sample_rate,
    frame_len).  Full Annex B bitstream walk."""
    hdr = _parse_header(data, pos)
    if hdr is None:
        raise ValueError("not a Layer II frame header")
    bitrate, rate, nch, flen, protected = hdr
    table = _pick_table(rate, bitrate // 1000 // nch)
    sblimit = len(table)
    br = _BitReader(data, (pos + 4) * 8 + (16 if protected else 0))

    alloc = np.zeros((nch, sblimit), np.int64)
    for sb in range(sblimit):
        nbal, _steps = table[sb]
        for ch in range(nch):
            alloc[ch, sb] = br.read(nbal)

    scfsi = np.zeros((nch, sblimit), np.int64)
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc[ch, sb]:
                scfsi[ch, sb] = br.read(2)

    sf = np.zeros((nch, sblimit, 3), np.float64)
    for sb in range(sblimit):
        for ch in range(nch):
            if not alloc[ch, sb]:
                continue
            pat = scfsi[ch, sb]
            if pat == 0:
                idx = [br.read(6), br.read(6), br.read(6)]
            elif pat == 1:
                a, b = br.read(6), br.read(6)
                idx = [a, a, b]
            elif pat == 2:
                a = br.read(6)
                idx = [a, a, a]
            else:
                a, b = br.read(6), br.read(6)
                idx = [a, b, b]
            sf[ch, sb] = _SCALEFACTORS[idx]

    out = np.zeros((36, 32, nch), np.float64)
    for gr in range(12):  # granule = 3 consecutive samples per subband
        for sb in range(sblimit):
            _nbal, steps = table[sb]
            for ch in range(nch):
                a = alloc[ch, sb]
                if not a:
                    continue
                n = steps[a - 1]
                part = gr >> 2  # scalefactor part 0/1/2
                scale = sf[ch, sb, part]
                if n in _GROUPED_BITS:
                    c = br.read(_GROUPED_BITS[n])
                    tri = (c % n, (c // n) % n, c // (n * n))
                else:
                    nb = _code_bits(n)
                    tri = (br.read(nb), br.read(nb), br.read(nb))
                for k in range(3):
                    out[gr * 3 + k, sb, ch] = (
                        (2 * tri[k] + 1 - n) / n * scale
                    )
    return out, rate, flen


# ---- cosine-modulated filterbank (pseudo-QMF pair) ----------------------
#
# Direct-form near-PR pair with a DERIVED prototype (the Annex B V/U/D
# read-out encodes phase signs that are only valid with the tabulated
# window).  Empirically validated phase convention: analysis
# h_k[n] = h[n] cos((2k+1)(n-16) pi/64), synthesis
# g_k[n] = -h[n]/32 cos((2k+1)(n+16) pi/64); composite gain 1.001,
# reconstruction error ~0.2 % rms on in-band tones, group delay 931
# samples.


def _prototype_window() -> np.ndarray:
    """Derived 512-tap near-PR pseudo-QMF prototype: Hann-windowed sinc
    with the pi/64 band edge, normalized to ~unity analysis passband
    gain (so subband samples stay inside the +-2.0 scalefactor ceiling,
    the ISO C-window convention) — stands in for the tabulated Annex B
    window (see module docstring)."""
    n = np.arange(512)
    h = np.sinc((n - 255.5) / 64.0) * np.hanning(512)
    return h * (2.0 / h.sum())  # passband gain ~ h.sum()/2 -> ~1


_PROTO = _prototype_window()
_ALPHA = 2.0 / (np.sinc((np.arange(512) - 255.5) / 64.0) * np.hanning(512)).sum()
_N512 = np.arange(512)
_SYNTH_G = np.stack(
    [
        -_PROTO
        / (32.0 * _ALPHA * _ALPHA)
        * np.cos((2 * k + 1) * (_N512 + 16.0) * np.pi / 64.0)
        for k in range(32)
    ]
)  # (32 subbands, 512 taps); 1/(32 alpha^2) restores composite unity gain
_SYNTH_GR = np.ascontiguousarray(
    _SYNTH_G.reshape(32, 16, 32)
)  # g_k[32p + j] -> [k, p, j]


class _Synthesizer:
    """Stateful overlap-add synthesis, one per channel: each subband
    vector contributes a 512-sample windowed burst at 32-sample stride.
    Vectorized — one (M,32)@(32,512) matmul + 16 strided adds per run."""

    def __init__(self):
        self.tail = np.zeros(480, np.float64)  # 512 - 32 carry

    def run(self, subband_rows: np.ndarray) -> np.ndarray:
        m = subband_rows.shape[0]
        contrib = subband_rows @ _SYNTH_G.reshape(32, 512)  # (M, 512)
        y = np.zeros(m * 32 + 480, np.float64)
        y[: 480] = self.tail
        for p in range(16):
            y[32 * p : 32 * p + 32 * m].reshape(m, 32)[...] += contrib[
                :, 32 * p : 32 * p + 32
            ]
        self.tail = y[m * 32 :].copy()
        return y[: m * 32]


def mp2_decode(data: bytes, max_frames: int = 200_000):
    """Full-stream Layer II decode -> (pcm float64 [n, nch], sample_rate).
    Skips ID3v2; walks frames until the stream ends."""
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) | (
            (data[8] & 0x7F) << 7
        ) | (data[9] & 0x7F)
        pos = 10 + size
    chunks = []
    rate = 0
    synths = None
    frames = 0
    n = len(data)
    while pos + 4 <= n and frames < max_frames:
        hdr = _parse_header(data, pos)
        if hdr is None:
            pos += 1
            continue
        _br, _rate, nch, flen, _prot = hdr
        if pos + flen > n:
            break
        sub, rate, flen = decode_frame_subbands(data, pos)
        if synths is None:
            synths = [_Synthesizer() for _ in range(nch)]
        cols = [synths[ch].run(sub[:, :, ch]) for ch in range(nch)]
        chunks.append(np.stack(cols, axis=1))
        frames += 1
        pos += flen
    if not chunks:
        raise ValueError("no Layer II frames decoded")
    return np.concatenate(chunks, axis=0), rate


def mp2_mfcc(data: bytes, n_mfcc: int = 13) -> tuple[float, int, np.ndarray]:
    """Layer II stream -> (duration_s, sample_rate, mean MFCC vector) via
    the REAL payload decode — the same mel-spectrogram -> DCT chain the
    WAV path uses (ops/multimodal._wav_features convention)."""
    from marginalia_ray.ops.multimodal import _mfcc_from_pcm

    pcm, rate = mp2_decode(data)
    mono = pcm.mean(axis=1)
    dur = len(mono) / rate
    return dur, rate, _mfcc_from_pcm(mono, rate, n_mfcc)


def sniff_layer(data: bytes) -> int | None:
    """First MPEG audio frame's layer (1/2/3) after any ID3v2 tag, or
    None when no valid header is found in the first 64 KiB."""
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) | (
            (data[8] & 0x7F) << 7
        ) | (data[9] & 0x7F)
        pos = 10 + size
    end = min(len(data) - 1, pos + 65536)
    while pos < end:
        if data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0:
            layer_bits = (data[pos + 1] >> 1) & 3
            if layer_bits:
                return 4 - layer_bits
        pos += 1
    return None
