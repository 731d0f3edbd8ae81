"""Layer II decode (ops/mp2.py): round-trip validation against the paired
minimal encoder (tests/mp2_encoder.py) — frequency placement, amplitude,
SNR, grouped-code classes, table selection — plus AudioFeatureStage
integration with the Layer II gate removed (fake=False)."""

import numpy as np
import pyarrow as pa
import pytest


def _sine(freq, sr=44100, secs=1.0, amp=0.5):
    t = np.arange(int(sr * secs)) / sr
    return amp * np.sin(2 * np.pi * freq * t)


def _roundtrip(x, sr=44100, kbps=128, **kw):
    import sys

    sys.path.insert(0, "tests")
    from mp2_encoder import encode_mp2

    from marginalia_ray.ops.mp2 import mp2_decode

    data = encode_mp2(x, sr, kbps, **kw)
    pcm, rate = mp2_decode(data)
    assert rate == sr
    return data, pcm[:, 0]


def _dominant(y, sr):
    yc = y[4096:-4096] if len(y) > 12288 else y
    spec = np.abs(np.fft.rfft(yc * np.hanning(len(yc))))
    return np.fft.rfftfreq(len(yc), 1 / sr)[np.argmax(spec)]


def _snr_db(y, x):
    best = (0.0, 0)
    for d in range(2000):
        c = abs(float(np.dot(y[d : d + 8192], x[:8192])))
        if c > best[0]:
            best = (c, d)
    d = best[1]
    n = min(len(y) - d, len(x), 20000)
    seg, ref = y[d : d + n], x[:n]
    g = float(np.dot(seg, ref) / np.dot(ref, ref))
    return 10 * np.log10(np.mean(ref**2) / np.mean((seg / g - ref) ** 2))


class TestRoundTrip:
    def test_1khz_sine(self):
        x = _sine(1000.0)
        _, y = _roundtrip(x)
        assert abs(_dominant(y, 44100) - 1000.0) < 5.0
        assert abs(np.sqrt(2) * y[4096:-4096].std() / 0.5 - 1.0) < 0.1
        assert _snr_db(y, x) > 20.0  # 15-level quantization ~ 23 dB

    def test_higher_band_tone(self):
        # 3.1 kHz lands in subband 4 — crosses the first alloc class
        x = _sine(3100.0)
        _, y = _roundtrip(x)
        assert abs(_dominant(y, 44100) - 3100.0) < 10.0

    def test_grouped_code_classes(self):
        # 3/5/9-level classes use grouped triplet codes — decode must
        # invert the base-n decomposition.  5/9 exist only in the
        # B.2a/B.2b middle class (subbands 3-10), so use a tone in
        # subband 3 (~2.4 kHz); 3 levels exist everywhere.
        for nlevels, freq in ((3, 700.0), (5, 2400.0), (9, 2400.0)):
            _, y = _roundtrip(_sine(freq), nlevels=nlevels, n_active_sb=8)
            assert abs(_dominant(y, 44100) - freq) < 10.0, nlevels

    def test_48k_table_a(self):
        # 48 kHz / 64 kbps mono -> table B.2a (sblimit 27)
        x = _sine(1000.0, sr=48000)
        _, y = _roundtrip(x, sr=48000, kbps=64)
        assert abs(_dominant(y, 48000) - 1000.0) < 5.0

    def test_duration(self):
        x = _sine(500.0, secs=2.0)
        data, y = _roundtrip(x)
        # whole frames only: 1152 samples each
        assert abs(len(y) - 2.0 * 44100) <= 1152

    def test_garbage_raises(self):
        from marginalia_ray.ops.mp2 import mp2_decode

        with pytest.raises(ValueError):
            mp2_decode(b"\x00" * 4096)


class TestSniffer:
    def test_layer2_vs_layer3(self):
        import sys

        sys.path.insert(0, "tests")
        from mp2_encoder import encode_mp2

        from marginalia_ray.ops.mp2 import sniff_layer

        mp2 = encode_mp2(_sine(440.0, secs=0.2), 44100, 128)
        assert sniff_layer(mp2) == 2
        mp3 = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 413
        assert sniff_layer(mp3) == 3
        assert sniff_layer(b"\x00" * 100) is None


class TestAudioFeatureStage:
    def test_layer2_real_mfcc_no_gate(self):
        """fake=False must NOT raise for Layer II; the MFCCs must match
        the WAV path's MFCCs of the same tone (same mel chain over the
        decoded audio) within a loose cepstral distance."""
        import io
        import sys
        import wave

        sys.path.insert(0, "tests")
        from mp2_encoder import encode_mp2

        from marginalia_ray.ops.multimodal import AudioFeatureStage

        x = _sine(1000.0, secs=1.0)
        mp2 = encode_mp2(x, 44100, 128)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(44100)
            wf.writeframes((x * 32767).astype(np.int16).tobytes())
        wav = buf.getvalue()

        t = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "audio": pa.array([mp2, wav], pa.binary()),
            }
        )
        out = AudioFeatureStage(fake=False)(t)
        assert out["sample_rate"].to_pylist() == [44100, 44100]
        durs = out["duration_s"].to_pylist()
        assert abs(durs[0] - 1.0) < 0.05 and abs(durs[1] - 1.0) < 1e-6
        m_mp2, m_wav = (np.array(v) for v in out["mfcc_mean"].to_pylist())
        # same tone -> same spectral shape; absolute scale differs by the
        # int16 vs float PCM level, which shifts ONLY c0 in a log-mel
        # cepstrum, so compare c1.. on direction
        a, b = m_mp2[1:], m_wav[1:]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
        assert cos > 0.9, (m_mp2, m_wav)  # MP2 quantization noise floor lifts
        # the out-of-band mel bins vs the clean WAV — 0.93 measured


class TestStereo:
    def test_stereo_roundtrip_distinct_channels(self):
        """Stereo decode path: left carries 800 Hz, right 2400 Hz — each
        decoded channel must be dominated by ITS tone."""
        import sys

        sys.path.insert(0, "tests")
        from mp2_encoder import encode_mp2

        from marginalia_ray.ops.mp2 import mp2_decode

        sr = 44100
        t = np.arange(sr) / sr
        left = 0.5 * np.sin(2 * np.pi * 800 * t)
        right = 0.5 * np.sin(2 * np.pi * 2400 * t)
        data = encode_mp2(np.stack([left, right], axis=1), sr, 256)
        pcm, rate = mp2_decode(data)
        assert rate == sr and pcm.shape[1] == 2
        assert abs(_dominant(pcm[:, 0], sr) - 800.0) < 10.0
        assert abs(_dominant(pcm[:, 1], sr) - 2400.0) < 10.0


class TestMultiTone:
    @pytest.mark.parametrize("seed", [1, 7, 23])
    def test_random_tone_mix_roundtrip(self, seed):
        """Deterministic random 3-tone mixes across the allocated band:
        every component tone must survive the encode/decode round trip as
        a spectral peak within 2 bins, and total in-band energy must be
        within 25 % of the source (15-level quantization + near-PR
        filterbank)."""
        rng = np.random.RandomState(seed)
        sr = 44100
        # tones inside the 8 active subbands (< 8 * 689 Hz), well separated
        freqs = np.sort(rng.choice(np.arange(300, 5200, 150), 3, replace=False))
        amps = rng.uniform(0.1, 0.3, 3)
        t = np.arange(sr) / sr
        x = sum(a * np.sin(2 * np.pi * f * t) for f, a in zip(freqs, amps))

        import sys

        sys.path.insert(0, "tests")
        from mp2_encoder import encode_mp2

        from marginalia_ray.ops.mp2 import mp2_decode

        pcm, rate = mp2_decode(encode_mp2(x, sr, 128))
        y = pcm[4096:-4096, 0]
        n = len(y)
        spec = np.abs(np.fft.rfft(y * np.hanning(n)))
        grid = np.fft.rfftfreq(n, 1 / rate)
        for f, a in zip(freqs, amps):
            k = int(round(f * n / rate))
            window = spec[max(k - 2, 0) : k + 3]
            # the tone must be a local spectral peak far above the floor
            assert window.max() > 10 * np.median(spec), (seed, f)
            peak_f = grid[max(k - 2, 0) + int(np.argmax(window))]
            assert abs(peak_f - f) * n / rate <= 2, (seed, f, peak_f)
        e_src = float(np.mean(x**2))
        e_dec = float(np.mean(y**2))
        assert abs(e_dec / e_src - 1.0) < 0.25, (seed, e_src, e_dec)
