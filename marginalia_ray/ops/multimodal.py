"""Multimodal column operators: image / audio / video payloads as opaque
`binary` columns with typed metadata.

The container has no image/audio codecs, so the decode kernels are gated:
with ``fake=True`` (default) they produce deterministic pseudo-decodes
(seeded by content hash) so the Ray-side plumbing — schema, actor-pool
signature, batch sizing, output layout — is real and tested end-to-end;
with ``fake=False`` they raise NotImplementedError where a PIL / ffmpeg
call would go (clearly marked below).

Scale design: payload columns are fat, so these stages run with SMALL
batch sizes (default 16) and actor pools; the binary column is dropped
from the output so downstream stages stream slim feature rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray


def _content_rng(payload: bytes) -> np.random.RandomState:
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=4).digest(), "little")
    return np.random.RandomState(seed)


class ImageDecodeStage:
    """binary image column -> (id, width, height, channels, embedding).

    Real path would be ``PIL.Image.open(io.BytesIO(payload))`` +
    a vision-encoder forward pass — both stubbed here.
    """

    def __init__(self, embed_dim: int = 32, fake: bool = True,
                 payload_col: str = "image", id_col: str = "doc_id"):
        self.embed_dim, self.fake = embed_dim, fake
        self.payload_col, self.id_col = payload_col, id_col
        # model-load placeholder: happens ONCE per actor (A-pool pattern)
        self.model = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        w, h, c, emb = [], [], [], []
        for p in payloads:
            if not self.fake:
                # real decode goes here (PIL + torchvision not in container)
                raise NotImplementedError("image decode requires PIL; run with fake=True")
            rng = _content_rng(p)
            w.append(int(rng.randint(64, 4096)))
            h.append(int(rng.randint(64, 4096)))
            c.append(3)
            v = rng.standard_normal(self.embed_dim)
            emb.append((v / np.linalg.norm(v)).astype(np.float32))
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "width": pa.array(w, pa.int32()),
                "height": pa.array(h, pa.int32()),
                "channels": pa.array(c, pa.int32()),
                "embedding": pa.array([e.tolist() for e in emb], pa.list_(pa.float32())),
            }
        )


class AudioFeatureStage:
    """binary audio column -> (id, duration_s, sample_rate, mfcc_mean).
    Real path: soundfile/librosa decode + MFCC — stubbed."""

    def __init__(self, n_mfcc: int = 13, fake: bool = True,
                 payload_col: str = "audio", id_col: str = "doc_id"):
        self.n_mfcc, self.fake = n_mfcc, fake
        self.payload_col, self.id_col = payload_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        dur, sr, mfcc = [], [], []
        for p in payloads:
            if not self.fake:
                raise NotImplementedError("audio decode requires soundfile; run with fake=True")
            rng = _content_rng(p)
            dur.append(float(rng.uniform(0.5, 600.0)))
            sr.append(int(rng.choice([16000, 22050, 44100])))
            mfcc.append(rng.standard_normal(self.n_mfcc).astype(np.float32))
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "duration_s": pa.array(dur, pa.float64()),
                "sample_rate": pa.array(sr, pa.int32()),
                "mfcc_mean": pa.array([m.tolist() for m in mfcc], pa.list_(pa.float32())),
            }
        )


class VideoFrameSampleStage:
    """binary video column -> one row per sampled frame:
    (id, frame_no, ts_s, frame_embedding).  Real path: ffmpeg -> frames."""

    def __init__(self, fps_sample: float = 0.2, max_frames: int = 8,
                 embed_dim: int = 32, fake: bool = True,
                 payload_col: str = "video", id_col: str = "doc_id"):
        self.fps_sample, self.max_frames = fps_sample, max_frames
        self.embed_dim, self.fake = embed_dim, fake
        self.payload_col, self.id_col = payload_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        out_id, out_fno, out_ts, out_emb = [], [], [], []
        for i, p in zip(ids, payloads):
            if not self.fake:
                raise NotImplementedError("video decode requires ffmpeg; run with fake=True")
            rng = _content_rng(p)
            duration = float(rng.uniform(1.0, 120.0))
            n = min(self.max_frames, max(1, int(duration * self.fps_sample)))
            for f in range(n):
                out_id.append(i)
                out_fno.append(f)
                out_ts.append(round(f / max(self.fps_sample, 1e-9), 3))
                v = rng.standard_normal(self.embed_dim)
                out_emb.append((v / np.linalg.norm(v)).astype(np.float32).tolist())
        return pa.table(
            {
                self.id_col: pa.array(out_id),
                "frame_no": pa.array(out_fno, pa.int32()),
                "ts_s": pa.array(out_ts, pa.float64()),
                "frame_embedding": pa.array(out_emb, pa.list_(pa.float32())),
            }
        )


def decode_images(ds, concurrency: int | None = None, batch_size: int = 16, **stage_kwargs):
    """Actor-pool image decode over a binary column (small batches: fat rows)."""
    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 8)) - 1)
    return ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs=stage_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def audio_features(ds, concurrency: int | None = None, batch_size: int = 16, **stage_kwargs):
    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 8)) - 1)
    return ds.map_batches(
        AudioFeatureStage,
        fn_constructor_kwargs=stage_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_video_frames(ds, concurrency: int | None = None, batch_size: int = 8, **stage_kwargs):
    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 8)) - 1)
    return ds.map_batches(
        VideoFrameSampleStage,
        fn_constructor_kwargs=stage_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
