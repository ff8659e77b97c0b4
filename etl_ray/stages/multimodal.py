"""Multimodal (image/audio/video) columns: opaque binary + typed metadata.

The decode kernels themselves are STUBBED (no PIL/ffmpeg in this
environment — they raise or produce deterministic fakes, clearly marked),
but the Ray-side plumbing is real and tested: schemas, actor-pool stage
signatures, batch sizing for wide binary rows, and output layout.

Pattern (SURVEY.md guidance): payloads stay ``binary``; stages are actor
pools created via ``map_batches(Cls, concurrency=N, batch_size=small)``
because each row is wide (keep batch x concurrency within worker heap;
same reasoning as the `html` column, SURVEY.md §4 memory row).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class ImageDecoder:
    """Actor-pool stage: decode image bytes -> (height, width, channels).

    REAL decode requires an image library not present in this container;
    ``fake=True`` (default here) derives deterministic pseudo-decodes from
    a payload digest so the pipeline plumbing is testable end-to-end.
    With ``fake=False`` it raises NotImplementedError at init, where an
    actor failure is surfaced immediately.
    """

    def __init__(self, payload_col: str = "payload", fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "real image decode needs PIL/opencv (not installed); "
                "run with fake=True for plumbing tests"
            )
        self.payload_col = payload_col

    def _fake_decode(self, payload: bytes | None) -> tuple[int, int, int]:
        if not payload:
            return (0, 0, 0)
        d = hashlib.md5(payload).digest()
        return (64 + d[0], 64 + d[1], 3)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        dims = [self._fake_decode(p) for p in payloads]
        h = pa.array([d[0] for d in dims], pa.int32())
        w = pa.array([d[1] for d in dims], pa.int32())
        c = pa.array([d[2] for d in dims], pa.int32())
        return (
            batch.append_column("dec_height", h)
            .append_column("dec_width", w)
            .append_column("dec_channels", c)
        )


class FeatureExtractor:
    """Actor-pool stage: payload bytes -> fixed-size feature vector.

    Deterministic fake 'model': byte-histogram features, normalized.
    A real model swap changes ONLY ``_embed`` — the Ray plumbing
    (constructor-loaded state, batch signature, list<float> output) is
    what this class pins down.
    """

    def __init__(self, payload_col: str = "payload", dim: int = 32):
        self.payload_col = payload_col
        self.dim = dim
        # "model load" happens here, once per actor
        self.bins = np.linspace(0, 256, dim + 1)

    def _embed(self, payload: bytes | None) -> np.ndarray:
        if not payload:
            return np.zeros(self.dim, np.float32)
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist, _ = np.histogram(arr, bins=self.bins)
        v = hist.astype(np.float32)
        n = np.linalg.norm(v)
        return v / n if n else v

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        feats = (
            np.stack([self._embed(p) for p in payloads])
            if payloads
            else np.zeros((0, self.dim), np.float32)
        )
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), pa.float32()), self.dim
        )
        return batch.append_column("features", col)


class FrameSampler:
    """Actor-pool stage: 'video' payload -> n deterministic frame offsets.

    Real frame extraction is stubbed (no ffmpeg); emits the byte ranges a
    real sampler would cut, as list<struct<offset,length>>.
    """

    def __init__(self, payload_col: str = "payload", n_frames: int = 4):
        self.payload_col = payload_col
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        out = []
        for p in payloads:
            size = len(p) if p else 0
            if size == 0:
                out.append([])
                continue
            step = max(1, size // self.n_frames)
            out.append(
                [
                    {"offset": i * step, "length": min(step, size - i * step)}
                    for i in range(min(self.n_frames, size))
                ]
            )
        typ = pa.list_(pa.struct([("offset", pa.int64()), ("length", pa.int64())]))
        return batch.append_column("frames", pa.array(out, typ))


def make_fake_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media rows for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    payloads = [rng.integers(0, 256, size=int(rng.integers(128, 2048))).astype(np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array([kinds[i % 3] for i in range(n)], pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["application/octet-stream"] * n, pa.string()),
            "width": pa.array([0] * n, pa.int32()),
            "height": pa.array([0] * n, pa.int32()),
            "duration_ms": pa.array([0] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )
