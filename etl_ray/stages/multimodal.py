"""Multimodal (image/audio/video) columns: opaque binary + typed metadata.

Decode kernels (round-4): PNG and WAV decode are REAL — pure-stdlib
implementations in `stages/codecs.py` (zlib + full five-filter PNG
reconstruction; stdlib ``wave`` PCM) — so image dims, pixels, audio
samples and their checksums are bit-exact recoveries from the encoded
payload, provable against fixture-carried pre-encode truth.  Only
formats that genuinely need a native library (JPEG, MP4) keep the
clearly-marked deterministic fake path.

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
    """Actor-pool stage: decode image bytes -> dims + pixel checksum.

    PNG payloads are decoded FOR REAL (`stages/codecs.decode_png`: zlib
    inflate + full five-filter scanline reconstruction, pure stdlib);
    ``dec_crc32`` is the crc32 of the reconstructed pixel bytes, so a
    fixture carrying the pre-encode checksum proves the roundtrip
    bit-exactly.  Non-PNG payloads: ``fake=True`` (default) derives a
    deterministic pseudo-decode from a payload digest (JPEG/MP4 need a
    native library this container lacks — clearly marked); with
    ``fake=False`` they raise, surfacing the unsupported format at the
    actor instead of fabricating dims.
    """

    def __init__(self, payload_col: str = "payload", fake: bool = True):
        from .codecs import _PNG_SIG, decode_png  # real kernel, once per actor

        self.payload_col = payload_col
        self.fake = fake
        self._sig = _PNG_SIG
        self._decode_png = decode_png

    def _decode(self, payload: bytes | None) -> tuple[int, int, int, int]:
        import zlib

        if not payload:
            return (0, 0, 0, 0)
        if payload[:8] == self._sig:
            arr = self._decode_png(payload)  # REAL decode
            h, w, c = arr.shape
            return (h, w, c, zlib.crc32(arr.tobytes()) & 0xFFFFFFFF)
        if not self.fake:
            raise ValueError(
                "unsupported image format (only PNG decodes without a "
                "native library); run with fake=True to pseudo-decode"
            )
        d = hashlib.md5(payload).digest()
        return (64 + d[0], 64 + d[1], 3, 0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        dims = [self._decode(p) for p in payloads]
        h = pa.array([d[0] for d in dims], pa.int32())
        w = pa.array([d[1] for d in dims], pa.int32())
        c = pa.array([d[2] for d in dims], pa.int32())
        crc = pa.array([d[3] for d in dims], pa.int64())
        return (
            batch.append_column("dec_height", h)
            .append_column("dec_width", w)
            .append_column("dec_channels", c)
            .append_column("dec_crc32", crc)
        )


class ImageResizer:
    """Actor-pool stage: REAL decode -> nearest-neighbor resize ->
    re-encode (PNG in, PNG out), the thumbnail/normalization pass.
    Emits ``thumb`` (encoded bytes) + ``thumb_crc32`` (crc of the
    resized pixel bytes, fixture-checkable)."""

    def __init__(
        self, out_h: int, out_w: int, payload_col: str = "payload"
    ):
        from .codecs import decode_png, encode_png, resize_nearest

        self.payload_col = payload_col
        self.out_h, self.out_w = out_h, out_w
        self._dec, self._enc, self._resize = decode_png, encode_png, resize_nearest

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        thumbs, crcs = [], []
        for p in batch.column(self.payload_col).to_pylist():
            small = self._resize(self._dec(p), self.out_h, self.out_w)
            thumbs.append(self._enc(small))
            crcs.append(zlib.crc32(small.tobytes()) & 0xFFFFFFFF)
        return batch.append_column(
            "thumb", pa.array(thumbs, pa.binary())
        ).append_column("thumb_crc32", pa.array(crcs, pa.int64()))


class AudioFeatures:
    """Actor-pool stage: REAL WAV decode -> exact integer features.

    Emits ``dec_rate`` / ``dec_samples`` / ``dec_channels`` / ``dec_peak``
    (first channel) / ``dec_zc`` (zero crossings) / ``dec_crc32`` (crc of
    the PCM bytes) — all integers, so the fixture-carried pre-encode
    values check the decode bit-exactly.  ``dec_``-prefixed like
    ImageDecoder: decoded facts never collide with carried metadata."""

    def __init__(self, payload_col: str = "payload"):
        from .codecs import decode_wav

        self.payload_col = payload_col
        self._decode = decode_wav

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        cols = {k: [] for k in ("dec_rate", "dec_samples", "dec_channels",
                                "dec_peak", "dec_zc", "dec_crc32")}
        for p in batch.column(self.payload_col).to_pylist():
            s, rate = self._decode(p)
            mono = s[:, 0].astype(np.int32)
            cols["dec_rate"].append(rate)
            cols["dec_samples"].append(s.shape[0])
            cols["dec_channels"].append(s.shape[1])
            cols["dec_peak"].append(int(np.abs(mono).max()) if len(mono) else 0)
            cols["dec_zc"].append(
                int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
            )
            cols["dec_crc32"].append(zlib.crc32(s.tobytes()) & 0xFFFFFFFF)
        out = batch
        for k, v in cols.items():
            out = out.append_column(k, pa.array(v, pa.int64()))
        return out


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


def make_real_media_table(
    n_images: int = 48, n_audio: int = 16, seed: int = 7
) -> pa.Table:
    """Deterministic REAL media rows: PNG payloads (varied sizes,
    channel counts and scanline filters, so decode exercises the full
    reconstruction logic) and PCM-16 WAV payloads.  Each row CARRIES its
    pre-encode truth (dims / sample counts / crc32 of the raw pixel or
    PCM bytes), computed BEFORE encoding — the oracle side of the
    encode→decode roundtrip proof."""
    import zlib

    from .codecs import encode_png, encode_wav

    rng = np.random.default_rng(seed)
    rows = {
        k: []
        for k in (
            "media_id", "kind", "payload", "mime", "width", "height",
            "channels", "crc32_pre", "sample_rate", "n_samples", "peak",
        )
    }

    def add(mid, kind, payload, mime, w=0, h=0, c=0, crc=0, sr=0, ns=0, peak=0):
        rows["media_id"].append(mid)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(mime)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["channels"].append(c)
        rows["crc32_pre"].append(crc)
        rows["sample_rate"].append(sr)
        rows["n_samples"].append(ns)
        rows["peak"].append(peak)

    for i in range(n_images):
        h = int(rng.integers(8, 48))
        w = int(rng.integers(8, 48))
        c = [1, 3, 4][i % 3]
        filt = i % 5  # cycle all five PNG filters
        arr = rng.integers(0, 256, size=(h, w, c)).astype(np.uint8)
        add(
            i, "image", encode_png(arr, filter_type=filt), "image/png",
            w=w, h=h, c=c, crc=zlib.crc32(arr.tobytes()) & 0xFFFFFFFF,
        )
    for j in range(n_audio):
        sr = [8000, 16000, 44100][j % 3]
        ch = 1 + (j % 2)
        n = int(rng.integers(200, 2000))
        t = np.arange(n, dtype=np.float64)
        wave_f = 3000 * np.sin(2 * np.pi * t * (50 + 10 * j) / sr)
        noise = rng.integers(-500, 500, size=(n, ch))
        samples = (wave_f[:, None] + noise).astype(np.int16)
        add(
            n_images + j, "audio", encode_wav(samples, sr), "audio/wav",
            c=ch, crc=zlib.crc32(samples.tobytes()) & 0xFFFFFFFF,
            sr=sr, ns=n, peak=int(np.abs(samples[:, 0].astype(np.int32)).max()),
        )
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "kind": pa.array(rows["kind"], pa.string()),
            "payload": pa.array(rows["payload"], pa.binary()),
            "mime": pa.array(rows["mime"], pa.string()),
            "width": pa.array(rows["width"], pa.int64()),
            "height": pa.array(rows["height"], pa.int64()),
            "channels": pa.array(rows["channels"], pa.int64()),
            "crc32_pre": pa.array(rows["crc32_pre"], pa.int64()),
            "sample_rate": pa.array(rows["sample_rate"], pa.int64()),
            "n_samples": pa.array(rows["n_samples"], pa.int64()),
            "peak": pa.array(rows["peak"], pa.int64()),
        }
    )


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
