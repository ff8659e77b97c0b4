"""Pure-stdlib media codecs: REAL PNG and WAV decode/encode.

The container has no PIL/opencv/ffmpeg, but PNG is zlib + per-scanline
filters and WAV is stdlib ``wave`` — both fully implementable from their
public specs (PNG: RFC 2083; WAV: RIFF/PCM).  These kernels are the real
decode step behind `stages/multimodal.py` (which round 3 had to fake):
decoded pixels/samples are bit-exact, so a fixture can carry the
pre-encode checksum and the pipeline proves a true encode→decode
roundtrip.

Scope (documented, checked, errors on anything else):
* PNG: 8-bit, color types 0 (gray), 2 (RGB), 6 (RGBA); all five
  scanline filters (None/Sub/Up/Average/Paeth); no interlacing, no
  palette.  That covers every PNG this engine itself writes and the
  common screenshot/figure corpus shape.
* WAV: PCM 16-bit, any channel count / sample rate.

JPEG/MP4 remain out of scope (DCT/entropy decode is a library job) —
`ImageDecoder` falls back to the clearly-marked fake for those.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per supported color type
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (H, W), (H, W, 3) or (H, W, 4) uint8 array as PNG.

    ``filter_type`` applies one filter to every scanline (0..4); the
    non-zero filters exist mainly so tests can exercise the decoder's
    full reconstruction logic with real encoded bytes."""
    if arr.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise ValueError(f"unsupported channel count {c}")
    if filter_type not in range(5):
        raise ValueError("filter_type must be 0..4")
    bpp = c  # bytes per pixel at bit depth 8
    raw = bytearray()
    prev = np.zeros((w * c,), np.uint8)
    for y in range(h):
        line = arr[y].reshape(-1)
        raw.append(filter_type)
        if filter_type == 0:  # None
            enc = line
        elif filter_type == 1:  # Sub
            left = np.concatenate((np.zeros(bpp, np.uint8), line[:-bpp]))
            enc = (line.astype(np.int16) - left).astype(np.uint8)
        elif filter_type == 2:  # Up
            enc = (line.astype(np.int16) - prev).astype(np.uint8)
        elif filter_type == 3:  # Average
            left = np.concatenate((np.zeros(bpp, np.uint8), line[:-bpp]))
            avg = (left.astype(np.int16) + prev.astype(np.int16)) // 2
            enc = (line.astype(np.int16) - avg).astype(np.uint8)
        else:  # Paeth
            left = np.concatenate((np.zeros(bpp, np.uint8), line[:-bpp]))
            ul = np.concatenate((np.zeros(bpp, np.uint8), prev[:-bpp]))
            enc = (line.astype(np.int16) - _paeth(left, prev, ul)).astype(np.uint8)
        raw += enc.tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (per the PNG spec's tie-break order)."""
    a = a.astype(np.int16)
    b = b.astype(np.int16)
    c = c.astype(np.int16)
    p = a + b - c
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out


def png_info(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the IHDR without a full decode —
    the metadata-only path a schema/stats pass wants."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    if data[12:16] != b"IHDR":
        raise ValueError("corrupt PNG (IHDR not first chunk)")
    w, h, depth, color_type = struct.unpack(">IIBB", data[16:26])
    if depth != 8 or color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG (depth={depth}, color={color_type})")
    return w, h, _PNG_CHANNELS[color_type]


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG to an (H, W, C) uint8 array.

    Full filter reconstruction (None/Sub/Up/Average/Paeth) per RFC 2083;
    rejects interlaced/palette/16-bit images with a clear error rather
    than guessing."""
    w, h, c = png_info(data)
    if struct.unpack(">BBB", data[26:29]) != (0, 0, 0):
        raise ValueError("unsupported PNG (compression/filter/interlace)")
    # walk chunks, concatenate IDAT
    idat = bytearray()
    off = 8
    while off < len(data):
        (length,) = struct.unpack(">I", data[off : off + 4])
        tag = data[off + 4 : off + 8]
        body = data[off + 8 : off + 8 + length]
        crc = struct.unpack(">I", data[off + 8 + length : off + 12 + length])[0]
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"corrupt PNG ({tag!r} chunk CRC mismatch)")
        if tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        off += 12 + length
    raw = zlib.decompress(bytes(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG (decompressed size mismatch)")
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    bpp = c
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if f == 0:
            rec = line
        elif f == 2:  # Up — vectorized
            rec = line + prev  # uint8 wraparound == mod-256 per spec
        elif f in (1, 3, 4):
            # Sub/Average/Paeth depend on the reconstructed left pixel:
            # sequential across the row's PIXELS, vectorized across the
            # pixel's CHANNELS (bpp lanes at a time)
            rec = np.zeros(stride, np.uint8)
            for x in range(0, stride, bpp):
                left = rec[x - bpp : x] if x else np.zeros(bpp, np.uint8)
                cur = line[x : x + bpp].astype(np.int16)
                if f == 1:
                    val = cur + left
                elif f == 3:
                    up = prev[x : x + bpp].astype(np.int16)
                    val = cur + (left.astype(np.int16) + up) // 2
                else:
                    up = prev[x : x + bpp]
                    ul = prev[x - bpp : x] if x else np.zeros(bpp, np.uint8)
                    val = cur + _paeth(left, up, ul)
                rec[x : x + bpp] = (val % 256).astype(np.uint8)
        else:
            raise ValueError(f"corrupt PNG (unknown filter {f})")
        out[y] = rec
        prev = out[y]
    return out.reshape(h, w, c)


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W, C) array — fully vectorized
    (two index gathers), the thumbnail/normalization pass."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[ys][:, xs]


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 samples ((N,) mono or (N, C)) as PCM WAV."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16")
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(ch)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.reshape(-1).tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM-16 WAV bytes -> ((N, C) int16 array, sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError(f"unsupported WAV sample width {f.getsampwidth()}")
        n, ch, rate = f.getnframes(), f.getnchannels(), f.getframerate()
        raw = f.readframes(n)
    return np.frombuffer(raw, np.int16).reshape(n, ch), rate
