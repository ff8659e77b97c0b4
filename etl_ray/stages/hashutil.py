"""Vectorized 64-bit hashing over Arrow columns (shared by lineage
checksums and bucket keys).

Two needs, one kernel:

* ``bytes_poly_hash``: per-row hash of a string/binary column, computed
  over the flat Arrow byte buffer with numpy only — positional weights
  come from one cumprod table + gather, so cost is O(total bytes) with
  no per-row Python.  Replaces the per-row ``zlib.crc32`` loop that ran
  inside the merge hot path (round-2 verdict item: every live row of
  every rewritten partition paid a Python iteration).
* ``hash_bucket``: bounded shuffle keys for ANY key dtype.  Integer keys
  mix through splitmix64; string/binary keys go through
  ``bytes_poly_hash``.  Generalizes the previous
  ``bit_wise_and(cast(uint64))`` helper, which only worked for integer
  keys (a url or uuid session key needs a real hash first).

All arithmetic wraps mod 2^64 (numpy unsigned overflow semantics), fully
deterministic across runs/processes — no dependence on PYTHONHASHSEED or
library-version hash internals.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_BASE = np.uint64(0x100000001B3)  # FNV-ish odd multiplier
_LEN_C = np.uint64(0x9E3779B97F4A7C15)
_NULL_SENTINEL = np.uint64(0xA5A5A5A55A5A5A5A)


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized; input/output uint64."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def bytes_poly_hash(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Per-row 64-bit polynomial hash of a string/binary column.

    h(row) = mix64( sum_j (b_j + 1) * BASE^(L-1-j)  +  L * C )
    (+1 so NUL bytes are length-distinguishing; the length term separates
    prefixes).  Nulls hash to a fixed sentinel.  Vectorized: one weight
    table of size max(L) via cumprod, one gather, one segmented reduce.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, np.uint64)
    arr = col.cast(pa.large_binary())
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], np.int64)[arr.offset : arr.offset + n + 1]
    starts, ends = offsets[:-1], offsets[1:]
    lens = (ends - starts).astype(np.int64)
    total = int(lens.sum())
    poly = np.zeros(n, np.uint64)
    if total:
        data = np.frombuffer(bufs[2], np.uint8)
        row_id = np.repeat(np.arange(n, dtype=np.int64), lens)
        cum = np.concatenate(([0], np.cumsum(lens)))
        k = np.arange(total, dtype=np.int64) - cum[row_id]
        b = data[starts[row_id] + k].astype(np.uint64) + np.uint64(1)
        maxlen = int(lens.max())
        table = np.empty(maxlen, np.uint64)
        table[0] = 1
        if maxlen > 1:
            np.cumprod(np.full(maxlen - 1, _BASE, np.uint64), out=table[1:])
        w = table[lens[row_id] - 1 - k]
        nz = lens > 0
        poly[nz] = np.add.reduceat(b * w, cum[:-1][nz])
    h = mix64(poly + lens.astype(np.uint64) * _LEN_C)
    if col.null_count:
        valid = np.asarray(col.is_valid())
        h[~valid] = _NULL_SENTINEL
    return h


def hash64(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """64-bit hash of any key column: integers mix via splitmix64,
    strings/binary via ``bytes_poly_hash``."""
    typ = col.type
    if pa.types.is_integer(typ):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = col.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        h = mix64(v.copy())
        if col.null_count:
            valid = np.asarray(col.is_valid())
            h[~valid] = _NULL_SENTINEL
        return h
    if pa.types.is_string(typ) or pa.types.is_large_string(typ) or pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        return bytes_poly_hash(col)
    raise TypeError(f"hash64: unsupported key type {typ}")


def hash_bucket(col: pa.Array | pa.ChunkedArray, n_buckets: int) -> pa.Array:
    """Bounded shuffle-bucket key for any key dtype: int32 in [0, n)."""
    return pa.array((hash64(col) % np.uint64(n_buckets)).astype(np.int32))
