"""Distributed Bloom filter — shuffle-volume reduction for semi/anti joins.

At 100 TB the exact semi/anti ``Dataset.join`` exchanges the ENTIRE left
side even when almost nothing matches (semi) or almost everything does
(anti).  A Bloom filter built from the key side cuts that exchange to
the rows the filter cannot decide:

* build: each task folds its key batch into an m-bit array (k double-
  hashed probes per key, vectorized ``np.bitwise_or.at`` on packed
  uint64 words); partials OR-merge — associative/commutative, any order
  — and only O(m/8)-byte arrays ever move or reach the driver;
* probe: broadcast the merged words once (``ray.put``), test each batch
  vectorized.  Negative is DEFINITE non-membership (no false
  negatives); positive is "maybe" at the designed false-positive rate.

So an anti join emits bloom-negative rows immediately and ships only
bloom-positive rows (true matches + FP) to the exact join; a semi join
drops bloom-negatives outright and exact-joins the survivors.  Results
are exact either way — the filter only re-routes volume.

Hashing is the repo's deterministic splitmix64 / byte-poly kernel
(stages/hashutil.py): no PYTHONHASHSEED or library-hash dependence.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashutil import hash64

# 16 MiB of filter (2^27 bits) ~= 13M keys at 10 bits/key; cap so the
# broadcast stays cheap on small boxes — callers can raise it
DEFAULT_MAX_BITS = 1 << 27


def bloom_params(n_keys: int, bits_per_key: int = 10, max_bits: int = DEFAULT_MAX_BITS):
    """(m_bits, k) sized for ~1% FP at 10 bits/key, power-of-two m."""
    m = 1 << max(10, int(np.ceil(np.log2(max(n_keys, 1) * bits_per_key))))
    m = min(m, max_bits)
    k = max(1, min(8, int(round(m / max(n_keys, 1) * 0.693))))
    return m, k


def _probe_positions(col: pa.Array | pa.ChunkedArray, m_bits: int, k: int):
    """(n, k) int64 bit positions via double hashing h1 + i*h2 (mod m)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    h = hash64(col)
    h1 = h & np.uint64(m_bits - 1)  # m is a power of two
    h2 = ((h >> np.uint64(33)) | np.uint64(1)) & np.uint64(m_bits - 1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return (h1[:, None] + i * h2[:, None]) & np.uint64(m_bits - 1)


def bloom_partial(col: pa.Array | pa.ChunkedArray, m_bits: int, k: int) -> np.ndarray:
    """Fold one key batch into packed uint64 words (length m_bits/64)."""
    pos = _probe_positions(col, m_bits, k).ravel()
    words = np.zeros(m_bits >> 6, dtype=np.uint64)
    np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (pos & np.uint64(63)))
    return words


def bloom_merge(partials: list[np.ndarray]) -> np.ndarray:
    out = partials[0].copy()
    for w in partials[1:]:
        np.bitwise_or(out, w, out=out)
    return out


def bloom_contains(words: np.ndarray, col: pa.Array | pa.ChunkedArray, k: int) -> np.ndarray:
    """Vectorized membership test: bool[n], no false negatives."""
    m_bits = len(words) << 6
    pos = _probe_positions(col, m_bits, k)
    bits = (words[(pos >> np.uint64(6)).astype(np.int64)]
            >> (pos & np.uint64(63))) & np.uint64(1)
    return bits.all(axis=1)


def bloom_build(keys_ds, col: str, n_keys: int, bits_per_key: int = 10):
    """Build the merged filter from a (materialized) key Dataset.

    Returns (words, k).  Each task emits one packed partial row; the
    driver OR-merges O(num_batches) rows of m/8 bytes each — key rows
    never leave their tasks."""
    m, k = bloom_params(n_keys, bits_per_key)

    def partial(t: pa.Table) -> pa.Table:
        w = bloom_partial(t[col], m, k)
        return pa.table({"w": pa.array([w], pa.list_(pa.uint64(), len(w)))})

    rows = keys_ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not rows:
        return np.zeros(m >> 6, dtype=np.uint64), k
    return bloom_merge([np.asarray(r["w"], dtype=np.uint64) for r in rows]), k
