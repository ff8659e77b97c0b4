"""Sketches: HyperLogLog approximate distinct count.

At 10^10 keys an exact COUNT(DISTINCT) is an all-to-all shuffle of every
key (the engine's exact path, ``queries.distinct_segments``, pays it).
The sketch path never shuffles rows at all: each ``map_batches`` task
emits one 2^p-byte register array (a *partial*), partials merge by
element-wise max (associative + commutative — any tree/order works), and
only registers ever reach the driver.  Standard HLL per Flajolet et al.
2007 ("HyperLogLog: the analysis of a near-optimal cardinality
estimation algorithm"), with the small-range linear-counting correction.

Determinism: the row hash is the repo's own vectorized splitmix64 /
byte-poly hash (stages/hashutil.py) — independent of PYTHONHASHSEED,
library versions, batch order, and parallelism (max-merge is
order-free), so estimates are bit-identical across runs and cluster
shapes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashutil import hash64


def hll_partial(col: pa.Array | pa.ChunkedArray, p: int = 14) -> np.ndarray:
    """One batch's HLL registers: uint8[2^p].  Nulls are skipped."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    h = hash64(col)
    if col.null_count:
        valid = np.asarray(col.is_valid())
        h = h[valid]
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)  # top p bits -> register
    rest = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    # rank = leading zeros of `rest` within 64-p bits, + 1; rest==0 -> max
    nbits = 64 - p
    rank = np.full(len(h), nbits + 1, dtype=np.uint8)
    nz = rest != 0
    if nz.any():
        # leading zeros via float64 exponent would lose precision past
        # 2^53; use a bit-length scan instead: lz = 64 - bit_length(rest)
        r = rest[nz]
        bl = np.zeros(len(r), dtype=np.int64)
        x = r.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            step = x >> np.uint64(shift)
            has = step != 0
            bl[has] += shift
            x = np.where(has, step, x)
        bl += 1  # bit_length of the nonzero values
        rank[nz] = (64 - bl + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(partials: list[np.ndarray]) -> np.ndarray:
    out = partials[0].copy()
    for r in partials[1:]:
        np.maximum(out, r, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected estimate with linear counting for the small range."""
    m = float(len(regs))
    if m >= 128:
        alpha = 0.7213 / (1 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)  # linear counting
    return float(est)


def approx_distinct(ds, col: str, p: int = 14) -> float:
    """Distributed approximate distinct count of ``ds[col]``.

    One streaming pass: each task reduces its batch to a 2^p-byte
    register row; the driver max-merges O(num_batches) tiny rows.  No
    key ever shuffles.  Relative error ~= 1.04/sqrt(2^p) (~0.8% at the
    default p=14, 16 KiB per partial)."""
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        regs = hll_partial(batch.column(col), p)
        return pa.table({"regs": pa.array([regs], pa.list_(pa.uint8(), m))})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not rows:
        return 0.0
    merged = hll_merge([np.asarray(r["regs"], dtype=np.uint8) for r in rows])
    return hll_estimate(merged)
