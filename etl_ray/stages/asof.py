"""Distributed as-of join (point-in-time lookup).

For every left row, find the right row with the same key and the
GREATEST right timestamp <= the left timestamp (``direction=backward``,
the CDC/point-in-time semantics: "state as of this event").  Ray Data
has no native as-of join; the reference has none either — this is the
composition path the engine's design notes prescribe for operators the
Dataset API lacks: co-partition by key hash, then a fully vectorized
per-bucket merge.

Shape (one shuffle, bounded groups):
  left  -> project (key, ts, payload...) + bucket = hash_bucket(key, B)
  right -> project (key, ts, payload...) + bucket
  union -> groupby(bucket) -> map_groups(vectorized searchsorted merge)

Inside a bucket nothing is per-row Python: keys dense-code via
``np.unique`` over the union, timestamps rank-encode the same way, and
the match is ONE ``np.searchsorted`` over fused ``code * R + rank``
values (code < rows, R <= rows+1, so the product stays far below 2^63).
Ties on right timestamp resolve deterministically to the greatest
``tiebreak`` value — the right side is sorted by (key, ts, tiebreak)
and ``side='right' - 1`` lands on the run's last row.

Partitioning assumption (documented per the scale contract): a single
hash bucket's rows (both sides) fit in one task's heap.  B scales with
the cluster; key skew within a bucket only grows that bucket linearly —
there is no quadratic pair blowup in an as-of join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashutil import hash_bucket


def asof_join(
    left,
    right,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    tiebreak: str,
    n_buckets: int = 64,
):
    """Backward as-of join; INNER semantics (left rows with no earlier
    right row are dropped).  ``on`` must name the key column in BOTH
    datasets (rename the right side first if needed).  Output columns =
    all left columns + all right columns except ``on``/``right_ts``.

    ``tiebreak`` names a right column that deterministically orders
    right rows sharing (key, ts); the greatest wins.
    """
    lschema = left.schema()
    rschema = right.schema()
    lcols = list(lschema.names)
    rpayload = [c for c in rschema.names if c not in (on, right_ts)]
    if tiebreak not in rpayload:
        raise ValueError(f"tiebreak {tiebreak!r} must be a right payload column")
    overlap = set(lcols) & set(rpayload)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    ltypes = {c: lschema.types[lschema.names.index(c)] for c in lcols}
    rtypes = {c: rschema.types[rschema.names.index(c)] for c in rschema.names}
    out_schema = pa.schema(
        [(c, ltypes[c]) for c in lcols] + [(c, rtypes[c]) for c in rpayload]
    )
    # the union schema: key/ts/side/bucket + both payload sets (the other
    # side's columns ride as typed nulls)
    lpayload = [c for c in lcols if c not in (on, left_ts)]

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {
            "_key": t[on],
            "_ts": t[left_ts].cast(pa.int64()),
            "_side": pa.array(np.ones(n, np.int8)),
            "_bucket": hash_bucket(t[on], n_buckets),
        }
        for c in lpayload:
            cols[c] = t[c]
        for c in rpayload:
            cols[c] = pa.nulls(n, rtypes[c])
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        key = t[on].cast(ltypes[on])  # hash the CAST key: both sides must
        # bucket identically for the same key value
        cols = {
            "_key": key,
            "_ts": t[right_ts].cast(pa.int64()),
            "_side": pa.array(np.zeros(n, np.int8)),
            "_bucket": hash_bucket(key, n_buckets),
        }
        for c in lpayload:
            cols[c] = pa.nulls(n, ltypes[c])
        for c in rpayload:
            cols[c] = t[c]
        return pa.table(cols)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def _empty() -> pa.Table:
        return out_schema.empty_table()

    def merge(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        lmask, rmask = side == 1, side == 0
        if not lmask.any() or not rmask.any():
            return _empty()
        keys = g["_key"].to_numpy(zero_copy_only=False)
        ts = g["_ts"].to_numpy(zero_copy_only=False)
        # dense-code keys and rank-encode timestamps over the union so the
        # fused value preserves (key, ts) lexicographic order
        _, codes = np.unique(keys, return_inverse=True)
        uts = np.unique(ts)
        ranks = np.searchsorted(uts, ts).astype(np.int64)
        fused = codes.astype(np.int64) * np.int64(len(uts) + 1) + ranks

        lidx = np.flatnonzero(lmask)
        ridx = np.flatnonzero(rmask)
        # subset FIRST: the full column carries nulls on left rows, and a
        # null-bearing int64 column converts to float64 (lossy past 2^53)
        tb = g[tiebreak].take(pa.array(ridx, pa.int64())).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((tb, fused[ridx]))
        ridx = ridx[order]
        rfused = fused[ridx]

        pos = np.searchsorted(rfused, fused[lidx], side="right") - 1
        valid = pos >= 0
        # same key? (fused floor-div recovers the key code)
        rcodes = codes[ridx]
        valid &= rcodes[np.maximum(pos, 0)] == codes[lidx]
        lkeep = lidx[valid]
        rkeep = ridx[pos[valid]]
        if not len(lkeep):
            return _empty()

        lt = g.take(pa.array(lkeep, pa.int64()))
        rt = g.take(pa.array(rkeep, pa.int64()))
        cols = {}
        for c in lcols:
            if c == on:
                cols[c] = lt["_key"]
            elif c == left_ts:
                cols[c] = lt["_ts"].cast(ltypes[left_ts])
            else:
                cols[c] = lt[c]
        for c in rpayload:
            cols[c] = rt[c]
        return pa.table(cols).cast(out_schema)

    merge.__name__ = "asof_merge"
    return unioned.groupby("_bucket").map_groups(merge, batch_format="pyarrow")
