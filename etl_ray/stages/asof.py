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


def interval_join(
    left,
    right,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    lo_offset: int,
    hi_offset: int,
    max_matches: int | None = None,
    n_buckets: int = 64,
):
    """Distributed interval (range) join: every (left, right) pair with
    the same key and ``left_ts + lo_offset <= right_ts <= left_ts +
    hi_offset`` (inclusive; offsets in the timestamp's integer unit,
    e.g. microseconds).  INNER semantics; output = all left columns +
    all right columns except ``on``/``right_ts`` plus ``right_ts``
    itself (callers usually want the matched time).

    Same co-partition + fused-searchsorted machinery as :func:`asof_join`
    but with a [start, end) window per left row instead of one
    predecessor: right rows sort by fused (key, ts-rank); two
    searchsorteds bound each left row's slice; segment expansion emits
    the pairs with no per-row Python.

    ``max_matches`` (optional) bounds output quadratic blowup on skewed
    data by keeping only the LATEST k matches per left row — the
    truncation is counted per batch in the task logs rather than
    silently ignored.  Caveat: among matches sharing the exact boundary
    timestamp, which survive truncation follows the group's row order
    (deterministic for a given input, but not a semantic ordering); the
    untruncated join is pure set semantics.
    """
    if lo_offset > hi_offset:
        raise ValueError("lo_offset must be <= hi_offset")
    lschema = left.schema()
    rschema = right.schema()
    lcols = list(lschema.names)
    rpayload = [c for c in rschema.names if c != on]  # right_ts kept in output
    overlap = set(lcols) & set(rpayload)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    ltypes = {c: lschema.types[lschema.names.index(c)] for c in lcols}
    rtypes = {c: rschema.types[rschema.names.index(c)] for c in rschema.names}
    out_schema = pa.schema(
        [(c, ltypes[c]) for c in lcols] + [(c, rtypes[c]) for c in rpayload]
    )
    lpayload = [c for c in lcols if c != on]

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
        key = t[on].cast(ltypes[on])
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

    def merge(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        lmask, rmask = side == 1, side == 0
        if not lmask.any() or not rmask.any():
            return out_schema.empty_table()
        keys = g["_key"].to_numpy(zero_copy_only=False)
        ts = g["_ts"].to_numpy(zero_copy_only=False)
        lidx = np.flatnonzero(lmask)
        ridx = np.flatnonzero(rmask)
        _, codes = np.unique(keys, return_inverse=True)
        lo_b = ts[lidx] + np.int64(lo_offset)
        hi_b = ts[lidx] + np.int64(hi_offset)
        # rank right timestamps together with both bound arrays so fused
        # (code, rank) order is exact and inclusive on both ends
        uts = np.unique(np.concatenate([ts[ridx], lo_b, hi_b]))
        R = np.int64(len(uts) + 1)
        r_rank = np.searchsorted(uts, ts[ridx]).astype(np.int64)
        rfused = codes[ridx] * R + r_rank
        order = np.argsort(rfused, kind="stable")
        ridx = ridx[order]
        rfused = rfused[order]
        lo_f = codes[lidx] * R + np.searchsorted(uts, lo_b).astype(np.int64)
        hi_f = codes[lidx] * R + np.searchsorted(uts, hi_b).astype(np.int64)
        start = np.searchsorted(rfused, lo_f, side="left")
        end = np.searchsorted(rfused, hi_f, side="right")
        counts = end - start
        if max_matches is not None:
            kept = np.minimum(counts, max_matches)
            start = end - kept  # keep the LATEST k per left row
            dropped = int((counts - kept).sum())
            if dropped:
                print(f"interval_join: truncated {dropped} matches (max_matches={max_matches})")
            counts = kept
        total = int(counts.sum())
        if total == 0:
            return out_schema.empty_table()
        # segment expansion: for each left row i, right positions
        # start[i] .. start[i]+counts[i]
        lrep = np.repeat(np.arange(len(lidx)), counts)
        offs = np.concatenate(([0], np.cumsum(counts)))[:-1]
        rpos = np.arange(total, dtype=np.int64) - np.repeat(offs, counts) + np.repeat(start, counts)
        lt = g.take(pa.array(lidx[lrep], pa.int64()))
        rt = g.take(pa.array(ridx[rpos], pa.int64()))
        cols = {}
        for c in lcols:
            if c == on:
                cols[c] = lt["_key"]
            elif c == left_ts:
                cols[c] = lt["_ts"].cast(ltypes[left_ts])
            else:
                cols[c] = lt[c]
        for c in rpayload:
            cols[c] = rt["_ts"].cast(rtypes[right_ts]) if c == right_ts else rt[c]
        return pa.table(cols).cast(out_schema)

    merge.__name__ = "interval_merge"
    return unioned.groupby("_bucket").map_groups(merge, batch_format="pyarrow")
