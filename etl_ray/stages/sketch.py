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


def heavy_hitters(ds, col: str, k: int = 20, m: int = 4096):
    """Distributed heavy hitters with a deterministic error bound.

    Each task reduces its batch to EXACT (item, count) pairs pruned to
    its top-``m`` plus the scalar ``pruned_max`` = the largest count it
    discarded; the driver merges by summing counts per item and summing
    pruned_max values.  For every item, true_count <= merged_count +
    total_pruned (an absent-from-some-partial item can have missed at
    most that partial's pruned_max there), so the returned top-``k``
    candidates with their (count_lo = merged, count_hi = merged +
    total_pruned) bracket is a SUPERSET filter for any threshold above
    total_pruned — the Misra-Gries/SpaceSaving guarantee shape without
    per-row sequential state.  Choose m >> k (default 4096 vs 20) so
    total_pruned stays far below real heavy-hitter counts.

    Returns a pyarrow table (item, count_lo, count_hi) of the k largest
    by count_lo, ties broken by item ascending.
    """
    import pyarrow.compute as _pc

    def partial(batch: pa.Table) -> pa.Table:
        col_arr = batch.column(col)
        if isinstance(col_arr, pa.ChunkedArray):
            col_arr = col_arr.combine_chunks()
        enc = _pc.dictionary_encode(col_arr)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(codes[codes >= 0].astype(np.int64))
        order = np.argsort(-cnt, kind="stable")
        keep = order[:m]
        pruned_max = int(cnt[order[m]]) if len(order) > m else 0
        items = enc.dictionary.take(pa.array(keep.astype(np.int64)))
        return pa.table(
            {
                "item": items.cast(pa.string()),
                "n": pa.array(cnt[keep].astype(np.int64), pa.int64()),
                "pruned_max": pa.array(
                    [pruned_max] + [0] * (len(keep) - 1) if len(keep) else [],
                    pa.int64(),
                ),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged: dict[str, int] = {}
    total_pruned = 0
    for r in rows:
        merged[r["item"]] = merged.get(r["item"], 0) + int(r["n"])
        total_pruned += int(r["pruned_max"])
    top = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pa.table(
        {
            "item": pa.array([t[0] for t in top], pa.string()),
            "count_lo": pa.array([t[1] for t in top], pa.int64()),
            "count_hi": pa.array(
                [t[1] + total_pruned for t in top], pa.int64()
            ),
        }
    )


def exact_topk_frequent(ds, col: str, k: int = 20, m: int = 4096) -> pa.Table:
    """EXACT top-k most-frequent items in two bounded passes — no
    full-key groupby shuffle.

    Pass 1 is :func:`heavy_hitters`'s partial (per-task exact counts
    pruned to top-``m`` + the pruned_max scalar).  From the merged
    partials, ``kth_lo`` = the k-th largest lower-bound count.  Any true
    top-k item x satisfies true(x) >= kth_lo (the k items carrying the
    k largest lower bounds already have true counts >= those bounds);
    an item absent from the merge has true <= total_pruned, and a merged
    item has true <= count_hi = merged + total_pruned.  So when
    total_pruned < kth_lo, the candidate set {item : count_hi >= kth_lo}
    PROVABLY contains the exact top-k.  Pass 2 recounts only those
    candidates exactly (per-batch filtered bincount partials; the
    candidate list is broadcast once via ``ray.put``), and the result is
    the exact top-k under the total order (count DESC, item ASC).

    If the certificate fails (adversarially flat distribution:
    total_pruned >= kth_lo), falls back to the exact full groupby —
    correctness is never sacrificed, only the shuffle saving.

    At 10^10 rows this ships O(m) rows per task in pass 1 and a
    candidate bincount per task in pass 2 — vs an all-to-all exchange of
    every key for groupby+sort.  Reference analogue: the engine-side
    aggregate family (SURVEY §2 A1) done sketch-first.
    """
    import pyarrow.compute as _pc
    import ray as _ray

    def partial(batch: pa.Table) -> pa.Table:
        col_arr = batch.column(col)
        if isinstance(col_arr, pa.ChunkedArray):
            col_arr = col_arr.combine_chunks()
        enc = _pc.dictionary_encode(col_arr)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(codes[codes >= 0].astype(np.int64))
        order = np.argsort(-cnt, kind="stable")
        keep = order[:m]
        if len(keep) == 0:
            return pa.table(
                {
                    "item": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "pruned_max": pa.array([], pa.int64()),
                }
            )
        pruned_max = int(cnt[order[m]]) if len(order) > m else 0
        items = enc.dictionary.take(pa.array(keep.astype(np.int64)))
        return pa.table(
            {
                "item": items.cast(pa.string()),
                "n": pa.array(cnt[keep].astype(np.int64), pa.int64()),
                "pruned_max": pa.array(
                    [pruned_max] + [0] * (len(keep) - 1), pa.int64()
                ),
            }
        )

    merged: dict[str, int] = {}
    total_pruned = 0
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        merged[r["item"]] = merged.get(r["item"], 0) + int(r["n"])
        total_pruned += int(r["pruned_max"])
    if not merged:
        return pa.table(
            {"item": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
    los = sorted(merged.values(), reverse=True)
    kth_lo = los[min(k, len(los)) - 1]

    if total_pruned >= kth_lo:
        # certificate failed — exact fallback (full groupby, still bounded
        # by the engine's partial-pre-agg groupby path)
        from ray.data.aggregate import Count as _Count

        agg = (
            ds.map_batches(
                lambda t: pa.table({"item": t.column(col).cast(pa.string())}),
                batch_format="pyarrow",
            )
            .groupby("item")
            .aggregate(_Count(alias_name="cnt"))
        )
        rows = agg.take_all()
        top = sorted(
            ((r["item"], int(r["cnt"])) for r in rows),
            key=lambda kv: (-kv[1], kv[0]),
        )[:k]
    else:
        cand = sorted(
            it for it, n in merged.items() if n + total_pruned >= kth_lo
        )
        cand_ref = _ray.put(pa.array(cand, pa.string()))

        def recount(batch: pa.Table) -> pa.Table:
            cset = _ray.get(cand_ref)
            vals = batch.column(col).cast(pa.string())
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            pos = _pc.fill_null(
                _pc.index_in(vals, value_set=cset), -1
            ).to_numpy(zero_copy_only=False)
            cnt = np.bincount(
                pos[pos >= 0].astype(np.int64), minlength=len(cset)
            )
            return pa.table(
                {
                    "item": cset,
                    "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                }
            )

        exact: dict[str, int] = {}
        for r in ds.map_batches(recount, batch_format="pyarrow").take_all():
            exact[r["item"]] = exact.get(r["item"], 0) + int(r["cnt"])
        top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    return pa.table(
        {
            "item": pa.array([t[0] for t in top], pa.string()),
            "cnt": pa.array([t[1] for t in top], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# mergeable quantile summary (deterministic rank-error bound)
# ---------------------------------------------------------------------------


def quantile_partial(col, m: int = 512) -> pa.Table:
    """One block's quantile summary: the ``min(m, n)`` evenly-spaced
    order statistics of the block, each carrying weight n/samples.

    Mergeable and DETERMINISTIC (no RNG, no hashing): a weighted merge
    of per-block summaries answers any quantile with rank error at most
    ``sum_b(n_b / m_b)`` — each block contributes at most n_b/m_b rank
    uncertainty between consecutive kept order statistics.  With
    same-size blocks that is n/m total: the ε = 1/m guarantee class of
    GK/KLL with a far simpler (and vectorized) summary."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    v = col.drop_null().to_numpy(zero_copy_only=False)
    n = len(v)
    if n == 0:
        return pa.table(
            {"value": pa.array([], pa.float64()), "weight": pa.array([], pa.float64())}
        )
    v = np.sort(v.astype(np.float64))
    k = min(m, n)
    # evenly-spaced ranks, always including both extremes
    idx = np.unique(np.linspace(0, n - 1, num=k).round().astype(np.int64))
    return pa.table(
        {
            "value": pa.array(v[idx], pa.float64()),
            "weight": pa.array(np.full(len(idx), n / len(idx)), pa.float64()),
        }
    )


def quantile_merge_estimate(partials: list[pa.Table], qs: list[float]) -> list[float]:
    """Merge per-block summaries and answer quantiles: weighted sort +
    cumulative-weight threshold.  O(total samples log total samples),
    order-free (weighted multiset union is commutative)."""
    if not partials:
        return [float("nan")] * len(qs)
    vals = np.concatenate([p["value"].to_numpy(zero_copy_only=False) for p in partials])
    wts = np.concatenate([p["weight"].to_numpy(zero_copy_only=False) for p in partials])
    if len(vals) == 0:
        return [float("nan")] * len(qs)
    order = np.argsort(vals, kind="stable")
    vals, wts = vals[order], wts[order]
    cum = np.cumsum(wts)
    total = cum[-1]
    out = []
    for q in sorted(qs):
        target = min(max(q, 0.0), 1.0) * total
        i = int(np.searchsorted(cum, target, side="left"))
        out.append(float(vals[min(i, len(vals) - 1)]))
    return out


def approx_quantiles(ds, col: str, qs: list[float], m: int = 512) -> pa.Table:
    """Distributed single-pass approximate quantiles: one streaming
    ``map_batches`` over WHOLE BLOCKS (``batch_size=None`` — the summary
    size is per block, so the driver sees O(blocks × m) samples: a few
    million at 10^10 rows, never the column), no shuffle anywhere.
    Returns (q, value) like ``quantiles.exact_quantiles``; the rank
    error bound is pytest-pinned (tests/test_sketch.py)."""

    def partial(batch: pa.Table) -> pa.Table:
        return quantile_partial(batch.column(col), m)

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).take_all()
    # rebuild the tiny tables the driver got back as one partial list
    tbl = (
        pa.table(
            {
                "value": pa.array([r["value"] for r in parts], pa.float64()),
                "weight": pa.array([r["weight"] for r in parts], pa.float64()),
            }
        )
        if parts
        else pa.table(
            {"value": pa.array([], pa.float64()), "weight": pa.array([], pa.float64())}
        )
    )
    qs = sorted(qs)
    vals = quantile_merge_estimate([tbl], qs)
    return pa.table(
        {"q": pa.array(qs, pa.float64()), "value": pa.array(vals, pa.float64())}
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (mergeable frequency estimates, one-sided error)
# ---------------------------------------------------------------------------

_CMS_SALT = np.uint64(0x9E3779B97F4A7C15)


def cms_partial(col: pa.Array | pa.ChunkedArray, d: int = 4, w: int = 16384) -> np.ndarray:
    """One batch's Count-Min sketch: int64[d, w].  Row i uses an
    independent derived hash (splitmix remix of the base row hash with a
    per-row salt), so the d estimates are independent min candidates.
    Merge = elementwise sum (associative + commutative); estimates are
    ONE-SIDED: est >= true always, est <= true + e*N/w with probability
    1 - e^-d (Cormode & Muthukrishnan 2005)."""
    from .hashutil import hash64, mix64

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    base = hash64(col)
    sk = np.zeros((d, w), np.int64)
    for i in range(d):
        hi = mix64(base + _CMS_SALT * np.uint64(i + 1))
        sk[i] += np.bincount((hi % np.uint64(w)).astype(np.int64), minlength=w)
    return sk


def cms_estimate(sk: np.ndarray, keys: pa.Array, d: int | None = None) -> np.ndarray:
    """Point frequency estimates (min over rows) for ``keys``."""
    from .hashutil import hash64, mix64

    d = d or sk.shape[0]
    w = sk.shape[1]
    base = hash64(keys)
    est = None
    for i in range(d):
        hi = mix64(base + _CMS_SALT * np.uint64(i + 1))
        v = sk[i][(hi % np.uint64(w)).astype(np.int64)]
        est = v if est is None else np.minimum(est, v)
    return est


def approx_counts(ds, col: str, keys: list, d: int = 4, w: int = 16384) -> pa.Table:
    """Dataset-level CMS: per-batch sketch partials sum on the driver
    (d*w int64 — 512 KB at the defaults, row-count independent), then
    the requested keys are estimated from the merged sketch.  The
    shuffle-free frequency query for when exact groupby counts are too
    expensive and only point lookups are needed."""

    def partial(batch: pa.Table) -> pa.Table:
        sk = cms_partial(batch.column(col), d, w)
        return pa.table({"sk": pa.array([sk.ravel().tolist()])})

    total = np.zeros(d * w, np.int64)
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        total += np.asarray(r["sk"], np.int64)
    sk = total.reshape(d, w)
    karr = pa.array([str(k) for k in keys], pa.string())
    est = cms_estimate(sk, karr, d)
    return pa.table(
        {
            "key": karr,
            "est": pa.array(est.astype(np.int64), pa.int64()),
        }
    )


def approx_distinct_grouped(ds, group_col: str, col: str, p: int = 12):
    """PER-GROUP approximate distinct counts — the grouped composition
    of :func:`approx_distinct` (e.g. distinct users per event type over
    10^10 events without shuffling a single user id).

    Each task reduces its batch to one 2^p-byte register row PER GROUP
    PRESENT IN THE BATCH; the shuffle therefore moves
    O(groups x batches) fixed-size sketch rows, never the keys.  The
    per-group max-merge + estimate runs inside ``map_groups`` —
    registers stay sharded end-to-end, nothing reaches the driver.
    Returns a Dataset (group_col, approx_distinct: float64).
    """
    import pyarrow.compute as _pc

    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        d = _pc.dictionary_encode(g)
        idx = d.indices.to_numpy(zero_copy_only=False)
        groups, regs = [], []
        for gi in range(len(d.dictionary)):
            sel = pa.array(idx == gi)
            groups.append(d.dictionary[gi].as_py())
            regs.append(hll_partial(batch.column(col).filter(sel), p))
        return pa.table(
            {
                group_col: pa.array(groups),
                "regs": pa.array(
                    [r for r in regs], pa.list_(pa.uint8(), m)
                ),
            }
        )

    def merge_grp(t: pa.Table) -> pa.Table:
        flat = np.asarray(
            t.column("regs").combine_chunks().flatten(), np.uint8
        ).reshape(t.num_rows, m)
        merged = flat.max(axis=0)
        return pa.table(
            {
                group_col: t.column(group_col).slice(0, 1),
                "approx_distinct": pa.array(
                    [hll_estimate(merged)], pa.float64()
                ),
            }
        )

    merge_grp.__name__ = "hll_group_merge"
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(merge_grp, batch_format="pyarrow")
    )


def approx_quantiles_grouped(
    ds, group_col: str, col: str, qs: list[float], m: int = 256
):
    """PER-GROUP approximate quantiles — the grouped composition of
    :func:`approx_quantiles`.  Each task emits one mergeable summary
    (<= m weighted order statistics, packed as list columns) PER GROUP
    PRESENT IN THE BATCH; the shuffle moves O(groups x batches) bounded
    summary rows, never the values.  The weighted merge + quantile
    answers run inside ``map_groups`` — nothing reaches the driver.
    Returns a Dataset (group_col, q: float64, value: float64), one row
    per (group, requested quantile).  Rank error per group is at most
    sum_b(n_bg / m) over that group's batch slices (the ungrouped
    operator's epsilon class)."""
    import pyarrow.compute as _pc

    qs = sorted(qs)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        d = _pc.dictionary_encode(g)
        idx = d.indices.to_numpy(zero_copy_only=False)
        groups, vals, wts = [], [], []
        for gi in range(len(d.dictionary)):
            sel = pa.array(idx == gi)
            p = quantile_partial(batch.column(col).filter(sel), m)
            groups.append(d.dictionary[gi].as_py())
            vals.append(p.column("value").to_pylist())
            wts.append(p.column("weight").to_pylist())
        return pa.table(
            {
                group_col: pa.array(groups),
                "values": pa.array(vals, pa.list_(pa.float64())),
                "weights": pa.array(wts, pa.list_(pa.float64())),
            }
        )

    def merge_grp(t: pa.Table) -> pa.Table:
        parts = [
            pa.table(
                {
                    "value": pa.array(v, pa.float64()),
                    "weight": pa.array(w, pa.float64()),
                }
            )
            for v, w in zip(
                t.column("values").to_pylist(), t.column("weights").to_pylist()
            )
        ]
        ans = quantile_merge_estimate(parts, qs)
        n = len(qs)
        return pa.table(
            {
                group_col: pa.array(
                    [t.column(group_col)[0].as_py()] * n
                ),
                "q": pa.array(qs, pa.float64()),
                "value": pa.array(ans, pa.float64()),
            }
        )

    merge_grp.__name__ = "quantile_group_merge"
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(merge_grp, batch_format="pyarrow")
    )
