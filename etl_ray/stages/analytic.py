"""Partitioned analytic (window) functions: row_number, lag, cumulative
sum per key — the per-entity ordered-history features every
training-data / CDC pipeline wants (time-since-last-event, per-user
cumulative spend, version counters).

Reference analogue: the reference computes nothing like this (its only
ordered op is a storage ORDER BY, `src/pipeline/core/client_clickhouse.py`
table DDL in /root/reference); this is a target-added operator.

Scale shape (same as stages/topk.py): shuffling on the raw key would
dispatch Python once per DISTINCT key via ``map_groups`` — ruinous at
10^8 users.  Instead rows shuffle on ``hash_bucket(key) % n_buckets``
(bounded group count) and every window function inside a bucket is
fully vectorized: one ``np.lexsort`` over (order keys, key codes), run
boundaries by diff, positions / shifted values / segmented cumsum from
the boundary arrays.  No per-key Python anywhere; one bounded shuffle.

Determinism: ``order_by`` must be a total order within each key (append
a unique id column as the final key).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashutil import hash_bucket


def _sorted_runs(g: pa.Table, key: str, order_by: list[str]):
    """lexsort rows by (key, *order_by); return (order, starts, run_id).

    ``order`` is the row permutation; ``starts[run_id[i]]`` is the first
    sorted position of row i's key-run.
    """
    n = g.num_rows
    keys = []
    for col in reversed(order_by):
        keys.append(g[col].to_numpy(zero_copy_only=False))
    # dense-code key values so strings sort cheaply and runs are contiguous
    _, kcodes = np.unique(g[key].to_numpy(zero_copy_only=False), return_inverse=True)
    order = np.lexsort(tuple(keys) + (kcodes,))
    ksorted = kcodes[order]
    boundary = np.flatnonzero(np.diff(ksorted)) + 1
    starts = np.concatenate(([0], boundary))
    run_id = np.zeros(n, np.int64)
    run_id[starts[1:]] = 1
    run_id = np.cumsum(run_id)
    return order, starts, run_id


def partitioned_analytics(
    ds,
    *,
    key: str,
    order_by: list[str],
    lag_cols: list[str] | None = None,
    lead_cols: list[str] | None = None,
    cum_cols: list[str] | None = None,
    n_buckets: int = 256,
    rn_col: str = "rn",
):
    """Per-``key`` ordered analytics over a Dataset.

    Adds, per input row:

    * ``rn_col``: 1-based row number within the key, ordered by
      ``order_by`` (ascending, total order required);
    * ``<c>_prev`` for each ``lag_cols`` entry: the previous row's value
      of ``c`` within the key (null on each key's first row) — numeric /
      temporal columns;
    * ``<c>_next`` for each ``lead_cols`` entry: the next row's value
      within the key (null on each key's last row) — the SCD2
      ``valid_to`` shape;
    * ``cum_<c>`` for each ``cum_cols`` entry: running sum of ``c``
      within the key up to and including this row.  Integer columns only
      (int64 running sums are exact and engine-order-independent; float
      cumsums are not comparable across engines — cast to cents first).
    """
    lag_cols = lag_cols or []
    lead_cols = lead_cols or []
    cum_cols = cum_cols or []

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("_abucket", hash_bucket(t[key], n_buckets))

    def analyze(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_abucket"])
        out_schema = g.schema.append(pa.field(rn_col, pa.int64()))
        for c in lag_cols:
            out_schema = out_schema.append(pa.field(f"{c}_prev", g.schema.field(c).type))
        for c in lead_cols:
            out_schema = out_schema.append(pa.field(f"{c}_next", g.schema.field(c).type))
        for c in cum_cols:
            out_schema = out_schema.append(pa.field(f"cum_{c}", pa.int64()))
        n = g.num_rows
        if n == 0:
            return out_schema.empty_table()
        order, starts, run_id = _sorted_runs(g, key, order_by)
        pos = np.arange(n, dtype=np.int64) - starts[run_id]
        # emit in sorted order (any order is fine for the caller; sorted
        # keeps per-key rows adjacent for downstream consumers)
        out = g.take(pa.array(order, pa.int64()))
        out = out.append_column(rn_col, pa.array(pos + 1, pa.int64()))
        is_first = pos == 0
        for c in lag_cols:
            field = g.schema.field(c)
            v = out[c].combine_chunks()
            prev = v.take(pa.array(np.maximum(np.arange(n) - 1, 0), pa.int64()))
            mask = pa.array(is_first)
            prev = pc.if_else(mask, pa.scalar(None, field.type), prev)
            out = out.append_column(f"{c}_prev", prev)
        if lead_cols:
            # last row of each run = position before the next run's start
            ends = np.concatenate((starts[1:], [n])) - 1
            is_last = np.zeros(n, bool)
            is_last[ends[run_id] == np.arange(n)] = True
            for c in lead_cols:
                field = g.schema.field(c)
                v = out[c].combine_chunks()
                nxt = v.take(pa.array(np.minimum(np.arange(n) + 1, n - 1), pa.int64()))
                nxt = pc.if_else(pa.array(is_last), pa.scalar(None, field.type), nxt)
                out = out.append_column(f"{c}_next", nxt)
        for c in cum_cols:
            v = out[c].to_numpy(zero_copy_only=False).astype(np.int64)
            csum = np.cumsum(v)
            base = csum[starts] - v[starts]  # prefix sum before each run
            out = out.append_column(
                f"cum_{c}", pa.array(csum - base[run_id], pa.int64())
            )
        return out

    analyze.__name__ = "partitioned_analytics"
    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_abucket")
        .map_groups(analyze, batch_format="pyarrow")
    )


def ordered_cumsum(
    ds,
    *,
    order_col: str,
    value_col: str,
    n_buckets: int = 256,
    out_col: str | None = None,
    bounds: tuple[int, int] | None = None,
):
    """GLOBAL ordered running sum — ``SUM(v) OVER (ORDER BY order_col)``
    with no key to partition by, the primitive behind training sequence
    packing, offset assignment, and quota cuts.

    A single-ordered cumsum looks inherently serial; the distributed
    shape is the classic two-phase scan:

      1. range-bucket rows on ``order_col`` (contiguous value ranges, so
         bucket order == global order), per-batch PARTIAL sums per
         bucket — the shuffle moves O(batches x buckets) tiny rows,
         never the data;
      2. driver: exclusive prefix over the B bucket sums (B ints);
      3. one bucketed pass over the data: in-bucket vectorized cumsum +
         the bucket's broadcast base offset.

    ``order_col`` must be integer-typed with unique values (a doc_id /
    lsn / surrogate key); ``value_col`` integer (exact int64 sums).
    Bucket boundaries come from the column's global min/max (one
    metadata-cheap aggregate pass).
    """
    out_col = out_col or f"cum_{value_col}"
    import ray as _ray

    # the scan consumes its input THREE times (bounds, bucket sums, the
    # final cumsum pass); pin the narrow (order, value) table once so an
    # expensive upstream (an actor-pool tokenizer, a wide read) never
    # re-executes.  Callers pass a PRUNED dataset — the pin is O(rows x
    # two int columns), spill-backed.
    ds = ds.materialize()
    if bounds is not None:
        lo, hi = int(bounds[0]), int(bounds[1])
    else:
        # one cheap pass for the range bounds (callers with parquet
        # min/max stats in hand pass bounds= and skip it)
        from ray.data.aggregate import Max, Min

        agg = ds.aggregate(Min(order_col), Max(order_col))
        lo = int(agg[f"min({order_col})"])
        hi = int(agg[f"max({order_col})"])
    span = max(hi - lo + 1, 1)
    B = min(n_buckets, span)

    def bucket_of(arr: np.ndarray) -> np.ndarray:
        a = arr.astype(np.int64) - lo
        if span <= np.iinfo(np.int64).max // B:
            b = (a * B) // span
        else:
            # exact integer math would overflow ((span * B) >= 2^63 —
            # e.g. packed 60-bit order keys).  The float mapping is
            # MONOTONE non-decreasing (int->float64 conversion, multiply
            # by a positive constant, truncation — each order-preserving
            # in IEEE), so bucket order still equals global order; only
            # the bucket-boundary placement shifts, which affects
            # balance, never correctness.
            b = np.minimum(
                (a.astype(np.float64) * (float(B) / float(span))).astype(np.int64),
                B - 1,
            )
        return b.astype(np.int32)

    def tag(t: pa.Table) -> pa.Table:
        o = t[order_col].to_numpy(zero_copy_only=False)
        return t.append_column("_rbucket", pa.array(bucket_of(o), pa.int32()))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    # phase 1: per-batch partial sums per bucket (combiner), then a tiny
    # groupby over <= B * n_batches partial rows
    def partials(t: pa.Table) -> pa.Table:
        b = t["_rbucket"].to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ub, inv = np.unique(b, return_inverse=True)
        sums = np.zeros(len(ub), np.int64)
        np.add.at(sums, inv, v)
        return pa.table(
            {
                "_rbucket": pa.array(ub, pa.int32()),
                "s": pa.array(sums, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    bucket_sums = (
        tagged.select_columns(["_rbucket", value_col])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("_rbucket")
        .aggregate(Sum("s", alias_name="s"))
        .take_all()
    )  # <= B rows on the driver — O(buckets), never O(rows)
    sums = np.zeros(B, np.int64)
    for r in bucket_sums:
        sums[int(r["_rbucket"])] = int(r["s"])
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))
    offsets_ref = _ray.put(offsets)

    # phase 2: in-bucket ordered cumsum + broadcast base offset
    class CumsumBucket:
        def __init__(self):
            self.offsets = _ray.get(offsets_ref)
            self.__name__ = "CumsumBucket"

        def __call__(self, g: pa.Table) -> pa.Table:
            if g.num_rows == 0:
                # match the non-empty branch's schema (_rbucket dropped)
                return g.drop_columns(["_rbucket"]).append_column(
                    out_col, pa.array([], pa.int64())
                )
            b = int(g["_rbucket"][0].as_py())
            o = g[order_col].to_numpy(zero_copy_only=False)
            order = np.argsort(o, kind="stable")
            g = g.take(pa.array(order, pa.int64()))
            v = g[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
            csum = np.cumsum(v) + self.offsets[b]
            return g.append_column(out_col, pa.array(csum, pa.int64())).drop_columns(
                ["_rbucket"]
            )

    return tagged.groupby("_rbucket").map_groups(
        CumsumBucket(), batch_format="pyarrow"
    )


def grouped_concat(
    ds,
    *,
    key: str,
    order_by: list[str],
    value_col: str,
    sep: str = ",",
    out_col: str = "concat",
    n_buckets: int = 256,
):
    """Per-key ordered string aggregation (SQL ``string_agg(value, sep
    ORDER BY ...)``) — the sessionized-journey / event-trace feature
    ("view,click,purchase" per user) that sequence models train on.

    Scale shape: same bucketed shuffle as partitioned_analytics (bounded
    group count, no per-key map_groups dispatch); inside a bucket one
    lexsort orders every key-run, then runs are joined per key.  The
    join itself is per-run Python (strings don't vectorize in numpy) but
    output is one row per KEY — the stage shrinks the data.  Determinism
    needs ``order_by`` to be a total order within each key."""

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("_cbucket", hash_bucket(t[key], n_buckets))

    def concat(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_cbucket"])
        schema_out = pa.schema(
            [g.schema.field(key), pa.field(out_col, pa.string())]
        )
        if g.num_rows == 0:
            return schema_out.empty_table()
        order, starts, _ = _sorted_runs(g, key, order_by)
        vals = g[value_col].to_numpy(zero_copy_only=False)[order]
        kvals = g[key].take(pa.array(order[starts], pa.int64()))
        ends = np.concatenate((starts[1:], [g.num_rows]))
        joined = [
            sep.join(vals[s:e]) for s, e in zip(starts.tolist(), ends.tolist())
        ]
        return pa.table(
            {key: kvals, out_col: pa.array(joined, pa.string())},
            schema=schema_out,
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_cbucket")
        .map_groups(concat, batch_format="pyarrow")
    )


def rolling_sum(
    ds,
    *,
    key: str,
    order_by: list[str],
    value_col: str,
    preceding: int,
    out_col: str = "rolling_sum",
    n_buckets: int = 256,
):
    """Per-key ROWS-frame rolling sum (SQL ``SUM(v) OVER (PARTITION BY
    key ORDER BY ... ROWS BETWEEN preceding PRECEDING AND CURRENT
    ROW)``) — the bounded-lookback feature (recent-activity totals,
    rate limits).  Same bucketed shuffle + lexsort shape as
    partitioned_analytics; the frame sum is a cumsum difference, fully
    vectorized.  Integer ``value_col`` only: int64 rolling sums are
    exact and summation-order-independent, so the SQL oracle matches
    bit-for-bit (float frames are not cross-engine comparable)."""

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("_rsb", hash_bucket(t[key], n_buckets))

    def roll(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_rsb"])
        schema_out = g.schema.append(pa.field(out_col, pa.int64()))
        n = g.num_rows
        if n == 0:
            return schema_out.empty_table()
        order, starts, run_id = _sorted_runs(g, key, order_by)
        v = g[value_col].to_numpy(zero_copy_only=False).astype(np.int64)[order]
        csum = np.concatenate(([0], np.cumsum(v)))
        pos = np.arange(n)
        run_start = starts[run_id]
        lo = np.maximum(pos - preceding, run_start)
        out_sorted = csum[pos + 1] - csum[lo]
        out = np.empty(n, np.int64)
        out[order] = out_sorted
        return g.append_column(out_col, pa.array(out, pa.int64()))

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_rsb")
        .map_groups(roll, batch_format="pyarrow")
    )


def rolling_sum_range(
    ds,
    *,
    key: str,
    ts_col: str,
    order_by: list[str],
    value_col: str,
    window: int,
    out_col: str = "trailing_sum",
    n_buckets: int = 256,
):
    """Per-key time-RANGE rolling sum (SQL ``SUM(v) OVER (PARTITION BY
    key ORDER BY ts RANGE BETWEEN <window> PRECEDING AND CURRENT ROW)``)
    — the trailing-window feature (1-hour activity totals, rate
    windows).  Unlike the ROWS frame (:func:`rolling_sum`), the frame
    edge is a TIME offset, and SQL RANGE semantics include all PEER rows
    sharing the current row's timestamp.

    Same bucketed shuffle as partitioned_analytics; inside a bucket the
    frame bounds come from two vectorized searchsorteds over a per-run
    re-based timestamp axis (each key-run's timestamps are shifted onto
    disjoint segments spaced wider than the window, so one global
    searchsorted never bleeds across keys — no per-key Python loop).
    ``ts_col`` must be the first entry of ``order_by``; ``value_col``
    must be integer (exact, order-independent sums)."""

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("_rgb", hash_bucket(t[key], n_buckets))

    def roll(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_rgb"])
        schema_out = g.schema.append(pa.field(out_col, pa.int64()))
        n = g.num_rows
        if n == 0:
            return schema_out.empty_table()
        order, starts, run_id = _sorted_runs(g, key, order_by)
        ts = (
            g[ts_col]
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)[order]
        )
        v = g[value_col].to_numpy(zero_copy_only=False).astype(np.int64)[order]
        run_start = starts[run_id]
        rel = ts - ts[run_start]
        span = int(rel.max()) if n else 0
        n_runs = len(starts)
        seg = span + window + 2
        if n_runs * seg < (1 << 62):
            base = run_id * seg
            axis = rel + base
            lo = np.searchsorted(axis, axis - window, side="left")
            hi = np.searchsorted(axis, axis, side="right")
        else:  # pathological span x run-count: per-run searchsorted
            lo = np.empty(n, np.int64)
            hi = np.empty(n, np.int64)
            ends = np.r_[starts[1:], n]
            for s, e in zip(starts, ends):
                seg_ts = ts[s:e]
                lo[s:e] = s + np.searchsorted(seg_ts, seg_ts - window, "left")
                hi[s:e] = s + np.searchsorted(seg_ts, seg_ts, "right")
        csum = np.concatenate(([0], np.cumsum(v)))
        out_sorted = csum[hi] - csum[lo]
        out = np.empty(n, np.int64)
        out[order] = out_sorted
        return g.append_column(out_col, pa.array(out, pa.int64()))

    roll.__name__ = "roll_range"

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_rgb")
        .map_groups(roll, batch_format="pyarrow")
    )
