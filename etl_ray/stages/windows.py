"""Streaming window operators (SURVEY.md §2.10, target-added).

Event-time windows over a Ray Data Dataset, all expressed as
batch-vectorized transforms + bounded-cardinality shuffles:

* ``tumbling``: fixed-width buckets — pure per-batch floor + groupby.
* ``sliding``: width W, step S — each event lands in W/S windows via a
  per-batch flat-map, then the same bounded groupby.
* ``sessionize``: per-key inactivity-gap sessions — ONE shuffle keyed by
  ``hash(key) % n_buckets`` (bounded group count, never one dispatch per
  key), fully vectorized numpy sessionization inside each bucket.

Reference analogue: none (the reference has no windowing); these are the
operators a web-scale training-data pipeline needs for event streams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum

from .hashutil import hash_bucket

_US_PER_HOUR = 3_600_000_000


def _restore_ts(col: str):
    """Ray's groupby carries timestamp keys at second resolution; restore
    timestamp[us] so results compare exactly with SQL date_trunc."""

    def fix(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.column_names.index(col), col, t.column(col).cast(pa.timestamp("us"))
        )

    return fix


def tumbling(
    ds,
    *,
    ts_col: str,
    width_us: int = _US_PER_HOUR,
    by: list[str] | None = None,
    aggregates: list | None = None,
    value_col: str | None = None,
    out_col: str = "window_start",
):
    """Fixed-width event-time windows; default aggregate = count (+ sum of
    ``value_col`` when given)."""
    by = by or []

    def bucket(t: pa.Table) -> pa.Table:
        start = pc.multiply(
            pc.cast(
                pc.floor(pc.divide(pc.cast(t[ts_col], pa.int64()), pa.scalar(float(width_us)))),
                pa.int64(),
            ),
            pa.scalar(width_us, pa.int64()),
        ).cast(pa.timestamp("us"))
        cols = {out_col: start, **{c: t[c] for c in by}}
        if value_col is not None:
            cols[value_col] = t[value_col]
        return pa.table(cols)

    aggs = aggregates or (
        [Count(alias_name="n_events")]
        + ([Sum(value_col, alias_name=f"sum_{value_col}")] if value_col else [])
    )
    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby([out_col] + by)
        .aggregate(*aggs)
        .map_batches(_restore_ts(out_col), batch_format="pyarrow")
    )


def sliding(
    ds,
    *,
    ts_col: str,
    width_us: int = 2 * _US_PER_HOUR,
    step_us: int = _US_PER_HOUR,
    by: list[str] | None = None,
    value_col: str | None = None,
    out_col: str = "window_start",
):
    """Sliding windows: an event at t belongs to every window starting in
    ``(t - width, t]`` on the step grid — flat-map then bounded groupby."""
    assert width_us % step_us == 0, "width must be a multiple of step"
    n_wins = width_us // step_us
    by = by or []

    def explode(t: pa.Table) -> pa.Table:
        base = pc.multiply(
            pc.cast(
                pc.floor(pc.divide(pc.cast(t[ts_col], pa.int64()), pa.scalar(float(step_us)))),
                pa.int64(),
            ),
            pa.scalar(step_us, pa.int64()),
        )
        parts = []
        for k in range(n_wins):
            start = pc.subtract(base, pa.scalar(k * step_us, pa.int64())).cast(
                pa.timestamp("us")
            )
            cols = {out_col: start, **{c: t[c] for c in by}}
            if value_col is not None:
                cols[value_col] = t[value_col]
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    aggs = [Count(alias_name="n_events")] + (
        [Sum(value_col, alias_name=f"sum_{value_col}")] if value_col else []
    )
    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby([out_col] + by)
        .aggregate(*aggs)
        .map_batches(_restore_ts(out_col), batch_format="pyarrow")
    )


def sessionize(
    ds,
    *,
    key_col: str,
    ts_col: str,
    order_cols: tuple[str, ...] = (),
    gap_us: int = 1_800_000_000,
    n_buckets: int = 256,
):
    """Per-key inactivity-gap sessions.

    Returns Dataset(key, session_start, session_end, n_events).  ONE
    shuffle on ``hash(key) % n_buckets``; inside a bucket: sort by
    (key, ts, *order_cols), session boundary = key change OR gap >
    ``gap_us``, boundary indices give starts/ends/counts — no per-key
    Python dispatch (Ray groupby costs ~100us per distinct group).
    """

    def add_bucket(t: pa.Table) -> pa.Table:
        # hash_bucket handles integer AND string/uuid session keys
        return t.append_column("bucket", hash_bucket(t[key_col], n_buckets))

    def sessions_bucket(g: pa.Table) -> pa.Table:
        sort_keys = [(key_col, "ascending"), (ts_col, "ascending")] + [
            (c, "ascending") for c in order_cols
        ]
        g = g.take(pc.sort_indices(g, sort_keys=sort_keys))
        keys = g.column(key_col).to_numpy(zero_copy_only=False)
        ts = g.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(keys)
        if n == 0:
            return pa.table(
                {
                    key_col: pa.array([], g.schema.field(key_col).type),
                    "session_start": pa.array([], pa.timestamp("us")),
                    "session_end": pa.array([], pa.timestamp("us")),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        new_sess = np.ones(n, bool)
        new_sess[1:] = (keys[1:] != keys[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        starts = np.flatnonzero(new_sess)
        ends = np.append(starts[1:], n) - 1
        return pa.table(
            {
                key_col: pc.take(g.column(key_col), pa.array(starts)),
                "session_start": pa.array(ts[starts], pa.timestamp("us")),
                "session_end": pa.array(ts[ends], pa.timestamp("us")),
                "n_events": pa.array(np.append(starts[1:], n) - starts, pa.int64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sessions_bucket, batch_format="pyarrow")
    )
