"""Grouped top-k: keep the best k rows per group (a training-data
staple — best documents per domain/language, newest k events per user).

Ray Data's ``groupby().map_groups`` dispatches Python once per DISTINCT
group (~100us each, see BASELINE.md) — ruinous at 10^8 groups.  This
operator shuffles on ``hash_bucket(group_col) % n_buckets`` (bounded
group count) and ranks INSIDE each bucket fully vectorized: one
``np.lexsort`` over (group, order keys), run boundaries by diff, and a
position-in-run < k mask.  No per-group Python anywhere.

Determinism: ``order_by`` must be a total order within each group (add a
unique id as the last key) — ties are broken by it, not by arrival
order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashutil import hash_bucket


def grouped_topk(
    ds,
    *,
    group_col: str,
    order_by: list[tuple[str, str]],
    k: int,
    n_buckets: int = 256,
    rank_col: str = "rk",
):
    """Top-k rows per ``group_col`` ordered by ``order_by`` (list of
    (column, "asc"|"desc"); numeric columns only for "desc").  Output =
    input columns + ``rank_col`` (1-based rank within the group)."""

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("_gbucket", hash_bucket(t[group_col], n_buckets))

    def topk(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_gbucket"])
        n = g.num_rows
        schema_out = g.schema.append(pa.field(rank_col, pa.int64()))
        if n == 0:
            return schema_out.empty_table()
        # lexsort: LAST key is primary -> (tiebreak..., primary, group)
        keys = []
        for col, direction in reversed(order_by):
            v = g[col].to_numpy(zero_copy_only=False)
            if direction == "desc":
                v = -v
            keys.append(v)
        grp = g[group_col].to_numpy(zero_copy_only=False)
        # group runs must be contiguous: dense-code group values so they
        # sort cheaply even for strings
        _, gcodes = np.unique(grp, return_inverse=True)
        order = np.lexsort(tuple(keys) + (gcodes,))
        gsorted = gcodes[order]
        boundary = np.flatnonzero(np.diff(gsorted)) + 1
        starts = np.concatenate(([0], boundary))
        run_id = np.zeros(n, np.int64)
        run_id[starts[1:]] = 1
        run_id = np.cumsum(run_id)
        pos = np.arange(n, dtype=np.int64) - starts[run_id]
        keep = pos < k
        take = order[keep]
        out = g.take(pa.array(take, pa.int64()))
        return out.append_column(rank_col, pa.array(pos[keep] + 1, pa.int64()))

    topk.__name__ = "grouped_topk"
    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_gbucket")
        .map_groups(topk, batch_format="pyarrow")
    )
