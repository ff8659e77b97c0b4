"""Distributed exact quantiles over a Dataset column.

Target-added operator (reference has only storage-side ORDER BY; no
quantile surface).  Shape: Ray's distributed sample-partition ``sort``
(the honest cost of *exact* quantiles — one all-to-all of the single
projected column), then ``split_at_indices`` at the precomputed global
row positions — a metadata-only split on the sorted, materialized
column — and one ``take(1)`` per boundary.  Only the q requested scalar
values ever reach the driver; the column itself stays sharded.

Position convention: quantile q selects the value at 0-indexed global
position ``floor(q * (n - 1))`` of the ascending sort ("lower"
interpolation) — chosen because it is exactly expressible as a SQL
``row_number()`` predicate, making the operator oracle-checkable.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def exact_quantiles(ds, col: str, qs: list[float]) -> pa.Table:
    """Exact (not approximate) quantile values of ``ds[col]``.

    Returns a small Arrow table (q, value), one row per requested
    quantile, ascending by q.  Nulls in ``col`` are excluded (SQL
    ORDER BY semantics would sort them last; exclusion matches
    aggregate-function semantics instead).
    """
    import pyarrow.compute as pc

    qs = sorted(qs)
    proj = ds.map_batches(
        lambda t: t.select([col]).filter(pc.is_valid(t.column(col))),
        batch_format="pyarrow",
    )
    n = proj.count()
    if n == 0:
        return pa.table({"q": pa.array(qs, pa.float64()), "value": pa.nulls(len(qs))})
    pos = [min(n - 1, math.floor(q * (n - 1))) for q in qs]
    uniq = sorted(set(pos))
    s = proj.sort(col).materialize()
    splits = s.split_at_indices(uniq)
    val_at = {}
    for i, p in enumerate(uniq):
        row = splits[i + 1].take(1)
        val_at[p] = row[0][col] if row else None
    return pa.table(
        {
            "q": pa.array(qs, pa.float64()),
            "value": pa.array([val_at[p] for p in pos]),
        }
    )
