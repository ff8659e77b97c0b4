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


def grouped_quantiles(
    ds,
    *,
    key: str,
    value_col: str,
    qs: list[float],
    n_buckets: int = 256,
    out_cols: list[str] | None = None,
):
    """EXACT per-group quantiles (SQL ``quantile_disc`` semantics: the
    value at 0-indexed rank ``ceil(q*n) - 1`` of the group's ascending
    sort) for every group at once — per-group latency/size percentiles
    (p50/p95 per endpoint/user/domain), the grouped generalization of
    ``exact_quantiles``.

    Scale shape (stages/topk.py pattern): groups shuffle by
    ``hash_bucket(key) % n_buckets`` (bounded group count — NEVER one
    map_groups dispatch per distinct key); inside a bucket one lexsort
    orders every group-run and the q-ranks gather vectorized across all
    groups simultaneously.  Output: one row per key, one column per q.

    Use binary-exact q values (k/2^m: 0.25, 0.5, 0.875, ...) when
    cross-engine hash equality matters — ``q*n`` is then float-exact, so
    the selected rank provably matches DuckDB's."""
    import ray as _ray  # noqa: F401  (parity with sibling operators)

    from .hashutil import hash_bucket

    out_cols = out_cols or [f"q{int(q * 1000):03d}" for q in qs]
    if len(out_cols) != len(qs):
        raise ValueError("out_cols must match qs")

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("_qb", hash_bucket(t[key], n_buckets))

    def quant(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_qb"])
        vtype = g.schema.field(value_col).type
        schema_out = pa.schema(
            [g.schema.field(key)] + [pa.field(c, vtype) for c in out_cols]
        )
        if g.num_rows == 0:
            return schema_out.empty_table()
        kv = g[key].to_numpy(zero_copy_only=False)
        vv = g[value_col].to_numpy(zero_copy_only=False)
        _, kcodes = np.unique(kv, return_inverse=True)
        order = np.lexsort((vv, kcodes))
        ksort = kcodes[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(ksort)) + 1))
        ends = np.concatenate((starts[1:], [len(ksort)]))
        lens = ends - starts
        keys_out = g[key].take(pa.array(order[starts], pa.int64()))
        cols = {key: keys_out}
        for q, name in zip(qs, out_cols):
            # quantile_disc rank: ceil(q*n) - 1, computed in float64
            # exactly as SQL does (binary-exact q => provably identical)
            idx = np.ceil(q * lens).astype(np.int64) - 1
            idx = np.clip(idx, 0, lens - 1)
            sel = order[starts + idx]
            cols[name] = g[value_col].take(pa.array(sel, pa.int64()))
        return pa.table(cols, schema=schema_out)

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_qb")
        .map_groups(quant, batch_format="pyarrow")
    )


def exact_quantiles_cont(ds, col: str, qs: list[float]) -> pa.Table:
    """Exact LINEARLY-INTERPOLATED quantiles (SQL ``quantile_cont``
    semantics: position ``q*(n-1)`` with the blend ``(1-frac)*lo +
    frac*hi`` — DuckDB's exact formula, bit-identical for shared
    inputs) —
    the continuous twin of :func:`exact_quantiles`.  Same distributed
    shape: one single-column sort, one metadata split at the (at most
    2*|qs|) needed global positions; only scalars reach the driver.
    Use binary-exact q values for cross-engine bit-equality of frac."""
    import pyarrow.compute as pc

    qs = sorted(qs)
    proj = ds.map_batches(
        lambda t: t.select([col]).filter(pc.is_valid(t.column(col))),
        batch_format="pyarrow",
    )
    n = proj.count()
    if n == 0:
        return pa.table({"q": pa.array(qs, pa.float64()), "value": pa.nulls(len(qs))})
    pos_f = [q * (n - 1) for q in qs]
    need = sorted({p for x in pos_f for p in (math.floor(x), math.ceil(x))})
    need = [min(n - 1, p) for p in need]
    s = proj.sort(col).materialize()
    splits = s.split_at_indices(sorted(set(need)))
    val_at = {}
    for i, p in enumerate(sorted(set(need))):
        row = splits[i + 1].take(1)
        val_at[p] = row[0][col] if row else None
    out = []
    for x in pos_f:
        lo, hi = min(n - 1, math.floor(x)), min(n - 1, math.ceil(x))
        vlo, vhi = float(val_at[lo]), float(val_at[hi])
        frac = x - math.floor(x)
        out.append((1 - frac) * vlo + frac * vhi)
    return pa.table(
        {"q": pa.array(qs, pa.float64()), "value": pa.array(out, pa.float64())}
    )
