"""Column-level partial-image upserts (coalesce merge).

Real CDC feeds often ship PARTIAL update images: only the changed
columns are non-null, null means "unchanged".  Whole-row LWW would
wipe the untouched columns; the coalesce merge instead takes, per key
and per column, the value of the latest event (by ``(ts, lsn)``) that
set that column — after the key's last delete (a delete resets
history, so a deleted row's old attributes cannot resurrect through
coalesce).  Reference analogue: per-row ``ALTER TABLE ... UPDATE``
setting only selected columns (`src/pipeline/core/spark.py:160-176` in
/root/reference), restated as an associative distributed fold.

Representation: every event becomes a STATE ROW carrying, per payload
column, its own ``(_cts__{col}, _clsn__{col})`` position (UNSET = -1
when the event did not set the column), plus row-level positions of
the latest upsert (``_up_ts/_up_lsn``) and latest delete
(``_del_ts/_del_lsn``).  ``fold_states`` is closed over this shape and
ASSOCIATIVE + COMMUTATIVE, so the same kernel runs as the per-batch
combiner, the salted pre-reduce and the per-partition merge — exactly
the pre-aggregation structure the whole-row path gets from
``lww_compact``.  Stored part files persist the state rows; readers
project the payload schema, so the metadata is invisible outside the
merge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

UNSET = -1  # meta sentinel: real event times are epoch-us > 0, lsns > 0

#: row-level state metadata (beyond merge.INTERNAL_COLS)
STATE_META = ("_up_ts", "_up_lsn", "_del_ts", "_del_lsn")


def payload_columns(schema: pa.Schema, key: str, ts_col: str) -> list[str]:
    """Coalesced payload columns: everything in the lake schema except
    the key and the ordering column (those are row-level)."""
    return [f.name for f in schema if f.name not in (key, ts_col)]


def col_meta_names(c: str) -> tuple[str, str]:
    return f"_cts__{c}", f"_clsn__{c}"


def _ts_int(arr) -> np.ndarray:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_timestamp(arr.type):
        arr = arr.cast(pa.int64())
    return arr.to_numpy(zero_copy_only=False)


def to_state(
    events: pa.Table, key: str, ts_col: str, payload_cols: list[str]
) -> pa.Table:
    """Convert raw WAL events (key, ts_col, lsn, op, payload...) into
    state rows.  Vectorized; delete rows contribute only their delete
    position."""
    events = events.combine_chunks()  # sliced/chunked inputs break
    # downstream pa.table() construction (offset-out-of-bounds)
    n = events.num_rows
    is_del = pc.fill_null(
        pc.equal(events.column("op"), pa.scalar("delete")), False
    )
    d = is_del.to_numpy(zero_copy_only=False)
    ts = _ts_int(events.column(ts_col))
    lsn = events.column("lsn").cast(pa.int64()).to_numpy(zero_copy_only=False)
    unset = np.full(n, UNSET, np.int64)
    cols: dict = {
        key: events.column(key),
        ts_col: events.column(ts_col),
        "_up_ts": pa.array(np.where(d, unset, ts), pa.int64()),
        "_up_lsn": pa.array(np.where(d, unset, lsn), pa.int64()),
        "_del_ts": pa.array(np.where(d, ts, unset), pa.int64()),
        "_del_lsn": pa.array(np.where(d, lsn, unset), pa.int64()),
        "lsn": events.column("lsn").cast(pa.int64()),
    }
    for c in payload_cols:
        if c in events.column_names:
            col = events.column(c)
            set_mask = pc.and_(pc.is_valid(col), pc.invert(is_del))
            sm = set_mask.to_numpy(zero_copy_only=False)
            # null-out unset positions via a null-masked take (NOT
            # pc.if_else: on sliced string inputs it emits arrays with
            # out-of-bounds binary offsets in pyarrow 17-21)
            cols[c] = col.take(
                pa.array(np.arange(n, dtype=np.int64), mask=~sm)
            )
        else:  # schema-evolved column the segment doesn't carry
            cols[c] = pa.nulls(n, pa.null())
            sm = np.zeros(n, bool)
        cts, clsn = col_meta_names(c)
        cols[cts] = pa.array(np.where(sm, ts, unset), pa.int64())
        cols[clsn] = pa.array(np.where(sm, lsn, unset), pa.int64())
    return pa.table(cols)


def _argmax_per_key(codes: np.ndarray, ts: np.ndarray, lsn: np.ndarray):
    """Per unique code (ascending), the row index with max (ts, lsn)."""
    order = np.lexsort((lsn, ts, codes))
    oc = codes[order]
    return order[np.concatenate((np.diff(oc) != 0, [True]))]


def fold_states(
    states: pa.Table, key: str, ts_col: str, payload_cols: list[str]
) -> pa.Table:
    """Reduce state rows to one row per key (associative + commutative).

    Output rows carry ``_deleted`` (tombstone flag) and ``_lsn`` (max
    lsn seen) like the whole-row path, so lineage/compaction logic is
    shared.  A column's value is invalidated when its position is at or
    before the key's winning delete position (the delete-resets rule).
    """
    if states.num_rows == 0:
        return states
    codes = (
        pc.dictionary_encode(states.column(key).combine_chunks())
        .indices.to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    up_ts = _ts_int(states.column("_up_ts"))
    up_lsn = _ts_int(states.column("_up_lsn"))
    del_ts = _ts_int(states.column("_del_ts"))
    del_lsn = _ts_int(states.column("_del_lsn"))

    up_i = _argmax_per_key(codes, up_ts, up_lsn)
    del_i = _argmax_per_key(codes, del_ts, del_lsn)
    w_up_ts, w_up_lsn = up_ts[up_i], up_lsn[up_i]
    w_del_ts, w_del_lsn = del_ts[del_i], del_lsn[del_i]
    alive = (w_up_ts > w_del_ts) | (
        (w_up_ts == w_del_ts) & (w_up_lsn > w_del_lsn)
    )
    lsn_np = states.column("lsn").to_numpy(zero_copy_only=False)
    max_lsn_i = _argmax_per_key(codes, lsn_np, lsn_np)

    out: dict = {
        key: states.column(key).take(pa.array(up_i)),
        ts_col: pa.array(
            np.where(alive, w_up_ts, w_del_ts), pa.int64()
        ).cast(states.schema.field(ts_col).type),
        "_up_ts": pa.array(w_up_ts, pa.int64()),
        "_up_lsn": pa.array(w_up_lsn, pa.int64()),
        "_del_ts": pa.array(w_del_ts, pa.int64()),
        "_del_lsn": pa.array(w_del_lsn, pa.int64()),
        "lsn": pa.array(lsn_np[max_lsn_i], pa.int64()),
    }
    for c in payload_cols:
        cts_n, clsn_n = col_meta_names(c)
        cts = _ts_int(states.column(cts_n))
        clsn = _ts_int(states.column(clsn_n))
        wi = _argmax_per_key(codes, cts, clsn)
        wts, wlsn = cts[wi], clsn[wi]
        # invalidate at-or-before the winning delete position
        dead = (wts < w_del_ts) | ((wts == w_del_ts) & (wlsn <= w_del_lsn))
        col = states.column(c)
        if pa.types.is_null(col.type):
            val = pa.nulls(len(wi), pa.null())
        else:
            # null-masked take: winner value, nulled where the delete
            # position invalidates it (see to_state for why not if_else)
            val = col.take(pa.array(wi, mask=dead))
        out[c] = val
        out[cts_n] = pa.array(np.where(dead, UNSET, wts), pa.int64())
        out[clsn_n] = pa.array(np.where(dead, UNSET, wlsn), pa.int64())
    return pa.table(out)


def finalize_states(
    folded: pa.Table, key: str, ts_col: str, payload_cols: list[str]
) -> pa.Table:
    """Attach the whole-row internal columns (_lsn, _deleted) a stored
    part file carries, in payload-schema column order."""
    up_ts = _ts_int(folded.column("_up_ts"))
    up_lsn = _ts_int(folded.column("_up_lsn"))
    del_ts = _ts_int(folded.column("_del_ts"))
    del_lsn = _ts_int(folded.column("_del_lsn"))
    alive = (up_ts > del_ts) | ((up_ts == del_ts) & (up_lsn > del_lsn))
    cols = {key: folded.column(key), ts_col: folded.column(ts_col)}
    for c in payload_cols:
        cols[c] = folded.column(c)
        for m in col_meta_names(c):
            cols[m] = folded.column(m)
    for m in STATE_META:
        cols[m] = folded.column(m)
    cols["_lsn"] = folded.column("lsn")
    cols["_deleted"] = pa.array(~alive)
    return pa.table(cols)


def conform_state(
    tbl: pa.Table, key: str, ts_col: str, payload_cols: list[str]
) -> pa.Table:
    """Align a STORED state file to the current payload schema as fold
    input: synthesize metadata for files written without it (bootstrap
    base loads and whole-row-era files treat the stored row as one
    event at ``(ts_col, _lsn)``), null+UNSET-fill columns added by
    schema evolution, and restore the ``lsn`` transport column."""
    n = tbl.num_rows
    ts = _ts_int(tbl.column(ts_col))
    lsn = (
        _ts_int(tbl.column("_lsn"))
        if "_lsn" in tbl.column_names
        else np.zeros(n, np.int64)
    )
    deleted = (
        tbl.column("_deleted").to_numpy(zero_copy_only=False)
        if "_deleted" in tbl.column_names
        else np.zeros(n, bool)
    )
    unset = np.full(n, UNSET, np.int64)
    cols: dict = {key: tbl.column(key), ts_col: tbl.column(ts_col)}
    have_meta = "_up_ts" in tbl.column_names
    if have_meta:
        for m in STATE_META:
            cols[m] = tbl.column(m)
        cols["lsn"] = tbl.column("_lsn").cast(pa.int64())
    else:
        cols["_up_ts"] = pa.array(np.where(deleted, unset, ts), pa.int64())
        cols["_up_lsn"] = pa.array(np.where(deleted, unset, lsn), pa.int64())
        cols["_del_ts"] = pa.array(np.where(deleted, ts, unset), pa.int64())
        cols["_del_lsn"] = pa.array(np.where(deleted, lsn, unset), pa.int64())
        cols["lsn"] = pa.array(lsn, pa.int64())
    for c in payload_cols:
        cts_n, clsn_n = col_meta_names(c)
        if c in tbl.column_names:
            col = tbl.column(c)
            cols[c] = col
            if have_meta and cts_n in tbl.column_names:
                cols[cts_n] = tbl.column(cts_n)
                cols[clsn_n] = tbl.column(clsn_n)
            else:
                sm = pc.is_valid(col).to_numpy(zero_copy_only=False) & ~deleted
                cols[cts_n] = pa.array(np.where(sm, ts, unset), pa.int64())
                cols[clsn_n] = pa.array(np.where(sm, lsn, unset), pa.int64())
        else:
            cols[c] = pa.nulls(n, pa.null())
            cols[cts_n] = pa.array(unset, pa.int64())
            cols[clsn_n] = pa.array(unset, pa.int64())
    return pa.table(cols)


def align_state_schemas(tables: list[pa.Table]) -> list[pa.Table]:
    """Unify value-column types across fold inputs (a null-typed column
    from a pre-evolution segment unifies with the typed one)."""
    target: dict[str, pa.DataType] = {}
    for t in tables:
        for f in t.schema:
            cur = target.get(f.name)
            if cur is None or pa.types.is_null(cur):
                target[f.name] = f.type
    out = []
    for t in tables:
        cols = []
        for name, typ in target.items():
            col = t.column(name)
            if col.type != typ:
                col = pa.nulls(t.num_rows, typ) if pa.types.is_null(col.type) else col.cast(typ)
            cols.append((name, col))
        out.append(pa.table(dict(cols)))
    return out
