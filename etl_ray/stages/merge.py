"""LWW compact + per-partition merge — the upsert core.

Reference analogue: the chains upsert `src/pipeline/core/spark.py:134-177`
in /root/reference — split new vs existing keys (anti/semi join against
collected driver-side key list, `:135-140`), JDBC-append new rows,
per-row ``ALTER TABLE ... UPDATE`` for existing.  Here it is restated per
partition: each merge task owns one ``pid``, lazily reads ONLY that
partition's current file (disk-backed state — never collect keys to the
driver, SURVEY.md §2.4 T5), reduces base ∪ changes under
last-writer-wins ``(warc_ts, lsn)``, and writes one staged file.

Deletes are retained as tombstones (``_deleted=true``) so a later
transaction replaying older (late) events cannot resurrect a deleted
row — required for incremental replay to equal the oracle's one-shot
max-by over all events.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..extract import extract_text
from .hashutil import hash64, mix64

# internal columns persisted in part files, never served to readers
INTERNAL_COLS = ("_lsn", "_deleted")


def lww_compact(
    tbl: pa.Table,
    key: str = "url",
    order_by: tuple[str, ...] = ("warc_ts", "lsn"),
) -> pa.Table:
    """Keep, per key, the single row with max ``order_by`` — vectorized.

    Associative & commutative, so it is safe as a per-batch combiner, a
    salted pre-reduce, and the final per-partition reduce (SURVEY.md A4).

    One ``take`` of winner rows (argmax via dictionary-encode + lexsort +
    group tails): the wide payload columns (html/text) are copied exactly
    once, vs twice for the previous sort-take + hash-aggregate("last")
    form.  Schema and column order pass through unchanged.
    """
    if tbl.num_rows == 0:
        return tbl
    if "_dlq_reason" in tbl.column_names:
        # quarantined rows (null key / null ts) must never participate in
        # the key reduce — pass them through untouched (stages/validate.py)
        mask = pc.is_valid(tbl.column("_dlq_reason"))
        if pc.any(mask).as_py():
            good = lww_compact(
                tbl.filter(pc.invert(mask)), key, order_by=order_by
            )
            return pa.concat_tables([good, tbl.filter(mask)])
    codes = (
        pc.dictionary_encode(tbl.column(key).combine_chunks())
        .indices.to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    sort_keys = []
    for c in reversed(order_by):  # np.lexsort: LAST key is primary
        arr = tbl.column(c).combine_chunks()
        if pa.types.is_timestamp(arr.type):
            arr = arr.cast(pa.int64())
        sort_keys.append(arr.to_numpy(zero_copy_only=False))
    order = np.lexsort(tuple(sort_keys) + (codes,))
    oc = codes[order]
    tails = order[np.concatenate((np.diff(oc) != 0, [True]))]
    return tbl.take(pa.array(np.sort(tails)))


def _checksum(key_col: pa.Array | pa.ChunkedArray, ts_us: np.ndarray, lsn: np.ndarray) -> int:
    """Order-insensitive per-partition content checksum (lineage).

    Vectorized (round-2 verdict item 3): per-row mix64 of (key hash,
    warc_ts, lsn), summed mod 2^64 — this runs on every live row of
    every rewritten partition inside the flagship replay, so no per-row
    Python is allowed here.  ``hash64`` handles string or integer keys.
    """
    row = mix64(
        hash64(key_col) * np.uint64(0xC2B2AE3D27D4EB4F)
        + ts_us.astype(np.int64).view(np.uint64) * np.uint64(0x165667B19E3779F9)
        + lsn.astype(np.int64).view(np.uint64)
    )
    return int(row.sum(dtype=np.uint64))


def load_partition_state(
    lake_root: str,
    meta: dict,
    schema: pa.Schema | None = None,
    key: str = "url",
    ts_col: str = "warc_ts",
    key_in: list | None = None,
    columns: list[str] | None = None,
    renames: list | None = None,
    drops: list | None = None,
    fs=None,
) -> pa.Table:
    """Materialize one partition's stored state: base file ∪ merge-on-read
    delta chain, reduced under LWW ``(ts_col, _lsn)``.  The fast path (no
    deltas) is a plain file read — base files hold unique keys already.
    ``schema`` (the CURRENT payload schema) null-backfills files written
    under older schema versions.

    ``key_in`` pushes an equality-set filter into every file read: part
    files are written sorted by key, so parquet row-group statistics
    prune non-matching row groups at the I/O layer — a point lookup
    reads O(matching row groups), not the partition (the serving-path
    scale lever for ``replay.get_rows``).  Exact for LWW: an equality
    filter retains every stored version of a requested key.

    ``columns`` prunes the file reads to the requested payload columns
    plus what the LWW reduce itself needs (key, ts, internals); columns
    a pre-evolution file doesn't carry are skipped at read and
    null-backfilled by ``conform_stored``."""
    from ..state.fs import resolve
    from ..state.manifest import partition_file_list
    from ..state.schema_registry import apply_renames, storage_aliases

    adapter = fs if (fs is not None and not isinstance(fs, str)) else resolve(fs)
    pafs = adapter.pyarrow_fs
    files = partition_file_list(meta)
    filters = [(key, "in", key_in)] if key_in is not None else None
    need = None
    if columns is not None:
        need = list(dict.fromkeys([*columns, key, ts_col, *INTERNAL_COLS]))
        if schema is not None:
            schema = pa.schema([f for f in schema if f.name in set(need)])
        if renames:
            # pre-rename files store CURRENT columns under historical
            # names — project by every alias so the data is not silently
            # dropped and null-backfilled
            need = list(
                dict.fromkeys(
                    a for c in need for a in storage_aliases(c, renames)
                )
            )
    # coalesce (partial-image) tables are SELF-DESCRIBING: their state
    # files carry per-column position metadata (_up_ts etc,
    # stages/coalesce.py); base ∪ chain then reduces under the coalesce
    # fold, not whole-row LWW
    coalesce_files = any(
        "_up_ts" in pq.read_schema(os.path.join(lake_root, rel), filesystem=pafs).names
        for rel in files
    )
    if coalesce_files:
        if renames or drops:
            raise NotImplementedError(
                "rename_column/drop_column are not supported on coalesce "
                "(partial-image) tables: their per-column state metadata "
                "(_cts__/_clsn__) is name-keyed inside the files"
            )
        return _load_coalesce_chain(
            lake_root, files, schema, key, ts_col, pafs, filters
        )
    tables = []
    for rel in files:
        path = os.path.join(lake_root, rel)
        cols = None
        if need is not None:
            present = set(pq.read_schema(path, filesystem=pafs).names)
            cols = [c for c in need if c in present]
        t = pq.read_table(path, filters=filters, columns=cols, filesystem=pafs)
        if renames:
            t = apply_renames(t, renames)
        if drops:
            # metadata-only column drops: pre-drop files still carry the
            # data physically; it must never reach a reader (`conform`
            # drops it when a schema is given — this covers schema=None
            # callers such as compact-deltas folds and backfills)
            t = t.drop_columns([c for c in drops if c in t.column_names])
        if schema is not None:
            t = conform_stored(t, schema)
        tables.append(t)
    if not tables:
        base = schema if schema is not None else pa.schema([])
        return base.empty_table()
    if len(tables) == 1:
        return tables[0]
    merged = pa.concat_tables(tables, promote_options="default")
    return lww_compact(merged, key, order_by=(ts_col, "_lsn"))


def _load_coalesce_chain(
    lake_root: str,
    files: list[str],
    schema: pa.Schema | None,
    key: str,
    ts_col: str,
    pafs,
    filters,
) -> pa.Table:
    """base ∪ delta chain of a coalesce table, reduced under the
    coalesce fold; returns finalized state rows (payload + per-column
    metadata + _lsn/_deleted) so fold-back maintenance can persist them
    unchanged.  Column pruning is NOT applied here (the fold needs every
    column's metadata); readers project afterwards."""
    from .coalesce import (
        STATE_META,
        conform_state,
        finalize_states,
        fold_states,
        payload_columns,
    )

    if schema is None:
        # derive the payload schema from the files (fold-back maintenance
        # passes schema=None): union of value columns across the chain,
        # first typed occurrence wins
        fields: dict[str, pa.Field] = {}
        for rel in files:
            for f in pq.read_schema(
                os.path.join(lake_root, rel), filesystem=pafs
            ):
                if (
                    f.name in INTERNAL_COLS
                    or f.name in STATE_META
                    or f.name.startswith(("_cts__", "_clsn__"))
                ):
                    continue
                cur = fields.get(f.name)
                if cur is None or pa.types.is_null(cur.type):
                    fields[f.name] = f
        schema = pa.schema(list(fields.values()))
    payload_schema = pa.schema(
        [f for f in schema if f.name not in INTERNAL_COLS]
    )
    pcols = payload_columns(payload_schema, key, ts_col)
    tables = [
        conform_state(
            pq.read_table(
                os.path.join(lake_root, rel), filters=filters, filesystem=pafs
            ),
            key,
            ts_col,
            pcols,
        )
        for rel in files
    ]
    states = (
        pa.concat_tables(tables, promote_options="default")
        if len(tables) > 1
        else tables[0]
    )
    folded = fold_states(states, key, ts_col, pcols)
    return finalize_states(folded, key, ts_col, pcols)


def conform_stored(cur: pa.Table, schema: pa.Schema) -> pa.Table:
    """Null-backfill a stored file written under an older schema version
    (additive evolution), preserving — or synthesizing, for pre-engine
    files — the internal ``_lsn``/``_deleted`` columns."""
    from ..state.schema_registry import conform

    internals = [c for c in INTERNAL_COLS if c in cur.column_names]
    kept = {c: cur.column(c) for c in internals}
    body = conform(cur.drop_columns(internals), schema)
    for c in INTERNAL_COLS:
        if c in kept:
            body = body.append_column(c, kept[c])
        elif c == "_lsn":
            # pre-engine rows rank below any WAL event at equal ts
            body = body.append_column(
                c, pa.array(np.zeros(body.num_rows, dtype=np.int64))
            )
        elif c == "_deleted":
            body = body.append_column(
                c, pa.array(np.zeros(body.num_rows, dtype=bool))
            )
    return body


class MergePartition:
    """map_groups callable: one invocation merges one pid group.

    Stateless w.r.t. Ray retries: writes a deterministic staging path
    (retry overwrites, never double-appends) and returns a lineage row.
    The commit (manifest swap) happens on the driver afterwards.

    ``delta=True`` is the merge-on-read write path: the task never reads
    the partition's current state — it compacts ONLY this transaction's
    change rows and stages them as a delta file that the commit appends
    to the partition's chain (manifest.commit(delta=True)).  Readers and
    later rewrite merges reduce base ∪ chain under the same LWW order,
    so the final table state is identical to rewrite mode; what changes
    is the cost shape — O(changes) write amplification per transaction
    instead of O(partition), at the price of chain-length read
    amplification until ``maintenance.compact_deltas`` folds it.
    """

    def __init__(
        self,
        lake_root: str,
        txid: str,
        target_schema: pa.Schema,
        partitions: dict[str, dict],
        key: str = "url",
        ts_col: str = "warc_ts",
        derive_text: bool = True,
        delta: bool = False,
        coalesce: bool = False,
        fs_spec: str = "local-os",
        renames: list | None = None,
    ):
        self.__name__ = "MergeDelta" if delta else (
            "MergeCoalesce" if coalesce else "MergePartition"
        )
        self.lake_root = lake_root
        self.txid = txid
        self.schema = target_schema
        self.partitions = partitions  # manifest snapshot: pid -> {file,...}
        self.key = key
        self.ts_col = ts_col
        self.derive_text = derive_text
        self.delta = delta
        self.coalesce = coalesce
        self.fs_spec = fs_spec  # adapter reconstructed worker-side
        self.renames = list(renames or [])
        self._fs = None

    @property
    def fs(self):
        if self._fs is None:
            from ..state.fs import resolve

            self._fs = resolve(self.fs_spec)
        return self._fs

    def __call__(self, group: pa.Table) -> pa.Table:
        from ..state.schema_registry import conform

        pid = int(group.column("pid")[0].as_py())
        changes = group.drop_columns(
            [c for c in ("pid", "salt") if c in group.column_names]
        )
        # quarantine split FIRST: malformed rows (null key/ts, bad op) are
        # staged to the partition's DLQ file and excluded from the merge
        from .validate import split_dlq

        changes, dlq = split_dlq(changes)
        dlq_rows = 0
        if dlq is not None:
            if self.coalesce:
                # quarantined rows ride the state-row shuffle with unset
                # per-column metadata — drop it from the staged DLQ file
                from .coalesce import STATE_META

                dlq = dlq.drop_columns(
                    [
                        c
                        for c in dlq.column_names
                        if c in STATE_META
                        or c.startswith(("_cts__", "_clsn__"))
                    ]
                )
            dlq = dlq.rename_columns(
                [
                    "reason" if c == "_dlq_reason" else c
                    for c in dlq.column_names
                ]
            )
            dlq_path = os.path.join(
                self.lake_root, "staging", self.txid, f"dlq-{pid:05d}.parquet"
            )
            self.fs.makedirs(os.path.dirname(dlq_path))
            pq.write_table(dlq, dlq_path, filesystem=self.fs.pyarrow_fs)
            # deterministic path: retry-safe
            dlq_rows = dlq.num_rows
        if self.coalesce:
            if self.renames:
                raise NotImplementedError(
                    "rename_column is not supported on coalesce tables"
                )
            return self._merge_coalesce(pid, changes, dlq_rows)
        if self.renames:
            # WAL payloads may still carry source-era (pre-rename) names;
            # normalize BEFORE conform or the data would be dropped and
            # null-backfilled under the new name
            from ..state.schema_registry import apply_renames

            changes = apply_renames(changes, self.renames)
        changes = lww_compact(changes, self.key, order_by=(self.ts_col, "lsn"))

        ops = changes.column("op")
        deleted = pc.equal(ops, pa.scalar("delete"))
        # text is NOT extracted here: conform null-fills the column, and
        # extraction runs post-merge on FINAL winners only — a change row
        # that loses to the stored row (or to a later change) never pays
        # the extraction cost (ds.stats: extraction dominates merge CPU)
        body = conform(changes, self.schema)  # fills text/lang with nulls if absent
        body = body.append_column("_lsn", changes.column("lsn").cast(pa.int64()))
        body = body.append_column("_deleted", deleted)

        # lazily read current partition state (disk-backed per-partition
        # index): base file ∪ any merge-on-read delta chain, pre-reduced.
        # Delta mode skips this read entirely — the tx's compacted changes
        # ARE the staged output.
        cur_meta = None if self.delta else self.partitions.get(str(pid))
        if cur_meta is not None:
            cur = load_partition_state(
                self.lake_root, cur_meta, self.schema, self.key, self.ts_col,
                renames=self.renames, fs=self.fs,
            )
            merged = pa.concat_tables([cur, body], promote_options="default")
        else:
            merged = body

        # final exact reduce: max (ts_col, _lsn) per key over base ∪ changes
        merged = self._lww_stored(merged)

        # derive-columns may themselves have been renamed — resolve their
        # CURRENT names through the chain before probing
        from ..state.schema_registry import current_name

        html_col = current_name("html", self.renames)
        text_col = current_name("text", self.renames)
        if self.derive_text and html_col in merged.column_names and text_col in merged.column_names:
            # extract for surviving change rows only (text still null,
            # not deleted); stored rows already carry their text
            txt = merged.column(text_col)
            need = pc.and_(pc.invert(merged.column("_deleted")), pc.is_null(txt))
            need_np = need.to_numpy(zero_copy_only=False)
            if need_np.any():
                idxs = np.flatnonzero(need_np)
                htmls = pc.take(merged.column(html_col), pa.array(idxs)).to_pylist()
                vals = txt.to_pylist()
                for i, h in zip(idxs.tolist(), htmls):
                    vals[i] = extract_text(h)
                merged = merged.set_column(
                    merged.column_names.index(text_col), text_col,
                    pa.array(vals, pa.string()),
                )

        out_path = os.path.join(
            self.lake_root, "staging", self.txid, f"part-{pid:05d}.parquet"
        )
        self.fs.makedirs(os.path.dirname(out_path))
        # store sorted by key for mergeable reads (reference keeps MergeTree
        # ORDER BY, src/pipeline/sql/create_tables.sql:20)
        merged = merged.take(pc.sort_indices(merged, sort_keys=[(self.key, "ascending")]))
        # bounded row groups: key-sorted files + row-group stats are the
        # point-lookup pruning unit (load_partition_state key_in) — the
        # pyarrow default of 1Mi rows would make each file one unprunable
        # group at scale.  No effect below 128k rows per partition.
        pq.write_table(
            merged, out_path, row_group_size=1 << 17,
            filesystem=self.fs.pyarrow_fs,
        )

        live = merged.filter(pc.invert(merged.column("_deleted")))
        lsn_np = merged.column("_lsn").to_numpy(zero_copy_only=False)
        ck = _checksum(
            live.column(self.key),
            live.column(self.ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False),
            live.column("_lsn").to_numpy(zero_copy_only=False),
        )
        ev_lsn = changes.column("lsn").to_numpy(zero_copy_only=False)
        from ..state.partstats import stats_json

        return pa.table(
            {
                "pid": pa.array([pid], pa.int32()),
                "rows": pa.array([live.num_rows], pa.int64()),
                "tombstones": pa.array([merged.num_rows - live.num_rows], pa.int64()),
                "checksum": pa.array([ck], pa.uint64()),
                "lsn_hi": pa.array([int(lsn_np.max()) if len(lsn_np) else 0], pa.int64()),
                "events_applied": pa.array([int(len(ev_lsn))], pa.int64()),
                "lsn_lo_applied": pa.array([int(ev_lsn.min()) if len(ev_lsn) else 0], pa.int64()),
                "lsn_hi_applied": pa.array([int(ev_lsn.max()) if len(ev_lsn) else 0], pa.int64()),
                "dlq_rows": pa.array([dlq_rows], pa.int64()),
                "stats_json": pa.array([stats_json(live)], pa.string()),
            }
        )

    # -- helpers ----------------------------------------------------------

    def _lww_stored(self, tbl: pa.Table) -> pa.Table:
        return lww_compact(tbl, self.key, order_by=(self.ts_col, "_lsn"))

    # -- column-level partial-image merge (stages/coalesce.py) ------------

    def _align_state(self, state: pa.Table, pcols: list[str]) -> pa.Table:
        """Project state rows to the target payload schema's columns and
        types (null+UNSET-fill columns the rows never saw — additive
        schema evolution)."""
        from .coalesce import STATE_META, UNSET, col_meta_names

        n = state.num_rows
        cols: dict = {
            self.key: state.column(self.key).cast(
                self.schema.field(self.key).type
            ),
            self.ts_col: state.column(self.ts_col).cast(
                self.schema.field(self.ts_col).type
            ),
        }
        for m in STATE_META:
            cols[m] = state.column(m)
        cols["lsn"] = state.column("lsn")
        unset = pa.array(np.full(n, UNSET, np.int64), pa.int64())
        for c in pcols:
            typ = self.schema.field(c).type
            cts, clsn = col_meta_names(c)
            if c in state.column_names and not pa.types.is_null(
                state.column(c).type
            ):
                cols[c] = state.column(c).cast(typ)
            else:
                cols[c] = pa.nulls(n, typ)
            if cts in state.column_names:
                cols[cts] = state.column(cts)
                cols[clsn] = state.column(clsn)
            else:
                cols[cts] = unset
                cols[clsn] = unset
        return pa.table(cols)

    def _merge_coalesce(
        self, pid: int, changes: pa.Table, dlq_rows: int
    ) -> pa.Table:
        """Per-partition coalesce merge: fold incoming state rows with the
        stored state (same associative kernel as the combiner), stage the
        folded state file, return the lineage row."""
        from ..state.schema_registry import conform  # noqa: F401 (parity)
        from .coalesce import conform_state, finalize_states, fold_states, payload_columns

        pcols = payload_columns(self.schema, self.key, self.ts_col)
        ch = changes.drop_columns(
            [c for c in ("op",) if c in changes.column_names]
        )
        inputs = []
        if ch.num_rows:
            inputs.append(self._align_state(ch, pcols))
        # delta mode: stage only this tx's folded state rows (O(changes)
        # write amplification); readers fold base ∪ chain (the coalesce
        # fold is associative, so chain order is irrelevant)
        cur_meta = None if self.delta else self.partitions.get(str(pid))
        if cur_meta is not None:
            from ..state.manifest import partition_file_list

            for rel in partition_file_list(cur_meta):
                cur = pq.read_table(
                    os.path.join(self.lake_root, rel),
                    filesystem=self.fs.pyarrow_fs,
                )
                cur = conform_state(cur, self.key, self.ts_col, pcols)
                inputs.append(self._align_state(cur, pcols))
        if not inputs:
            # every row of this group quarantined, no stored state: stage
            # an empty state file (uniform lineage accounting)
            from .coalesce import STATE_META

            cols = {
                self.key: pa.array([], self.schema.field(self.key).type),
                self.ts_col: pa.array([], self.schema.field(self.ts_col).type),
            }
            for m in STATE_META:
                cols[m] = pa.array([], pa.int64())
            cols["lsn"] = pa.array([], pa.int64())
            inputs.append(self._align_state(pa.table(cols), pcols))
        states = (
            pa.concat_tables(inputs) if len(inputs) > 1 else inputs[0]
        )
        folded = fold_states(states, self.key, self.ts_col, pcols)
        merged = finalize_states(folded, self.key, self.ts_col, pcols)

        out_path = os.path.join(
            self.lake_root, "staging", self.txid, f"part-{pid:05d}.parquet"
        )
        self.fs.makedirs(os.path.dirname(out_path))
        merged = merged.take(
            pc.sort_indices(merged, sort_keys=[(self.key, "ascending")])
        )
        pq.write_table(
            merged, out_path, row_group_size=1 << 17,
            filesystem=self.fs.pyarrow_fs,
        )

        live = merged.filter(pc.invert(merged.column("_deleted")))
        lsn_np = merged.column("_lsn").to_numpy(zero_copy_only=False)
        ck = _checksum(
            live.column(self.key),
            live.column(self.ts_col).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            ),
            live.column("_lsn").to_numpy(zero_copy_only=False),
        )
        ev_lsn = changes.column("lsn").to_numpy(zero_copy_only=False)
        from ..state.partstats import stats_json

        return pa.table(
            {
                "pid": pa.array([pid], pa.int32()),
                "rows": pa.array([live.num_rows], pa.int64()),
                "tombstones": pa.array(
                    [merged.num_rows - live.num_rows], pa.int64()
                ),
                "checksum": pa.array([ck], pa.uint64()),
                "lsn_hi": pa.array(
                    [int(lsn_np.max()) if len(lsn_np) else 0], pa.int64()
                ),
                "events_applied": pa.array([int(len(ev_lsn))], pa.int64()),
                "lsn_lo_applied": pa.array(
                    [int(ev_lsn.min()) if len(ev_lsn) else 0], pa.int64()
                ),
                "lsn_hi_applied": pa.array(
                    [int(ev_lsn.max()) if len(ev_lsn) else 0], pa.int64()
                ),
                "dlq_rows": pa.array([dlq_rows], pa.int64()),
                "stats_json": pa.array([stats_json(live)], pa.string()),
            }
        )
