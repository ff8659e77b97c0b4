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
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..extract import extract_text

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
    """
    if tbl.num_rows == 0:
        return tbl
    idx = pc.sort_indices(tbl, sort_keys=[(c, "ascending") for c in order_by])
    tbl = tbl.take(idx)
    others = [c for c in tbl.column_names if c != key]
    agg = tbl.group_by(key, use_threads=False).aggregate(
        [(c, "last", pc.ScalarAggregateOptions(skip_nulls=False)) for c in others]
    )
    return agg.rename_columns([key] + others)


def _checksum(urls: list[str], ts_us: np.ndarray, lsn: np.ndarray) -> int:
    """Order-insensitive per-partition content checksum (lineage)."""
    acc = 0
    for u, t, l in zip(urls, ts_us.tolist(), lsn.tolist()):
        acc = (acc + zlib.crc32(f"{u}|{t}|{l}".encode())) & 0xFFFFFFFFFFFFFFFF
    return acc


class MergePartition:
    """map_groups callable: one invocation merges one pid group.

    Stateless w.r.t. Ray retries: writes a deterministic staging path
    (retry overwrites, never double-appends) and returns a lineage row.
    The commit (manifest swap) happens on the driver afterwards.
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
    ):
        self.__name__ = "MergePartition"
        self.lake_root = lake_root
        self.txid = txid
        self.schema = target_schema
        self.partitions = partitions  # manifest snapshot: pid -> {file,...}
        self.key = key
        self.ts_col = ts_col
        self.derive_text = derive_text

    def __call__(self, group: pa.Table) -> pa.Table:
        from ..state.schema_registry import conform

        pid = int(group.column("pid")[0].as_py())
        changes = group.drop_columns(
            [c for c in ("pid", "salt") if c in group.column_names]
        )
        changes = lww_compact(changes, self.key, order_by=(self.ts_col, "lsn"))

        ops = changes.column("op")
        deleted = pc.equal(ops, pa.scalar("delete"))
        body = changes
        if self.derive_text and "html" in changes.column_names:
            # text extraction ONLY for merge winners (insert/update) —
            # superseded events never pay the extraction cost.  One
            # to_pylist() conversion up front (per-element as_py() in this
            # loop measurably dominated); extraction itself is legitimately
            # per-row Python (regex pipeline over bytes).
            htmls = changes.column("html").to_pylist()
            dels = deleted.to_numpy(zero_copy_only=False)
            texts = [
                None if d else extract_text(h) for d, h in zip(dels, htmls)
            ]
            body = body.append_column("text", pa.array(texts, pa.string()))
        body = conform(body, self.schema)  # fills lang etc. with nulls if absent
        body = body.append_column("_lsn", changes.column("lsn").cast(pa.int64()))
        body = body.append_column("_deleted", deleted)

        # lazily read current partition state (disk-backed per-partition index)
        cur_meta = self.partitions.get(str(pid))
        if cur_meta is not None:
            cur = pq.read_table(os.path.join(self.lake_root, cur_meta["file"]))
            cur = self._conform_stored(cur)
            merged = pa.concat_tables([cur, body], promote_options="default")
        else:
            merged = body

        # final exact reduce: max (ts_col, _lsn) per key over base ∪ changes
        merged = self._lww_stored(merged)

        out_path = os.path.join(
            self.lake_root, "staging", self.txid, f"part-{pid:05d}.parquet"
        )
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        # store sorted by key for mergeable reads (reference keeps MergeTree
        # ORDER BY, src/pipeline/sql/create_tables.sql:20)
        merged = merged.take(pc.sort_indices(merged, sort_keys=[(self.key, "ascending")]))
        pq.write_table(merged, out_path)

        live = merged.filter(pc.invert(merged.column("_deleted")))
        lsn_np = merged.column("_lsn").to_numpy(zero_copy_only=False)
        ck = _checksum(
            live.column(self.key).to_pylist(),
            live.column(self.ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False),
            live.column("_lsn").to_numpy(zero_copy_only=False),
        )
        ev_lsn = changes.column("lsn").to_numpy(zero_copy_only=False)
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
            }
        )

    # -- helpers ----------------------------------------------------------

    def _conform_stored(self, cur: pa.Table) -> pa.Table:
        """Null-backfill an existing partition file written under an older
        schema version (additive evolution)."""
        from ..state.schema_registry import conform

        internals = [c for c in INTERNAL_COLS if c in cur.column_names]
        kept = {c: cur.column(c) for c in internals}
        body = conform(cur.drop_columns(internals), self.schema)
        for c in INTERNAL_COLS:
            if c in kept:
                body = body.append_column(c, kept[c])
            elif c == "_lsn":
                # pre-engine rows rank below any WAL event at equal warc_ts
                body = body.append_column(
                    c, pa.array(np.zeros(body.num_rows, dtype=np.int64))
                )
            elif c == "_deleted":
                body = body.append_column(
                    c, pa.array(np.zeros(body.num_rows, dtype=bool))
                )
        return body

    def _lww_stored(self, tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            tbl, sort_keys=[(self.ts_col, "ascending"), ("_lsn", "ascending")]
        )
        tbl = tbl.take(idx)
        others = [c for c in tbl.column_names if c != self.key]
        agg = tbl.group_by(self.key, use_threads=False).aggregate(
            [(c, "last", pc.ScalarAggregateOptions(skip_nulls=False)) for c in others]
        )
        return agg.rename_columns([self.key] + others)
