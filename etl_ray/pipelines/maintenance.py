"""Lake maintenance: tombstone compaction + orphan vacuum.

Tombstones are retained at merge time so late events from
not-yet-applied segments cannot resurrect deleted rows
(`etl_ray/stages/merge.py`).  Once the WAL guarantees no event older
than ``watermark_lsn`` will ever be replayed (e.g. the ledger shows a
contiguous applied prefix), tombstones with ``_lsn <= watermark`` are
dead weight and can be dropped.  Compaction is itself a manifest
transaction: staged rewrites + one atomic swap, so a crash mid-compact
leaves the previous state intact and readers never see a half-compacted
table.

``vacuum`` deletes part files and staging dirs no longer referenced by
the committed manifest (crash/retry orphans) — safe because readers
resolve files only through the manifest.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..state.manifest import LakeTable


@ray.remote
def _compact_partition(
    lake_root: str,
    txid: str,
    pid: int,
    rel_file: str,
    watermark_lsn: int,
    watermark_ts_us: int | None = None,
    key: str = "url",
    ts_col: str = "warc_ts",
) -> dict:
    from ..stages.merge import _checksum

    from ..state.fs import resolve as _resolve

    _fs = _resolve(None)
    tbl = pq.read_table(
        os.path.join(lake_root, rel_file), filesystem=_fs.pyarrow_fs
    )
    dead = pc.and_(
        tbl.column("_deleted"),
        pc.less_equal(tbl.column("_lsn"), pa.scalar(watermark_lsn, pa.int64())),
    )
    if watermark_ts_us is not None:
        # bounded-lateness rule: a tombstone at event time T <= W is
        # EXACTLY droppable — any future event E has ts_E >= W >= T and
        # lsn_E above every applied lsn, so E beats the tombstone under
        # LWW (ts, lsn) whether or not the tombstone still exists
        by_ts = pc.and_(
            tbl.column("_deleted"),
            pc.less_equal(
                tbl.column(ts_col).cast(pa.int64()),
                pa.scalar(watermark_ts_us, pa.int64()),
            ),
        )
        dead = pc.or_(dead, by_ts)
    out = tbl.filter(pc.invert(dead))
    path = os.path.join(lake_root, "staging", txid, f"part-{pid:05d}.parquet")
    _fs.makedirs(os.path.dirname(path))
    pq.write_table(out, path, filesystem=_fs.pyarrow_fs)
    live = out.filter(pc.invert(out.column("_deleted")))
    lsn_np = out.column("_lsn").to_numpy(zero_copy_only=False)
    ck = _checksum(
        live.column(key),
        live.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False),
        live.column("_lsn").to_numpy(zero_copy_only=False),
    )
    from ..state.partstats import stats_json

    return {
        "pid": pid,
        "rows": live.num_rows,
        "checksum": ck,
        "lsn_hi": int(lsn_np.max()) if len(lsn_np) else 0,
        "events_applied": 0,
        "tombstones_dropped": int(tbl.num_rows - out.num_rows),
        "stats_json": stats_json(live),
    }


def contiguous_applied_prefix(manifest: dict) -> int:
    """Highest LSN H such that every lsn <= H lies inside a committed
    applied range.  Events above H may still arrive in not-yet-applied
    segments, so tombstones above H must be retained."""
    cur = 0
    for lo, hi in sorted((int(a), int(b)) for a, b in manifest["applied_lsn_ranges"]):
        if lo <= cur + 1:
            cur = max(cur, hi)
        else:
            break
    return cur


def _compact_impl(
    lake_root: str,
    watermark_lsn: int | None = None,
    *,
    assume_caught_up: bool = False,
    lateness_us: int | None = None,
    key: str = "url",
    ts_col: str = "warc_ts",
) -> dict:
    """Drop tombstones at or below ``watermark_lsn``.

    ``lateness_us`` adds the BOUNDED-LATENESS event-time rule: under the
    contract "every future event's ts_col is within ``lateness_us`` of
    the highest event time already applied" (the per-tx
    ``event_ts_hi_us`` lineage watermark), tombstones with
    ``warc_ts <= max_applied_ts - lateness_us`` are dropped — exact, not
    heuristic: any in-contract future event has ts >= that watermark and
    a higher lsn than every applied row, so it beats such a tombstone
    under LWW (ts, lsn) whether or not the tombstone remains.  This is
    the steady-state tailing GC (assume_caught_up is the stream-ended
    assertion; lateness is the stream-still-running contract).

    Safety analysis (LWW order is EVENT TIME ``(warc_ts, lsn)``, so an
    event's lsn says nothing about its warc_ts):

    * redelivered copies of already-applied segments can never resurrect a
      dropped tombstone — the replay combiner filters events whose lsn
      lies inside a committed range (event-level exactly-once);
    * a still-PENDING segment may carry arbitrarily late (old-warc_ts)
      events for a deleted key, and only the tombstone guards those.

    Gap-free committed LSN ranges prove only that every PUBLISHED segment
    was applied — in a tailing deployment a FUTURE segment (not yet
    visible) can still carry an older-warc_ts event for a deleted key, so
    "ranges are gap-free" does not imply "stream is caught up".  The
    default watermark is therefore 0 (drop nothing).  Opt in to the
    aggressive rule with ``assume_caught_up=True`` — the caller asserts
    the WAL has ended — which uses the full applied range when the
    committed ranges are gap-free (and still 0 when a gap shows older
    segments pending).  Or pass ``watermark_lsn`` explicitly to encode a
    stronger WAL lateness contract (e.g. an event-time bound).  Returns
    the tx lineage."""
    lake = LakeTable(lake_root)
    manifest = lake.read_manifest()
    if watermark_lsn is None:
        if assume_caught_up:
            prefix = contiguous_applied_prefix(manifest)
            mx = max((hi for _, hi in manifest["applied_lsn_ranges"]), default=0)
            watermark_lsn = prefix if prefix >= mx else 0
        else:
            watermark_lsn = 0
    watermark_ts_us = None
    if lateness_us is not None:
        highs = [
            int(tx["event_ts_hi_us"])
            for tx in manifest["lineage"]
            if tx.get("event_ts_hi_us") is not None
        ]
        if highs:
            watermark_ts_us = max(highs) - int(lateness_us)
    txid = lake.next_txid(manifest)
    # Partitions carrying a merge-on-read delta chain are SKIPPED: the
    # tombstone rewrite reads only the base file, and committing it would
    # replace the partition entry and drop the chain.  Fold chains first
    # (compact_deltas), then GC tombstones.
    skipped = [pid for pid, meta in manifest["partitions"].items() if meta.get("deltas")]
    futs = [
        _compact_partition.remote(
            lake_root, txid, int(pid), meta["file"], int(watermark_lsn),
            watermark_ts_us, key, ts_col,
        )
        for pid, meta in manifest["partitions"].items()
        if not meta.get("deltas")
    ]
    results = ray.get(futs)
    m = lake.commit(
        manifest,
        txid,
        results,
        applied_segments=[f"__compact_{txid}__"],
        applied_lsn_range=None,
        extras={
            "compaction": True,
            "watermark_lsn": int(watermark_lsn),
            "watermark_ts_us": watermark_ts_us,
            "tombstones_dropped": int(sum(r["tombstones_dropped"] for r in results)),
            "skipped_delta_pids": len(skipped),
        },
    )
    return m["lineage"][-1]


@ray.remote
def _fold_partition(
    lake_root: str, txid: str, pid: int, meta: dict, key: str, ts_col: str,
    renames: list | None = None, drops: list | None = None,
) -> dict:
    """Fold one partition's base ∪ delta chain into a fresh base file
    (staged; the driver commits).  Tombstone WINNERS are retained — this
    folds superseded row versions only, it is not tombstone GC."""
    from ..stages.merge import _checksum, load_partition_state

    tbl = load_partition_state(
        lake_root, meta, schema=None, key=key, ts_col=ts_col, renames=renames,
        drops=drops,
    )
    tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[(key, "ascending")]))
    path = os.path.join(lake_root, "staging", txid, f"part-{pid:05d}.parquet")
    from ..state.fs import resolve as _resolve

    _fs = _resolve(None)
    _fs.makedirs(os.path.dirname(path))
    pq.write_table(tbl, path, filesystem=_fs.pyarrow_fs)
    live = tbl.filter(pc.invert(tbl.column("_deleted")))
    lsn_np = tbl.column("_lsn").to_numpy(zero_copy_only=False)
    ck = _checksum(
        live.column(key),
        live.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False),
        live.column("_lsn").to_numpy(zero_copy_only=False),
    )
    from ..state.partstats import stats_json

    return {
        "pid": pid,
        "rows": live.num_rows,
        "checksum": ck,
        "lsn_hi": int(lsn_np.max()) if len(lsn_np) else 0,
        "events_applied": 0,
        "deltas_folded": len(meta.get("deltas", [])),
        "stats_json": stats_json(live),
    }


def _compact_deltas_impl(
    lake_root: str,
    min_chain: int = 1,
    key: str = "url",
    ts_col: str = "warc_ts",
) -> dict | None:
    """Fold merge-on-read delta chains back into base part files — the
    compaction half of ``replay(merge_mode="delta")``.

    Every partition whose chain length is >= ``min_chain`` is rewritten
    as base ∪ chain reduced under LWW ``(ts_col, _lsn)`` (exactly the
    read path's reduce, so served state is unchanged); the commit clears
    those chains and the superseded delta files become vacuum-reclaimable
    orphans.  One manifest transaction: crash mid-fold leaves the chains
    intact.  Returns the tx lineage record, or None if no chain
    qualifies.  Run with ``min_chain > 1`` for steady-state tailing
    (amortize folds); ``min_chain=1`` folds everything."""
    lake = LakeTable(lake_root)
    manifest = lake.read_manifest()
    todo = {
        pid: meta
        for pid, meta in manifest["partitions"].items()
        if len(meta.get("deltas", [])) >= min_chain
    }
    if not todo:
        return None
    txid = lake.next_txid(manifest)
    futs = [
        _fold_partition.remote(
            lake_root, txid, int(pid), meta, key, ts_col,
            manifest.get("renames", []), manifest.get("drops", []),
        )
        for pid, meta in todo.items()
    ]
    results = ray.get(futs)
    m = lake.commit(
        manifest,
        txid,
        results,
        applied_segments=[f"__compact_deltas_{txid}__"],
        applied_lsn_range=None,
        extras={
            "delta_compaction": True,
            "partitions_folded": len(results),
            "deltas_folded": int(sum(r["deltas_folded"] for r in results)),
        },
    )
    return m["lineage"][-1]


@ray.remote
def _backfill_partition(
    lake_root: str,
    txid: str,
    pid: int,
    meta: dict,
    column: str,
    fn,
    key: str,
    ts_col: str,
    renames: list | None = None,
    drops: list | None = None,
) -> dict:
    from ..stages.merge import _checksum, load_partition_state

    tbl = load_partition_state(
        lake_root, meta, schema=None, key=key, ts_col=ts_col, renames=renames,
        drops=drops,
    )
    newcol = fn(tbl)
    if not isinstance(newcol, (pa.Array, pa.ChunkedArray)):
        newcol = pa.array(newcol)
    tbl = tbl.set_column(tbl.column_names.index(column), column, newcol)
    tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[(key, "ascending")]))
    path = os.path.join(lake_root, "staging", txid, f"part-{pid:05d}.parquet")
    from ..state.fs import resolve as _resolve

    _fs = _resolve(None)
    _fs.makedirs(os.path.dirname(path))
    pq.write_table(tbl, path, filesystem=_fs.pyarrow_fs)
    live = tbl.filter(pc.invert(tbl.column("_deleted")))
    lsn_np = tbl.column("_lsn").to_numpy(zero_copy_only=False)
    ck = _checksum(
        live.column(key),
        live.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False),
        live.column("_lsn").to_numpy(zero_copy_only=False),
    )
    from ..state.partstats import stats_json

    return {
        "pid": pid,
        "rows": live.num_rows,
        "checksum": ck,
        "lsn_hi": int(lsn_np.max()) if len(lsn_np) else 0,
        "events_applied": 0,
        "stats_json": stats_json(live),
    }


def _backfill_impl(
    lake_root: str,
    column: str,
    fn,
    key: str = "url",
    ts_col: str = "warc_ts",
) -> dict:
    """Recompute a derived column for EVERY stored row as one manifest
    transaction — the extractor-upgrade op (new `extract_text` version,
    new language-ID model, …).  ``fn(table) -> Array`` runs once per
    partition on the folded state (delta chains are folded in passing,
    like a rewrite tx); the LWW identity columns ``(key, ts, _lsn)``
    are untouched, so replay semantics, exactly-once ledger state and
    lineage checksums are preserved.  One task per partition, no
    shuffle; crash mid-backfill leaves the old state committed."""
    lake = LakeTable(lake_root)
    manifest = lake.read_manifest()
    txid = lake.next_txid(manifest)
    futs = [
        _backfill_partition.remote(
            lake_root, txid, int(pid), meta, column, fn, key, ts_col,
            manifest.get("renames", []), manifest.get("drops", []),
        )
        for pid, meta in manifest["partitions"].items()
    ]
    results = ray.get(futs)
    m = lake.commit(
        manifest,
        txid,
        results,
        applied_segments=[f"__backfill_{column}_{txid}__"],
        applied_lsn_range=None,
        extras={"backfill": column, "partitions_rewritten_total": len(results)},
    )
    return m["lineage"][-1]


@ray.remote
def _fsck_partition(
    lake_root: str, pid: int, meta: dict, key: str, ts_col: str
) -> list[dict]:
    """Audit every file of one partition against its manifest entry."""
    from ..stages.merge import _checksum

    problems = []
    entries = [("base", meta)] if meta.get("file") else []
    entries += [
        (f"delta[{i}]", d) for i, d in enumerate(meta.get("deltas", []))
    ]
    for label, ent in entries:
        path = os.path.join(lake_root, ent["file"])
        try:
            from ..state.fs import resolve as _resolve

            tbl = pq.read_table(path, filesystem=_resolve(None).pyarrow_fs)
        except Exception as e:  # missing/corrupt file
            problems.append(
                {"pid": pid, "file": ent["file"], "what": f"unreadable: {e}"}
            )
            continue
        live = tbl.filter(pc.invert(tbl.column("_deleted")))
        ck = _checksum(
            live.column(key),
            live.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False),
            live.column("_lsn").to_numpy(zero_copy_only=False),
        )
        if live.num_rows != int(ent["rows"]):
            problems.append(
                {
                    "pid": pid,
                    "file": ent["file"],
                    "what": f"{label} rows {live.num_rows} != manifest {ent['rows']}",
                }
            )
        elif ck != int(ent["checksum"]):
            problems.append(
                {
                    "pid": pid,
                    "file": ent["file"],
                    "what": f"{label} checksum {ck} != manifest {ent['checksum']}",
                }
            )
        # stats audit: scan pruning TRUSTS these bounds — a manifest
        # entry claiming a narrower range than the file's live rows
        # would make filtered reads silently drop data.  Soundness is
        # CONTAINMENT (claimed bounds ⊇ actual bounds; string bounds are
        # truncation-widened by design), plus exact null accounting.
        claimed = ent.get("stats")
        if claimed and live.num_rows:
            from ..state.partstats import table_stats

            actual = table_stats(live) or {}
            for col, c_ent in claimed.items():
                a_ent = actual.get(col)
                if a_ent is None:
                    continue  # column no longer stat-eligible: ignore
                bad = None
                if int(c_ent.get("nulls", 0)) != int(a_ent.get("nulls", 0)):
                    bad = (
                        f"nulls {c_ent.get('nulls')} != {a_ent.get('nulls')}"
                    )
                elif "min" not in c_ent and "min" in a_ent:
                    bad = "claimed all-null but file has values"
                elif "min" in c_ent and "min" in a_ent:
                    if c_ent["min"] > a_ent["min"]:
                        bad = f"min bound {c_ent['min']!r} > actual {a_ent['min']!r}"
                    elif (
                        c_ent.get("max") is not None
                        and a_ent.get("max") is not None
                        and c_ent["max"] < a_ent["max"]
                    ):
                        bad = f"max bound {c_ent['max']!r} < actual {a_ent['max']!r}"
                    elif "vset" in c_ent:
                        # equality pruning trusts value-hash absence: the
                        # claimed set must contain every actual value
                        if "vset" not in a_ent:
                            bad = "claimed vset but file has more distinct values than the cap"
                        elif not set(a_ent["vset"]) <= set(c_ent["vset"]):
                            bad = "vset missing live value hash(es)"
                if bad:
                    problems.append(
                        {
                            "pid": pid,
                            "file": ent["file"],
                            "what": f"{label} stats[{col}]: {bad}",
                        }
                    )
    return problems


def fsck(
    lake_root: str,
    at_txid: str | None = None,
    key: str = "url",
    ts_col: str = "warc_ts",
) -> dict:
    """Integrity audit: recompute every referenced file's live row count
    and order-insensitive content checksum and compare them to the
    lineage recorded at commit time (base files AND merge-on-read delta
    files each carry their own entry).  One Ray task per partition —
    O(table) read, zero shuffle, embarrassingly parallel; run it like a
    scrub.  ``at_txid`` audits a historical snapshot (until vacuum).
    Returns {partitions, files, mismatches:[{pid, file, what}]}; an empty
    ``mismatches`` list is the pass condition."""
    lake = LakeTable(lake_root)
    m = lake.manifest_at(at_txid) if at_txid is not None else lake.read_manifest()
    futs = [
        _fsck_partition.remote(lake_root, int(pid), meta, key, ts_col)
        for pid, meta in m["partitions"].items()
    ]
    problems = [p for lst in ray.get(futs) for p in lst]
    n_files = sum(
        (1 if meta.get("file") else 0) + len(meta.get("deltas", []))
        for meta in m["partitions"].values()
    )
    # quarantine audit: every committed DLQ entry's file must exist with
    # the recorded row count (footer read only — cheap, driver-side)
    import pyarrow.parquet as _pq

    for e in m.get("dlq", []):
        path = os.path.join(lake_root, e["file"])
        if not os.path.exists(path):
            problems.append({"pid": e["pid"], "file": e["file"], "what": "dlq_missing"})
        elif _pq.read_metadata(path).num_rows != int(e["rows"]):
            problems.append({"pid": e["pid"], "file": e["file"], "what": "dlq_rows"})
    # constraint coherence: every CHECK constraint must reference a
    # current schema column with a known op (a stale reference would
    # silently never match — rename_column rewrites these, so a miss
    # here means manifest corruption or hand-editing)
    from ..stages.predicate import PRED_OPS

    schema_names = set(lake.schema(m).names)
    for cname, c in m.get("constraints", {}).items():
        if c.get("column") not in schema_names or c.get("op") not in PRED_OPS:
            problems.append(
                {"pid": -1, "file": f"constraint:{cname}", "what": "constraint_ref"}
            )
    return {
        "txid": m["txid"],
        "partitions": len(m["partitions"]),
        "files": n_files + len(m.get("dlq", [])),
        "mismatches": problems,
    }


def vacuum(lake_root: str, keep_txids: list[str] | None = None) -> dict:
    """Delete unreferenced part files and stale staging dirs.

    Only staging dirs whose txid is <= the committed ``tx_seq`` are
    removed: a concurrently in-flight transaction stages under
    ``tx_seq + 1`` and must not have its files deleted before commit.
    (A crashed transaction's staging dir is reclaimed after the next
    successful commit advances ``tx_seq`` past it.)

    Note: vacuum reclaims the part files that historical snapshots
    reference — time-travel reads (``read_table(at_txid=...)``) are only
    valid for transactions newer than the last vacuum — EXCEPT snapshots
    named in ``keep_txids``, whose file sets stay protected.  Pass the
    member txids of any live cross-table transaction group
    (``pipelines/groups.py``) so group-consistent reads survive GC.
    Snapshots pinned by a named tag (``pipelines/tags.py``) are
    protected AUTOMATICALLY — tagging is the retention policy; deleting
    the tag releases the files to the next vacuum."""
    from ..state.manifest import partition_file_list
    from .tags import list_tags

    lake = LakeTable(lake_root)
    manifest = lake.read_manifest()
    referenced = {
        os.path.basename(rel)
        for p in manifest["partitions"].values()
        for rel in partition_file_list(p)
    }
    keep_txids = list(keep_txids or ()) + sorted(
        set(list_tags(lake_root, fs=lake.fs).values())
    )
    for txid in keep_txids or ():
        snap = lake.manifest_at(txid)
        referenced |= {
            os.path.basename(rel)
            for p in snap["partitions"].values()
            for rel in partition_file_list(p)
        }
    removed_parts = 0
    if lake.fs.exists(lake.parts_dir):
        for f in lake.fs.listdir(lake.parts_dir):
            if f.endswith(".parquet") and f not in referenced:
                lake.fs.remove(os.path.join(lake.parts_dir, f))
                removed_parts += 1
    removed_staging = 0
    committed_seq = int(manifest["tx_seq"])
    if lake.fs.exists(lake.staging_root):
        for d in lake.fs.listdir(lake.staging_root):
            try:
                seq = int(d.removeprefix("tx"))
            except ValueError:
                continue  # unknown dir — leave it
            if seq <= committed_seq:
                lake.fs.rmtree(os.path.join(lake.staging_root, d))
                removed_staging += 1
    # dlq orphans: a crash between DLQ-file promotion and the manifest
    # swap leaves a dlq/ file no manifest references.  Same in-flight
    # guard as staging: only files whose txid <= the committed tx_seq
    # are candidates (a racing commit promotes under tx_seq + 1).
    dlq_referenced = {os.path.basename(e["file"]) for e in manifest.get("dlq", [])}
    removed_dlq = 0
    if lake.fs.exists(lake.dlq_dir):
        for f in lake.fs.listdir(lake.dlq_dir):
            if not f.endswith(".parquet") or f in dlq_referenced:
                continue
            try:  # dlq-{pid:05d}-tx{seq:06d}.parquet
                seq = int(f.rsplit("-tx", 1)[1].split(".")[0])
            except (IndexError, ValueError):
                continue
            if seq <= committed_seq:
                lake.fs.remove(os.path.join(lake.dlq_dir, f))
                removed_dlq += 1
    # Commit-log retention: records below the head are only needed for
    # head recovery (time travel resolves through manifests/{txid}.json,
    # which vacuum never touches), BUT a record also blocks a stale
    # writer from re-winning its sequence number — deleting one re-opens
    # that writer's lost-update hole.  Keep a 64-deep tail: a writer
    # whose manifest read is >64 commits stale has long since lost the
    # advisory writer lock and must reload anyway.
    removed_commits = 0
    if lake.fs.exists(lake.commits_dir):
        seqs = sorted(
            int(n[:-5])
            for n in lake.fs.listdir(lake.commits_dir)
            if n.endswith(".json") and n[:-5].isdigit()
        )
        for seq in seqs[:-64]:
            lake.fs.remove(os.path.join(lake.commits_dir, f"{seq:09d}.json"))
            removed_commits += 1
    return {
        "removed_parts": removed_parts,
        "removed_staging_dirs": removed_staging,
        "removed_dlq": removed_dlq,
        "removed_commits": removed_commits,
    }


class _RepartitionWriter:
    """map_groups callable: write one NEW pid's rows (live + tombstones,
    all columns preserved) as a staged, url-sorted part file."""

    def __init__(self, lake_root: str, txid: str):
        self.__name__ = "_RepartitionWriter"
        self.lake_root = lake_root
        self.txid = txid

    def __call__(self, group: pa.Table) -> pa.Table:
        from ..stages.merge import _checksum, lww_compact

        pid = int(group.column("pid")[0].as_py())
        body = group.drop_columns(["pid"])
        # fold superseded versions: a source partition with a merge-on-read
        # delta chain contributes multiple rows per url to the flat scan;
        # LWW keeps the winner (tombstone winners included).  No-op for
        # delta-free tables (urls already unique).
        body = lww_compact(body, "url", order_by=("warc_ts", "_lsn"))
        body = body.take(pc.sort_indices(body, sort_keys=[("url", "ascending")]))
        out = os.path.join(
            self.lake_root, "staging", self.txid, f"part-{pid:05d}.parquet"
        )
        from ..state.fs import resolve as _resolve

        _fs = _resolve(None)
        _fs.makedirs(os.path.dirname(out))
        pq.write_table(body, out, filesystem=_fs.pyarrow_fs)
        live = body.filter(pc.invert(body.column("_deleted")))
        lsn_np = body.column("_lsn").to_numpy(zero_copy_only=False)
        ck = _checksum(
            live.column("url"),
            live.column("warc_ts").cast(pa.int64()).to_numpy(zero_copy_only=False),
            live.column("_lsn").to_numpy(zero_copy_only=False),
        )
        from ..state.partstats import stats_json

        return pa.table(
            {
                "pid": pa.array([pid], pa.int32()),
                "rows": pa.array([live.num_rows], pa.int64()),
                "tombstones": pa.array([body.num_rows - live.num_rows], pa.int64()),
                "checksum": pa.array([ck], pa.uint64()),
                "lsn_hi": pa.array([int(lsn_np.max()) if len(lsn_np) else 0], pa.int64()),
                "events_applied": pa.array([0], pa.int64()),
                "stats_json": pa.array([stats_json(live)], pa.string()),
            }
        )


def _repartition_impl(lake_root: str, new_num_partitions: int) -> dict:
    """Re-bucket the whole table to a different partition count as ONE
    committed transaction (grow a hot table / compact a sparse one).

    The stable ``pid = crc32(url) % P`` rule simply changes P: every row
    (tombstones included — their replay-safety role survives the move)
    streams through one ``add_partition_cols`` pass and a single
    pid-keyed shuffle into ``new_num_partitions`` staged files; the
    commit atomically swaps the ENTIRE partition map and records the new
    P, which subsequent ``replay()`` calls pick up from the manifest.
    Crash mid-repartition leaves the old state intact (staged files are
    orphans for ``vacuum``).  Scale note: this is a full-table rewrite —
    one all-to-all of the stored bytes — the honest cost of changing a
    table's partitioning; at 100 TB you run it rarely and deliberately.
    """
    from ..stages.partition import add_partition_cols

    lake = LakeTable(lake_root)
    manifest = lake.read_manifest()
    txid = lake.next_txid(manifest)
    files = lake.data_files(manifest)
    if not files:
        raise ValueError("repartition: table has no data files")
    # blocks <= new pid groups, else empty (schema-less) sorted ranges
    # reach the map_groups stage — see bootstrap_lake for the rationale
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    n_blocks = max(1, min(max(ncpu, len(files)), int(new_num_partitions)))
    ds = ray.data.read_parquet(files, override_num_blocks=n_blocks)
    renames = manifest.get("renames", [])
    drops = manifest.get("drops", [])

    def _prep(t: pa.Table) -> pa.Table:
        if renames:
            # files span rename eras; the dataset layer may have union'd
            # old+new names (null-filled complementarily) — coalesce the
            # historical column into the current one, else plain-rename
            from ..state.schema_registry import apply_renames

            for r in renames:
                o, n = r["from"], r["to"]
                if o in t.column_names and n in t.column_names:
                    t = t.set_column(
                        t.column_names.index(n), n,
                        pc.coalesce(t.column(n), t.column(o)),
                    ).drop_columns([o])
            t = apply_renames(t, renames)
        if drops:
            # rewrite = the physical removal point for metadata-only drops
            t = t.drop_columns([c for c in drops if c in t.column_names])
        return add_partition_cols(t, new_num_partitions)

    ds = ds.map_batches(_prep, batch_format="pyarrow")
    lineage_ds = ds.groupby("pid").map_groups(
        _RepartitionWriter(lake_root, txid), batch_format="pyarrow"
    )
    lineage = lineage_ds.take_all()  # <= new_num_partitions tiny rows
    m = lake.commit(
        manifest,
        txid,
        lineage,
        applied_segments=[f"__repartition_{txid}__"],
        applied_lsn_range=None,
        extras={"repartition": True, "new_num_partitions": int(new_num_partitions)},
        replace_partitions=True,
        new_num_partitions=int(new_num_partitions),
    )
    return m["lineage"][-1]


# -- single-writer guards ----------------------------------------------------
# Every committing maintenance verb takes the same advisory writer lock
# as replay(): a compaction racing a tailing replay would otherwise both
# stage tx N+1 and the second manifest swap would discard the first
# (state/manifest.writer_lock).

def compact(lake_root, *args, **kwargs):
    from ..state.manifest import writer_lock

    with writer_lock(lake_root):
        return _compact_impl(lake_root, *args, **kwargs)


def compact_deltas(lake_root, *args, **kwargs):
    from ..state.manifest import writer_lock

    with writer_lock(lake_root):
        return _compact_deltas_impl(lake_root, *args, **kwargs)


def backfill(lake_root, *args, **kwargs):
    from ..state.manifest import writer_lock

    with writer_lock(lake_root):
        return _backfill_impl(lake_root, *args, **kwargs)


def repartition(lake_root, *args, **kwargs):
    from ..state.manifest import writer_lock

    with writer_lock(lake_root):
        return _repartition_impl(lake_root, *args, **kwargs)


compact.__doc__ = _compact_impl.__doc__
compact_deltas.__doc__ = _compact_deltas_impl.__doc__
backfill.__doc__ = _backfill_impl.__doc__
repartition.__doc__ = _repartition_impl.__doc__


def _ndjson_write(t: pa.Table, path: str) -> None:
    """Pure-stdlib NDJSON shard writer — no pandas on the export data
    path.  Explicit format contract: one JSON object per row in column
    order, compact separators, UTF-8 unescaped, timestamps/dates as
    ISO-8601 (microsecond precision), NaN -> null, floats via Python
    ``repr`` (shortest exact roundtrip).  The per-row loop is fine here:
    JSON serialization is inherently per-object and each call is bounded
    to one lake partition's live rows."""
    import datetime as _dt
    import json as _json
    import math as _math

    def _default(o):
        if isinstance(o, _dt.datetime):
            return o.isoformat(timespec="microseconds")
        if isinstance(o, (_dt.date, _dt.time)):
            return o.isoformat()
        raise TypeError(
            f"jsonl export cannot serialize {type(o).__name__}"
        )

    cols = t.column_names
    arrays = [t.column(c).to_pylist() for c in cols]
    with open(path, "w", encoding="utf-8") as fh:
        for vals in zip(*arrays):
            rec = {
                c: (None if isinstance(v, float) and _math.isnan(v) else v)
                for c, v in zip(cols, vals)
            }
            fh.write(
                _json.dumps(
                    rec, ensure_ascii=False, separators=(",", ":"),
                    default=_default,
                )
            )
            fh.write("\n")


class _ExportPartition:
    """map_batches callable over partition items: LWW-load one pid's live
    rows, write them to ``out_dir/pid=NNNNN/part-<txid>.parquet`` via
    tmp-file + atomic rename, emit one lineage row.  Deterministic
    target path per (pid, lake txid) = idempotent under task retry."""

    def __init__(
        self,
        lake_root: str,
        out_dir: str,
        txid: str,
        schema: pa.Schema,
        key: str,
        ts_col: str,
        columns: list[str] | None,
        fs_spec: str = "local-os",
        renames: list | None = None,
        fmt: str = "parquet",
        filters=None,
        name_tag: str = "",
    ):
        self.__name__ = "_ExportPartition"
        self.lake_root = lake_root
        self.out_dir = out_dir
        self.txid = txid
        self.schema = schema
        self.key = key
        self.ts_col = ts_col
        self.columns = columns
        self.fs_spec = fs_spec
        self.renames = list(renames or [])
        self.fmt = fmt
        self.filters = list(filters or [])
        self.name_tag = name_tag  # filter-identity suffix (see export)
        self._expr = None  # dataset expressions don't pickle: built lazily

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json as _json

        from ..stages.merge import INTERNAL_COLS, load_partition_state

        pids, rows, skipped = [], [], []
        for pid, meta_json in zip(
            batch.column("pid").to_pylist(), batch.column("meta").to_pylist()
        ):
            pdir = os.path.join(self.out_dir, f"pid={pid:05d}")
            ext = "parquet" if self.fmt == "parquet" else "jsonl"
            final = os.path.join(
                pdir, f"part-{self.txid}{self.name_tag}.{ext}"
            )
            if os.path.exists(final):  # resumed run: partition is done
                pids.append(pid)
                if self.fmt == "parquet":
                    rows.append(pq.read_metadata(final).num_rows)
                else:
                    with open(final, "rb") as fh:
                        rows.append(sum(1 for _ in fh))
                skipped.append(True)
                continue
            load_cols = self.columns
            if load_cols is not None and self.filters:
                # filter columns must be loaded even when not exported
                load_cols = sorted(
                    set(load_cols) | {c for c, _, _ in self.filters}
                )
            t = load_partition_state(
                self.lake_root, _json.loads(meta_json), self.schema,
                self.key, self.ts_col, columns=load_cols,
                renames=self.renames, fs=self.fs_spec,
            )
            t = t.filter(pc.invert(t.column("_deleted")))
            t = t.drop_columns([c for c in INTERNAL_COLS if c in t.column_names])
            if self.filters:
                if self._expr is None:
                    from ..state.partstats import filters_to_expr

                    self._expr = filters_to_expr(self.filters, self.schema)
                t = t.filter(self._expr)
            if self.columns is not None:
                t = t.select(self.columns)
            os.makedirs(pdir, exist_ok=True)
            tmp = f"{final}.tmp.{os.getpid()}"
            if self.fmt == "parquet":
                pq.write_table(t, tmp)
            else:  # jsonl: the shard format training loaders consume
                for f in t.schema:
                    if pa.types.is_binary(f.type) or pa.types.is_large_binary(f.type):
                        raise TypeError(
                            f"jsonl export cannot serialize binary column "
                            f"{f.name!r}; pass columns=[...] without it"
                        )
                _ndjson_write(t, tmp)
            os.replace(tmp, final)  # publish is atomic; crash leaves tmp only
            pids.append(pid)
            rows.append(t.num_rows)
            skipped.append(False)
        return pa.table(
            {
                "pid": pa.array(pids, pa.int64()),
                "rows": pa.array(rows, pa.int64()),
                "skipped": pa.array(skipped, pa.bool_()),
            }
        )


def export_partitioned(
    lake_root: str,
    out_dir: str,
    *,
    at_txid: str | None = None,
    at_ts=None,
    key: str = "url",
    ts_col: str = "warc_ts",
    columns: list[str] | None = None,
    fs=None,
    fmt: str = "parquet",
    filters=None,
) -> dict:
    """RESUMABLE partitioned export of the lake's live rows: one output
    directory per lake partition (``out/pid=NNNNN/part-<txid>.parquet``),
    one Ray task per partition, atomic per-partition publish.

    ``filters`` — the same ``(col, op, value)`` conjuncts as
    ``read_table(filters=)`` — exports only matching rows.  Partitions
    whose manifest stats exclude the filters are dropped from the task
    list outright (nothing read, reported as ``pruned``); a filtered
    export's shard names carry a filter-identity tag
    (``part-<txid>-f<hash>.parquet``), so resuming with DIFFERENT
    filters can never silently mix shards from two predicates in one
    output tree.

    ``fmt="jsonl"`` writes newline-delimited JSON shards instead (the
    format training data loaders consume); binary columns are rejected
    with a clear error — select the text columns.  Same resume/skip and
    snapshot-consistency rules in both formats.

    A re-run after a crash skips every partition whose file for the same
    lake transaction already exists — finished work is never redone and
    never rewritten (the brief's resumable-output requirement: a failed
    100 TB export resumes at O(missing partitions), not from byte 0).
    The export is consistent by construction: all partitions render the
    SAME committed manifest (``at_txid`` defaults to the current tx), so
    a resume after more replays still exports the original snapshot.

    Returns ``{"txid", "partitions", "written", "skipped", "rows"}``.
    """
    import json as _json

    lake = LakeTable(lake_root, fs=fs)
    if at_ts is not None:
        if at_txid is not None:
            raise ValueError("pass at most one of at_txid / at_ts")
        from ..state.manifest import resolve_txid_at_ts
        at_txid = resolve_txid_at_ts(lake_root, at_ts, fs=fs)
    m = lake.manifest_at(at_txid) if at_txid is not None else lake.read_manifest()
    schema = lake.schema(m)
    parts = m["partitions"]
    name_tag = ""
    pruned = 0
    if filters:
        import hashlib as _hashlib

        from ..state.partstats import check_filters
        from .replay import _plan_scan

        check_filters(filters, schema)
        kept, plan = _plan_scan(m, schema, filters, m.get("renames", []))
        pruned = plan["partitions_skipped"]
        parts = kept
        ident = _json.dumps(
            [[c, op, repr(v)] for c, op, v in filters] + [columns or []],
            sort_keys=True,
        )
        name_tag = "-f" + _hashlib.sha1(ident.encode()).hexdigest()[:8]
    items = [
        {"pid": int(pid), "meta": _json.dumps(meta)}
        for pid, meta in sorted(parts.items(), key=lambda kv: int(kv[0]))
    ]
    if not items:
        return {
            "txid": m["txid"], "partitions": 0, "written": 0,
            "skipped": 0, "pruned": pruned, "rows": 0,
        }
    ds = ray.data.from_items(items, override_num_blocks=len(items))
    lineage = ds.map_batches(
        _ExportPartition(
            lake_root, out_dir, m["txid"], schema, key, ts_col, columns,
            fs_spec=lake.fs.spec, renames=m.get("renames", []), fmt=fmt,
            filters=filters, name_tag=name_tag,
        ),
        batch_format="pyarrow",
        batch_size=None,
        max_retries=3,
        retry_exceptions=True,
    ).take_all()  # tiny: one row per partition
    return {
        "txid": m["txid"],
        "partitions": len(lineage),
        "written": sum(1 for r in lineage if not r["skipped"]),
        "skipped": sum(1 for r in lineage if r["skipped"]),
        "pruned": pruned,
        "rows": int(sum(r["rows"] for r in lineage)),
    }


# ---------------------------------------------------------------------------
# Z-order clustering rewrite (multi-column locality)
# ---------------------------------------------------------------------------


def _zspread16(v: np.ndarray, ndim: int) -> np.ndarray:
    """Spread each 16-bit value's bits ``ndim`` apart (Morton interleave
    building block, standard binary-magic masks) — int64, vectorized."""
    x = v.astype(np.int64) & 0xFFFF
    if ndim == 1:
        return x
    if ndim == 2:
        x = (x | (x << 8)) & 0x00FF00FF
        x = (x | (x << 4)) & 0x0F0F0F0F
        x = (x | (x << 2)) & 0x33333333
        x = (x | (x << 1)) & 0x55555555
        return x
    # ndim == 3: 16 bits -> 48
    x = (x | (x << 32)) & 0xFFFF00000000FFFF
    x = (x | (x << 16)) & 0x00FF0000FF0000FF
    x = (x | (x << 8)) & 0xF00F00F00F00F00F
    x = (x | (x << 4)) & 0x30C30C30C30C30C3
    x = (x | (x << 2)) & 0x1249249249249249
    return x


def _zcode(tbl: pa.Table, cols: list[str]) -> np.ndarray:
    """Morton (Z-curve) code per row over up to 3 columns.  Each column
    is rank-normalized into 16-bit space (timestamps/ints by value
    order, strings by dictionary order) WITHIN the partition — locality
    only matters within a file's row groups, so per-partition
    normalization is exact for pruning purposes and needs no global
    statistics pass."""
    if not 1 <= len(cols) <= 3:
        raise ValueError("zorder supports 1-3 columns")
    parts = []
    for d, c in enumerate(cols):
        col = tbl.column(c)
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.int64())
        v = col.to_numpy(zero_copy_only=False)
        if v.dtype.kind in "OU":
            v = v.astype(str)
        else:
            v = np.nan_to_num(v.astype(np.float64), nan=-np.inf)
        # DENSE-rank scaling: equal values share a bin (a low-cardinality
        # column must cluster, not degrade into row-index noise)
        u, codes = np.unique(v, return_inverse=True)
        q = (codes * 65536) // max(len(u), 1)  # 16-bit rank space
        parts.append(_zspread16(q, len(cols)) << d)
    out = parts[0]
    for p in parts[1:]:
        out = out | p
    return out


def _zorder_partition(
    lake_root: str,
    txid: str,
    pid: int,
    rel_file: str,
    cols: list[str],
    key: str,
    ts_col: str,
    row_group_size: int,
    renames: list | None = None,
    drops: list | None = None,
) -> dict:
    from ..stages.merge import _checksum
    from ..state.fs import resolve as _resolve
    from ..state.schema_registry import apply_renames

    _fs = _resolve(None)
    tbl = pq.read_table(os.path.join(lake_root, rel_file), filesystem=_fs.pyarrow_fs)
    if renames:
        tbl = apply_renames(tbl, renames)
    if drops:
        # rewrite = the physical removal point for metadata-only drops
        tbl = tbl.drop_columns([c for c in drops if c in tbl.column_names])
    if tbl.num_rows:
        z = _zcode(tbl, cols)
        tbl = tbl.take(pa.array(np.argsort(z, kind="stable"), pa.int64()))
    path = os.path.join(lake_root, "staging", txid, f"part-{pid:05d}.parquet")
    _fs.makedirs(os.path.dirname(path))
    pq.write_table(tbl, path, row_group_size=row_group_size, filesystem=_fs.pyarrow_fs)
    live = tbl.filter(pc.invert(tbl.column("_deleted")))
    lsn_np = tbl.column("_lsn").to_numpy(zero_copy_only=False)
    ck = _checksum(
        live.column(key),
        live.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False),
        live.column("_lsn").to_numpy(zero_copy_only=False),
    )
    from ..state.partstats import stats_json

    return {
        "pid": pid,
        "rows": live.num_rows,
        "checksum": ck,
        "lsn_hi": int(lsn_np.max()) if len(lsn_np) else 0,
        "events_applied": 0,
        "stats_json": stats_json(live),
    }


_zorder_partition_remote = ray.remote(_zorder_partition)


def _zorder_impl(
    lake_root: str,
    cols: list[str],
    *,
    key: str = "url",
    ts_col: str = "warc_ts",
    row_group_size: int = 1 << 14,
) -> dict:
    """Rewrite each partition's base file in Morton (Z-curve) order over
    ``cols`` — the multi-column clustering pass that makes row-group
    min/max stats selective for predicates on NON-key columns (time
    ranges, language, host), the Delta/Iceberg OPTIMIZE ZORDER analogue.

    Row content is untouched (same live rows, same checksums — verified
    by the committed lineage); only the physical row order and row-group
    granularity change.  TRADE-OFF: base files are normally key-sorted,
    which is what prunes point lookups (``get_rows``); after a z-order
    rewrite those lookups still return exact results but scan more row
    groups, while range scans on ``cols`` prune better.  Choose per
    table by read mix.  Partitions carrying merge-on-read delta chains
    are skipped (fold chains first, as with tombstone compaction)."""
    lake = LakeTable(lake_root)
    manifest = lake.read_manifest()
    txid = lake.next_txid(manifest)
    skipped = [pid for pid, meta in manifest["partitions"].items() if meta.get("deltas")]
    futs = [
        _zorder_partition_remote.remote(
            lake_root, txid, int(pid), meta["file"], list(cols), key, ts_col,
            row_group_size, manifest.get("renames", []),
            manifest.get("drops", []),
        )
        for pid, meta in manifest["partitions"].items()
        if not meta.get("deltas")
    ]
    results = ray.get(futs)
    m = lake.commit(
        manifest,
        txid,
        results,
        applied_segments=[f"__zorder_{txid}__"],
        applied_lsn_range=None,
        extras={
            "zorder": list(cols),
            "row_group_size": int(row_group_size),
            "skipped_delta_pids": len(skipped),
        },
    )
    return m["lineage"][-1]


def _rename_column_impl(
    lake_root: str,
    old: str,
    new: str,
    *,
    key: str = "url",
    ts_col: str = "warc_ts",
) -> dict:
    """Metadata-only column rename (no file rewrite) — the Iceberg-style
    schema-evolution step the additive registry could not express.

    Publishes ONE transaction that (a) swaps the field name in the
    manifest schema and (b) appends {from, to} to the table's ordered
    rename chain.  Stored part files keep their era's names; every read
    path normalizes through the chain (``schema_registry.apply_renames``
    inside ``load_partition_state`` / the merged-partition reader), and
    the MERGE path maps still-old-named WAL payloads forward, so replay
    after a rename keeps landing in the renamed column.  Time travel and
    tags serve each snapshot's own era names (the chain is part of the
    per-tx snapshot).  Refused for the LWW identity columns (key,
    ts_col, internals) and for coalesce (partial-image) tables, whose
    per-column state metadata is name-keyed inside files."""
    from ..stages.merge import INTERNAL_COLS

    lake = LakeTable(lake_root)
    manifest = lake.read_manifest()
    schema = lake.schema(manifest)
    if old in (key, ts_col) or old in INTERNAL_COLS:
        raise ValueError(
            f"rename_column: {old!r} is an LWW identity/internal column"
        )
    if old not in schema.names:
        raise ValueError(f"rename_column: no column {old!r} in {schema.names}")
    if new in schema.names or new in INTERNAL_COLS or new in (key, ts_col):
        raise ValueError(f"rename_column: target name {new!r} already in use")
    # a name that EVER named a column (rename-chain member or dropped
    # column) is retired forever: old files still carry its data under
    # that physical name, and reusing it would misread their bytes as the
    # new column (the no-field-id price of metadata-only evolution)
    chain = manifest.get("renames", [])
    used = {n for r in chain for n in (r["from"], r["to"])}
    used |= set(manifest.get("drops", []))
    if new in used:
        raise ValueError(
            f"rename_column: {new!r} named a column in a previous era "
            "(rename chain or drop log); retired names cannot be reused"
        )
    # coalesce tables carry name-keyed per-column metadata inside files
    for meta in manifest["partitions"].values():
        rel = meta.get("file")
        if rel:
            names = pq.read_schema(
                os.path.join(lake_root, rel), filesystem=lake.fs.pyarrow_fs
            ).names
            if "_up_ts" in names:
                raise NotImplementedError(
                    "rename_column is not supported on coalesce tables"
                )
            break
    new_schema = pa.schema(
        [f.with_name(new) if f.name == old else f for f in schema],
        metadata=schema.metadata,
    )
    renames = list(manifest.get("renames", [])) + [{"from": old, "to": new}]
    # CHECK constraints follow the rename in the SAME transaction: a
    # constraint left referencing the old name would silently stop
    # matching payloads that ship the new name (its alias walk starts
    # from the stored column name)
    constraints = {
        cname: (
            {**c, "column": new} if c["column"] == old else dict(c)
        )
        for cname, c in manifest.get("constraints", {}).items()
    }
    txid = lake.next_txid(manifest)
    m = lake.commit(
        manifest,
        txid,
        [],
        applied_segments=[f"__rename_{old}_{new}_{txid}__"],
        applied_lsn_range=None,
        new_schema=new_schema,
        renames=renames,
        constraints=constraints or None,
        extras={"rename_from": old, "rename_to": new},
    )
    return m["lineage"][-1]


def rename_column(lake_root, old, new, **kwargs):
    from ..state.manifest import writer_lock

    with writer_lock(lake_root):
        return _rename_column_impl(lake_root, old, new, **kwargs)


def _drop_column_impl(
    lake_root: str,
    column: str,
    *,
    key: str = "url",
    ts_col: str = "warc_ts",
) -> dict:
    """Metadata-only column DROP (no file rewrite) — completes the
    Iceberg-style evolution triple (add = additive registry, rename =
    ``rename_column``, drop = here).

    Publishes ONE transaction that removes the field from the manifest
    schema and appends the column's CURRENT name to the table's drop
    log.  Stored part files keep the dead bytes; every schema-driven
    read excludes them (``conform``), schema-less maintenance reads
    (compact-deltas folds, backfills) and the rewrite paths
    (repartition, zorder) strip them explicitly — a rewrite is the
    physical removal point.  Replay IGNORES WAL payloads that still
    ship the column (upstream sources keep emitting it after a target
    drop), and the name is retired forever: additive evolution and
    ``rename_column`` both refuse to reintroduce it, because old files
    would resurrect their dead bytes under the reborn name.  Time
    travel / tags to a pre-drop snapshot still serve the column (the
    drop log is part of each per-tx snapshot).  Refused for the LWW
    identity columns and coalesce tables (name-keyed in-file state)."""
    from ..stages.merge import INTERNAL_COLS

    lake = LakeTable(lake_root)
    manifest = lake.read_manifest()
    schema = lake.schema(manifest)
    if column in (key, ts_col) or column in INTERNAL_COLS:
        raise ValueError(
            f"drop_column: {column!r} is an LWW identity/internal column"
        )
    if column not in schema.names:
        raise ValueError(f"drop_column: no column {column!r} in {schema.names}")
    holders = [
        n for n, c in manifest.get("constraints", {}).items()
        if c["column"] == column
    ]
    if holders:
        raise ValueError(
            f"drop_column: {column!r} is referenced by CHECK constraint(s) "
            f"{holders}; drop_constraint first"
        )
    for meta in manifest["partitions"].values():
        rel = meta.get("file")
        if rel:
            names = pq.read_schema(
                os.path.join(lake_root, rel), filesystem=lake.fs.pyarrow_fs
            ).names
            if "_up_ts" in names:
                raise NotImplementedError(
                    "drop_column is not supported on coalesce tables"
                )
            break
    new_schema = pa.schema(
        [f for f in schema if f.name != column], metadata=schema.metadata
    )
    drops = list(manifest.get("drops", [])) + [column]
    txid = lake.next_txid(manifest)
    m = lake.commit(
        manifest,
        txid,
        [],
        applied_segments=[f"__drop_{column}_{txid}__"],
        applied_lsn_range=None,
        new_schema=new_schema,
        drops=drops,
        extras={"dropped_column": column},
    )
    return m["lineage"][-1]


def drop_column(lake_root, column, **kwargs):
    from ..state.manifest import writer_lock

    with writer_lock(lake_root):
        return _drop_column_impl(lake_root, column, **kwargs)


def zorder_rewrite(lake_root, cols, **kwargs):
    from ..state.manifest import writer_lock

    with writer_lock(lake_root):
        return _zorder_impl(lake_root, cols, **kwargs)


zorder_rewrite.__doc__ = _zorder_impl.__doc__


# -- predicate delete (purge) -------------------------------------------------
# GDPR-style "DELETE FROM lake WHERE <predicate>": physically remove the
# payload of every matching row (live OR already-tombstoned) in ONE
# manifest transaction, rewriting only the partitions whose parquet
# footer statistics admit a possible match.  The reference has no lake
# delete at all (rows only ever accumulate in ClickHouse,
# client_clickhouse.py); this is the operation a web-page lake actually
# needs for takedown/right-to-be-forgotten requests at 100 TB: a
# metadata-only pruning pass over file footers, then O(matching
# partitions) rewrite work.
#
# Semantics: a purged row becomes a payload-nulled tombstone that KEEPS
# its original (ts, _lsn) order key — so a late WAL event older than
# the purged row still loses LWW and cannot resurrect the data, while a
# genuinely newer event recreates the key with fresh content (purge is
# point-in-time removal, not a permanent ban).  The key column survives
# in the tombstone until the normal watermark compaction (`compact`)
# GC's it under the exactly-droppable rule; time-travel snapshots keep
# serving pre-purge data until `vacuum` reclaims the superseded files —
# a full forget is therefore `delete_where` + `compact` + `vacuum`,
# each step O(touched partitions).

# The predicate vocabulary (eq|prefix|in|lt|le|gt|ge), its vectorized
# row mask, and the footer-statistics admission test live in
# stages/predicate.py — shared with commit-time CHECK constraints
# (stages/validate.py), which use the OPPOSITE null policy (see that
# module's docstring).  delete_where matches rows: nulls never match.
from ..stages.predicate import PRED_OPS as _PRED_OPS
from ..stages.predicate import pred_mask as _pred_mask
from ..stages.predicate import stats_admit as _stats_admit


@ray.remote(num_cpus=0.25)
def _probe_partition_files(
    lake_root: str, pid: int, files: list[str], aliases: list[str],
    op: str, value,
) -> tuple[int, bool]:
    """Footer-statistics probe: may ANY file of this partition contain a
    matching row?  Metadata-only (no data pages read).  A file missing
    the column entirely cannot match (nulls never match); missing
    row-group stats keep the file conservatively."""
    from ..state.fs import resolve as _resolve

    pafs = _resolve(None).pyarrow_fs
    for rel in files:
        md = pq.read_metadata(os.path.join(lake_root, rel), filesystem=pafs)
        arrow_names = md.schema.to_arrow_schema().names
        for name in aliases:
            ci = (
                arrow_names.index(name) if name in arrow_names else -1
            )
            if ci < 0:
                continue
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    return pid, True
                mn, mx = st.min, st.max
                if isinstance(mn, bytes) and isinstance(value, str):
                    try:
                        mn, mx = mn.decode("utf-8"), mx.decode("utf-8")
                    except UnicodeDecodeError:
                        return pid, True
                if _stats_admit(mn, mx, op, value):
                    return pid, True
    return pid, False


@ray.remote
def _purge_partition(
    lake_root: str, txid: str, pid: int, meta: dict, schema_json: dict,
    column: str, op: str, value, key: str, ts_col: str,
    renames: list | None, drops: list | None,
) -> dict:
    """Rewrite one partition with matching rows payload-nulled and
    tombstoned (original LWW order key retained).  Folds any delta
    chain as a side effect (the rewrite IS the merged state)."""
    from ..stages.merge import INTERNAL_COLS, _checksum, load_partition_state
    from ..state.fs import resolve as _resolve
    from ..state.manifest import _schema_from_json

    schema = _schema_from_json(schema_json)
    tbl = load_partition_state(
        lake_root, meta, schema=schema, key=key, ts_col=ts_col,
        renames=renames, drops=drops,
    )
    mask = _pred_mask(tbl.column(column), op, value)
    was_live = pc.invert(tbl.column("_deleted"))
    purged_live = int(pc.sum(pc.and_(mask, was_live)).as_py() or 0)
    keep = {key, ts_col, *INTERNAL_COLS}
    cols = {}
    for name in tbl.column_names:
        col = tbl.column(name)
        if name == "_deleted":
            cols[name] = pc.or_(col, mask)
        elif name in keep:
            cols[name] = col
        else:
            cols[name] = pc.if_else(mask, pa.scalar(None, col.type), col)
    out = pa.table(cols)
    out = out.take(pc.sort_indices(out, sort_keys=[(key, "ascending")]))
    path = os.path.join(lake_root, "staging", txid, f"part-{pid:05d}.parquet")
    _fs = _resolve(None)
    _fs.makedirs(os.path.dirname(path))
    pq.write_table(out, path, filesystem=_fs.pyarrow_fs)
    live = out.filter(pc.invert(out.column("_deleted")))
    lsn_np = out.column("_lsn").to_numpy(zero_copy_only=False)
    ck = _checksum(
        live.column(key),
        live.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False),
        live.column("_lsn").to_numpy(zero_copy_only=False),
    )
    from ..state.partstats import stats_json

    return {
        "pid": pid,
        "rows": live.num_rows,
        "checksum": ck,
        "lsn_hi": int(lsn_np.max()) if len(lsn_np) else 0,
        "events_applied": 0,
        "rows_purged": purged_live,
        "stats_json": stats_json(live),
    }


def _delete_where_impl(
    lake_root: str,
    column: str,
    op: str,
    value,
    key: str = "url",
    ts_col: str = "warc_ts",
) -> dict | None:
    """Predicate delete over the live table state (see module comment
    above).  ``op`` is one of ``eq | prefix | in | lt | le | gt | ge``;
    ``value`` a scalar (or list for ``in``).  Returns the tx lineage
    record, or None when footer statistics prove no partition can
    match.  One manifest transaction; crash mid-purge leaves the
    previous state intact."""
    from ..state.schema_registry import storage_aliases

    if op not in _PRED_OPS:
        raise ValueError(f"delete_where op must be one of {_PRED_OPS}, got {op!r}")
    lake = LakeTable(lake_root)
    manifest = lake.read_manifest()
    schema = lake.schema(manifest)
    if column.startswith("_"):
        raise ValueError(f"cannot delete by internal column {column!r}")
    if column not in schema.names:
        raise ValueError(
            f"delete_where column {column!r} not in table schema {schema.names}"
        )
    renames = manifest.get("renames", [])
    drops = manifest.get("drops", [])
    aliases = storage_aliases(column, renames)

    from ..state.manifest import partition_file_list

    probes = []
    for pid, meta in manifest["partitions"].items():
        files = partition_file_list(meta)
        if files:
            probes.append(
                _probe_partition_files.remote(
                    lake_root, int(pid), files, aliases, op, value
                )
            )
    todo = [pid for pid, may in ray.get(probes) if may]
    if not todo:
        return None
    txid = lake.next_txid(manifest)
    schema_json = _schema_to_json_cached(schema)
    futs = [
        _purge_partition.remote(
            lake_root, txid, pid, manifest["partitions"][str(pid)],
            schema_json, column, op, value, key, ts_col, renames, drops,
        )
        for pid in todo
    ]
    results = ray.get(futs)
    m = lake.commit(
        manifest,
        txid,
        results,
        applied_segments=[f"__delete_where_{txid}__"],
        applied_lsn_range=None,
        extras={
            "delete_where": {
                "column": column,
                "op": op,
                # lineage is JSON: stringify non-JSON predicate values
                # (timestamps, bytes) — evaluation used the native value
                "value": [str(v) for v in value] if op == "in" else str(value),
            },
            "rows_purged": int(sum(r["rows_purged"] for r in results)),
            "partitions_scanned": len(todo),
            "partitions_pruned": len(manifest["partitions"]) - len(todo),
        },
    )
    return m["lineage"][-1]


def _schema_to_json_cached(schema: pa.Schema) -> dict:
    from ..state.manifest import _schema_to_json

    return _schema_to_json(schema)


def delete_where(lake_root, column, op, value, **kwargs):
    from ..state.manifest import writer_lock

    with writer_lock(lake_root):
        return _delete_where_impl(lake_root, column, op, value, **kwargs)


delete_where.__doc__ = _delete_where_impl.__doc__


# -- declarative CHECK constraints (commit-time expectations) -----------------
# Delta-Lake-style table invariants (`ALTER TABLE ADD CONSTRAINT CHECK`):
# one predicate from the shared vocabulary (stages/predicate.py) per
# named constraint, stored in the table manifest and enforced on every
# subsequent replay — violating change events are quarantined to the DLQ
# with reason `constraint:<name>` (stages/validate.constraint_reasons)
# instead of corrupting the table, atomically with the transaction that
# rejected them.  SQL CHECK null semantics: nulls PASS; delete events
# are exempt.  The reference has no invariant enforcement at all — a
# bad row lands in ClickHouse silently (client_clickhouse.py:39-58 in
# /root/reference); at 10^10 events/feed a declarative gate is the only
# practical way to keep upstream garbage out of the lake.
#
# `set_constraint` VERIFIES existing table state first (like Delta):
# a footer-statistics pass proves most partitions clean without touching
# data pages (stages/predicate.stats_all_satisfy — the dual of the
# delete_where pruning test), and only unproven partitions pay a merged
# live-row scan.  Any existing violation aborts the whole operation with
# nothing committed.

_CONSTRAINT_NAME_RE = r"[A-Za-z0-9_][A-Za-z0-9_.-]*"


@ray.remote(num_cpus=0.25)
def _prove_partition_clean(
    lake_root: str, pid: int, files: list[str], aliases: list[str],
    op: str, value,
) -> tuple[int, bool]:
    """Footer-statistics proof: does EVERY row of EVERY file of this
    partition provably satisfy the CHECK predicate (nulls pass)?
    Metadata-only.  A file carrying none of the column's storage-era
    names is clean (all-null column after conform); a row group with
    zero non-null values is clean; missing min/max stats leave the
    partition conservatively unproven (caller scans it)."""
    from ..stages.predicate import stats_all_satisfy
    from ..state.fs import resolve as _resolve

    pafs = _resolve(None).pyarrow_fs
    for rel in files:
        md = pq.read_metadata(os.path.join(lake_root, rel), filesystem=pafs)
        arrow_names = md.schema.to_arrow_schema().names
        ci = next(
            (arrow_names.index(a) for a in aliases if a in arrow_names), None
        )
        if ci is None:
            # absent column == all-null after conform: clean for every
            # CHECK predicate EXCEPT notnull, where it's all-violating
            if op == "notnull":
                return pid, False
            continue
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None:
                return pid, False
            if op == "notnull":
                # proof comes from the null count, not min/max
                if st.null_count is None or st.null_count > 0:
                    return pid, False
                continue
            if st.num_values == 0:  # all-null row group: CHECK passes
                continue
            if not st.has_min_max:
                return pid, False
            mn, mx = st.min, st.max
            if isinstance(mn, bytes) and isinstance(value, str):
                try:
                    mn, mx = mn.decode("utf-8"), mx.decode("utf-8")
                except UnicodeDecodeError:
                    return pid, False
            if not stats_all_satisfy(mn, mx, op, value):
                return pid, False
    return pid, True


@ray.remote
def _count_partition_violations(
    lake_root: str, pid: int, meta: dict, schema_json: dict,
    column: str, op: str, value, key: str, ts_col: str,
    renames: list | None, drops: list | None,
) -> tuple[int, int]:
    """Merged LIVE rows of one partition that VIOLATE the CHECK
    predicate (evaluate it to FALSE; nulls pass).  Reads base ∪ delta
    chain through the normal conform path, so old files' storage-era
    names and missing columns resolve exactly as a reader would see
    them."""
    from ..stages.merge import load_partition_state
    from ..stages.predicate import pred_mask_raw
    from ..state.manifest import _schema_from_json

    tbl = load_partition_state(
        lake_root, meta, schema=_schema_from_json(schema_json), key=key,
        ts_col=ts_col, renames=renames, drops=drops,
        columns=[column],  # pruned read: only the constrained column
        # (plus the LWW fold's key/ts/internals) leaves storage
    )
    live = tbl.filter(pc.invert(tbl.column("_deleted")))
    if not live.num_rows:
        return pid, 0
    viol = pc.fill_null(
        pc.invert(pred_mask_raw(live.column(column), op, value)), False
    )
    return pid, int(pc.sum(viol).as_py() or 0)


class ConstraintViolation(ValueError):
    """Existing table rows violate the constraint being added — nothing
    was committed."""


def _set_constraint_impl(
    lake_root: str,
    name: str,
    column: str,
    op: str,
    value,
    *,
    key: str = "url",
    ts_col: str = "warc_ts",
    verify: bool = True,
) -> dict:
    """Add a named CHECK constraint `<column> <op> <value>` to the table
    (see section comment above).  ``op`` ∈ ``eq | prefix | in | lt | le
    | gt | ge | notnull``; ``value`` a JSON scalar (list of scalars for
    ``in``, ignored/None for ``notnull`` — the SQL NOT NULL constraint,
    the one CHECK where a null VIOLATES) so the manifest stays a plain
    JSON document.  Verifies current live
    rows satisfy the predicate first (``verify=False`` skips the scan —
    the Delta `NOT ENFORCED`-on-existing-data escape hatch), then
    publishes ONE metadata-only transaction.  Raises
    ``ConstraintViolation`` and commits nothing if existing rows
    violate."""
    import re as _re

    from ..stages.predicate import PRED_OPS, pred_mask_raw
    from ..state.manifest import partition_file_list
    from ..state.schema_registry import storage_aliases

    if not _re.fullmatch(_CONSTRAINT_NAME_RE, name):
        raise ValueError(f"constraint name {name!r} must match {_CONSTRAINT_NAME_RE}")
    if op not in PRED_OPS:
        raise ValueError(f"constraint op must be one of {PRED_OPS}, got {op!r}")
    _scalars = (str, int, float, bool)
    if op == "notnull":
        value = None  # valueless op (SQL NOT NULL); nothing to store
    elif op == "in":
        if not isinstance(value, (list, tuple)) or not all(
            isinstance(v, _scalars) for v in value
        ):
            raise ValueError("`in` constraint value must be a list of JSON scalars")
        value = list(value)
    elif not isinstance(value, _scalars):
        raise ValueError(
            f"constraint value must be a JSON scalar (manifest-storable), "
            f"got {type(value).__name__}"
        )
    lake = LakeTable(lake_root)
    manifest = lake.read_manifest()
    schema = lake.schema(manifest)
    if column.startswith("_"):
        raise ValueError(f"cannot constrain internal column {column!r}")
    if column not in schema.names:
        raise ValueError(
            f"constraint column {column!r} not in table schema {schema.names}"
        )
    constraints = dict(manifest.get("constraints", {}))
    if name in constraints:
        raise ValueError(f"constraint {name!r} already exists; drop it first")
    if op == "notnull":
        # coalesce (partial-image) tables: an update event legitimately
        # ships null for every UNCHANGED column, so a notnull gate would
        # quarantine all partial updates — refuse it (same in-file
        # detection as rename_column)
        for meta in manifest["partitions"].values():
            rel = meta.get("file")
            if rel:
                names = pq.read_schema(
                    os.path.join(lake_root, rel), filesystem=lake.fs.pyarrow_fs
                ).names
                if "_up_ts" in names:
                    raise NotImplementedError(
                        "notnull constraints are not supported on coalesce "
                        "(partial-image) tables: updates carry nulls for "
                        "unchanged columns by design"
                    )
                break
    # fail-fast type check: evaluate the predicate against a zero-row
    # array of the column's CURRENT type, so a value/column type mismatch
    # surfaces HERE, not inside a replay combiner task months later
    try:
        pred_mask_raw(pa.array([], schema.field(column).type), op, value)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError) as exc:
        raise ValueError(
            f"constraint predicate {column} {op} {value!r} is not evaluable "
            f"against column type {schema.field(column).type}: {exc}"
        ) from None

    renames = manifest.get("renames", [])
    drops = manifest.get("drops", [])
    scanned = pruned = 0
    if verify:
        aliases = storage_aliases(column, renames)
        probes = []
        for pid, meta in manifest["partitions"].items():
            files = partition_file_list(meta)
            if files:
                probes.append(
                    _prove_partition_clean.remote(
                        lake_root, int(pid), files, aliases, op, value
                    )
                )
        todo = [pid for pid, clean in ray.get(probes) if not clean]
        scanned, pruned = len(todo), len(probes) - len(todo)
        if todo:
            schema_json = _schema_to_json_cached(schema)
            counts = ray.get(
                [
                    _count_partition_violations.remote(
                        lake_root, pid, manifest["partitions"][str(pid)],
                        schema_json, column, op, value, key, ts_col,
                        renames, drops,
                    )
                    for pid in todo
                ]
            )
            bad = {pid: n for pid, n in counts if n}
            if bad:
                raise ConstraintViolation(
                    f"cannot add constraint {name!r}: {sum(bad.values())} "
                    f"existing live row(s) violate {column} {op} {value!r} "
                    f"in partition(s) {sorted(bad)}"
                )
    constraints[name] = {"column": column, "op": op, "value": value}
    txid = lake.next_txid(manifest)
    m = lake.commit(
        manifest,
        txid,
        [],
        applied_segments=[f"__set_constraint_{name}_{txid}__"],
        applied_lsn_range=None,
        constraints=constraints,
        extras={
            "set_constraint": {"name": name, "column": column, "op": op,
                               "value": value, "verified": bool(verify)},
            "partitions_scanned": scanned,
            "partitions_pruned": pruned,
        },
    )
    return m["lineage"][-1]


def _drop_constraint_impl(lake_root: str, name: str) -> dict:
    """Remove a named CHECK constraint in ONE metadata-only transaction;
    subsequent replays stop quarantining its violators.  Raises KeyError
    if no such constraint."""
    lake = LakeTable(lake_root)
    manifest = lake.read_manifest()
    constraints = dict(manifest.get("constraints", {}))
    if name not in constraints:
        raise KeyError(
            f"no constraint {name!r} on {lake_root}; "
            f"have {sorted(constraints)}"
        )
    dropped = constraints.pop(name)
    txid = lake.next_txid(manifest)
    m = lake.commit(
        manifest,
        txid,
        [],
        applied_segments=[f"__drop_constraint_{name}_{txid}__"],
        applied_lsn_range=None,
        constraints=constraints,
        extras={"drop_constraint": {"name": name, **dropped}},
    )
    return m["lineage"][-1]


def list_constraints(lake_root: str) -> dict:
    """Current CHECK constraints: name -> {column, op, value}."""
    return dict(LakeTable(lake_root).read_manifest().get("constraints", {}))


def set_constraint(lake_root, name, column, op, value, **kwargs):
    from ..state.manifest import writer_lock

    with writer_lock(lake_root):
        return _set_constraint_impl(lake_root, name, column, op, value, **kwargs)


def drop_constraint(lake_root, name):
    from ..state.manifest import writer_lock

    with writer_lock(lake_root):
        return _drop_constraint_impl(lake_root, name)


set_constraint.__doc__ = _set_constraint_impl.__doc__
drop_constraint.__doc__ = _drop_constraint_impl.__doc__


# -- ANALYZE: table statistics into the manifest ------------------------------
# One distributed pass over the merged LIVE state collects per-column
# statistics — row/null counts, HLL NDV estimate (stages/sketch.py:
# register partials max-merge on the driver, 4 KiB per column per
# partition, raw values never leave their task), min/max, mean byte
# length for string/binary — and publishes them into the manifest in a
# metadata-only transaction.  The optimizer story at 100 TB: NDV sizes
# shuffles and join sides, null fraction gates quality dashboards, and
# min/max complement the per-file footer stats with a table-level view.
# Stats are a SNAPSHOT (stamped with the txid they were computed at);
# consumers check `as_of_txid` for staleness and re-run `analyze` after
# large ingests.  The reference has no statistics at all.


@ray.remote
def _analyze_partition(
    lake_root: str, pid: int, meta: dict, schema_json: dict,
    columns: list[str], key: str, ts_col: str,
    renames: list | None, drops: list | None, p: int,
) -> dict:
    """Per-column partials over one partition's merged live rows:
    (rows, nulls, hll_registers, min, max, total_bytes)."""
    from ..stages.merge import load_partition_state
    from ..stages.sketch import hll_partial
    from ..state.manifest import _schema_from_json

    tbl = load_partition_state(
        lake_root, meta, schema=_schema_from_json(schema_json), key=key,
        ts_col=ts_col, renames=renames, drops=drops,
        columns=columns,  # prune the read: a 2-column ANALYZE must not
        # pull the html payload off storage (the LWW fold's own needs —
        # key/ts/internals — are added by load_partition_state)
    )
    live = tbl.filter(pc.invert(tbl.column("_deleted")))
    out = {"_rows": live.num_rows}
    for col in columns:
        arr = live.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        nulls = arr.null_count
        t = arr.type
        # hashable view for the NDV sketch: temporal/bool -> int64,
        # floats -> same-width bit pattern (distinctness of the bits)
        h = arr
        if (
            pa.types.is_timestamp(t) or pa.types.is_date(t)
            or pa.types.is_time(t) or pa.types.is_boolean(t)
        ):
            h = arr.cast(pa.int64())
        elif pa.types.is_float64(t):
            h = arr.view(pa.int64())
        elif pa.types.is_float32(t):
            h = arr.view(pa.int32()).cast(pa.int64())
        regs = hll_partial(h, p=p) if live.num_rows else None
        mn = mx = None
        if live.num_rows > nulls:
            mm = pc.min_max(arr)
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
        nbytes = None
        if pa.types.is_string(t) or pa.types.is_large_string(t) \
                or pa.types.is_binary(t) or pa.types.is_large_binary(t):
            nbytes = int(
                pc.sum(pc.binary_length(arr)).as_py() or 0
            )
        out[col] = (nulls, regs, mn, mx, nbytes)
    return out


def _json_safe(v):
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, bytes):
        return v[:64].hex()  # bounded: stats, not data
    return str(v)  # timestamps/decimals -> ISO/str repr


def _analyze_impl(
    lake_root: str,
    columns: list[str] | None = None,
    *,
    key: str = "url",
    ts_col: str = "warc_ts",
    p: int = 12,
) -> dict:
    """ANALYZE TABLE (see section comment above): compute per-column
    statistics over the live state and publish them into the manifest
    as ``table_stats`` in one metadata-only transaction.  ``columns``
    defaults to every non-internal schema column; ``p`` is the HLL
    precision (2^p uint8 registers per column per partition in flight;
    relative NDV error ~1.04/sqrt(2^p), ~1.6% at the default).
    Returns the published stats record."""
    from ..stages.sketch import hll_estimate, hll_merge
    from ..state.manifest import partition_file_list

    lake = LakeTable(lake_root)
    manifest = lake.read_manifest()
    schema = lake.schema(manifest)
    if columns is None:
        columns = [n for n in schema.names if not n.startswith("_")]
    for c in columns:
        if c not in schema.names:
            raise ValueError(f"analyze column {c!r} not in schema {schema.names}")
    renames = manifest.get("renames", [])
    drops = manifest.get("drops", [])
    schema_json = _schema_to_json_cached(schema)
    futs = [
        _analyze_partition.remote(
            lake_root, int(pid), meta, schema_json, columns, key, ts_col,
            renames, drops, p,
        )
        for pid, meta in manifest["partitions"].items()
        if partition_file_list(meta)
    ]
    parts = ray.get(futs)
    rows = sum(pt["_rows"] for pt in parts)
    col_stats = {}
    for col in columns:
        nulls = sum(pt[col][0] for pt in parts)
        regs = [pt[col][1] for pt in parts if pt[col][1] is not None]
        ndv = int(round(hll_estimate(hll_merge(regs)))) if regs else 0
        mns = [pt[col][2] for pt in parts if pt[col][2] is not None]
        mxs = [pt[col][3] for pt in parts if pt[col][3] is not None]
        nb = [pt[col][4] for pt in parts if pt[col][4] is not None]
        non_null = rows - nulls
        col_stats[col] = {
            "nulls": int(nulls),
            "null_frac": round(nulls / rows, 6) if rows else None,
            "ndv": min(ndv, non_null),  # estimate cannot exceed population
            "min": _json_safe(min(mns)) if mns else None,
            "max": _json_safe(max(mxs)) if mxs else None,
            "avg_len": (
                round(sum(nb) / non_null, 2) if nb and non_null else None
            ),
        }
    txid = lake.next_txid(manifest)
    stats = {
        "as_of_txid": manifest["txid"],
        "analyzed_txid": txid,
        "rows": int(rows),
        "hll_p": int(p),
        "columns": col_stats,
    }
    manifest2 = dict(manifest)
    manifest2["table_stats"] = stats
    lake.commit(
        manifest2,
        txid,
        [],
        applied_segments=[f"__analyze_{txid}__"],
        applied_lsn_range=None,
        extras={"analyze": {"columns": list(columns), "rows": int(rows)}},
    )
    return stats


def table_stats(lake_root: str) -> dict | None:
    """Latest published ANALYZE record (None if never analyzed).  Check
    ``as_of_txid`` against the current manifest txid for staleness."""
    return LakeTable(lake_root).read_manifest().get("table_stats")


def analyze(lake_root, columns=None, **kwargs):
    from ..state.manifest import writer_lock

    with writer_lock(lake_root):
        return _analyze_impl(lake_root, columns, **kwargs)


analyze.__doc__ = _analyze_impl.__doc__


# -- table clone (snapshot export) --------------------------------------------
# Deep-copy a committed snapshot into a fresh lake: backup/restore, dev
# clones, and fork-for-experiment without touching the source.  The
# clone carries the FULL exactly-once ledger (applied segments + LSN
# ranges), schema-evolution metadata (rename chain, drop log), and the
# CHECK constraints in force — so `replay` against the same WAL resumes
# on the clone exactly where the snapshot left off, and the clone
# evolves independently afterwards.  File copies fan out as Ray tasks
# through the fs adapter (object-store portable); the clone publishes
# via the same seq-1 conditional-put CAS as every other commit, so a
# crashed clone leaves only an un-referenced directory.


@ray.remote(num_cpus=0.25)
def _copy_rels(src_root: str, dst_root: str, rels: list[str]) -> int:
    from ..state.fs import resolve as _resolve

    adapter = _resolve(None)
    pafs = adapter.pyarrow_fs  # None on the plain-os adapter
    n = 0
    for rel in rels:
        src = os.path.join(src_root, rel)
        dst = os.path.join(dst_root, rel)
        adapter.makedirs(os.path.dirname(dst))
        if pafs is None:
            import shutil as _sh

            _sh.copyfile(src, dst)
        else:
            with pafs.open_input_stream(src) as r, \
                    pafs.open_output_stream(dst) as w:
                while True:
                    chunk = r.read(8 << 20)
                    if not chunk:
                        break
                    w.write(chunk)
        n += 1
    return n


def _ledger_upto(src: "LakeTable", txid: str) -> tuple[list, list]:
    """Cumulative (applied_segments, lsn_ranges) as of a historical
    txid, reconstructed from the immutable per-tx records.  Ranges are
    per-TRANSACTION granular (the per-tx record stores the merged
    [lo, hi]); with in-order WAL publication that equals the head
    ledger, with out-of-order (broker) publication it is coarser —
    exact resume from a historical clone then relies on the
    file-level applied_segments set, which is always exact."""
    seq = int(txid.removeprefix("tx"))
    segs: list = []
    ranges: list = []
    for n in range(1, seq + 1):
        rec = src.fs.read_json(
            os.path.join(src.manifests_dir, f"tx{n:06d}.json")
        )
        segs.extend(rec.get("applied_segments", []))
        r = rec.get("applied_lsn_range")
        if r:
            ranges.append(list(r))
    return segs, ranges


def clone_table(
    src_root: str,
    dst_root: str,
    *,
    at_txid: str | None = None,
    at_ts=None,
) -> dict:
    """Clone ``src_root``'s committed state (head, or a snapshot via
    ``at_txid`` / ``at_ts``) into a NEW lake at ``dst_root`` (see
    section comment above).  Returns the clone's lineage record."""
    from ..state.manifest import resolve_txid_at_ts

    if at_txid is not None and at_ts is not None:
        raise ValueError("pass at_txid or at_ts, not both")
    src = LakeTable(src_root)
    if at_ts is not None:
        at_txid = resolve_txid_at_ts(src_root, at_ts)
    if at_txid is None:
        m = src.read_manifest()
        state = {
            k: m[k] for k in (
                "num_partitions", "schema", "schema_version", "partitions",
                "applied_segments", "applied_lsn_ranges",
            )
        }
        for k in ("renames", "drops", "constraints"):
            if m.get(k):
                state[k] = m[k]
        src_txid = m["txid"]
    else:
        snap = src.manifest_at(at_txid)
        rec = src.fs.read_json(
            os.path.join(src.manifests_dir, f"{at_txid}.json")
        )
        segs, ranges = _ledger_upto(src, at_txid)
        state = {
            "num_partitions": snap["num_partitions"],
            "schema": snap["schema"],
            # schema_version is not snapshotted per tx; the clone restarts
            # version counting (cosmetic — evolution compares schemas, not
            # version numbers)
            "schema_version": 0,
            "partitions": snap["partitions"],
            "applied_segments": segs,
            "applied_lsn_ranges": ranges,
        }
        if snap.get("renames"):
            state["renames"] = snap["renames"]
        if snap.get("drops"):
            state["drops"] = snap["drops"]
        if rec.get("snapshot", {}).get("constraints"):
            state["constraints"] = rec["snapshot"]["constraints"]
        src_txid = at_txid

    from ..state.manifest import _schema_from_json, partition_file_list
    from .tags import create_tag, delete_tag

    dst = LakeTable(dst_root, num_partitions=state["num_partitions"])
    dst.init(_schema_from_json(state["schema"]), state["num_partitions"])

    rels = [
        rel
        for meta in state["partitions"].values()
        for rel in partition_file_list(meta)
    ]
    # pin the snapshot against a concurrent vacuum on the SOURCE for the
    # duration of the copy (vacuum auto-protects tagged snapshots) —
    # cheaper than holding the source writer lock across a 100 TB copy
    guard = f"__clone_{os.getpid()}_{src_txid}"
    create_tag(src_root, guard, src_txid, replace=True)
    try:
        futs = [
            _copy_rels.remote(src_root, dst_root, rels[i:i + 16])
            for i in range(0, len(rels), 16)
        ]
        copied = sum(ray.get(futs))
    finally:
        try:
            delete_tag(src_root, guard)
        except KeyError:
            pass
    m = dst.install_snapshot(
        state,
        provenance={
            "cloned_from": src_root,
            "cloned_txid": src_txid,
            "files_copied": copied,
        },
    )
    return m["lineage"][-1]


def sync_clone(src_root: str, dst_root: str, *, force: bool = False) -> dict:
    """Incrementally update a clone to the source's CURRENT head,
    copying only the files of partitions that changed since the last
    clone/sync — O(changed partitions) per sync, the replication shape
    for a 100 TB mirror (continuous DR / read-replica feeding).

    Mirror semantics: the destination's state is REPLACED by the source
    head (partitions, ledger, schema, rename chain, drop log,
    constraints) in one CAS-published transaction; superseded local
    files become vacuum-reclaimable orphans.  Refused when the
    destination has committed anything since its last clone/sync (it
    diverged — ``force=True`` overwrites anyway, keeping time travel to
    the divergent snapshots until vacuum).  A source that hasn't moved
    is a no-op (no transaction)."""
    from ..state.manifest import partition_file_list

    src = LakeTable(src_root)
    dst = LakeTable(dst_root)
    sm = src.read_manifest()
    with writer_lock_for(dst_root):
        dm = dst.read_manifest()
        last = dm["lineage"][-1] if dm["lineage"] else {}
        mirror_of = last.get("synced_from") or last.get("cloned_from")
        if mirror_of != src_root and not force:
            raise ValueError(
                f"sync_clone: {dst_root} is not an up-to-date mirror of "
                f"{src_root} (last tx {last.get('txid')} is "
                f"{'a local commit' if mirror_of is None else f'a mirror of {mirror_of}'}); "
                "pass force=True to overwrite"
            )
        synced_txid = last.get("synced_txid") or last.get("cloned_txid")
        if mirror_of == src_root and synced_txid == sm["txid"]:
            return {"synced_txid": sm["txid"], "partitions_updated": 0,
                    "files_copied": 0, "noop": True}

        # identity = (rows, checksum) per file entry, NOT the file name:
        # two lakes mint txids independently, so a diverged mirror can
        # hold different bytes under the same part-{pid}-{txid} name —
        # a name-only diff would keep the stale local file
        def _file_entries(meta: dict) -> dict:
            out = {}
            if meta.get("file"):
                out[meta["file"]] = (meta.get("rows"), meta.get("checksum"))
            for d in meta.get("deltas", []):
                out[d["file"]] = (d.get("rows"), d.get("checksum"))
            return out

        dst_files = {
            pid: _file_entries(meta) for pid, meta in dm["partitions"].items()
        }
        rels: list[str] = []
        changed = 0
        for pid, meta in sm["partitions"].items():
            want = _file_entries(meta)
            have = dst_files.get(pid, {})
            missing = [r for r, ident in want.items() if have.get(r) != ident]
            if missing:
                changed += 1
                rels.extend(missing)
        from .tags import create_tag, delete_tag

        guard = f"__sync_{os.getpid()}_{sm['txid']}"
        create_tag(src_root, guard, sm["txid"], replace=True)
        try:
            futs = [
                _copy_rels.remote(src_root, dst_root, rels[i:i + 16])
                for i in range(0, len(rels), 16)
            ]
            copied = sum(ray.get(futs))
        finally:
            try:
                delete_tag(src_root, guard)
            except KeyError:
                pass
        state = {
            k: sm[k] for k in (
                "num_partitions", "schema", "schema_version", "partitions",
                "applied_segments", "applied_lsn_ranges",
            )
        }
        for k in ("renames", "drops", "constraints"):
            if sm.get(k):
                state[k] = sm[k]
        m = dst.publish_state(
            state,
            provenance={
                "synced_from": src_root,
                "synced_txid": sm["txid"],
                "partitions_updated": changed,
                "files_copied": copied,
            },
        )
        return m["lineage"][-1]


def writer_lock_for(root: str):
    from ..state.manifest import writer_lock

    return writer_lock(root)


def _maintenance_signals(lake_root: str) -> dict:
    """Cheap health probe for the policy loop: chain lengths from the
    manifest (free), tombstone counts from parquet footers (one
    metadata GET per base file — no data pages), orphan files from one
    directory listing.

    The tombstone ratio is computed over FLAT partitions only, where it
    is exact (footer rows − manifest live rows = tombstones).  On a
    chained partition "stored − live" would also count superseded row
    versions and pure-insert delta rows as tombstone debt — the
    fold-chains action runs first precisely so the refreshed ratio
    becomes exact.  Orphan counting honors the same protection set
    vacuum does (tag-pinned snapshots), so a tagged lake reports 0
    reclaimable orphans instead of recommending a vacuum that can never
    reclaim anything."""
    from ..state.fs import resolve as _resolve
    from ..state.manifest import partition_file_list
    from .tags import list_tags

    lake = LakeTable(lake_root)
    m = lake.read_manifest()
    _fs = _resolve(None)
    chains = {
        int(pid): len(meta.get("deltas", []) or [])
        for pid, meta in m["partitions"].items()
    }
    live = 0
    stored = 0
    for meta in m["partitions"].values():
        if meta.get("deltas"):
            continue  # chained: ratio undefined until folded
        rel = meta.get("file")
        if rel:
            live += int(meta.get("rows", 0))
            stored += pq.read_metadata(
                os.path.join(lake_root, rel), filesystem=_fs.pyarrow_fs
            ).num_rows
    referenced = {
        os.path.basename(rel)
        for p in m["partitions"].values()
        for rel in partition_file_list(p)
    }
    for txid in sorted(set(list_tags(lake_root, fs=lake.fs).values())):
        snap = lake.manifest_at(txid)
        referenced |= {
            os.path.basename(rel)
            for p in snap["partitions"].values()
            for rel in partition_file_list(p)
        }
    parts_dir = os.path.join(lake_root, "parts")
    try:
        on_disk = set(_fs.listdir(parts_dir))
    except (FileNotFoundError, OSError):
        on_disk = set()
    return {
        "txid": m["txid"],
        "partitions": len(chains),
        "max_chain": max(chains.values(), default=0),
        "chained_partitions": sum(1 for v in chains.values() if v),
        "live_rows": live,
        "stored_rows": stored,
        "tombstone_rows": stored - live,
        "tombstone_ratio": (stored - live) / stored if stored else 0.0,
        "orphan_files": len(on_disk - referenced),
    }


def auto_maintain(
    lake_root: str,
    *,
    max_chain: int = 3,
    tombstone_ratio: float = 0.2,
    assume_caught_up: bool = False,
    lateness_us: int | None = None,
    run_vacuum: bool = True,
    keep_txids: list[str] | None = None,
    dry_run: bool = False,
) -> dict:
    """Policy-driven maintenance — the one-call OPTIMIZE loop an
    operator schedules after each tailing window instead of hand-
    sequencing compact_deltas / compact / vacuum.

    Signals → actions, in dependency order (each re-reads the manifest
    the previous action committed):

    1. any delta chain >= ``max_chain``  → ``compact_deltas``
       (fold merge-on-read chains; read cost is chain-length-linear,
       so bounding it bounds every reader);
    2. tombstone rows / stored rows >= ``tombstone_ratio``
       → ``compact`` — but ONLY under ``assume_caught_up=True`` or an
       explicit ``lateness_us`` bound (tombstone GC is correctness-
       sensitive while the WAL may still redeliver; without either
       flag the condition is REPORTED as a recommendation, never run);
    3. orphan part files present and ``run_vacuum`` → ``vacuum``
       (tag- and ``keep_txids``-protected snapshots survive, as ever).

    ``dry_run=True`` evaluates every signal and returns the
    recommendations without touching the lake.  Returns
    ``{"signals", "actions", "recommendations"}`` where actions carry
    each executed step's lineage.  Idempotent: a second run on a
    healthy lake does nothing."""
    sig = _maintenance_signals(lake_root)
    actions: list[dict] = []
    recs: list[str] = []

    if sig["max_chain"] >= max_chain:
        rec = (
            f"fold {sig['chained_partitions']} delta chain(s) "
            f"(longest {sig['max_chain']} >= max_chain {max_chain})"
        )
        if dry_run:
            recs.append(rec)
        else:
            lin = compact_deltas(lake_root, min_chain=max_chain)
            actions.append({"kind": "compact_deltas", "lineage": lin})
            sig = _maintenance_signals(lake_root)  # chains now folded

    if sig["stored_rows"] and sig["tombstone_ratio"] >= tombstone_ratio:
        rec = (
            f"compact {sig['tombstone_rows']} tombstone row(s) "
            f"({sig['tombstone_ratio']:.1%} of stored >= "
            f"{tombstone_ratio:.1%})"
        )
        if dry_run:
            recs.append(
                rec if (assume_caught_up or lateness_us is not None)
                else rec + " — blocked: needs assume_caught_up or lateness_us"
            )
        elif assume_caught_up or lateness_us is not None:
            lin = compact(
                lake_root,
                assume_caught_up=assume_caught_up,
                **({"lateness_us": lateness_us} if lateness_us is not None else {}),
            )
            actions.append({"kind": "compact", "lineage": lin})
            sig = _maintenance_signals(lake_root)
        else:
            recs.append(rec + " — blocked: needs assume_caught_up or lateness_us")

    if sig["orphan_files"] and run_vacuum:
        if dry_run:
            recs.append(f"vacuum {sig['orphan_files']} orphan file(s)")
        else:
            res = vacuum(lake_root, keep_txids=keep_txids)
            actions.append({"kind": "vacuum", "result": res})
            sig = _maintenance_signals(lake_root)

    return {"signals": sig, "actions": actions, "recommendations": recs}


def expire_snapshots(
    lake_root: str,
    *,
    keep_last: int = 2,
    keep_committed_after_us: int | None = None,
    keep_txids: list[str] | None = None,
) -> dict:
    """Snapshot retention policy (the Iceberg ``expireSnapshots``
    shape): compute the keep-set from the commit lineage — the head,
    the last ``keep_last`` transactions, anything committed at or after
    ``keep_committed_after_us`` (absolute epoch µs), any explicit
    ``keep_txids`` — and vacuum the part files only older snapshots
    reference.  Tag-pinned snapshots are additionally protected by
    vacuum itself (tags ARE the indefinite-retention mechanism; this
    call handles the untagged tail).

    Time travel to an expired txid fails at read time (its files are
    gone) unless every file it references is still shared with a kept
    snapshot; per-tx snapshot manifests themselves are metadata and are
    never deleted.  Returns ``{"kept", "expired", **vacuum_result}``."""
    from .tags import list_tags

    lake = LakeTable(lake_root)
    m = lake.read_manifest()
    lineage = m.get("lineage", [])
    all_txids = [rec["txid"] for rec in lineage]
    keep = set(keep_txids or ())
    keep.add(m["txid"])  # the head is never expirable
    if keep_last > 0:
        keep.update(all_txids[-keep_last:])
    if keep_committed_after_us is not None:
        keep.update(
            rec["txid"]
            for rec in lineage
            if int(rec.get("committed_at", 0)) >= keep_committed_after_us
        )
    # tag-pinned snapshots survive vacuum regardless; report them as
    # kept so the audit trail matches what actually happens on disk
    keep.update(set(list_tags(lake_root, fs=lake.fs).values()))
    expired = [t for t in all_txids if t not in keep]
    res = vacuum(lake_root, keep_txids=sorted(keep - {m["txid"]}))
    return {
        "kept": sorted(keep),
        "expired": expired,
        **res,
    }
