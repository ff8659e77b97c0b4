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

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..state.manifest import LakeTable


@ray.remote
def _compact_partition(
    lake_root: str, txid: str, pid: int, rel_file: str, watermark_lsn: int
) -> dict:
    from ..stages.merge import _checksum

    tbl = pq.read_table(os.path.join(lake_root, rel_file))
    dead = pc.and_(
        tbl.column("_deleted"),
        pc.less_equal(tbl.column("_lsn"), pa.scalar(watermark_lsn, pa.int64())),
    )
    out = tbl.filter(pc.invert(dead))
    path = os.path.join(lake_root, "staging", txid, f"part-{pid:05d}.parquet")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(out, path)
    live = out.filter(pc.invert(out.column("_deleted")))
    lsn_np = out.column("_lsn").to_numpy(zero_copy_only=False)
    ck = _checksum(
        live.column("url").to_pylist(),
        live.column("warc_ts").cast(pa.int64()).to_numpy(zero_copy_only=False),
        live.column("_lsn").to_numpy(zero_copy_only=False),
    )
    return {
        "pid": pid,
        "rows": live.num_rows,
        "checksum": ck,
        "lsn_hi": int(lsn_np.max()) if len(lsn_np) else 0,
        "events_applied": 0,
        "tombstones_dropped": int(tbl.num_rows - out.num_rows),
    }


def compact(lake_root: str, watermark_lsn: int | None = None) -> dict:
    """Drop tombstones at or below ``watermark_lsn`` (default: the highest
    applied LSN — valid when the WAL is replayed strictly in segment
    order, which ``replay()`` guarantees).  Returns the tx lineage."""
    lake = LakeTable(lake_root)
    manifest = lake.read_manifest()
    if watermark_lsn is None:
        watermark_lsn = max(
            (hi for _, hi in manifest["applied_lsn_ranges"]), default=0
        )
    txid = lake.next_txid(manifest)
    futs = [
        _compact_partition.remote(
            lake_root, txid, int(pid), meta["file"], int(watermark_lsn)
        )
        for pid, meta in manifest["partitions"].items()
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
            "tombstones_dropped": int(sum(r["tombstones_dropped"] for r in results)),
        },
    )
    return m["lineage"][-1]


def vacuum(lake_root: str) -> dict:
    """Delete unreferenced part files and stale staging dirs."""
    import shutil

    lake = LakeTable(lake_root)
    manifest = lake.read_manifest()
    referenced = {os.path.basename(p["file"]) for p in manifest["partitions"].values()}
    removed_parts = 0
    if os.path.isdir(lake.parts_dir):
        for f in os.listdir(lake.parts_dir):
            if f.endswith(".parquet") and f not in referenced:
                os.remove(os.path.join(lake.parts_dir, f))
                removed_parts += 1
    removed_staging = 0
    if os.path.isdir(lake.staging_root):
        for d in os.listdir(lake.staging_root):
            shutil.rmtree(os.path.join(lake.staging_root, d), ignore_errors=True)
            removed_staging += 1
    return {"removed_parts": removed_parts, "removed_staging_dirs": removed_staging}
