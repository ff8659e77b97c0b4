"""The flagship CDC replay pipeline (WAL tail -> exactly-once lake upsert).

Ray-Data-native restatement of the reference's loader loop
(`src/pipeline/core/client_clickhouse.py:154-206` +
`src/pipeline/core/spark.py:134-177` in /root/reference), per SURVEY.md §3.4:

    pending segments (ledger diff)
      -> ray.data.read_parquet(segments, schema=unified)   # null-fills old-schema segments
      -> map_batches(combiner, batch_format="pyarrow")      # pid/salt assign + per-batch LWW compact
      -> [salted pre-reduce: groupby(pid, salt).map_groups(lww_compact)]   # hot-key skew
      -> groupby(pid).map_groups(MergePartition)            # disk-backed per-partition merge
      -> driver: atomic manifest commit (exactly-once)

Everything streams: the only materialized result per transaction is the
tiny lineage table (<= num_partitions rows).
"""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..config import PAGES, TableSpec
from ..gen import PAGES_SCHEMA
from ..stages.merge import INTERNAL_COLS, MergePartition, lww_compact
from ..stages.partition import add_partition_cols
from ..state.manifest import LakeTable, partition_file_list
from ..state.schema_registry import conform, evolve

# WAL envelope columns that are not lake payload
_WAL_META = ("lsn", "op")

# Serializes Dataset PLAN CONSTRUCTION across replay_many threads.  Ray's
# path resolution probes `from fsspec.implementations.http import
# HTTPFileSystem` on every read_parquet; with aiohttp absent that import
# fails every time (failed imports are not cached), and two threads
# failing the SAME import concurrently can observe a partially
# initialized module — a plain ImportError("cannot import name ...")
# that Ray's `except ModuleNotFoundError` does not catch.  Plan
# construction is milliseconds; execution still interleaves freely.
_plan_lock = threading.Lock()


@dataclass
class ReplayStats:
    transactions: int = 0
    events_applied: int = 0
    segments_applied: int = 0
    rows_live: int = 0
    schema_version: int = 0


# ---------------------------------------------------------------------------
# shared CPU-headroom cap (thread-safe: concurrent replay_many streams all
# mutate ONE global DataContext, so the cap is refcounted)
# ---------------------------------------------------------------------------

_limits_lock = threading.Lock()
_limits_depth = 0
_limits_prev = None
_limits_set = False


def _default_cpu_cap() -> int:
    """Per-NODE worker-width cap, summed across nodes.  Two measured
    ceilings on wide nodes (4M-event fixture):

    * the raylet + object-store data plane needs ~2 dedicated cores
      during shuffle-heavy phases — at a 16-CPU node, width 14 ran
      372-468k events/s vs 241-386k at full width 16 (fresh-process
      trials, same day);
    * memory bandwidth saturates beyond ~16-20 concurrent heavy workers
      (width 20 = 381k vs width 24 = 240k, round-2 sweep).

    Rule: full width on small nodes (<= 8 CPUs, where reserving cores
    measurably LOSES throughput), else ``min(16, node_cpus - 2)``.  Each
    cluster node brings its own bus and its own raylet, so the cap scales
    with node count, not total CPUs."""
    import ray as _ray

    total = 0
    for node in _ray.nodes():
        if not node.get("Alive"):
            continue
        node_cpus = int(node.get("Resources", {}).get("CPU", 0))
        total += node_cpus if node_cpus <= 8 else min(16, node_cpus - 2)
    return total


@contextmanager
def _cpu_headroom(ncpu: int):
    """Cap executor width on wide sessions (raylet/object-store/driver
    threads starve at full width, and memory bandwidth saturates — see
    _default_cpu_cap / BASELINE.md).  ``ETLRAY_CPU_CAP`` overrides.
    Reentrant: first enter sets the cap, last exit restores."""
    global _limits_depth, _limits_prev, _limits_set
    from ray.data import DataContext, ExecutionResources

    exec_opts = DataContext.get_current().execution_options
    cap_env = os.environ.get("ETLRAY_CPU_CAP")
    with _limits_lock:
        _limits_depth += 1
        if _limits_depth == 1:
            cap = int(cap_env) if cap_env else _default_cpu_cap()
            if cap < ncpu:
                _limits_prev = exec_opts.resource_limits
                _limits_set = True
                exec_opts.resource_limits = ExecutionResources(cpu=cap)
    try:
        yield
    finally:
        with _limits_lock:
            _limits_depth -= 1
            if _limits_depth == 0 and _limits_set:
                exec_opts.resource_limits = _limits_prev
                _limits_prev = None
                _limits_set = False


def list_segments(wal_dir: str) -> list[str]:
    return sorted(
        os.path.join(wal_dir, f)
        for f in os.listdir(wal_dir)
        if f.endswith(".parquet")
    )


# ---------------------------------------------------------------------------
# bootstrap: load the pre-existing base table into partitioned lake form
# ---------------------------------------------------------------------------


class _BootstrapPartition:
    """map_groups callable: write one pid's base rows as a staged file."""

    def __init__(
        self, lake_root: str, txid: str, schema: pa.Schema,
        fs_spec: str = "local-os",
        key: str = "url",
        ts_col: str = "warc_ts",
    ):
        self.__name__ = "_BootstrapPartition"
        self.lake_root = lake_root
        self.txid = txid
        self.schema = schema
        self.fs_spec = fs_spec
        self.key = key
        self.ts_col = ts_col

    def __call__(self, group: pa.Table) -> pa.Table:
        import numpy as np

        from ..stages.merge import _checksum

        pid = int(group.column("pid")[0].as_py())
        body = conform(group.drop_columns(["pid"]), self.schema)
        body = body.append_column("_lsn", pa.array(np.zeros(body.num_rows, np.int64)))
        body = body.append_column("_deleted", pa.array(np.zeros(body.num_rows, bool)))
        body = body.take(pc.sort_indices(body, sort_keys=[(self.key, "ascending")]))
        from ..state.fs import resolve

        fs = resolve(self.fs_spec)
        out = os.path.join(self.lake_root, "staging", self.txid, f"part-{pid:05d}.parquet")
        fs.makedirs(os.path.dirname(out))
        pq.write_table(body, out, filesystem=fs.pyarrow_fs)
        ck = _checksum(
            body.column(self.key),
            body.column(self.ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False),
            body.column("_lsn").to_numpy(zero_copy_only=False),
        )
        from ..state.partstats import stats_json

        return pa.table(
            {
                "pid": pa.array([pid], pa.int32()),
                "rows": pa.array([body.num_rows], pa.int64()),
                "checksum": pa.array([ck], pa.uint64()),
                "lsn_hi": pa.array([0], pa.int64()),
                "events_applied": pa.array([0], pa.int64()),
                "stats_json": pa.array([stats_json(body)], pa.string()),
            }
        )


def bootstrap_lake(
    lake_root: str,
    base_parquet: str | None,
    num_partitions: int = 32,
    schema: pa.Schema | None = None,
    fs=None,
    spec=None,
) -> LakeTable:
    """Create the lake table; if ``base_parquet`` given, load it as tx 1.
    ``fs``: filesystem adapter or spec string (state/fs.py); None
    consults ETLRAY_FS (default local-os).  ``spec``: a TableSpec for
    non-pages tables — supplies schema_v0 and the partitioning
    key/ordering columns (base rows of ANY keyed table bootstrap through
    the same path)."""
    lake = LakeTable(lake_root, num_partitions, fs=fs)
    key, ts_col = ("url", "warc_ts") if spec is None else (spec.key, spec.ts_col)
    if spec is not None and schema is None:
        schema = spec.schema_v0
    schema = schema or PAGES_SCHEMA
    manifest = lake.init(schema, num_partitions)
    if base_parquet is None:
        return lake
    txid = lake.next_txid(manifest)
    # Read blocks <= pid groups: extra blocks become EMPTY sorted ranges
    # after the pid groupby, and empty blocks carry no schema (executor
    # logs a schema-mismatch warning per task and the map_groups wrapper
    # yields nothing for them — wasted shuffle fragments).
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    n_blocks = max(1, min(ncpu, num_partitions))
    ds = ray.data.read_parquet(base_parquet, override_num_blocks=n_blocks)
    ds = ds.map_batches(
        lambda t: add_partition_cols(t, num_partitions, key=key),
        batch_format="pyarrow",
    )
    lineage_ds = ds.groupby("pid").map_groups(
        _BootstrapPartition(
            lake_root, txid, schema, fs_spec=lake.fs.spec,
            key=key, ts_col=ts_col,
        ),
        batch_format="pyarrow"
    )
    lineage = lineage_ds.take_all()  # <= num_partitions tiny rows
    lake.commit(manifest, txid, lineage, applied_segments=["__base__"], applied_lsn_range=(0, 0))
    return lake


# ---------------------------------------------------------------------------
# replay
# ---------------------------------------------------------------------------


def _wal_payload_schema(wal_schema: pa.Schema) -> pa.Schema:
    fields = [f for f in wal_schema if f.name not in _WAL_META]
    return pa.schema(fields)


def _merged_lsn_ranges(ranges) -> tuple | None:
    """Sort + coalesce [lo, hi] pairs into disjoint numpy arrays for a
    vectorized searchsorted membership test."""
    import numpy as np

    if not ranges:
        return None
    rs = sorted((int(lo), int(hi)) for lo, hi in ranges)
    out: list[list[int]] = []
    for lo, hi in rs:
        if out and lo <= out[-1][1] + 1:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])
    return (
        np.array([r[0] for r in out], np.int64),
        np.array([r[1] for r in out], np.int64),
    )


def _make_combiner(
    num_partitions: int,
    salt: int,
    unified: pa.Schema,
    combine: bool,
    spec: TableSpec,
    applied_ranges: tuple | None = None,
    constraints: list | None = None,
):
    def combiner(batch: pa.Table) -> pa.Table:
        if applied_ranges is not None and batch.num_rows:
            # event-level exactly-once: drop events whose lsn falls inside
            # a COMMITTED range — a redelivered copy of an applied segment
            # becomes a true no-op, which also makes tombstone compaction
            # safe against at-least-once redelivery (SURVEY.md D1/D2)
            import numpy as np

            los, his = applied_ranges
            lsn = batch.column("lsn").to_numpy(zero_copy_only=False)
            idx = np.searchsorted(los, lsn, side="right") - 1
            dup = (idx >= 0) & (lsn <= his[np.maximum(idx, 0)])
            if dup.any():
                batch = batch.filter(pa.array(~dup))
        # dead-letter classification BEFORE normalize/partition: malformed
        # rows (null key/ts, unknown op) would crash the key hash or
        # corrupt the LWW reduce.  They keep riding THIS pipeline — tagged
        # with a reason, routed by lsn instead of key — so quarantining
        # costs no second pass over the WAL (stages/validate.py).
        from ..stages.validate import DLQ_COL, event_reasons

        reasons = (
            spec.validate(batch)
            if spec.validate is not None
            else event_reasons(batch, spec.key, spec.ts_col)
        )
        if constraints:
            # declarative CHECK constraints from the table manifest
            # (maintenance.set_constraint): violators are quarantined
            # with `constraint:<name>` reasons, nulls pass, deletes are
            # exempt — stages/validate.constraint_reasons
            from ..stages.validate import constraint_reasons

            reasons = constraint_reasons(batch, constraints, reasons)
        bad = None
        bad_mask = pc.is_valid(reasons)
        if pc.any(bad_mask).as_py():
            bad = batch.filter(bad_mask)
            bad_reasons = reasons.filter(bad_mask)
            batch = batch.filter(pc.invert(bad_mask))
        if spec.normalize is not None:
            batch = spec.normalize(batch)
            # derived-key re-check: when the upsert key only EXISTS after
            # normalize (surrogate composite keys), the pre-normalize
            # classifier could not apply the null_key rule — a null part
            # yields a null surrogate that would crash the key hash
            if spec.key in batch.column_names:
                nk = pc.is_null(batch.column(spec.key))
                if pc.any(nk).as_py():
                    late_bad = batch.filter(nk)
                    late_reasons = pa.array(
                        ["null_key"] * late_bad.num_rows, pa.string()
                    )
                    batch = batch.filter(pc.invert(nk))
                    if bad is None:
                        bad, bad_reasons = late_bad, late_reasons
                    else:
                        # align: bad rows never passed normalize; keep only
                        # shared columns (conform below re-aligns to unified)
                        common = [
                            c for c in bad.column_names
                            if c in late_bad.column_names
                        ]
                        bad = pa.concat_tables(
                            [bad.select(common), late_bad.select(common)],
                            promote_options="default",
                        )
                        bad_reasons = pa.concat_arrays(
                            [
                                bad_reasons.combine_chunks()
                                if isinstance(bad_reasons, pa.ChunkedArray)
                                else bad_reasons,
                                late_reasons,
                            ]
                        )
        # conform to the unified WAL schema (null-fills columns absent in
        # old-schema segments when the reader didn't already) — but KEEP
        # columns the normalize hook derived beyond the WAL envelope
        # (e.g. a surrogate composite key); normalize is deterministic,
        # so extras appear identically in every batch
        extras_cols = [c for c in batch.column_names if c not in unified.names]
        kept = {c: batch.column(c) for c in extras_cols}
        batch = conform(batch, unified)
        for c in extras_cols:
            batch = batch.append_column(c, kept[c])
        if spec.coalesce_partial:
            # partial-image tables ship STATE ROWS through the shuffle
            # (per-column (ts, lsn) positions — stages/coalesce.py); the
            # per-batch fold is the coalesce analogue of lww_compact
            from ..stages.coalesce import fold_states, to_state

            pcols = [
                c
                for c in batch.column_names
                if c not in ("lsn", "op", spec.key, spec.ts_col)
            ]
            batch = to_state(batch, spec.key, spec.ts_col, pcols)
            if combine:
                batch = fold_states(batch, spec.key, spec.ts_col, pcols)
            batch = batch.append_column(
                "op", pa.nulls(batch.num_rows, pa.string())
            )
        batch = add_partition_cols(batch, num_partitions, salt, key=spec.key)
        if combine and not spec.coalesce_partial:
            # per-batch LWW compaction: the "combiner" — bounds any key's
            # post-shuffle row count by the number of batches, shrinking
            # both the shuffle and hot-key groups (SURVEY.md §4 skew row)
            batch = lww_compact(batch, spec.key, order_by=(spec.ts_col, "lsn"))
        batch = batch.append_column(
            DLQ_COL, pa.nulls(batch.num_rows, pa.string())
        )
        if bad is not None:
            import numpy as np

            bad = conform(bad, unified)
            # key may be null: route quarantined rows by lsn, not key hash
            lsn = bad.column("lsn").to_numpy(zero_copy_only=False)
            bad = bad.append_column(
                "pid",
                pa.array((lsn % num_partitions).astype(np.int32), pa.int32()),
            )
            if salt > 1:
                bad = bad.append_column(
                    "salt", pa.array((lsn % salt).astype(np.int32), pa.int32())
                )
            bad = bad.append_column(DLQ_COL, bad_reasons)
            # normalize-derived extras never exist on quarantined rows
            # (they bypass the hook, or their derivation came out null) —
            # null-fill so both sides share one shuffle schema
            for c in batch.column_names:
                if c not in bad.column_names:
                    bad = bad.append_column(
                        c, pa.nulls(bad.num_rows, batch.schema.field(c).type)
                    )
            batch = pa.concat_tables(
                [batch, bad.select(batch.column_names)]
            )
        return batch

    return combiner


def _make_salted_reduce(spec: TableSpec):
    def salted_reduce(group: pa.Table) -> pa.Table:
        return lww_compact(group, spec.key, order_by=(spec.ts_col, "lsn"))

    if not spec.coalesce_partial:
        return salted_reduce

    def salted_coalesce(group: pa.Table) -> pa.Table:
        # state rows: the fold is the salted pre-reduce (associative);
        # quarantined rows and the carried pid/salt/op pass through
        from ..stages.coalesce import fold_states
        from ..stages.validate import DLQ_COL

        carried = [
            c for c in ("pid", "salt", "op", DLQ_COL)
            if c in group.column_names
        ]
        if group.num_rows == 0:
            return group
        bad_mask = (
            pc.is_valid(group.column(DLQ_COL))
            if DLQ_COL in group.column_names
            else None
        )
        bad = None
        if bad_mask is not None and pc.any(bad_mask).as_py():
            bad = group.filter(bad_mask)
            group = group.filter(pc.invert(bad_mask))
        pcols = [
            c
            for c in group.column_names
            if c not in (spec.key, spec.ts_col, "lsn", *carried)
            and not c.startswith(("_cts__", "_clsn__", "_up_", "_del_"))
        ]
        body = group.drop_columns(carried)
        folded = fold_states(body, spec.key, spec.ts_col, pcols)
        n = folded.num_rows
        for c in carried:
            if c in ("pid", "salt"):
                # constant within a (pid, salt) group
                folded = folded.append_column(
                    c, pa.array([group.column(c)[0].as_py()] * n, pa.int32())
                )
            else:
                folded = folded.append_column(
                    c, pa.nulls(n, group.schema.field(c).type)
                )
        folded = folded.select(group.column_names)
        return (
            pa.concat_tables([folded, bad.select(group.column_names)])
            if bad is not None
            else folded
        )

    return salted_coalesce


# ---------------------------------------------------------------------------
# narrow shuffle (winner-only payload exchange)
# ---------------------------------------------------------------------------

def _narrow_event_cols(spec: TableSpec) -> list[str]:
    return list(dict.fromkeys(["lsn", "op", spec.key, spec.ts_col]))


def _use_narrow(spec: TableSpec, unified: pa.Schema, n_events: int) -> bool:
    """Decide the two-pass narrow-shuffle mode for this transaction.

    The wide path ships every surviving event's full payload (html/...)
    through the pid exchange; at 10^10 events the shuffle volume is ~the
    corpus.  Narrow mode first reduces LWW winners over a (lsn, op, key,
    ts) projection — a cheap column-pruned scan plus a keys-only shuffle
    — then re-scans the segments with a winner-LSN filter so only
    O(winners) wide rows enter the merge exchange.

    Requirements: no normalize/validate hook (those may consume payload
    columns before the key exists) and the narrow columns present in the
    WAL schema.  Auto mode (default) additionally requires a MULTI-NODE
    cluster, a non-trivial payload (some string/binary column beyond the
    keys) and a transaction big enough (ETLRAY_NARROW_MIN, default 1M
    events) that the second scan + winner broadcast amortize.
    ETLRAY_NARROW=1/0 forces.

    Why multi-node: MEASURED single-box A/B at 16 CPUs (4M events) —
    wide 7.4/7.8 s vs narrow 10.5/13.1 s on the mostly-distinct bench
    fixture, and wide 5.1-5.9 s vs narrow 7.9-8.8 s even on a 20×
    update-heavy fixture (200k urls).  On one box the pid exchange is
    row-count/sort-barrier bound, so cutting exchanged BYTES buys
    nothing while the second scan + winner broadcast cost ~40%.  The
    narrow win is cross-node: network + remote object-store volume drops
    from O(surviving events × payload) to O(winners × payload) — at
    10^10 events the wide exchange is ~the corpus.  Re-measure the
    threshold on a real cluster before trusting auto there (same caveat
    as the sort-vs-hash shuffle note below).
    """
    env = os.environ.get("ETLRAY_NARROW", "auto")
    if env == "0":
        return False
    if spec.normalize is not None or spec.validate is not None:
        return False
    if spec.coalesce_partial:
        # a partial image is NOT superseded by a later event unless that
        # event sets the same columns — winner-only fetch would drop
        # contributing images
        return False
    need = _narrow_event_cols(spec)
    if any(c not in unified.names for c in need):
        return False
    if env == "1":
        return True
    import ray as _ray

    multi_node = len([n for n in _ray.nodes() if n.get("Alive")]) > 1
    if not multi_node:
        return False
    payload = [f for f in unified if f.name not in set(need)]
    wide = any(
        pa.types.is_binary(f.type)
        or pa.types.is_large_binary(f.type)
        or pa.types.is_string(f.type)
        or pa.types.is_large_string(f.type)
        for f in payload
    )
    return wide and n_events >= int(os.environ.get("ETLRAY_NARROW_MIN", "1000000"))


def _make_fused_read(combiner, batch_size: int, columns: list[str] | None = None):
    """Task body fusing the segment READ into the combiner.

    Ray 2.49's planner never fuses ReadParquet with a downstream
    MapBatches (measured: the read always materializes its output
    blocks), so the wide WAL payload would round-trip the object store
    once before the combiner even runs — at the bench fixture that is
    ~2.4 GB of pure plasma traffic, and at 10^10 events it is the
    corpus.  Feeding a dataset of (path, row-group range) items to ONE
    map_batches that reads and combines in the same task removes that
    round trip; each task streams its row groups through the combiner
    and yields compacted batches straight into the shuffle.
    """

    def read_combine(items: pa.Table):
        for path, lo, hi in zip(
            items.column("path").to_pylist(),
            items.column("rg_lo").to_pylist(),
            items.column("rg_hi").to_pylist(),
        ):
            pf = pq.ParquetFile(path)
            cols = (
                [c for c in columns if c in pf.schema_arrow.names]
                if columns is not None
                else None
            )
            for rb in pf.iter_batches(
                batch_size=batch_size,
                row_groups=list(range(lo, hi)),
                columns=cols,
            ):
                out = combiner(pa.Table.from_batches([rb]))
                if out.num_rows:
                    yield out

    return read_combine


def _fused_read_items(
    chunk: list[str], seg_md, ncpu: int, n_blocks: int
) -> list[dict]:
    """Split segments into ~n_blocks read units on row-group boundaries
    so one giant segment cannot serialize the scan."""
    total_rgs = sum(md.num_row_groups for md in seg_md)
    per_unit = max(1, total_rgs // max(n_blocks, 1))
    items = []
    for path, md in zip(chunk, seg_md):
        nrg = md.num_row_groups
        lo = 0
        while lo < nrg:
            hi = min(nrg, lo + per_unit)
            items.append({"path": path, "rg_lo": lo, "rg_hi": hi})
            lo = hi
        if nrg == 0:
            items.append({"path": path, "rg_lo": 0, "rg_hi": 0})
    return items


def _make_winner_filter(winner_ref):
    """Per-batch membership filter against the broadcast sorted winner-LSN
    array (ray.put once per tx; zero-copy numpy view in every task)."""
    import numpy as np
    import ray as _ray

    def winner_filter(batch: pa.Table) -> pa.Table:
        w = _ray.get(winner_ref)
        if len(w) == 0 or batch.num_rows == 0:
            return batch.slice(0, 0)
        lsn = batch.column("lsn").to_numpy(zero_copy_only=False)
        idx = np.minimum(np.searchsorted(w, lsn), len(w) - 1)
        return batch.filter(pa.array(w[idx] == lsn))

    return winner_filter


def replay(
    lake_root: str,
    wal_dir: str,
    *,
    segments: list[str] | None = None,
    max_segments_per_tx: int | None = None,
    salting: str = "auto",
    salt: int = 8,
    combine: bool = True,
    batch_size: int = 32768,
    spec: TableSpec = PAGES,
    merge_mode: str | None = None,
    fs=None,
) -> ReplayStats:
    """Replay all pending WAL segments into the lake. Idempotent/resumable:
    already-applied segments are skipped via the manifest ledger; a crash
    between staging and commit leaves the previous state intact.

    ``wal_dir`` accepts a directory path or any
    ``sources.wal.SegmentSource`` implementation (e.g. a broker-backed
    source with consumer-offset semantics); replay consumes only the
    protocol's ``pending(applied)`` and re-asks after every transaction,
    so segments may keep arriving — in any order — while the loop runs.

    ``merge_mode``: ``"rewrite"`` (default) rewrites each touched
    partition's full state per transaction; ``"delta"`` stages only the
    tx's compacted change rows as merge-on-read delta files (O(changes)
    write amplification — the steady-state tailing shape; fold chains
    back with ``maintenance.compact_deltas``).  ``ETLRAY_MERGE_MODE``
    overrides the default when the argument is None.  Final table state
    is identical either way (differential-tested)."""
    from ..sources.wal import DirectorySource, StaticSource
    from ..state.manifest import writer_lock

    lake = LakeTable(lake_root, fs=fs)
    stats = ReplayStats()
    # wal_dir may be a directory path OR any SegmentSource implementation
    # (sources/wal.py protocol, duck-typed on pending()) — replay
    # consumes only pending()
    if hasattr(wal_dir, "pending"):
        source = wal_dir
    elif segments is not None:
        source = StaticSource(segments)
    else:
        source = DirectorySource(wal_dir)
    if merge_mode is None:
        merge_mode = os.environ.get("ETLRAY_MERGE_MODE", "rewrite")
    if merge_mode not in ("rewrite", "delta"):
        raise ValueError(f"merge_mode must be 'rewrite' or 'delta', got {merge_mode!r}")
    if spec.coalesce_partial:
        if spec.derive_text:
            raise NotImplementedError(
                "coalesce_partial is incompatible with derive_text: a "
                "partial image updating html would silently orphan the "
                "derived text — set derive_text=False on the TableSpec"
            )

    # single-writer guard: two uncoordinated replays would both stage
    # tx N+1 and the loser's commit would be silently discarded by the
    # winner's manifest swap (state/manifest.writer_lock; stale locks
    # from crashed writers are stolen after a pid liveness check)
    with writer_lock(lake_root):
        while True:
            manifest = lake.read_manifest()
            applied = {
                os.path.basename(s) for s in manifest["applied_segments"]
            }
            pending = source.pending(applied)
            if not pending:
                break
            chunk = (
                pending
                if max_segments_per_tx is None
                else pending[:max_segments_per_tx]
            )
            stats.transactions += 1
            _replay_one_tx(
                lake, manifest, chunk, salting, salt, combine, batch_size,
                stats, spec, merge_mode=merge_mode,
            )
            if max_segments_per_tx is None:
                break

    final = lake.read_manifest()
    # In delta mode this counts stored rows (base + chains): an upper
    # bound on live rows until compaction folds superseded versions.
    stats.rows_live = sum(
        p["rows"] + sum(d["rows"] for d in p.get("deltas", []))
        for p in final["partitions"].values()
    )
    stats.schema_version = final["schema_version"]
    return stats


def follow(
    lake_root: str,
    wal_dir: str,
    *,
    poll_interval: float = 5.0,
    max_polls: int | None = None,
    idle_exit_after: int | None = None,
    fold_chain_over: int | None = None,
    metrics: "callable | None" = None,
    metrics_path: str | None = None,
    on_commit: "callable | None" = None,
    **replay_kwargs,
) -> ReplayStats:
    """Continuous tailing: poll the WAL dir for new segments and replay
    them as they appear — the reference's loader loop
    (`src/pipeline/core/client_clickhouse.py:154-206` 30s poll +
    `src/pipeline/core/spark_job.py:66-98` outer retry in /root/reference)
    without the fixed sleeps on the apply path.

    Exits after ``max_polls`` polls, or after ``idle_exit_after``
    consecutive polls with no pending segments (None = run forever).

    ``fold_chain_over``: with ``merge_mode="delta"``, automatically fold
    any partition whose merge-on-read chain exceeds this many delta
    files after a poll that applied segments (bounds read amplification
    during indefinite tailing; each fold is its own manifest tx).

    **Metrics**: every poll emits one JSON-able record — throughput
    (events applied this poll, seconds, events/s), lag (pending segments
    and their total rows, from footers), merge-on-read chain lengths
    (max/total deltas), cumulative DLQ row count, live rows and schema
    version — the reference's aspirational "pipeline throughput metrics"
    (`/root/reference/README.md:168`) done continuously.  Provide a
    ``metrics`` callback and/or a ``metrics_path`` file (one JSON line
    per poll, append).

    ``on_commit(lake_root, txid)`` fires after every poll that applied
    segments, with the new head txid — the wiring point for derived
    state that must track the lake (incremental views
    ``views.refresh_view``, the host index
    ``hostindex.refresh_host_index``, group publishes).  Exceptions
    propagate: derived-state failure should stop the tailer, not
    silently fall behind.
    """
    import json as _json
    import time

    total = ReplayStats()
    idle = 0
    polls = 0
    while True:
        t0 = time.perf_counter()
        stats = replay(lake_root, wal_dir, **replay_kwargs)
        dt = time.perf_counter() - t0
        total.transactions += stats.transactions
        total.events_applied += stats.events_applied
        total.segments_applied += stats.segments_applied
        total.rows_live = stats.rows_live
        total.schema_version = stats.schema_version
        if fold_chain_over is not None and stats.segments_applied:
            from .maintenance import compact_deltas

            spec = replay_kwargs.get("spec", PAGES)
            compact_deltas(
                lake_root,
                min_chain=fold_chain_over + 1,
                key=spec.key,
                ts_col=spec.ts_col,
            )
        if on_commit is not None and stats.segments_applied:
            on_commit(lake_root, LakeTable(lake_root).read_manifest()["txid"])
        idle = idle + 1 if stats.segments_applied == 0 else 0
        polls += 1
        if metrics is not None or metrics_path is not None:
            rec = _follow_metrics_record(
                lake_root, wal_dir, stats, dt, polls,
                segments=replay_kwargs.get("segments"),
            )
            if metrics is not None:
                metrics(rec)
            if metrics_path is not None:
                with open(metrics_path, "a") as f:
                    f.write(_json.dumps(rec) + "\n")
        if idle_exit_after is not None and idle >= idle_exit_after:
            break
        if max_polls is not None and polls >= max_polls:
            break
        time.sleep(poll_interval)
    return total


def _follow_metrics_record(
    lake_root: str,
    wal_dir,
    stats: ReplayStats,
    seconds: float,
    poll: int,
    segments: list[str] | None = None,
) -> dict:
    """One poll's observability record (see follow()).  Lag rows come
    from pending segments' parquet footers — O(pending) metadata reads,
    no data scanned."""
    from ..sources.wal import (
        DirectorySource,
        StaticSource,
        segment_row_count,
    )

    if hasattr(wal_dir, "pending"):
        source = wal_dir
    elif segments is not None:
        source = StaticSource(segments)
    else:
        source = DirectorySource(wal_dir)
    lake = LakeTable(lake_root)
    m = lake.read_manifest()
    applied = {os.path.basename(s) for s in m["applied_segments"]}
    pending = source.pending(applied)
    lag_rows = sum(segment_row_count(p) for p in pending)
    chains = [len(p.get("deltas", [])) for p in m["partitions"].values()]
    return {
        "poll": poll,
        "transactions": stats.transactions,
        "events_applied": stats.events_applied,
        "segments_applied": stats.segments_applied,
        "seconds": round(seconds, 3),
        "events_per_sec": round(stats.events_applied / seconds, 1)
        if seconds > 0
        else None,
        "lag_segments": len(pending),
        "lag_rows": int(lag_rows),
        "chain_max": max(chains) if chains else 0,
        "chain_total": sum(chains),
        "dlq_rows": int(sum(e.get("rows", 0) for e in m.get("dlq", []))),
        "rows_live": stats.rows_live,
        "schema_version": stats.schema_version,
    }


@dataclass
class StreamSpec:
    """One table stream for ``replay_many``: where its lake lives, where
    its WAL arrives, and the TableSpec governing its upsert semantics."""

    lake_root: str
    wal_dir: str
    spec: TableSpec = PAGES
    replay_kwargs: dict = field(default_factory=dict)


def replay_many(streams: dict[str, StreamSpec], max_workers: int | None = None) -> dict[str, ReplayStats]:
    """Replay N table streams CONCURRENTLY in one Ray session — the
    reference runs 18 topic consumers simultaneously
    (`src/pipeline/core/kafka_multi_consumer.py:100-129` in
    /root/reference); here each stream is a driver thread issuing its own
    manifest transactions while Ray Data interleaves all streams' tasks
    on the shared cluster.  Per-table manifests keep commits independent:
    one stream failing does not roll back the others (matching the
    per-topic isolation of the reference's consumer threads)."""
    from concurrent.futures import ThreadPoolExecutor

    names = list(streams)
    with ThreadPoolExecutor(max_workers=max_workers or min(8, len(names))) as ex:
        futs = {
            n: ex.submit(
                replay,
                s.lake_root,
                s.wal_dir,
                spec=s.spec,
                **s.replay_kwargs,
            )
            for n, s in streams.items()
        }
        return {n: f.result() for n, f in futs.items()}


def _constraint_rules(manifest: dict) -> list[dict]:
    """CHECK-constraint rule list for the combiner classifier: manifest
    constraints in name order, each with its storage-era column aliases
    (stages/validate.constraint_reasons)."""
    from ..state.schema_registry import storage_aliases

    renames = manifest.get("renames", [])
    return [
        {
            "name": cname,
            "op": c["op"],
            "value": c["value"],
            "aliases": storage_aliases(c["column"], renames),
        }
        for cname, c in sorted(manifest.get("constraints", {}).items())
    ]


def _replay_one_tx(
    lake: LakeTable,
    manifest: dict,
    chunk: list[str],
    salting: str,
    salt: int,
    combine: bool,
    batch_size: int,
    stats: ReplayStats,
    spec: TableSpec = PAGES,
    merge_mode: str = "rewrite",
    dedup: bool = True,
) -> None:
    import time as _time

    num_partitions = manifest["num_partitions"]
    txid = lake.next_txid(manifest)
    t_start = _time.perf_counter()

    # ONE footer read per segment (schema + row count + lsn range all come
    # from the same parquet metadata; three separate reads here were ~1s of
    # pure serial driver time per transaction at 32 segments)
    seg_md = [pq.read_metadata(s) for s in chunk]
    seg_schemas = [md.schema.to_arrow_schema() for md in seg_md]
    unified_wal = seg_schemas[0]
    for s in seg_schemas[1:]:
        unified_wal = evolve(unified_wal, s)
    current_schema = lake.schema(manifest)
    wal_payload = _wal_payload_schema(unified_wal)
    tbl_renames = manifest.get("renames", [])
    if tbl_renames:
        # a renamed column's WAL payload may still arrive under the
        # source-era name; map it forward BEFORE unification or additive
        # evolution would resurrect the old name as a new column
        from ..state.schema_registry import apply_renames as _apply_renames

        wal_payload = _apply_renames(wal_payload, tbl_renames)
    tbl_drops = manifest.get("drops", [])
    if tbl_drops:
        # columns dropped from the table (metadata-only drop_column) are
        # IGNORED when the upstream source still ships them — additive
        # evolution must not resurrect the name (old files still carry
        # the dead data physically, so a re-added name would read it)
        wal_payload = pa.schema(
            [f for f in wal_payload if f.name not in set(tbl_drops)]
        )
    target_schema = evolve(current_schema, wal_payload)

    n_events_est = sum(md.num_rows for md in seg_md)
    # auto rule: the per-batch combiner already caps any key's post-shuffle
    # rows at the number of batches, so the extra salted pre-reduce shuffle
    # only pays once that cap itself is large (10^10-event territory, where
    # a 100%-hot key would still mean millions of post-combine rows).
    use_salt = salting == "on" or (
        salting == "auto" and (not combine or n_events_est / batch_size > 4096)
    )
    eff_salt = salt if use_salt else 0

    # block-count control: the sort shuffle's fragment fan-out is
    # O(map_blocks x reduce_blocks); hundreds of 3 MB blocks measurably
    # thrash the local object store (2M events: 17s -> 5.6s when capped).
    # Target ~1 block per CPU, bounded to [16, 256].
    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", 8))
    n_blocks = min(256, max(16, ncpu, len(chunk)))
    # concurrency headroom: at full width every CPU runs a worker and the
    # raylet/object-store/driver threads get starved — measured on this
    # workload: 32-wide 25.7s vs 24-wide 10.4s on a 32-core box.  The
    # shared refcounted _cpu_headroom cap leaves 25% on wide sessions.

    # applied LSN range PER SEGMENT from parquet footer stats
    # (pre-compaction truth; the combiner drops superseded events so
    # group-level mins undercount).  Per-segment granularity keeps the
    # event-level dedup filter exact when segments arrive out of order.
    # The same footers yield the EVENT-TIME high watermark (max ts_col),
    # recorded per tx — the basis for bounded-lateness tombstone GC
    # (maintenance.compact(lateness_us=...)).
    seg_ranges: list[tuple[int, int]] = []
    event_ts_hi: int | None = None
    ts_i = [s.get_field_index(spec.ts_col) for s in seg_schemas]
    for md, schema, tsi in zip(seg_md, seg_schemas, ts_i):
        ci = schema.get_field_index("lsn")
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is not None and st.has_min_max:
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if tsi >= 0:
                ts_st = md.row_group(rg).column(tsi).statistics
                if ts_st is not None and ts_st.has_min_max:
                    v = ts_st.max
                    if hasattr(v, "timestamp"):  # datetime -> epoch us
                        import calendar

                        v = (
                            calendar.timegm(v.timetuple()) * 1_000_000
                            + v.microsecond
                        )
                    v = int(v)
                    event_ts_hi = v if event_ts_hi is None else max(event_ts_hi, v)
        seg_ranges.append((int(lo or 0), int(hi or 0)))

    # declarative CHECK constraints in force (maintenance.set_constraint),
    # resolved to storage-era column aliases once per transaction.  They
    # disable the narrow two-pass path: pass 1 elects winners over a
    # keys-only projection that cannot see the constrained payload
    # columns, so a violating winner would shadow the older valid event
    # that the wide path (quarantine BEFORE the LWW merge) would keep.
    constraint_rules = _constraint_rules(manifest)

    use_narrow = _use_narrow(spec, unified_wal, n_events_est) and not constraint_rules
    # fused read (default on; ETLRAY_FUSED_READ=0 reverts to the
    # ReadParquet operator): see _make_fused_read
    fused_items = (
        _fused_read_items(chunk, seg_md, ncpu, n_blocks)
        if os.environ.get("ETLRAY_FUSED_READ", "1") != "0"
        else None
    )
    with _cpu_headroom(ncpu):
        winner_ref = None
        if use_narrow:
            # pass 1: winner LSNs over a keys-only projection.  The
            # combiner/salting/LWW machinery is identical to the wide
            # path — only the scanned columns change — so the winning
            # (key, ts, lsn) set is exactly the wide path's merge input.
            import numpy as np
            import ray as _ray

            ncols = _narrow_event_cols(spec)
            nschema = pa.schema([unified_wal.field(c) for c in ncols])
            comb1 = _make_combiner(
                num_partitions, eff_salt, nschema, combine, spec,
                applied_ranges=_merged_lsn_ranges(
                    manifest["applied_lsn_ranges"]
                ) if dedup else None,
            )
            if fused_items is not None:
                with _plan_lock:
                    nds = ray.data.from_items(
                        fused_items, override_num_blocks=len(fused_items)
                    )
                nds = nds.map_batches(
                    _make_fused_read(comb1, batch_size, columns=ncols),
                    batch_format="pyarrow",
                )
            else:
                with _plan_lock:
                    nds = ray.data.read_parquet(
                        chunk, schema=nschema, columns=ncols,
                        override_num_blocks=n_blocks,
                    )
                nds = nds.map_batches(
                    comb1, batch_format="pyarrow", batch_size=batch_size
                )
            if use_salt:
                nds = nds.groupby(["pid", "salt"]).map_groups(
                    _make_salted_reduce(spec), batch_format="pyarrow"
                ).drop_columns(["salt"])
            winners = nds.groupby("pid").map_groups(
                _make_salted_reduce(spec), batch_format="pyarrow"
            )
            # winner-LSN broadcast: O(unique keys in this tx) int64s —
            # bounded by the tx chunk size (max_segments_per_tx), put
            # ONCE and read zero-copy by every pass-2 filter task
            # to_arrow_refs directly — select_columns here would trigger
            # a schema-inference limit-1 run that re-executes the whole
            # pass-1 shuffle; the winner blocks are narrow already
            parts = [
                t.column("lsn").to_numpy(zero_copy_only=False)
                for t in map(ray.get, winners.to_arrow_refs())
                if "lsn" in t.column_names  # fully-deduped txs yield
                # empty blocks with an EMPTY schema
            ]
            wlsns = (
                np.sort(np.concatenate(parts).astype(np.int64))
                if parts
                else np.empty(0, np.int64)
            )
            winner_ref = _ray.put(wlsns)

        with _plan_lock:
            if fused_items is not None:
                ds = ray.data.from_items(
                    fused_items, override_num_blocks=len(fused_items)
                )
            else:
                ds = ray.data.read_parquet(
                    chunk, schema=unified_wal, override_num_blocks=n_blocks
                )
        # Shuffle strategy for the pid exchange (ETLRAY_SHUFFLE=hash|sort,
        # default sort).  hash = streaming hash-shuffle into aggregator
        # actors (no global sort barrier; merge can overlap the read +
        # combine).  MEASURED on the 4M-event bench fixture at 32 CPUs,
        # same window: sort 8.0-8.9 s vs hash 47-68 s — the actor pool
        # reserves ~CPU/2 for the exchange, pays per-transaction startup,
        # and pushes the wide html/text payload through actor mailboxes,
        # while sorting 32 pid groups is nearly free.  Sort stays the
        # default; the hash path is kept (correctness-pinned by
        # test_replay_hash_shuffle_mode) because on a real multi-node
        # cluster the sort barrier is a cross-node exchange and the trade
        # can flip — re-measure there before flipping the default.
        # Scoped to THIS dataset's context snapshot (process-global
        # DataContext untouched — replay_many runs tables on threads).
        use_hash_shuffle = os.environ.get("ETLRAY_SHUFFLE", "sort") == "hash"
        if use_hash_shuffle:
            from ray.data.context import ShuffleStrategy

            ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        # Without an explicit partition count the hash shuffle defaults to
        # 200 partitions / 64 aggregator actors (16 CPUs of demand) and
        # deadlocks small sessions; pid cardinality is num_partitions, so
        # more exchange partitions than that is pure overhead anyway.
        gb_parts = num_partitions if use_hash_shuffle else None
        if use_narrow:
            # pass 2: winner filter BEFORE the combiner — only O(winners)
            # wide rows pay partitioning and the merge exchange.  No dup
            # filter (pass 1 ran it; non-winners are already excluded),
            # no per-batch combine and no salt (winners are one row per
            # key; identical redelivered copies inside one chunk are
            # deduped by MergePartition's entry compaction).
            wfilter = _make_winner_filter(winner_ref)
            comb2 = _make_combiner(
                num_partitions, 0, unified_wal, False, spec,
                applied_ranges=None,
            )
            if fused_items is not None:

                def filtered_comb2(batch: pa.Table) -> pa.Table:
                    return comb2(wfilter(batch))

                ds = ds.map_batches(
                    _make_fused_read(filtered_comb2, batch_size),
                    batch_format="pyarrow",
                )
            else:
                ds = ds.map_batches(
                    wfilter, batch_format="pyarrow", batch_size=batch_size
                )
                ds = ds.map_batches(
                    comb2, batch_format="pyarrow", batch_size=batch_size
                )
        else:
            comb = _make_combiner(
                num_partitions, eff_salt, unified_wal, combine, spec,
                applied_ranges=(
                    _merged_lsn_ranges(manifest["applied_lsn_ranges"])
                    if dedup else None
                ),
                constraints=constraint_rules,
            )
            if fused_items is not None:
                ds = ds.map_batches(
                    _make_fused_read(comb, batch_size), batch_format="pyarrow"
                )
            else:
                ds = ds.map_batches(
                    comb, batch_format="pyarrow", batch_size=batch_size
                )
            if use_salt:
                ds = ds.groupby(["pid", "salt"], num_partitions=gb_parts).map_groups(
                    _make_salted_reduce(spec), batch_format="pyarrow"
                )
                ds = ds.drop_columns(["salt"])
        merge = MergePartition(
            lake.root, txid, target_schema, manifest["partitions"],
            key=spec.key, ts_col=spec.ts_col, derive_text=spec.derive_text,
            delta=(merge_mode == "delta"),
            coalesce=spec.coalesce_partial,
            fs_spec=lake.fs.spec,
            renames=tbl_renames,
        )
        # retry application exceptions too: a merge task is side-effect-safe
        # (deterministic staging path, overwrite on retry), so transient I/O
        # failures mid-write must not kill the transaction
        lineage_ds = ds.groupby("pid", num_partitions=gb_parts).map_groups(
            merge, batch_format="pyarrow", max_retries=3, retry_exceptions=True
        )
        lineage = lineage_ds.take_all()  # tiny: <= num_partitions rows
        if os.environ.get("ETLRAY_DUMP_STATS"):
            import sys as _sys

            print(lineage_ds.stats(), file=_sys.stderr)

    tx_seconds = _time.perf_counter() - t_start
    lake.commit(
        manifest,
        txid,
        lineage,
        applied_segments=[os.path.basename(s) for s in chunk],
        applied_lsn_range=seg_ranges,
        new_schema=target_schema,
        extras={
            "wal_events": int(n_events_est),
            "seconds": round(tx_seconds, 3),
            "events_per_sec": round(n_events_est / tx_seconds, 1) if tx_seconds > 0 else None,
            "salted": bool(use_salt),
            "narrow": bool(use_narrow),
            "merge_mode": merge_mode,
            "event_ts_hi_us": event_ts_hi,
        },
        delta=(merge_mode == "delta"),
    )
    # raw WAL rows applied (pre-compaction) — the throughput denominator;
    # per-partition lineage keeps the post-compaction merge counts
    stats.events_applied += int(n_events_est)
    stats.segments_applied += len(chunk)


# ---------------------------------------------------------------------------
# reads
# ---------------------------------------------------------------------------


class _MergedPartitionRead:
    """map_batches callable over partition-metadata items: each task
    LWW-merges one pid's base file ∪ delta chain and emits its live rows
    (the merge-on-read read path; one task per partition)."""

    def __init__(
        self,
        lake_root: str,
        schema: pa.Schema,
        key: str,
        ts_col: str,
        columns: list[str] | None = None,
        fs_spec: str = "local-os",
        renames: list | None = None,
    ):
        self.__name__ = "_MergedPartitionRead"
        self.lake_root = lake_root
        self.schema = schema  # FULL lake schema: the LWW reduce needs key/ts
        self.key = key
        self.ts_col = ts_col
        self.columns = columns  # output projection, applied post-merge
        self.fs_spec = fs_spec
        self.renames = list(renames or [])

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json as _json

        from ..stages.merge import load_partition_state

        tables = []
        for meta_json in batch.column("meta").to_pylist():
            t = load_partition_state(
                self.lake_root, _json.loads(meta_json), self.schema,
                self.key, self.ts_col, columns=self.columns,
                renames=self.renames, fs=self.fs_spec,
            )
            t = t.filter(pc.invert(t.column("_deleted")))
            t = t.drop_columns([c for c in INTERNAL_COLS if c in t.column_names])
            if self.columns is not None:
                t = t.select(self.columns)
            tables.append(t)
        out_schema = (
            pa.schema([self.schema.field(c) for c in self.columns])
            if self.columns is not None
            else self.schema
        )
        # coalesce state rows carry per-column position metadata beyond
        # the payload schema; conform projects it away (and casts the
        # null-typed columns an evolution-era file never carried)
        tables = [conform(t, out_schema) for t in tables]
        if not tables:  # typed empty: keep the executor's schema stable
            return out_schema.empty_table()
        return pa.concat_tables(tables, promote_options="default")


def _resolve_at(lake_root, at_txid, at_tag, fs, at_ts=None):
    """Shared at_txid/at_tag/at_ts resolution for the reader family."""
    if sum(x is not None for x in (at_txid, at_tag, at_ts)) > 1:
        raise ValueError("pass at most one of at_txid / at_tag / at_ts")
    if at_tag is not None:
        from .tags import resolve_tag

        return resolve_tag(lake_root, at_tag, fs=fs)
    if at_ts is not None:
        from ..state.manifest import resolve_txid_at_ts

        return resolve_txid_at_ts(lake_root, at_ts, fs=fs)
    return at_txid


def _plan_scan(
    m: dict, schema: pa.Schema, filters, renames
) -> tuple[dict, dict]:
    """Manifest-level scan planning: split the partition map into kept
    vs skipped using writer-recorded column stats (state/partstats.py)
    — zero parquet footer reads.  Returns (kept_partitions, report)."""
    from ..state.partstats import (
        check_filters,
        partition_excluded,
        rename_blocks_pruning,
    )

    parts = m["partitions"]
    n_files = lambda meta: (1 if meta.get("file") else 0) + len(  # noqa: E731
        meta.get("deltas", []) or []
    )
    live = lambda meta: int(meta.get("rows", 0)) + sum(  # noqa: E731
        int(d.get("rows", 0)) for d in meta.get("deltas", []) or []
    )
    report = {
        "txid": m["txid"],
        "filters": [[c, op, repr(v)] for c, op, v in (filters or [])],
        "partitions_total": len(parts),
        "partitions_skipped": 0,
        "files_total": sum(n_files(p) for p in parts.values()),
        "files_skipped": 0,
        "rows_total": sum(live(p) for p in parts.values()),
        "rows_skipped": 0,
        "stats_partitions": sum(
            1 for p in parts.values() if p.get("stats") or p.get("deltas")
        ),
        "pruning": "on",
        "skipped_pids": [],
    }
    if not filters:
        report["pruning"] = "off (no filters)"
        return parts, report
    check_filters(filters, schema)
    if rename_blocks_pruning(filters, renames):
        report["pruning"] = "off (filter column involved in rename chain)"
        return parts, report
    kept: dict = {}
    for pid, meta in parts.items():
        if partition_excluded(meta, filters, schema):
            report["partitions_skipped"] += 1
            report["files_skipped"] += n_files(meta)
            report["rows_skipped"] += live(meta)
            if len(report["skipped_pids"]) < 64:
                report["skipped_pids"].append(int(pid))
        else:
            kept[pid] = meta
    return kept, report


def explain_scan(
    lake_root: str,
    filters,
    columns: list[str] | None = None,
    at_txid: str | None = None,
    at_tag: str | None = None,
    at_ts=None,
    fs=None,
) -> dict:
    """Dry-run the manifest-level scan plan for ``read_table(filters=)``
    and report what file-skipping would do — partitions/files/live rows
    read vs skipped — without touching any data or footer bytes.  The
    observability half of stats pruning: at 100 TB the difference
    between "opens 2M footers to prune" and "drops 1.9M files from the
    manifest alone" is the scan's startup latency, and this is how an
    operator checks a predicate actually prunes BEFORE paying for the
    scan (the Delta/Iceberg ``EXPLAIN`` analogue)."""
    at_txid = _resolve_at(lake_root, at_txid, at_tag, fs, at_ts=at_ts)
    lake = LakeTable(lake_root, fs=fs)
    m = lake.manifest_at(at_txid) if at_txid is not None else lake.read_manifest()
    if columns is not None:
        # mirror read_table's contract so the dry run rejects exactly
        # what the real scan would reject
        names = {lake.schema(m).field(c).name for c in columns}
        for c, _, _ in filters or []:
            if c not in names:
                raise ValueError(
                    f"filter column {c!r} must be in the read schema "
                    f"(add it to columns=)"
                )
    _, report = _plan_scan(m, lake.schema(m), filters, m.get("renames", []))
    report["merged_read"] = bool(
        m.get("renames") or any(p.get("deltas") for p in m["partitions"].values())
    )
    return report


def _limit_prefix(parts: dict, limit: int) -> dict:
    """Minimal pid-ordered prefix of FLAT partitions whose manifest
    live-row counts cover ``limit`` — a limited scan opens only these
    files.  Only callable when every partition is flat (manifest rows
    are exact there); callers must not use it under delta chains."""
    chosen: dict = {}
    acc = 0
    for pid, meta in sorted(parts.items(), key=lambda kv: int(kv[0])):
        chosen[pid] = meta
        acc += int(meta.get("rows", 0))
        if acc >= limit:
            break
    return chosen


def read_table(
    lake_root: str,
    at_txid: str | None = None,
    key: str = "url",
    ts_col: str = "warc_ts",
    columns: list[str] | None = None,
    predicate=None,
    filters=None,
    limit: int | None = None,
    at_tag: str | None = None,
    at_ts=None,
    fs=None,
) -> ray.data.Dataset:
    """Stream the live rows of the lake table (manifest-resolved files,
    tombstones filtered, internal columns dropped).

    ``at_txid`` time-travels to the committed state as of that
    transaction (resolved from its immutable per-tx snapshot; valid until
    ``vacuum()`` reclaims superseded part files).  ``at_tag`` does the
    same through a named snapshot tag (``pipelines/tags.py``), whose
    files vacuum protects for as long as the tag exists.  ``at_ts``
    time-travels by wall clock: the last transaction whose manifest
    ``committed_at`` stamp (epoch µs; also accepts datetime) is <= the
    given instant — resolved from lineage metadata alone
    (``state/manifest.resolve_txid_at_ts``), no data I/O.

    When any partition carries a merge-on-read delta chain, reads switch
    from flat file scans to one task per partition that reduces
    base ∪ chain under LWW ``(ts_col, _lsn)`` before serving — the same
    reduce the rewrite merge runs, so both merge modes serve identical
    live states.  ``key``/``ts_col`` only matter for that reduce (lakes
    replayed with a non-pages TableSpec pass their own).

    ``columns`` prunes the read at the parquet layer — a scan that needs
    one narrow column must not ship the html/text payload through the
    object store.  Files written under older schema versions null-fill
    requested columns they don't carry (additive evolution).

    ``filters`` — a list of ``(column, op, value)`` conjuncts (op in
    ``== != < <= > >= in``) — prunes at THREE layers: whole partitions
    drop from the manifest alone via writer-recorded column stats
    (state/partstats.py, no footer reads), surviving files prune row
    groups through the derived pushdown expression, and the same
    expression applies post-merge on delta-chain reads.  Filter columns
    must be in the read schema.  ``explain_scan`` previews the plan.
    ``predicate`` (a pyarrow.dataset expression) remains for arbitrary
    shapes the tuple form can't say — it pushes down but cannot
    file-skip (expressions aren't introspectable against stats).

    ``limit`` bounds the result to N rows.  On an all-flat lake with no
    predicate it also prunes the FILE LIST: manifest live-row counts
    are exact there, so only the minimal pid-prefix of partitions that
    covers N is ever opened — the 100 TB ``head``.  Under filters /
    predicates / delta chains the limit still applies (and Ray Data's
    streaming executor stops early), but every candidate partition
    stays in the plan."""
    import json as _json

    at_txid = _resolve_at(lake_root, at_txid, at_tag, fs, at_ts=at_ts)
    lake = LakeTable(lake_root, fs=fs)
    m = lake.manifest_at(at_txid) if at_txid is not None else lake.read_manifest()
    full_schema = lake.schema(m)
    schema = (
        pa.schema([full_schema.field(c) for c in columns])
        if columns is not None
        else full_schema
    )
    renames = m.get("renames", [])
    parts = m["partitions"]
    if filters:
        from ..state.partstats import filters_to_expr

        for c, _, _ in filters:
            if c not in schema.names:
                raise ValueError(
                    f"filter column {c!r} must be in the read schema "
                    f"(add it to columns=)"
                )
        parts, _ = _plan_scan(m, full_schema, filters, renames)
        fexpr = filters_to_expr(filters, full_schema)
        predicate = fexpr if predicate is None else predicate & fexpr
    if (
        limit is not None
        and predicate is None
        and not renames
        and not any(p.get("deltas") for p in parts.values())
    ):
        parts = _limit_prefix(parts, limit)
    files = [
        os.path.join(lake_root, rel)
        for p in parts.values()
        for rel in partition_file_list(p)
    ]
    if not files:
        return ray.data.from_arrow(schema.empty_table())

    # gate on the PRUNED set: if stats pruning dropped every chained
    # partition, the survivors take the cheap flat path
    if renames or any(p.get("deltas") for p in parts.values()):
        items = [
            {"pid": int(pid), "meta": _json.dumps(meta)}
            for pid, meta in sorted(parts.items(), key=lambda kv: int(kv[0]))
        ]
        ds = ray.data.from_items(items, override_num_blocks=len(items))
        out = ds.map_batches(
            _MergedPartitionRead(
                lake_root, full_schema, key, ts_col, columns=columns,
                fs_spec=lake.fs.spec, renames=renames,
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        if predicate is not None:
            # post-merge: a version-level pushdown could drop the very
            # row version that wins the LWW reduce
            out = out.map_batches(
                lambda t: t.filter(predicate), batch_format="pyarrow"
            )
        return out if limit is None else out.limit(limit)

    # explicit read schema: fragments written before an additive
    # evolution null-fill the missing columns at the dataset layer
    read_schema = pa.schema(
        list(schema) + [pa.field("_deleted", pa.bool_())]
    )
    # flat path: base files hold post-merge UNIQUE keys, so any row
    # predicate is safe to push into the parquet scan (row-group stats
    # prune at the I/O layer); delta-chain reads apply it post-merge
    ds = ray.data.read_parquet(
        files, schema=read_schema, filter=predicate,
        filesystem=lake.fs.pyarrow_fs,
    )

    def live(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(t.column("_deleted")))
        return t.drop_columns(["_deleted"])

    out = ds.map_batches(live, batch_format="pyarrow")
    return out if limit is None else out.limit(limit)


def get_rows(
    lake_root: str,
    keys: list[str],
    at_txid: str | None = None,
    key: str = "url",
    ts_col: str = "warc_ts",
    at_tag: str | None = None,
    at_ts=None,
    fs=None,
) -> pa.Table:
    """Point lookup: live rows for the given keys, reading ONLY the
    partitions those keys hash to (pid = crc32(key) % P from the
    manifest) — base file ∪ delta chain per touched pid, LWW-reduced.
    O(touched partitions) file reads regardless of table size: the
    serving-path complement to the streaming ``read_table`` (a CDC lake
    exists to be point-queried by the freshest version of a key).
    Driver-local (no Ray tasks): a lookup touches a handful of files and
    task dispatch would dominate; wrap in ``ray.remote`` for fan-out."""
    from ..stages.merge import INTERNAL_COLS as _IC
    from ..stages.merge import load_partition_state
    from ..stages.partition import url_pid

    at_txid = _resolve_at(lake_root, at_txid, at_tag, fs, at_ts=at_ts)
    lake = LakeTable(lake_root, fs=fs)
    m = lake.manifest_at(at_txid) if at_txid is not None else lake.read_manifest()
    schema = lake.schema(m)
    P = int(m["num_partitions"])
    by_pid: dict[int, list[str]] = {}
    for k in keys:
        by_pid.setdefault(url_pid(k, P), []).append(k)
    hits = []
    want = pa.array(sorted(set(keys)), pa.string())
    for pid in sorted(by_pid):
        meta = m["partitions"].get(str(pid))
        if meta is None:
            continue
        # key filter pushed into the parquet reads: part files are sorted
        # by key, so row-group stats prune non-matching groups at the I/O
        # layer — O(matching row groups) per lookup, not O(partition)
        t = load_partition_state(
            lake_root, meta, schema, key, ts_col, key_in=by_pid[pid],
            renames=m.get("renames", []), fs=lake.fs,
        )
        t = t.filter(
            pc.and_(
                pc.invert(t.column("_deleted")),
                pc.is_in(t.column(key), value_set=want),
            )
        )
        hits.append(t.drop_columns([c for c in _IC if c in t.column_names]))
    if not hits:
        return schema.empty_table()
    out = pa.concat_tables(hits, promote_options="default")
    return out.take(pc.sort_indices(out, sort_keys=[(key, "ascending")]))


def read_table_arrow(
    lake_root: str,
    at_txid: str | None = None,
    key: str = "url",
    ts_col: str = "warc_ts",
    at_tag: str | None = None,
    at_ts=None,
    fs=None,
) -> pa.Table:
    """Materialized, key-sorted snapshot — for tests/small results only."""
    at_txid = _resolve_at(lake_root, at_txid, at_tag, fs, at_ts=at_ts)
    lake = LakeTable(lake_root, fs=fs)
    schema = lake.schema(lake.manifest_at(at_txid)) if at_txid is not None else lake.schema()
    batches = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in read_table(
            lake_root, at_txid, key=key, ts_col=ts_col, fs=fs
        ).iter_batches(batch_format="pyarrow")
    ]
    if not batches:
        return schema.empty_table()
    out = pa.concat_tables([conform(b, schema) for b in batches])
    return out.take(pc.sort_indices(out, sort_keys=[(key, "ascending")]))


def read_dlq(lake_root: str, fs=None) -> pa.Table:
    """Quarantined (dead-letter) change events across all transactions:
    raw WAL columns + ``reason`` (stages/validate.py), sorted by lsn.
    Committed atomically with the transaction that rejected them, so the
    DLQ is exactly-once too (a redelivered segment never re-quarantines).
    Driver-local table read — DLQ volume is O(malformed rows); for a
    pathological feed wrap the file list in ``ray.data.read_parquet``."""
    lake = LakeTable(lake_root, fs=fs)
    files = lake.dlq_files()
    if not files:
        return pa.schema([("reason", pa.string()), ("lsn", pa.int64())]).empty_table()
    out = pa.concat_tables(
        [pq.read_table(f, filesystem=lake.fs.pyarrow_fs) for f in files],
        promote_options="default",
    )
    return out.take(pc.sort_indices(out, sort_keys=[("lsn", "ascending")]))


def requeue_dlq(
    lake_root: str,
    reasons: list[str] | None = None,
    spec: TableSpec = PAGES,
    fs=None,
    salting: str = "auto",
    salt: int = 8,
    combine: bool = True,
    batch_size: int = 64 * 1024,
    merge_mode: str = "rewrite",
) -> dict:
    """Close the quarantine loop: re-apply dead-lettered change events
    that now pass classification (the Kafka-DLQ reprocessing pattern the
    reference's pipeline has no answer to — a bad row there is simply
    lost or crashes the batch, `kafka_multi_consumer.py:33-129` in
    /root/reference).  The intended flow is quarantine → fix the cause
    (drop/relax a constraint, upstream repair) → ``requeue_dlq``.

    ``reasons``: only rows whose DLQ reason is in this list are
    candidates (None = all rows).  Candidates are RE-CLASSIFIED against
    the built-in rules + the constraints currently in force: rows that
    still fail stay quarantined under their FRESH reason; rows that now
    pass are replayed through the normal combiner → pid shuffle → LWW
    merge path in ONE transaction that also publishes the shrunken DLQ —
    atomically, so a crash leaves either the old state (rows still
    quarantined) or the new (applied + removed), never both or neither.

    The event-level duplicate filter is disabled for this transaction
    (``dedup=False``): quarantined LSNs lie INSIDE committed ranges by
    construction (their segment was applied — minus them).  Safe because
    the DLQ itself is exactly-once and the requeued rows are removed
    from it in the same commit; re-running requeue is a no-op.  LWW
    ordering is preserved — rows carry their ORIGINAL (ts, lsn), so a
    requeued event older than current state loses the merge, exactly as
    if it had never been quarantined.

    Returns ``{"requeued", "kept", "stats"}``."""
    from ..stages.validate import constraint_reasons, event_reasons
    from ..state.manifest import writer_lock

    lake = LakeTable(lake_root, fs=fs)
    stats = ReplayStats()
    with writer_lock(lake_root):
        manifest = lake.read_manifest()
        dlq = read_dlq(lake_root, fs=fs)
        if not dlq.num_rows:
            return {"requeued": 0, "kept": 0, "stats": stats}
        if reasons is not None:
            cand_mask = pc.is_in(
                dlq.column("reason"), value_set=pa.array(list(reasons))
            )
        else:
            cand_mask = pa.array([True] * dlq.num_rows)
        events = dlq.drop_columns(["reason"])
        # re-classify candidates with the SAME kernels the combiner runs,
        # so a row we forward can only be re-quarantined by checks that
        # need post-normalize state (derived keys) — never double-counted
        fresh = (
            spec.validate(events)
            if spec.validate is not None
            else event_reasons(events, spec.key, spec.ts_col)
        )
        rules = _constraint_rules(manifest)
        if rules:
            fresh = constraint_reasons(events, rules, fresh)
        now_valid = pc.and_(pc.is_null(fresh), cand_mask)
        n_requeue = int(pc.sum(now_valid).as_py() or 0)
        if n_requeue == 0:
            return {"requeued": 0, "kept": dlq.num_rows, "stats": stats}
        keep_mask = pc.invert(now_valid)
        # kept candidates carry their FRESH reason (a dropped constraint
        # may have been one of two defects); non-candidates keep theirs
        kept_reason = pc.if_else(cand_mask, fresh, dlq.column("reason"))
        keep = events.filter(keep_mask).append_column(
            "reason", kept_reason.filter(keep_mask)
        )

        txid = lake.next_txid(manifest)  # deterministic: tx_seq + 1
        manifest2 = dict(manifest)
        dlq_entries = []
        if keep.num_rows:
            rel = os.path.join("dlq", f"dlq-keep-{txid}.parquet")
            dst = os.path.join(lake.root, rel)
            lake.fs.makedirs(os.path.dirname(dst))
            pq.write_table(keep, dst, filesystem=lake.fs.pyarrow_fs)
            dlq_entries.append(
                {"file": rel, "rows": keep.num_rows, "pid": -1, "txid": txid}
            )
        manifest2["dlq"] = dlq_entries

        import tempfile

        seg_dir = tempfile.mkdtemp(prefix="etlray_requeue_")
        seg = os.path.join(seg_dir, f"requeue-{txid}.parquet")
        try:
            pq.write_table(events.filter(now_valid), seg)
            stats.transactions += 1
            _replay_one_tx(
                lake, manifest2, [seg], salting, salt, combine, batch_size,
                stats, spec, merge_mode=merge_mode, dedup=False,
            )
        finally:
            import shutil

            shutil.rmtree(seg_dir, ignore_errors=True)
    final = lake.read_manifest()
    stats.rows_live = sum(p["rows"] for p in final["partitions"].values())
    stats.schema_version = final["schema_version"]
    return {"requeued": n_requeue, "kept": keep.num_rows, "stats": stats}
