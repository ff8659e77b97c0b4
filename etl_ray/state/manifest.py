"""Transaction manifests + checkpoint: the exactly-once commit layer.

Generalizes the reference's ``loaded_files`` ledger
(`src/pipeline/sql/create_loaded_files.sql:1-7`, diffed at
`src/pipeline/core/client_clickhouse.py:181,193,203` in /root/reference)
from file-granularity at-least-once to LSN-range exactly-once:

* merge tasks write partition files into ``staging/{txid}/`` (side-effect
  safe: Ray may retry a task; the retried task overwrites the same
  deterministic staging path);
* the driver then publishes everything via ONE conditional put
  (put-if-absent, ``state/fs.py``) of the next sequenced commit record
  ``commits/{seq:09d}.json`` — current partition->file map, applied
  segments, applied LSN ranges, schema version, lineage.  The put is the
  COMMIT POINT: of two racing writers that both read tx_seq N, exactly
  one creates record N+1; the loser raises ``CommitConflict`` with
  nothing published.  ``MANIFEST.json`` is a read-optimized cache of the
  head, refreshed after the put and repaired by readers when it lags —
  so no step relies on rename atomicity, and the protocol ports to S3 /
  GCS where rename is copy+delete but conditional put is native.
  Readers resolve data files only through the manifest, so orphaned
  staging/part files from a crashed, retried, or CONFLICTED transaction
  are invisible;
* resume = diff pending WAL segments against ``applied_segments`` in the
  committed manifest; replaying an already-applied segment is a no-op.

Layout of a lake table directory::

    lake/pages/
      parts/part-{pid:05d}-{txid}.parquet   data (orphans possible, ignored)
      staging/{txid}/part-{pid:05d}.parquet pre-commit scratch
      manifests/{txid}.json                 immutable per-tx lineage record
      commits/{seq:09d}.json                commit log (conditional-put CAS)
      MANIFEST.json                         root cache of the commit head
"""

from __future__ import annotations

import base64
import json
import os
import time

import pyarrow as pa


def partition_file_list(meta: dict) -> list[str]:
    """Root-relative data files of one partition: base (may be absent for
    a delta-only partition) followed by its merge-on-read delta chain in
    commit order.  LWW order across the chain is carried by the rows'
    ``(ts, _lsn)`` columns, not file order, so readers may concat freely."""
    files = [meta["file"]] if meta.get("file") else []
    files.extend(d["file"] for d in meta.get("deltas", []))
    return files


def _schema_to_json(schema: pa.Schema) -> dict:
    return {
        "ipc_b64": base64.b64encode(schema.serialize().to_pybytes()).decode("ascii"),
        "fields": [[f.name, str(f.type)] for f in schema],
    }


def _schema_from_json(d: dict) -> pa.Schema:
    buf = base64.b64decode(d["ipc_b64"])
    return pa.ipc.read_schema(pa.BufferReader(buf))


class LakeTable:
    """Manifest-governed partitioned Parquet table.

    All lake I/O goes through a filesystem adapter (``state/fs.py``):
    ``fs`` may be an adapter instance or a spec string
    (``"local-os"``/``"pyarrow-local"``); None consults ``ETLRAY_FS``.
    Merge tasks reconstruct the adapter worker-side from ``fs.spec``."""

    def __init__(self, root: str, num_partitions: int = 32, fs=None):
        from .fs import resolve

        self.root = root
        self.fs = fs if fs is not None and not isinstance(fs, str) else resolve(fs)
        self.parts_dir = os.path.join(root, "parts")
        self.dlq_dir = os.path.join(root, "dlq")
        self.staging_root = os.path.join(root, "staging")
        self.manifests_dir = os.path.join(root, "manifests")
        self.manifest_path = os.path.join(root, "MANIFEST.json")
        self.commits_dir = os.path.join(root, "commits")
        self.default_num_partitions = num_partitions

    # -- init / read ------------------------------------------------------

    def exists(self) -> bool:
        return self.fs.exists(self.manifest_path)

    def init(self, schema: pa.Schema, num_partitions: int | None = None) -> dict:
        """Create an empty table (txid tx000000, no partitions yet).
        The seq-0 commit record is published via the conditional put, so
        two racing initializers cannot both claim the table."""
        for d in (
            self.parts_dir, self.staging_root, self.manifests_dir,
            self.commits_dir,
        ):
            self.fs.makedirs(d)
        manifest = {
            "txid": "tx000000",
            "tx_seq": 0,
            "num_partitions": num_partitions or self.default_num_partitions,
            "schema_version": 0,
            "schema": _schema_to_json(schema),
            "partitions": {},  # pid(str) -> {file, rows, checksum, lsn_hi}
            "applied_segments": [],
            "applied_lsn_ranges": [],
            "lineage": [],  # per-tx summary records
        }
        try:
            self.fs.create_exclusive_json(self._commit_path(0), manifest)
        except FileExistsError:
            raise CommitConflict(
                f"lake table at {self.root} is already initialized"
            ) from None
        self._atomic_write(manifest)
        return manifest

    def _commit_path(self, seq: int) -> str:
        return os.path.join(self.commits_dir, f"{seq:09d}.json")

    def commit_head(self) -> tuple[int, dict] | None:
        """Highest committed (seq, manifest) in the commit log, or None
        for pre-commit-log lakes (older layout: root manifest only)."""
        if not self.fs.exists(self.commits_dir):
            return None
        seqs = [
            int(n[:-5])
            for n in self.fs.listdir(self.commits_dir)
            if n.endswith(".json") and n[:-5].isdigit()
        ]
        if not seqs:
            return None
        head = max(seqs)
        return head, self.fs.read_json(self._commit_path(head))

    def read_manifest(self) -> dict:
        """Committed root state.  ``MANIFEST.json`` is a read-optimized
        CACHE of the commit-log head: if a writer crashed between winning
        the conditional put and refreshing the root, the head is adopted
        here and the cache repaired (best-effort — readers may lack write
        permission).  A missing root still raises FileNotFoundError: the
        commit log supplements the root, it does not replace it."""
        m = self.fs.read_json(self.manifest_path)
        head = self.commit_head()
        if head is not None and head[0] > int(m.get("tx_seq", -1)):
            m = head[1]
            try:
                self._atomic_write(m)
            except OSError:
                pass
        return m

    def schema(self, manifest: dict | None = None) -> pa.Schema:
        m = manifest or self.read_manifest()
        return _schema_from_json(m["schema"])

    def data_files(self, manifest: dict | None = None) -> list[str]:
        """Every referenced data file: base part files plus any
        merge-on-read delta files (in chain order per partition)."""
        m = manifest or self.read_manifest()
        out: list[str] = []
        for p in m["partitions"].values():
            out.extend(
                os.path.join(self.root, rel) for rel in partition_file_list(p)
            )
        return out

    # -- transaction lifecycle -------------------------------------------

    def next_txid(self, manifest: dict) -> str:
        return f"tx{manifest['tx_seq'] + 1:06d}"

    def staging_dir(self, txid: str) -> str:
        d = os.path.join(self.staging_root, txid)
        self.fs.makedirs(d)
        return d

    def staging_path(self, txid: str, pid: int) -> str:
        return os.path.join(self.staging_root, txid, f"part-{pid:05d}.parquet")

    def dlq_staging_path(self, txid: str, pid: int) -> str:
        return os.path.join(self.staging_root, txid, f"dlq-{pid:05d}.parquet")

    def dlq_files(self, manifest: dict | None = None) -> list[str]:
        """Absolute paths of all committed quarantine (DLQ) files."""
        m = manifest or self.read_manifest()
        return [os.path.join(self.root, e["file"]) for e in m.get("dlq", [])]

    def commit(
        self,
        manifest: dict,
        txid: str,
        partition_results: list[dict],
        applied_segments: list[str],
        applied_lsn_range: tuple[int, int] | list[tuple[int, int]] | None,
        new_schema: pa.Schema | None = None,
        extras: dict | None = None,
        replace_partitions: bool = False,
        new_num_partitions: int | None = None,
        delta: bool = False,
        renames: list | None = None,
        drops: list | None = None,
        constraints: dict | None = None,
    ) -> dict:
        """Atomically publish a transaction.

        ``partition_results``: one dict per rewritten partition —
        ``{pid, rows, checksum, lsn_hi, events_applied}`` — whose staged
        file ``staging/{txid}/part-{pid:05d}.parquet`` is promoted to
        ``parts/part-{pid:05d}-{txid}.parquet``.  Untouched partitions
        keep their current files.  Crash before the final ``os.replace``
        leaves the previous manifest fully intact.

        ``replace_partitions=True`` discards the previous partition map
        entirely (every surviving row was rewritten this tx — the
        repartition path); ``new_num_partitions`` records a changed
        partition count for subsequent replays.

        ``delta=True`` publishes merge-on-read deltas instead: each staged
        file becomes ``parts/delta-{pid:05d}-{txid}.parquet`` APPENDED to
        the partition's delta chain; the base file and its stats are left
        untouched (a partition first touched by a delta tx gets a
        base-less entry).  Readers merge base ∪ chain under LWW;
        ``maintenance.compact_deltas`` folds the chain back into the base.
        A rewrite commit for a pid (delta=False) clears its chain — the
        rewrite merged those rows — and the superseded delta files become
        vacuum-reclaimable orphans.
        """
        m = dict(manifest)
        if new_num_partitions is not None:
            m["num_partitions"] = int(new_num_partitions)
        partitions = {} if replace_partitions else dict(m["partitions"])
        promoted = []
        for res in partition_results:
            pid = int(res["pid"])
            src = self.staging_path(txid, pid)
            stem = "delta" if delta else "part"
            rel = os.path.join("parts", f"{stem}-{pid:05d}-{txid}.parquet")
            dst = os.path.join(self.root, rel)
            self.fs.makedirs(os.path.dirname(dst))
            self.fs.replace(src, dst)
            entry = {
                "file": rel,
                "rows": int(res["rows"]),
                "checksum": int(res["checksum"]),
                "lsn_hi": int(res.get("lsn_hi", 0)),
            }
            # writer-computed column min/max (state/partstats.py): the
            # scan planner skips this file from the manifest alone
            if res.get("stats_json"):
                entry["stats"] = json.loads(res["stats_json"])
            if delta:
                prev = dict(
                    partitions.get(
                        str(pid), {"file": None, "rows": 0, "checksum": 0, "lsn_hi": 0}
                    )
                )
                prev["deltas"] = list(prev.get("deltas", [])) + [entry]
                partitions[str(pid)] = prev
            else:
                partitions[str(pid)] = entry
            promoted.append(rel)

        # promote staged quarantine (DLQ) files: malformed events rode the
        # same shuffle as valid ones and were staged by the merge tasks;
        # publishing them is part of the SAME atomic transaction (crash
        # before the manifest swap leaves no committed DLQ entry)
        dlq_entries = list(m.get("dlq", []))
        for res in partition_results:
            if int(res.get("dlq_rows", 0)) <= 0:
                continue
            pid = int(res["pid"])
            src = self.dlq_staging_path(txid, pid)
            rel = os.path.join("dlq", f"dlq-{pid:05d}-{txid}.parquet")
            self.fs.makedirs(self.dlq_dir)
            self.fs.replace(src, os.path.join(self.root, rel))
            dlq_entries.append(
                {"file": rel, "rows": int(res["dlq_rows"]), "pid": pid, "txid": txid}
            )
        if dlq_entries:
            m["dlq"] = dlq_entries

        # normalize: a single (lo, hi) pair or a list of per-segment pairs
        # (per-segment granularity keeps event-level dedup exact when a
        # chunk spans a gap in segment arrival order)
        if applied_lsn_range and isinstance(applied_lsn_range[0], (list, tuple)):
            lsn_ranges = [list(r) for r in applied_lsn_range]
        elif applied_lsn_range:
            lsn_ranges = [list(applied_lsn_range)]
        else:
            lsn_ranges = []
        tx_record = {
            "txid": txid,
            # wall-clock commit stamp (epoch µs) — operational metadata
            # for timestamp time travel (`read_table(at_ts=...)`), never
            # part of data/correctness comparisons
            "committed_at": int(time.time() * 1_000_000),
            "applied_segments": list(applied_segments),
            "applied_lsn_range": (
                [min(r[0] for r in lsn_ranges), max(r[1] for r in lsn_ranges)]
                if lsn_ranges
                else None
            ),
            "partitions": [
                {k: int(v) if isinstance(v, (int, float)) else v for k, v in r.items()}
                for r in partition_results
            ],
            "rows_total": int(sum(r["rows"] for r in partition_results)),
            "events_applied": int(sum(r.get("events_applied", 0) for r in partition_results)),
        }
        if extras:
            tx_record.update(extras)
        # snapshot the FULL post-tx state into the immutable per-tx record:
        # time-travel reads (`read_table(at_txid=...)`) resolve files and
        # schema from this snapshot alone (valid until vacuum() reclaims
        # the superseded part files)
        # the rename chain is part of the snapshot: a time-travel read of
        # a pre-rename txid serves that era's names (metadata-only column
        # renames, pipelines/maintenance.rename_column)
        eff_renames = (
            list(renames) if renames is not None
            else list(manifest.get("renames", []))
        )
        # same for metadata-only column drops (maintenance.drop_column):
        # a pre-drop snapshot still serves the column, later ones exclude
        # it even though the bytes remain in the files until a rewrite
        eff_drops = (
            list(drops) if drops is not None
            else list(manifest.get("drops", []))
        )
        # declarative CHECK constraints (maintenance.set_constraint) ride
        # the manifest the same way: name -> {column, op, value}.  They
        # govern FUTURE replays only, but snapshotting them keeps per-tx
        # audit records coherent ("which invariants were in force here").
        eff_constraints = (
            dict(constraints) if constraints is not None
            else dict(manifest.get("constraints", {}))
        )
        tx_record["snapshot"] = {
            "partitions": partitions,
            "schema": (
                _schema_to_json(new_schema)
                if new_schema is not None
                else dict(m["schema"])
            ),
            "num_partitions": m["num_partitions"],
            "renames": eff_renames,
            "drops": eff_drops,
            "constraints": eff_constraints,
        }
        self.fs.makedirs(self.manifests_dir)
        self.fs.write_json(
            os.path.join(self.manifests_dir, f"{txid}.json"), tx_record
        )

        m["txid"] = txid
        m["tx_seq"] = manifest["tx_seq"] + 1
        if eff_renames:
            m["renames"] = eff_renames
        if eff_drops:
            m["drops"] = eff_drops
        if constraints is not None or eff_constraints:
            m["constraints"] = eff_constraints
        m["partitions"] = partitions
        m["applied_segments"] = list(manifest["applied_segments"]) + list(applied_segments)
        if lsn_ranges:
            m["applied_lsn_ranges"] = list(manifest["applied_lsn_ranges"]) + lsn_ranges
        if new_schema is not None and not new_schema.equals(self.schema(manifest)):
            m["schema"] = _schema_to_json(new_schema)
            m["schema_version"] = manifest["schema_version"] + 1
        m["lineage"] = list(manifest["lineage"]) + [
            {
                "txid": txid,
                "committed_at": tx_record["committed_at"],
                "rows_total": tx_record["rows_total"],
                "events_applied": tx_record["events_applied"],
                "applied_lsn_range": tx_record["applied_lsn_range"],
                "partitions_rewritten": len(partition_results),
                **(extras or {}),
            }
        ]
        # THE commit point: conditional put of the next sequenced commit
        # record.  Exactly one of two racing writers that both read
        # tx_seq N creates commits/{N+1}.json; the loser's staged files
        # stay invisible (readers resolve through manifests only) and it
        # must reload the manifest and retry its whole transaction.
        self.fs.makedirs(self.commits_dir)  # pre-commit-log lakes upgrade here
        try:
            self.fs.create_exclusive_json(self._commit_path(m["tx_seq"]), m)
        except FileExistsError:
            raise CommitConflict(
                f"tx_seq {m['tx_seq']} already committed by another writer "
                f"on {self.root}; reload the manifest and retry"
            ) from None
        # root cache refresh (non-decisive: readers repair from the head)
        self._atomic_write(m)
        # post-commit GC of this tx's staging dir (safe: manifest is durable)
        self.fs.rmtree(os.path.join(self.staging_root, txid))
        return m

    def publish_state(self, state: dict, provenance: dict) -> dict:
        """Publish a fully-formed table state (partitions / schema /
        ledger / evolution metadata, whose referenced files the caller
        has already placed under this root) as this table's next
        transaction — the clone/mirror primitive
        (maintenance.clone_table / sync_clone).  ``provenance`` is
        recorded in the lineage entry and per-tx record.  Same CAS
        commit point as ``commit()``: the next-seq conditional put."""
        manifest = self.read_manifest()
        txid = self.next_txid(manifest)
        m = dict(manifest)
        m["txid"] = txid
        m["tx_seq"] = manifest["tx_seq"] + 1
        for k in (
            "num_partitions", "schema", "schema_version", "partitions",
            "applied_segments", "applied_lsn_ranges",
        ):
            m[k] = state[k]
        for k in ("renames", "drops", "constraints"):
            if state.get(k):
                m[k] = state[k]
            else:
                m.pop(k, None)  # mirror semantics: absent upstream wins
        rows_total = int(sum(p["rows"] for p in m["partitions"].values()))
        tx_record = {
            "txid": txid,
            "committed_at": int(time.time() * 1_000_000),
            "applied_segments": [],
            "applied_lsn_range": None,
            "partitions": [],
            "rows_total": rows_total,
            "events_applied": 0,
            **provenance,
            "snapshot": {
                "partitions": m["partitions"],
                "schema": dict(m["schema"]),
                "num_partitions": m["num_partitions"],
                "renames": m.get("renames", []),
                "drops": m.get("drops", []),
                "constraints": m.get("constraints", {}),
            },
        }
        self.fs.makedirs(self.manifests_dir)
        self.fs.write_json(
            os.path.join(self.manifests_dir, f"{txid}.json"), tx_record
        )
        m["lineage"] = list(manifest["lineage"]) + [{
            "txid": txid,
            "committed_at": tx_record["committed_at"],
            "rows_total": rows_total,
            "events_applied": 0,
            "applied_lsn_range": None,
            "partitions_rewritten": 0,
            **provenance,
        }]
        self.fs.makedirs(self.commits_dir)
        try:
            self.fs.create_exclusive_json(self._commit_path(m["tx_seq"]), m)
        except FileExistsError:
            raise CommitConflict(
                f"tx_seq {m['tx_seq']} already committed by another writer "
                f"on {self.root}"
            ) from None
        self._atomic_write(m)
        return m

    def install_snapshot(self, state: dict, provenance: dict) -> dict:
        """``publish_state`` gated to a freshly ``init``-ed table — the
        initial-clone path (maintenance.clone_table)."""
        manifest = self.read_manifest()
        if manifest["tx_seq"] != 0 or manifest["partitions"]:
            raise CommitConflict(
                f"install_snapshot requires a freshly initialized table; "
                f"{self.root} is at tx_seq {manifest['tx_seq']}"
            )
        return self.publish_state(state, provenance)

    def manifest_at(self, txid: str) -> dict:
        """Reconstruct the committed state as of ``txid`` from its
        immutable per-tx snapshot (time travel).  Raises FileNotFoundError
        for unknown txids and KeyError for pre-snapshot-era records."""
        rec = self.fs.read_json(
            os.path.join(self.manifests_dir, f"{txid}.json")
        )
        snap = rec["snapshot"]
        return {
            "txid": txid,
            "num_partitions": snap["num_partitions"],
            "schema": snap["schema"],
            "partitions": snap["partitions"],
            "renames": snap.get("renames", []),
            "drops": snap.get("drops", []),
        }

    def pending_segments(self, all_segments: list[str], manifest: dict | None = None) -> list[str]:
        """Ledger diff — the reference's new-file predicate
        (`src/pipeline/core/client_clickhouse.py:193`) at segment level."""
        m = manifest or self.read_manifest()
        applied = {os.path.basename(s) for s in m["applied_segments"]}
        return [s for s in all_segments if os.path.basename(s) not in applied]

    # -- internals --------------------------------------------------------

    def _atomic_write(self, manifest: dict) -> None:
        self.fs.write_json_atomic(self.manifest_path, manifest)


def resolve_txid_at_ts(lake_root: str, at_ts, fs=None) -> str:
    """Resolve the LAST transaction committed at or before ``at_ts`` —
    the txid that timestamp time travel (``read_table(at_ts=...)``)
    serves.

    ``at_ts`` is an epoch-microseconds int (matching the manifest's
    ``committed_at`` stamps) or a ``datetime`` (converted with
    ``.timestamp()``; pass tz-aware datetimes to avoid local-zone
    surprises).  Resolution walks the manifest's lineage — O(#txs)
    driver-side metadata, no data I/O.  Transactions committed by a
    pre-``committed_at`` version of this engine carry no stamp and are
    not addressable by timestamp (they are skipped); address those by
    ``at_txid`` instead."""
    import datetime as _dt

    if isinstance(at_ts, _dt.datetime):
        at_us = int(at_ts.timestamp() * 1_000_000)
    else:
        at_us = int(at_ts)
    lake = LakeTable(lake_root, fs=fs)
    m = lake.read_manifest()
    best = None
    stamped = 0
    for entry in m.get("lineage", []):
        ca = entry.get("committed_at")
        if ca is None:
            continue
        stamped += 1
        if int(ca) <= at_us:
            best = entry
    if best is None:
        lo = min(
            (int(e["committed_at"]) for e in m.get("lineage", [])
             if e.get("committed_at") is not None),
            default=None,
        )
        raise ValueError(
            f"no transaction on {lake_root} committed at or before "
            f"{at_us} ({stamped} stamped txs"
            + (f", earliest committed_at={lo}" if lo is not None else "")
            + ")"
        )
    return best["txid"]


class CommitConflict(RuntimeError):
    """Another writer won the conditional put for this sequence number.
    The losing transaction committed NOTHING (its staged files are
    unreferenced and vacuum-reclaimable); reload the manifest and retry."""


class WriterLockHeld(RuntimeError):
    """Another live process holds the table's writer lock."""


class writer_lock:
    """Advisory single-writer lock for a lake table (context manager).

    Two uncoordinated writers would both read manifest tx_seq N, both
    stage tx N+1, and the second ``os.replace`` would silently discard
    the first transaction's commit — the one lost-update hole the
    atomic manifest swap cannot close by itself.  The lock is an
    O_EXCL-created ``WRITER.lock`` carrying the holder's pid: creation
    is atomic on POSIX, a crash leaves a stale file that the next
    writer STEALS after confirming the pid is dead (os.kill(pid, 0)).

    Single-node semantics: pid liveness is only meaningful on one host.
    On a multi-node cluster run ONE driver per table (the engine's
    deployment shape — replay_many multiplexes tables inside one
    driver) or replace this with an external lock service.
    """

    def __init__(self, root: str):
        self.path = os.path.join(root, "WRITER.lock")

    def __enter__(self):
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        for _ in range(2):  # second try after stealing a stale lock
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                with os.fdopen(fd, "w") as f:
                    f.write(str(os.getpid()))
                return self
            except FileExistsError:
                try:
                    with open(self.path) as f:
                        pid = int(f.read().strip() or "0")
                except (OSError, ValueError):
                    pid = 0
                alive = False
                if pid == os.getpid():
                    alive = True  # our own (or a thread of ours) holds it
                elif pid > 0:
                    try:
                        os.kill(pid, 0)
                        alive = True
                    except (ProcessLookupError, PermissionError):
                        alive = False
                if alive:
                    raise WriterLockHeld(
                        f"writer lock {self.path} held by live pid {pid}"
                    )
                # Stale (holder crashed) — steal by ATOMICALLY renaming the
                # stale file aside to a name unique to this stealer.  Two
                # racing stealers both calling os.remove could each delete
                # the OTHER's freshly created lock (TOCTOU); rename is
                # atomic, so exactly one stealer wins the rename and the
                # loser's retry sees whatever lock the winner creates.
                aside = f"{self.path}.stale.{os.getpid()}"
                try:
                    os.rename(self.path, aside)
                except (FileNotFoundError, OSError):
                    continue  # another stealer won the rename; retry
                try:
                    os.remove(aside)
                except FileNotFoundError:
                    pass
        raise WriterLockHeld(f"could not acquire {self.path}")

    def __exit__(self, *exc):
        try:
            os.remove(self.path)
        except FileNotFoundError:
            pass
        return False
