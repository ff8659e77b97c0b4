"""In-memory fake message broker: consumer-offset semantics for the
SegmentSource protocol.

The reference consumes 18 Kafka topics with consumer-group offset
commits (`src/pipeline/core/kafka_multi_consumer.py:33-129` in
/root/reference).  This module is the sandbox stand-in that exercises
the SAME protocol behaviors against ``replay``/``follow`` without a
broker process:

* **log segments**: producers ``produce`` record batches; each becomes
  an immutable parquet segment held in a staging area until
  ``publish``-ed — so tests control EXACTLY when, and in what order,
  the consumer can see each segment (late/out-of-order publication,
  duplicate delivery);
* **delivery order = publication order**, not segment-name order: the
  broker journals every publish and ``BrokerSource.pending`` replays
  the journal — a consumer polling mid-stream sees segment 5 before
  segment 3 if that is how the producer published them;
* **committed offsets = the lake ledger**: the consumer never tells the
  broker anything.  ``pending(applied)`` diffs the journal against the
  manifest's ``applied_segments`` set, exactly how a consumer group's
  committed offsets gate redelivery.  Duplicate publishes (broker
  redelivery) are therefore consumed at-most-once by construction, and
  the engine's event-level LSN filter makes the end state exactly-once;
* **restartable**: the journal and segments live on disk, so a consumer
  process can die mid-tail and a fresh ``BrokerSource`` over the same
  broker root resumes from the ledger, not from byte 0.

At 100 TB the shape holds: the broker object is driver-side control
plane only; data-plane reads are plain parquet paths handed to Ray
tasks, and the journal/ledger diff is O(unconsumed segments).
"""

from __future__ import annotations

import json
import os
import threading

import pyarrow as pa
import pyarrow.parquet as pq

from .wal import SegmentSource


class FakeBroker:
    """Single-topic fake broker over a spool directory.

    ``produce(table, segment_id)`` stages an immutable segment;
    ``publish(segment_id)`` makes it visible to consumers (atomic
    rename + journal append, so a consumer polling concurrently sees
    either nothing or the complete segment).  ``publish`` may be called
    in any order relative to production, and more than once — a
    re-publish journals a duplicate delivery, which consumers must (and
    do) no-op via their committed-offset set."""

    def __init__(self, root: str):
        self.root = root
        self.staged_dir = os.path.join(root, "staged")
        self.log_dir = os.path.join(root, "log")
        self.journal_path = os.path.join(root, "PUBLISHED.jsonl")
        os.makedirs(self.staged_dir, exist_ok=True)
        os.makedirs(self.log_dir, exist_ok=True)
        self._lock = threading.Lock()

    # -- producer side ------------------------------------------------------

    def produce(self, table: pa.Table, segment_id: str) -> str:
        """Stage one immutable log segment (not yet visible)."""
        if not segment_id.endswith(".parquet"):
            segment_id += ".parquet"
        path = os.path.join(self.staged_dir, segment_id)
        pq.write_table(table, path)
        return segment_id

    def produce_file(self, parquet_path: str, segment_id: str | None = None) -> str:
        """Stage an existing parquet segment file (e.g. generated WAL)."""
        import shutil

        segment_id = segment_id or os.path.basename(parquet_path)
        shutil.copyfile(
            parquet_path, os.path.join(self.staged_dir, segment_id)
        )
        return segment_id

    def publish(self, segment_id: str) -> None:
        """Make a staged segment visible, in THIS call's order.  A
        second publish of the same id journals a duplicate delivery."""
        with self._lock:
            staged = os.path.join(self.staged_dir, segment_id)
            final = os.path.join(self.log_dir, segment_id)
            if os.path.exists(staged):
                os.replace(staged, final)  # atomic: whole segment or nothing
            elif not os.path.exists(final):
                raise FileNotFoundError(
                    f"segment {segment_id!r} was never produced"
                )
            with open(self.journal_path, "a") as f:
                f.write(json.dumps({"id": segment_id}) + "\n")
                f.flush()
                os.fsync(f.fileno())

    # -- consumer side ------------------------------------------------------

    def source(self) -> "BrokerSource":
        return BrokerSource(self.root)


class BrokerSource(SegmentSource):
    """Consumer handle: ``pending(applied)`` = journal order minus the
    committed-offset set.  Stateless over the broker root, so a restart
    (fresh object, same root) resumes exactly where the LEDGER says —
    the broker holds no consumer state (reference consumer groups:
    `kafka_multi_consumer.py:33-129`)."""

    def __init__(self, root: str):
        self.root = root
        self.log_dir = os.path.join(root, "log")
        self.journal_path = os.path.join(root, "PUBLISHED.jsonl")

    def _journal(self) -> list[str]:
        if not os.path.exists(self.journal_path):
            return []
        with open(self.journal_path) as f:
            return [json.loads(line)["id"] for line in f if line.strip()]

    def pending(self, applied: set[str]) -> list[str]:
        out, seen = [], set()
        for sid in self._journal():
            if sid in applied or sid in seen:  # committed or dup delivery
                continue
            seen.add(sid)
            out.append(os.path.join(self.log_dir, sid))
        return out

    def committed_offsets(self, applied: set[str]) -> dict:
        """The consumer-group view: per-topic committed/unconsumed
        counts derived from the ledger (= offsets live with the
        consumer's own committed state, never with the broker)."""
        journal = self._journal()
        delivered = list(dict.fromkeys(journal))  # first-delivery order
        committed = [s for s in delivered if s in applied]
        return {
            "delivered": len(delivered),
            "deliveries": len(journal),  # includes duplicate redeliveries
            "committed": len(committed),
            "lag": len(delivered) - len(committed),
        }
