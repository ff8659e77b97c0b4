"""WAL/binlog segment source.

The simulated WAL is a directory of ordered Parquet segment files (the
Ray-native restatement of the reference's per-topic Kafka streams,
`src/pipeline/core/kafka_multi_consumer.py:33-98` in /root/reference —
offsets become (segment, lsn), consumer groups become the manifest
ledger).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq


def list_segments(wal_dir: str) -> list[str]:
    """All segment files in WAL order (lexicographic == creation order)."""
    return sorted(
        os.path.join(wal_dir, f)
        for f in os.listdir(wal_dir)
        if f.endswith(".parquet")
    )


def segment_lsn_range(path: str) -> tuple[int, int]:
    """(min, max) lsn from parquet footer statistics — no data read."""
    md = pq.read_metadata(path)
    ci = md.schema.to_arrow_schema().get_field_index("lsn")
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(ci).statistics
        if st is not None and st.has_min_max:
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    return (lo or 0, hi or 0)


def segment_row_count(path: str) -> int:
    return pq.read_metadata(path).num_rows


def read_segments(paths: list[str], schema=None):
    """Dataset over WAL segments; pass a unified schema so old-schema
    segments are null-filled by the Arrow dataset scanner."""
    import ray.data

    return ray.data.read_parquet(paths, schema=schema)


# ---------------------------------------------------------------------------
# pluggable segment source protocol
# ---------------------------------------------------------------------------


class SegmentSource:
    """Minimal protocol between ``replay``/``follow`` and whatever
    publishes WAL segments.

    ``pending(applied)`` returns the ordered list of segment paths/URIs
    that are published but whose ids (basenames) are not in ``applied``
    (the lake ledger's committed set).  ``replay`` re-asks after every
    transaction, so a source may keep publishing — including OUT OF
    ORDER — while a replay loop runs; event-level exactly-once and
    per-segment LSN ranges make late/out-of-order publication safe.

    A message-broker implementation maps naturally: topic partitions
    -> segment ids, consumer committed offsets -> the ``applied`` set
    (the reference's consumer group protocol,
    `src/pipeline/core/kafka_multi_consumer.py:33-129` in
    /root/reference).  The directory listing below is the default.
    """

    def pending(self, applied: set[str]) -> list[str]:  # pragma: no cover
        raise NotImplementedError


class DirectorySource(SegmentSource):
    """The simulated-WAL default: a directory of parquet segments; the
    new-file predicate is a listing diff against the ledger (reference:
    `src/pipeline/core/client_clickhouse.py:193`)."""

    def __init__(self, wal_dir: str):
        self.wal_dir = wal_dir

    def pending(self, applied: set[str]) -> list[str]:
        return [
            s
            for s in list_segments(self.wal_dir)
            if os.path.basename(s) not in applied
        ]


class StaticSource(SegmentSource):
    """A fixed, explicitly ordered segment list (replay(segments=...))."""

    def __init__(self, segments: list[str]):
        self.segments = list(segments)

    def pending(self, applied: set[str]) -> list[str]:
        return [
            s for s in self.segments if os.path.basename(s) not in applied
        ]
