"""Continuous tailing: segments arriving between polls get applied."""

import os
import shutil
import threading
import time

from etl_ray.oracle import replay_oracle


def test_follow_picks_up_new_segments(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.replay import bootstrap_lake, follow, read_table_arrow

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)

    # start with half the segments in a fresh WAL dir; drip the rest in
    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    segs = small_wal["segments"]
    half = len(segs) // 2
    for s in segs[:half]:
        shutil.copy(s, wal)

    def drip():
        time.sleep(1.0)
        for s in segs[half:]:
            tmp = os.path.join(wal, "." + os.path.basename(s))
            shutil.copy(s, tmp)
            os.replace(tmp, os.path.join(wal, os.path.basename(s)))  # atomic appear
            time.sleep(0.3)

    t = threading.Thread(target=drip)
    t.start()
    stats = follow(root, wal, poll_interval=0.5, idle_exit_after=4)
    t.join()

    assert stats.segments_applied == len(segs)
    assert stats.transactions >= 2  # applied across multiple polls
    oracle = replay_oracle(small_wal["base"], segs)
    assert read_table_arrow(root).equals(oracle)


class _FakeBroker:
    """In-memory broker-style SegmentSource: segments become visible in
    explicit publish() bursts — including OUT OF ORDER relative to their
    WAL (lsn) order — mimicking a consumer seeing late partitions."""

    def __init__(self):
        self.published: list[str] = []

    def publish(self, *paths: str):
        self.published.extend(paths)

    def pending(self, applied: set[str]) -> list[str]:
        return [
            s
            for s in self.published
            if os.path.basename(s) not in applied
        ]


def test_fake_broker_source_out_of_order(ray_session, small_wal, tmp_path):
    """replay consumes only SegmentSource.pending(); out-of-order segment
    publication across replay calls still converges to the oracle."""
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    root = str(tmp_path / "lake_broker" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    segs = small_wal["segments"]

    broker = _FakeBroker()
    # publish LAST segments first, then the earlier ones — late events
    # (older warc_ts in earlier segments) must not win over the applied
    broker.publish(*segs[3:])
    s1 = replay(root, broker)
    assert s1.segments_applied == len(segs) - 3
    broker.publish(*segs[:3])  # older segments arrive late
    s2 = replay(root, broker)
    assert s2.segments_applied == 3

    oracle = replay_oracle(small_wal["base"], segs)
    assert read_table_arrow(root).equals(oracle)
    # broker source replays are idempotent too
    assert replay(root, broker).transactions == 0


def test_broker_follow_tail_exactly_once(ray_session, small_wal, tmp_path):
    """The real broker-backed SegmentSource (sources/broker.py) under
    follow(): segments published OUT OF ORDER while the consumer tails,
    plus one duplicate redelivery — the final state must equal the
    oracle with every segment applied exactly once (ledger = committed
    offsets; the broker holds no consumer state)."""
    from etl_ray.pipelines.replay import bootstrap_lake, follow, read_table_arrow
    from etl_ray.sources.broker import FakeBroker
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake_fb" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    broker = FakeBroker(str(tmp_path / "broker"))
    segs = small_wal["segments"]
    ids = [broker.produce_file(s) for s in segs]
    half = len(ids) // 2

    def produce():
        time.sleep(0.4)
        for sid in ids[half:]:  # newest WAL segments become visible FIRST
            broker.publish(sid)
            time.sleep(0.1)
        broker.publish(ids[-1])  # broker redelivery of an already-sent one
        for sid in ids[:half]:  # the older segments arrive late
            broker.publish(sid)
            time.sleep(0.1)

    t = threading.Thread(target=produce)
    t.start()
    records = []
    stats = follow(
        root, broker.source(), poll_interval=0.25, idle_exit_after=4,
        metrics=records.append,
    )
    t.join()

    assert stats.segments_applied == len(segs)  # the dup was NOT re-applied
    ledger = LakeTable(root).read_manifest()["applied_segments"]
    # exactly once: every segment ledgered exactly one time (plus the
    # bootstrap's __base__ entry), no re-application of the redelivery
    assert len(ledger) == len(set(ledger))
    assert set(ledger) == {"__base__"} | {os.path.basename(s) for s in segs}
    oracle = replay_oracle(small_wal["base"], segs)
    assert read_table_arrow(root).equals(oracle)
    # consumer-group view: all delivered segments committed, zero lag,
    # and the duplicate delivery is visible as deliveries > delivered
    off = broker.source().committed_offsets(
        {os.path.basename(s) for s in ledger}
    )
    assert off["committed"] == len(segs) and off["lag"] == 0
    assert off["deliveries"] == len(segs) + 1
    assert stats.transactions >= 2  # consumed across multiple polls
    assert records[-1]["lag_segments"] == 0  # metrics see broker lag too


def test_broker_restart_mid_tail_resumes_from_ledger(ray_session, small_wal, tmp_path):
    """Consumer dies mid-tail; more segments are published while it is
    down; a FRESH consumer handle over the same broker root resumes from
    the lake ledger (committed offsets) — nothing reapplied, nothing
    lost."""
    from etl_ray.pipelines.replay import bootstrap_lake, follow, read_table_arrow
    from etl_ray.sources.broker import BrokerSource, FakeBroker
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake_rs" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    broker = FakeBroker(str(tmp_path / "broker_rs"))
    segs = small_wal["segments"]
    ids = [broker.produce_file(s) for s in segs]

    for sid in (ids[2], ids[0], ids[1]):  # out-of-order early burst
        broker.publish(sid)
    s1 = follow(root, broker.source(), poll_interval=0.01, max_polls=1)
    assert s1.segments_applied == 3

    for sid in reversed(ids[3:]):  # arrivals while the consumer is down
        broker.publish(sid)

    # restart: new source object, same broker root, offsets from ledger
    s2 = follow(
        root, BrokerSource(str(tmp_path / "broker_rs")),
        poll_interval=0.01, idle_exit_after=1,
    )
    assert s2.segments_applied == len(segs) - 3
    ledger = LakeTable(root).read_manifest()["applied_segments"]
    assert len(ledger) == len(set(ledger))
    assert set(ledger) == {"__base__"} | {os.path.basename(s) for s in segs}
    oracle = replay_oracle(small_wal["base"], segs)
    assert read_table_arrow(root).equals(oracle)


def test_follow_emits_metrics(ray_session, small_wal, tmp_path):
    """Per-poll observability records: throughput, lag, chains, DLQ."""
    import json

    from etl_ray.pipelines.replay import bootstrap_lake, follow

    root = str(tmp_path / "lake_metrics" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    wal = str(tmp_path / "wal_metrics")
    os.makedirs(wal)
    segs = small_wal["segments"]
    for s in segs[:2]:
        shutil.copy(s, wal)

    records = []
    mpath = str(tmp_path / "metrics.jsonl")
    follow(
        root, wal, poll_interval=0.1, idle_exit_after=2,
        metrics=records.append, metrics_path=mpath,
        max_segments_per_tx=1,
    )
    assert len(records) >= 2
    first = records[0]
    assert first["segments_applied"] == 2
    assert first["transactions"] == 2  # max_segments_per_tx=1
    assert first["events_applied"] > 0
    assert first["events_per_sec"] > 0
    assert first["lag_segments"] == 0 and first["lag_rows"] == 0
    assert first["dlq_rows"] == 0 and first["chain_max"] == 0
    assert records[-1]["segments_applied"] == 0  # idle polls report too
    # file sink carries the same records
    lines = [json.loads(l) for l in open(mpath)]
    assert lines == records


def test_follow_on_commit_keeps_derived_state_current(ray_session, small_wal, tmp_path):
    """on_commit fires once per applying poll; wiring it to the host
    index keeps the index consistent with the lake head after tailing."""
    import os
    import shutil

    from etl_ray.pipelines.hostindex import (
        build_host_index, read_index, refresh_host_index,
    )
    from etl_ray.pipelines.replay import bootstrap_lake, follow
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=4)
    idx_root = str(tmp_path / "idx")
    build_host_index(idx_root, root)

    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    for s in small_wal["segments"]:
        shutil.copy(s, wal)

    seen = []

    def hook(lake_root, txid):
        seen.append(txid)
        refresh_host_index(idx_root, lake_root, to_txid=txid)

    follow(
        root, wal,
        poll_interval=0.01, idle_exit_after=1, max_segments_per_tx=4,
        on_commit=hook,
    )
    assert seen, "hook never fired"
    assert seen[-1] == LakeTable(root).read_manifest()["txid"]

    got = read_index(idx_root).to_pandas().sort_values(["host", "pid"]).reset_index(drop=True)
    rebuilt_root = str(tmp_path / "idx2")
    build_host_index(rebuilt_root, root)
    exp = read_index(rebuilt_root).to_pandas().sort_values(["host", "pid"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp)
