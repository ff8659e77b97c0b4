"""Policy-driven maintenance loop (maintenance.auto_maintain): signals,
recommendation-vs-action gating, idempotence, state preservation."""

import json
import os

from etl_ray.oracle import replay_oracle
from etl_ray.pipelines.maintenance import _maintenance_signals, auto_maintain
from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay
from etl_ray.state.manifest import LakeTable


def _build(tmp_path, small_wal, name, **kw):
    root = str(tmp_path / name / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], **kw)
    return root


def test_signals_probe(ray_session, small_wal, tmp_path):
    # delta lake: chains visible; tombstone ratio deliberately excludes
    # chained partitions (undefined until folded — a pure-insert delta
    # must not read as tombstone debt)
    root = _build(tmp_path, small_wal, "sg", merge_mode="delta",
                  max_segments_per_tx=2)
    sig = _maintenance_signals(root)
    assert sig["max_chain"] >= 1
    assert sig["partitions"] == 8
    # flat (rewrite) lake: ratio is exact — tombstones exist in base files
    root2 = _build(tmp_path, small_wal, "sg2")
    sig2 = _maintenance_signals(root2)
    assert sig2["max_chain"] == 0
    assert sig2["stored_rows"] > sig2["live_rows"]
    assert 0 < sig2["tombstone_ratio"] < 1


def test_dry_run_recommends_without_touching(ray_session, small_wal, tmp_path):
    root = _build(tmp_path, small_wal, "dr", merge_mode="delta",
                  max_segments_per_tx=2)
    before = LakeTable(root).read_manifest()["tx_seq"]
    rep = auto_maintain(root, max_chain=1, tombstone_ratio=0.01, dry_run=True)
    assert rep["actions"] == []
    assert any("fold" in r for r in rep["recommendations"])
    assert LakeTable(root).read_manifest()["tx_seq"] == before
    # flat lake: tombstone GC is blocked without the safety flag, and says so
    root2 = _build(tmp_path, small_wal, "dr2")
    rep2 = auto_maintain(root2, tombstone_ratio=0.01, dry_run=True)
    assert rep2["actions"] == []
    assert any("blocked" in r for r in rep2["recommendations"])


def test_full_loop_preserves_state_and_is_idempotent(
    ray_session, small_wal, tmp_path
):
    root = _build(tmp_path, small_wal, "fl", merge_mode="delta",
                  max_segments_per_tx=2)
    want = replay_oracle(small_wal["base"], small_wal["segments"])

    rep = auto_maintain(
        root, max_chain=1, tombstone_ratio=0.01, assume_caught_up=True
    )
    kinds = [a["kind"] for a in rep["actions"]]
    assert kinds == ["compact_deltas", "compact", "vacuum"]
    assert read_table_arrow(root).equals(want)
    sig = rep["signals"]
    assert sig["max_chain"] == 0
    assert sig["tombstone_rows"] == 0
    assert sig["orphan_files"] == 0

    # healthy lake: second run does nothing
    rep2 = auto_maintain(
        root, max_chain=1, tombstone_ratio=0.01, assume_caught_up=True
    )
    assert rep2["actions"] == [] and rep2["recommendations"] == []
    assert read_table_arrow(root).equals(want)


def test_lateness_contract_enables_gc(ray_session, small_wal, tmp_path):
    root = _build(tmp_path, small_wal, "lt", merge_mode="delta",
                  max_segments_per_tx=2)
    want = read_table_arrow(root)
    rep = auto_maintain(
        root, max_chain=1, tombstone_ratio=0.01, lateness_us=0
    )
    assert any(a["kind"] == "compact" for a in rep["actions"])
    assert read_table_arrow(root).equals(want)


def test_cli_maintain(ray_session, small_wal, tmp_path, capsys):
    from etl_ray.pipelines.cli import main

    root = _build(tmp_path, small_wal, "cm", merge_mode="delta",
                  max_segments_per_tx=2)
    assert main(["maintain", "--lake", root, "--max-chain", "1",
                 "--tombstone-ratio", "0.01", "--dry-run"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["recommendations"] and not rep["actions"]
    assert main(["maintain", "--lake", root, "--max-chain", "1",
                 "--tombstone-ratio", "0.01", "--assume-caught-up"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [a["kind"] for a in rep["actions"]] == [
        "compact_deltas", "compact", "vacuum"
    ]


def test_expire_snapshots_retention(ray_session, small_wal, tmp_path):
    """expire_snapshots: kept snapshots stay time-travelable, expired
    ones lose their files; the head is never expirable."""
    import pytest

    from etl_ray.pipelines.maintenance import expire_snapshots
    from etl_ray.pipelines.replay import read_table_arrow

    root = _build(tmp_path, small_wal, "ex", max_segments_per_tx=2)
    lake = LakeTable(root)
    m = lake.read_manifest()
    txids = [r["txid"] for r in m["lineage"]]
    assert len(txids) >= 3  # bootstrap + >=2 replay txs
    head = m["txid"]
    before = read_table_arrow(root)

    rep = expire_snapshots(root, keep_last=2)
    assert head in rep["kept"]
    assert rep["expired"] == txids[:-2]
    assert rep["removed_parts"] > 0

    # head and the previous snapshot still read
    assert read_table_arrow(root).equals(before)
    read_table_arrow(root, at_txid=txids[-2])
    # the expired bootstrap snapshot's files are gone
    with pytest.raises(Exception):
        read_table_arrow(root, at_txid=txids[0])

    # absolute-time retention: keep everything committed after epoch 0
    root2 = _build(tmp_path, small_wal, "ex2", max_segments_per_tx=2)
    txids2 = [r["txid"] for r in LakeTable(root2).read_manifest()["lineage"]]
    rep2 = expire_snapshots(root2, keep_last=0, keep_committed_after_us=0)
    assert rep2["expired"] == []
    for t in txids2:
        read_table_arrow(root2, at_txid=t)
