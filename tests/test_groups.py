"""Cross-table transaction groups: the group pointer exposes only
member states published together — per-table commits that raced ahead
stay invisible to group readers until the next atomic group publish."""

import os
import shutil

import pytest

from etl_ray.oracle import replay_oracle


def _half_wal(tmp_path, small_wal, name):
    segs = [s for s in small_wal["segments"] if "redelivered" not in s]
    half = str(tmp_path / f"wal_half_{name}")
    os.makedirs(half)
    for s in segs[: len(segs) // 2]:
        shutil.copy(s, half)
    return half, segs


def test_group_publish_is_atomic_and_consistent(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.groups import (
        group_snapshot, read_group_table, replay_group,
    )
    from etl_ray.pipelines.replay import (
        StreamSpec, bootstrap_lake, read_table_arrow, replay,
    )

    roots = {}
    for name in ("a", "b"):
        root = str(tmp_path / f"lake_{name}" / "pages")
        bootstrap_lake(root, small_wal["base"], num_partitions=4)
        roots[name] = root

    half_a, segs = _half_wal(tmp_path, small_wal, "a")
    half_b, _ = _half_wal(tmp_path, small_wal, "b")
    group_root = str(tmp_path / "group")

    # round 1: both members advance to the half-replayed state together
    streams_half = {
        "a": StreamSpec(lake_root=roots["a"], wal_dir=half_a),
        "b": StreamSpec(lake_root=roots["b"], wal_dir=half_b),
    }
    replay_group(streams_half, group_root)
    snap1 = group_snapshot(group_root)
    half_oracle = replay_oracle(small_wal["base"], segs[: len(segs) // 2])
    for name in ("a", "b"):
        got = read_group_table(group_root, name)
        assert got.count() == half_oracle.num_rows

    # member A races ahead OUTSIDE the group (full WAL) — a crash between
    # member commits and group publish looks exactly like this
    replay(roots["a"], small_wal["wal_dir"])
    full_oracle = replay_oracle(small_wal["base"], small_wal["segments"])
    assert read_table_arrow(roots["a"]).equals(full_oracle)  # head moved on
    # ...but the GROUP still serves the consistent half-state pair
    snap_after_race = group_snapshot(group_root)
    assert snap_after_race.members == snap1.members
    assert read_group_table(group_root, "a").count() == half_oracle.num_rows

    # round 2 (the re-run after the 'crash'): A's replay no-ops, B catches
    # up, and the pointer advances to a consistent full-state pair
    streams_full = {
        "a": StreamSpec(lake_root=roots["a"], wal_dir=small_wal["wal_dir"]),
        "b": StreamSpec(lake_root=roots["b"], wal_dir=small_wal["wal_dir"]),
    }
    stats = replay_group(streams_full, group_root)
    assert stats["a"].events_applied == 0  # exactly-once no-op
    snap2 = group_snapshot(group_root)
    assert snap2.gtxid != snap1.gtxid
    for name in ("a", "b"):
        got = read_group_table(group_root, name).to_pandas()
        assert len(got) == full_oracle.num_rows

    # history: the round-1 snapshot stays consistently readable (time
    # travel composes across the group)
    old = group_snapshot(group_root, gtxid=snap1.gtxid)
    assert old.members == snap1.members
    from etl_ray.pipelines.replay import read_table

    a_old = read_table(
        old.members["a"]["lake_root"], at_txid=old.members["a"]["txid"]
    )
    assert a_old.count() == half_oracle.num_rows

    # idempotent re-publish: heads unchanged
    replay_group(streams_full, group_root)
    snap3 = group_snapshot(group_root)
    assert snap3.members == snap2.members

    with pytest.raises(FileNotFoundError):
        group_snapshot(group_root, gtxid="gtx999999")


def test_vacuum_keep_txids_protects_group_snapshots(ray_session, small_wal, tmp_path):
    """vacuum(keep_txids=[group member txid]) preserves the group's
    historical snapshot files; a plain vacuum would reclaim them."""
    from etl_ray.pipelines.maintenance import vacuum
    from etl_ray.pipelines.replay import bootstrap_lake, read_table, replay
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=4)
    half, segs = _half_wal(tmp_path, small_wal, "v")
    replay(root, half)
    tx_group = LakeTable(root).read_manifest()["txid"]  # the 'group member'
    replay(root, small_wal["wal_dir"])

    vacuum(root, keep_txids=[tx_group])
    half_oracle = replay_oracle(small_wal["base"], segs[: len(segs) // 2])
    assert read_table(root, at_txid=tx_group).count() == half_oracle.num_rows

    # without protection the snapshot's files are reclaimed
    vacuum(root)
    import pytest as _pytest

    with _pytest.raises(Exception):
        read_table(root, at_txid=tx_group).count()
