"""Compaction + vacuum: tombstones dropped, state preserved, orphans GC'd."""

import os

import pyarrow.compute as pc

from etl_ray.oracle import replay_oracle


def test_compact_drops_tombstones_preserves_live(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import compact, vacuum
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"])
    before = read_table_arrow(root)

    # tombstones exist before compaction
    import pyarrow.parquet as pq

    lake = LakeTable(root)
    m = lake.read_manifest()
    n_tomb = 0
    for f in lake.data_files(m):
        t = pq.read_table(f, columns=["_deleted"])
        n_tomb += pc.sum(t.column("_deleted")).as_py() or 0
    assert n_tomb > 0

    lineage = compact(root)
    assert lineage["compaction"] is True
    assert lineage["tombstones_dropped"] == n_tomb

    after = read_table_arrow(root)
    assert after.equals(before)  # live rows untouched
    # and the oracle still matches
    assert after.equals(replay_oracle(small_wal["base"], small_wal["segments"]))

    # old part files are now orphans; vacuum removes them
    res = vacuum(root)
    assert res["removed_parts"] > 0
    # readers unaffected
    assert read_table_arrow(root).equals(before)


def test_vacuum_removes_crash_staging(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import vacuum
    from etl_ray.pipelines.replay import bootstrap_lake, replay

    root = str(tmp_path / "lake2" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"])
    # simulate crash leftovers
    os.makedirs(os.path.join(root, "staging", "tx_dead"), exist_ok=True)
    open(os.path.join(root, "staging", "tx_dead", "part-00000.parquet"), "wb").write(b"junk")
    res = vacuum(root)
    assert res["removed_staging_dirs"] >= 1
    assert not os.listdir(os.path.join(root, "staging"))
