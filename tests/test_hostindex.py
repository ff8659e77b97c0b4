"""Host->partition secondary index under CDC: delta refresh equals a
full rebuild, serving reads touch only the index's partitions, and the
served rows equal a full-scan filter."""

import pandas as pd


def test_host_index_refresh_equals_rebuild_and_prunes(
    ray_session, small_wal, tmp_path
):
    from etl_ray.pipelines.hostindex import (
        build_host_index, lookup_pids, read_hosts, read_index,
        refresh_host_index,
    )
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay
    from etl_ray.state.manifest import LakeTable

    import os
    import shutil

    root = str(tmp_path / "lake" / "pages")
    P = 16
    bootstrap_lake(root, small_wal["base"], num_partitions=P)

    segs = [s for s in small_wal["segments"] if "redelivered" not in s]
    wal_half = str(tmp_path / "wal_half")
    os.makedirs(wal_half)
    for s in segs[: len(segs) // 2]:
        shutil.copy(s, wal_half)
    replay(root, wal_half)

    idx_root = str(tmp_path / "host_idx")
    build_host_index(idx_root, root)

    # lake advances; index catches up from deltas only
    replay(root, small_wal["wal_dir"])
    refresh_host_index(idx_root, root)

    got = (
        read_index(idx_root)
        .to_pandas()
        .sort_values(["host", "pid"])
        .reset_index(drop=True)
    )

    # ground truth: full rebuild at head
    idx2_root = str(tmp_path / "host_idx_rebuild")
    build_host_index(idx2_root, root)
    exp = (
        read_index(idx2_root)
        .to_pandas()
        .sort_values(["host", "pid"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)

    # serving: pick the two smallest hosts; rows must equal a full-scan
    # filter and the read must touch fewer partitions than the ring
    full = read_table_arrow(root).to_pandas()
    full["host"] = full["url"].str.extract(r"^[a-z][a-z0-9+.-]*://([^/?#]+)")
    sizes = full.groupby("host").size().sort_values()
    hosts = list(sizes.index[:2])

    rows, pids_read = read_hosts(root, idx_root, hosts)
    assert pids_read == len(lookup_pids(idx_root, hosts))
    assert pids_read < P
    mine = rows.to_pandas().sort_values("url").reset_index(drop=True)
    want = (
        full[full["host"].isin(hosts)]
        .drop(columns=["host"])
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(mine[want.columns.tolist()], want)

    # noop refresh: same txid -> no rewrite
    meta = refresh_host_index(idx_root, root)
    assert meta.get("noop") is True
    assert meta["txid"] == LakeTable(root).read_manifest()["txid"]
