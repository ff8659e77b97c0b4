"""Table clone (snapshot export): deep copy into a fresh lake carrying
the exactly-once ledger, evolution metadata, and constraints — replay
resumes on the clone exactly where the snapshot left off, and the two
lakes evolve independently (pipelines/maintenance.clone_table)."""

import os
import shutil

import pyarrow.parquet as pq
import pytest

from etl_ray.oracle import replay_oracle
from tests.test_replay import assert_tables_equal


def _replayed(small_wal, tmp_path, n_first=4):
    from etl_ray.pipelines.replay import bootstrap_lake, replay

    lake = str(tmp_path / "src" / "pages")
    bootstrap_lake(lake, small_wal["base"], num_partitions=8)
    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    segs = sorted(small_wal["segments"])
    for s in segs[:n_first]:
        shutil.copy(s, wal)
    replay(lake, wal)
    return lake, wal, segs


def test_clone_head_resumes_replay(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import (
        clone_table,
        fsck,
        list_constraints,
        set_constraint,
    )
    from etl_ray.pipelines.replay import read_table_arrow, replay

    lake, wal, segs = _replayed(small_wal, tmp_path)
    set_constraint(lake, "url_https", "url", "prefix", "https://")

    dst = str(tmp_path / "dst" / "pages")
    rec = clone_table(lake, dst)
    assert rec["cloned_from"] == lake and rec["files_copied"] > 0

    # identical state, independent files, clean audit, constraints carried
    assert_tables_equal(read_table_arrow(dst), read_table_arrow(lake))
    assert fsck(dst)["mismatches"] == []
    assert list_constraints(dst) == list_constraints(lake)

    # the ledger came along: redelivering the same WAL is a no-op
    assert replay(dst, wal).transactions == 0

    # resume: feed the remaining segments to the CLONE only
    for s in segs[4:]:
        shutil.copy(s, wal)
    replay(dst, wal)
    oracle_full = replay_oracle(small_wal["base"], segs)
    assert_tables_equal(read_table_arrow(dst), oracle_full)
    # source untouched by the clone's progress
    oracle_half = replay_oracle(small_wal["base"], segs[:4])
    assert_tables_equal(read_table_arrow(lake), oracle_half)


def test_clone_historical_snapshot(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import clone_table
    from etl_ray.pipelines.replay import (
        bootstrap_lake,
        read_table_arrow,
        replay,
    )
    from etl_ray.state.manifest import LakeTable

    lake = str(tmp_path / "src" / "pages")
    bootstrap_lake(lake, small_wal["base"], num_partitions=8)
    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    segs = sorted(small_wal["segments"])
    for s in segs[:3]:
        shutil.copy(s, wal)
    replay(lake, wal, max_segments_per_tx=2)  # >=2 txs
    mid_txid = LakeTable(lake).read_manifest()["lineage"][1]["txid"]
    for s in segs[3:]:
        shutil.copy(s, wal)
    replay(lake, wal)

    dst = str(tmp_path / "dst" / "pages")
    clone_table(lake, dst, at_txid=mid_txid)
    assert_tables_equal(
        read_table_arrow(dst), read_table_arrow(lake, at_txid=mid_txid)
    )
    # resume from the snapshot: replay the full WAL dir on the clone —
    # already-applied (pre-snapshot) segments skip, the rest apply
    replay(dst, wal)
    assert_tables_equal(
        read_table_arrow(dst), replay_oracle(small_wal["base"], segs)
    )


def test_clone_refuses_existing_destination(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import clone_table
    from etl_ray.state.manifest import CommitConflict

    lake, _, _ = _replayed(small_wal, tmp_path)
    dst = str(tmp_path / "dst" / "pages")
    clone_table(lake, dst)
    with pytest.raises(CommitConflict):
        clone_table(lake, dst)
    with pytest.raises(ValueError, match="not both"):
        clone_table(lake, str(tmp_path / "x"), at_txid="tx000001", at_ts=1)


def test_cli_clone(ray_session, small_wal, tmp_path, capsys):
    from tests.test_cli import _run

    from etl_ray.pipelines.replay import read_table_arrow

    lake, _, _ = _replayed(small_wal, tmp_path)
    dst = str(tmp_path / "cli_dst" / "pages")
    rec = _run(capsys, "clone", "--lake", lake, "--dest", dst)
    assert rec["files_copied"] > 0
    assert_tables_equal(read_table_arrow(dst), read_table_arrow(lake))


def _one_url_segment(wal_dir, name, lsn, url):
    import pyarrow as pa

    from etl_ray.gen import WAL_SCHEMA_V1, make_html

    tbl = pa.table(
        {
            "lsn": pa.array([lsn], pa.int64()),
            "op": pa.array(["update"], pa.string()),
            "url": pa.array([url], pa.string()),
            "warc_ts": pa.array([2_000_000_000_000_000 + lsn], pa.timestamp("us")),
            "html": pa.array([make_html(url, 9)], pa.binary()),
            "lang": pa.array(["en"], pa.string()),
        },
        schema=WAL_SCHEMA_V1,
    )
    pq.write_table(tbl, os.path.join(wal_dir, name))


def test_sync_clone_incremental_mirror(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import clone_table, sync_clone
    from etl_ray.pipelines.replay import read_table_arrow, replay
    from etl_ray.state.manifest import LakeTable

    lake, wal, segs = _replayed(small_wal, tmp_path, n_first=len(
        sorted(small_wal["segments"])))
    dst = str(tmp_path / "mirror" / "pages")
    clone_table(lake, dst)

    # source advances by ONE url -> exactly one partition changes
    url = read_table_arrow(lake)["url"][0].as_py()
    last = max(
        pq.read_table(s, columns=["lsn"])["lsn"].to_numpy().max() for s in segs
    )
    _one_url_segment(wal, "segment-one-00090.parquet", int(last) + 1, url)
    replay(lake, wal)

    rec = sync_clone(lake, dst)
    assert rec["partitions_updated"] == 1
    assert 0 < rec["files_copied"] <= 2
    assert_tables_equal(read_table_arrow(dst), read_table_arrow(lake))
    # mirror ledger carried: the one-url segment is already applied
    assert replay(dst, wal).transactions == 0
    # unchanged source -> no-op, no transaction
    seq = LakeTable(dst).read_manifest()["tx_seq"]
    assert sync_clone(lake, dst)["noop"] is True
    assert LakeTable(dst).read_manifest()["tx_seq"] == seq


def test_sync_clone_refuses_diverged_mirror(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import clone_table, sync_clone
    from etl_ray.pipelines.replay import read_table_arrow, replay

    lake, wal, segs = _replayed(small_wal, tmp_path)
    dst = str(tmp_path / "mirror" / "pages")
    clone_table(lake, dst)

    # the mirror commits locally -> diverged
    last = max(
        pq.read_table(s, columns=["lsn"])["lsn"].to_numpy().max() for s in segs
    )
    wal2 = str(tmp_path / "wal_local")
    os.makedirs(wal2)
    _one_url_segment(
        wal2, "segment-local-00091.parquet", int(last) + 50,
        "https://local.example.com/only-on-mirror",
    )
    replay(dst, wal2)

    with pytest.raises(ValueError, match="diverged|local commit"):
        sync_clone(lake, dst)
    # force overwrites back to the source head
    sync_clone(lake, dst, force=True)
    assert_tables_equal(read_table_arrow(dst), read_table_arrow(lake))


def test_clone_guards_snapshot_against_vacuum(ray_session, small_wal, tmp_path):
    """During the copy the source snapshot is pinned by a guard tag, so
    a concurrent writer+vacuum cannot reclaim the files mid-clone; the
    guard is gone afterwards (tagging is transient)."""
    from etl_ray.pipelines.maintenance import clone_table
    from etl_ray.pipelines.tags import list_tags

    lake, _, _ = _replayed(small_wal, tmp_path)
    clone_table(lake, str(tmp_path / "g" / "pages"))
    assert not any(t.startswith("__clone_") for t in list_tags(lake))
