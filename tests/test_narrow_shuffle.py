"""Narrow-shuffle replay (winner-only payload exchange) == wide path ==
oracle.

The two-pass mode (replay._use_narrow) first LWW-reduces over a
(lsn, op, key, ts) projection, then re-scans the WAL with a winner-LSN
filter so only O(winners) wide rows pay the merge exchange — the
scale-out answer to 'shuffle volume ~ corpus' at 10^10 events.  These
tests force ETLRAY_NARROW=1 so the path is pinned regardless of the
auto threshold.
"""

import pyarrow.parquet as pq
import pytest

from etl_ray.oracle import replay_oracle
from tests.test_replay import assert_tables_equal


@pytest.fixture()
def narrow_env(monkeypatch):
    monkeypatch.setenv("ETLRAY_NARROW", "1")


def test_narrow_matches_oracle_and_wide(
    ray_session, small_wal, tmp_path, narrow_env, monkeypatch
):
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay
    from etl_ray.state.manifest import LakeTable

    root_n = str(tmp_path / "lake_n" / "pages")
    bootstrap_lake(root_n, small_wal["base"], num_partitions=16)
    stats = replay(root_n, small_wal["wal_dir"])
    assert stats.transactions == 1
    lin = LakeTable(root_n).read_manifest()["lineage"][-1]
    assert lin["narrow"] is True

    oracle = replay_oracle(small_wal["base"], small_wal["segments"])
    narrow_tbl = read_table_arrow(root_n)
    assert_tables_equal(narrow_tbl, oracle)

    monkeypatch.setenv("ETLRAY_NARROW", "0")
    root_w = str(tmp_path / "lake_w" / "pages")
    bootstrap_lake(root_w, small_wal["base"], num_partitions=16)
    replay(root_w, small_wal["wal_dir"])
    assert_tables_equal(read_table_arrow(root_w), narrow_tbl)


def test_narrow_incremental_salted_and_redelivery(
    ray_session, small_wal, tmp_path, narrow_env
):
    """Per-segment txs + forced salting + a re-replay of the whole WAL
    (event-level exactly-once) under the narrow exchange."""
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    root = str(tmp_path / "lake_inc" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    stats = replay(root, small_wal["wal_dir"], max_segments_per_tx=2, salting="on")
    assert stats.transactions >= 3
    oracle = replay_oracle(small_wal["base"], small_wal["segments"])
    assert_tables_equal(read_table_arrow(root), oracle)

    again = replay(root, small_wal["wal_dir"])
    assert again.transactions == 0


def test_narrow_duplicate_lsn_copy_in_one_chunk(
    ray_session, small_wal, tmp_path, narrow_env
):
    """A redelivered COPY of a segment published under a new name inside
    the same pending chunk: the winner-LSN filter fetches both copies;
    the merge entry compaction dedups them.  Final state == oracle over
    the originals."""
    import shutil

    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    wal_dir = str(tmp_path / "wal_dup")
    shutil.copytree(small_wal["wal_dir"], wal_dir)
    seg0 = sorted(
        p for p in __import__("os").listdir(wal_dir) if p.endswith(".parquet")
    )[0]
    shutil.copy(
        f"{wal_dir}/{seg0}", f"{wal_dir}/zz-redelivered-copy.parquet"
    )

    root = str(tmp_path / "lake_dup" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, wal_dir)
    oracle = replay_oracle(small_wal["base"], small_wal["segments"])
    assert_tables_equal(read_table_arrow(root), oracle)


def test_narrow_dlq_and_delta_mode(ray_session, tmp_path, narrow_env, small_wal):
    """Malformed rows quarantine identically under the narrow exchange,
    in both rewrite and merge-on-read delta modes."""
    from tests.test_dlq import _dirty_segment

    from etl_ray.pipelines.replay import (
        bootstrap_lake,
        read_dlq,
        read_table_arrow,
        replay,
    )

    import os

    last_lsn = max(
        pq.read_table(s, columns=["lsn"])["lsn"].to_numpy().max()
        for s in small_wal["segments"]
    )
    for mode in ("rewrite", "delta"):
        wal_dir = str(tmp_path / f"wal_{mode}")
        os.makedirs(wal_dir)
        _, valid = _dirty_segment(
            os.path.join(wal_dir, "segment-dirty-00000.parquet"),
            int(last_lsn) + 1,
        )
        clean = str(tmp_path / f"clean_{mode}.parquet")
        pq.write_table(valid, clean)

        root = str(tmp_path / f"lake_{mode}" / "pages")
        bootstrap_lake(root, small_wal["base"], num_partitions=8)
        replay(root, wal_dir, merge_mode=mode)
        oracle = replay_oracle(small_wal["base"], [clean])
        assert_tables_equal(read_table_arrow(root), oracle)
        dlq = read_dlq(root)
        assert dlq.num_rows == 4
        assert sorted(set(dlq["reason"].to_pylist())) == [
            "bad_op", "null_key", "null_ts",
        ]
