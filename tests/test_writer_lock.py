"""Single-writer guard: concurrent replays are rejected, crashed
writers' stale locks are stolen, and replay still works end-to-end
under the lock."""

import os

import pytest

from etl_ray.state.manifest import WriterLockHeld, writer_lock


def test_lock_exclusive_and_released(tmp_path):
    root = str(tmp_path / "t")
    with writer_lock(root):
        assert os.path.exists(os.path.join(root, "WRITER.lock"))
        with pytest.raises(WriterLockHeld):
            with writer_lock(root):
                pass
    # released on exit — a new writer acquires freely
    with writer_lock(root):
        pass
    assert not os.path.exists(os.path.join(root, "WRITER.lock"))


def test_stale_lock_stolen(tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "WRITER.lock"), "w") as f:
        f.write("999999999")  # dead pid
    with writer_lock(root):  # steals without raising
        pass


def test_garbage_lock_stolen(tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "WRITER.lock"), "w") as f:
        f.write("not-a-pid")
    with writer_lock(root):
        pass


def test_replay_rejects_second_writer(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.replay import bootstrap_lake, replay

    lake = str(tmp_path / "lake" / "pages")
    bootstrap_lake(lake, small_wal["base"], num_partitions=8)
    with writer_lock(lake):  # simulate a concurrent writer holding it
        with pytest.raises(WriterLockHeld):
            replay(lake, small_wal["wal_dir"])
    stats = replay(lake, small_wal["wal_dir"])  # released -> proceeds
    assert stats.transactions == 1
