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
