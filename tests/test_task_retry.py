"""Exactly-once under Ray TASK retries: a merge task that crashes once
(after writing a corrupt partial staging file) is retried by Ray,
overwrites the same deterministic staging path, and the committed result
is exact.

This is the property SURVEY.md §7 'hard parts' calls out: merge side
effects must be idempotent because Ray re-executes failed tasks.
"""

import os

import pyarrow as pa

from etl_ray.oracle import replay_oracle


def test_merge_task_retry_is_exactly_once(ray_session, small_wal, tmp_path, monkeypatch):
    import etl_ray.pipelines.replay as R
    from etl_ray.stages.merge import MergePartition

    marker_dir = str(tmp_path / "markers")
    os.makedirs(marker_dir)
    root = str(tmp_path / "lake" / "pages")
    R.bootstrap_lake(root, small_wal["base"], num_partitions=8)

    # defined INSIDE the test so cloudpickle ships it by value (workers
    # cannot import the test module)
    class FlakyMergePartition(MergePartition):
        def __init__(self, *args, **kwargs):
            super().__init__(*args, **kwargs)
            self.__name__ = "FlakyMergePartition"
            self.fail_pid = 3
            self.marker_dir = marker_dir

        def __call__(self, group: pa.Table) -> pa.Table:
            pid = int(group.column("pid")[0].as_py())
            marker = os.path.join(self.marker_dir, f"failed-{pid}")
            if pid == self.fail_pid and not os.path.exists(marker):
                open(marker, "w").close()
                # leave a corrupt partial staging file behind, then die
                path = os.path.join(
                    self.lake_root, "staging", self.txid, f"part-{pid:05d}.parquet"
                )
                os.makedirs(os.path.dirname(path), exist_ok=True)
                with open(path, "wb") as f:
                    f.write(b"PARTIAL GARBAGE")
                raise RuntimeError(f"injected task failure for pid {pid}")
            return super().__call__(group)

    orig = R.MergePartition
    monkeypatch.setattr(R, "MergePartition", FlakyMergePartition)
    stats = R.replay(root, small_wal["wal_dir"])
    monkeypatch.setattr(R, "MergePartition", orig)

    # the injected failure actually happened and was retried
    assert os.path.exists(os.path.join(marker_dir, "failed-3"))
    assert stats.transactions == 1

    oracle = replay_oracle(small_wal["base"], small_wal["segments"])
    engine = R.read_table_arrow(root)
    assert engine.equals(oracle)
