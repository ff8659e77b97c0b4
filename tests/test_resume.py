"""Crash-injection / resume: exactly-once under partial failure.

SURVEY.md §5 target item 3 and FIXTURES.md F5: staging files present
without a manifest commit must be invisible; restart resumes from the
committed ledger and reaches the oracle state with no double-apply.
"""

import json
import os

from etl_ray.oracle import replay_oracle


def test_crash_before_commit_leaves_state_intact(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines import replay as R
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake" / "pages")
    R.bootstrap_lake(root, small_wal["base"], num_partitions=8)
    lake = LakeTable(root)
    m_before = lake.read_manifest()

    # simulate a crash: run the distributed merge (staging written) but die
    # before commit — monkeypatch commit to raise
    orig_commit = LakeTable.commit
    try:
        def boom(self, *a, **k):
            raise RuntimeError("injected crash before manifest swap")

        LakeTable.commit = boom
        try:
            R.replay(root, small_wal["wal_dir"])
        except RuntimeError:
            pass
    finally:
        LakeTable.commit = orig_commit

    # committed state unchanged; orphaned staging files may exist but are
    # invisible to readers
    m_after = lake.read_manifest()
    assert m_after == m_before
    staged = []
    for d, _, fs in os.walk(os.path.join(root, "staging")):
        staged += [os.path.join(d, f) for f in fs]
    assert staged, "crash left orphan staging files (expected)"
    committed_files = set(lake.data_files(m_after))
    assert not (set(staged) & committed_files)

    # restart: full replay resumes from the ledger and matches the oracle
    stats = R.replay(root, small_wal["wal_dir"])
    assert stats.transactions == 1
    oracle = replay_oracle(small_wal["base"], small_wal["segments"])
    engine = R.read_table_arrow(root)
    assert engine.equals(oracle)


def test_resume_mid_stream_across_processes_shape(ray_session, small_wal, tmp_path):
    """Apply half the segments, 'restart' (new LakeTable object), apply rest."""
    from etl_ray.pipelines import replay as R
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake2" / "pages")
    R.bootstrap_lake(root, small_wal["base"], num_partitions=8)
    segs = small_wal["segments"]
    half = len(segs) // 2
    R.replay(root, small_wal["wal_dir"], segments=segs[:half])

    ckpt = LakeTable(root).read_manifest()
    assert len(ckpt["applied_segments"]) == half + 1  # + __base__

    # fresh handle = restarted process; replay over the FULL list
    stats = R.replay(root, small_wal["wal_dir"], segments=segs)
    assert stats.segments_applied == len(segs) - half  # only the pending ones
    oracle = replay_oracle(small_wal["base"], segs)
    assert R.read_table_arrow(root).equals(oracle)


def test_manifest_atomic_write_is_fsynced_rename(tmp_path):
    from etl_ray.state.manifest import LakeTable
    import pyarrow as pa

    root = str(tmp_path / "t")
    lake = LakeTable(root, 4)
    lake.init(pa.schema([("url", pa.string())]))
    # tmp file never left behind
    assert not os.path.exists(lake.manifest_path + ".tmp")
    m = lake.read_manifest()
    assert m["tx_seq"] == 0
    json.dumps(m)  # manifest is valid JSON round-trip
