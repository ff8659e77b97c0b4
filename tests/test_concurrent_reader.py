"""Snapshot isolation under concurrent write: while a separate PROCESS
replays the WAL one segment-transaction at a time, a reader polling the
public lookup path must only ever observe states that equal some
COMMITTED segment-prefix oracle — never a torn or partially-applied
view.  The guarantee under test is the manifest's atomic swap (readers
resolve immutable part files through one manifest read) plus part-file
immutability."""

import os
import subprocess
import sys
import time

import pandas as pd


def _fingerprint(df: pd.DataFrame) -> frozenset:
    return frozenset(
        zip(df["url"], df["warc_ts"].astype("int64"), df["text"])
    )


def test_reader_sees_only_committed_prefix_states(ray_session, small_wal, tmp_path):
    from etl_ray.oracle import replay_oracle
    from etl_ray.pipelines.replay import bootstrap_lake, get_rows

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)

    segs = [s for s in small_wal["segments"] if "redelivered" not in s]
    # oracle state after each committed prefix (0 segments = base only);
    # the redelivered segment duplicates an applied one, so states where
    # it lands in a prefix are identical to existing prefixes anyway
    all_segs = small_wal["segments"]
    prefixes = [replay_oracle(small_wal["base"], all_segs[:k]).to_pandas()
                for k in range(len(all_segs) + 1)]
    legal = {_fingerprint(p) for p in prefixes}

    base = pd.read_parquet(small_wal["base"])
    probe_urls = sorted(
        set(base["url"]) | {u for p in prefixes for u in p["url"]}
    )

    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "etl_ray.pipelines.cli", "replay",
            "--lake", root, "--wal", small_wal["wal_dir"],
            "--max-segments-per-tx", "1",
        ],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        env=env,
        cwd="/root/repo",
    )
    observed = set()
    try:
        while proc.poll() is None:
            snap = get_rows(root, probe_urls).to_pandas()
            fp = _fingerprint(snap)
            assert fp in legal, (
                f"reader observed a non-committed state ({len(snap)} rows)"
            )
            observed.add(len(snap))
            time.sleep(0.05)
    finally:
        proc.wait(timeout=300)
    assert proc.returncode == 0

    final = get_rows(root, probe_urls).to_pandas()
    assert _fingerprint(final) == _fingerprint(prefixes[-1])
    # the poll loop actually caught intermediate commits, not just the ends
    assert len(observed) >= 2, observed
