"""Process-level exactly-once: SIGKILL a CLI replay mid-run, restart it,
and the final lake equals the oracle with no double-apply.

Unlike the monkeypatch crash test (test_resume.py), this exercises the
real failure mode: a whole driver process dying between staging writes
and the manifest swap.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(args, **kw):
    env = dict(os.environ, PYTHONPATH=REPO, RAY_TMPDIR="/root/ray_tmp")
    return subprocess.Popen(
        [sys.executable, "-m", "etl_ray.pipelines.cli", *args],
        env=env,
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        **kw,
    )


@pytest.mark.slow
def test_sigkill_mid_replay_then_resume(tmp_path):
    from etl_ray.gen import WalSpec, generate_dataset
    from etl_ray.oracle import replay_oracle

    data = str(tmp_path / "data")
    spec = WalSpec(n_urls=500, n_events=4000, n_segments=8, seed=11)
    paths = generate_dataset(data, spec)
    lake = str(tmp_path / "lake" / "pages")

    p = _cli(["bootstrap", "--lake", lake, "--base", paths["base"], "--partitions", "8"])
    assert p.wait(timeout=240) == 0

    # replay per-segment transactions; SIGKILL the process after the first
    # commit lands (some segments applied, some not)
    p = _cli(["replay", "--lake", lake, "--wal", paths["wal_dir"], "--max-segments-per-tx", "1"])
    deadline = time.time() + 240
    killed = False
    while time.time() < deadline:
        try:
            m = json.load(open(os.path.join(lake, "MANIFEST.json")))
            if len(m["applied_segments"]) >= 3:  # __base__ + >=2 segments
                os.kill(p.pid, signal.SIGKILL)
                killed = True
                break
        except Exception:
            pass
        time.sleep(0.2)
    p.wait(timeout=30)
    assert killed, "replay finished before we could kill it; enlarge the WAL"

    # AUTHORITATIVE head, not the MANIFEST.json cache: SIGKILL can land
    # between the commit-log conditional put (commit N durable) and the
    # root-cache refresh, leaving the cache one commit behind — the
    # resume would then look like it applied one segment "twice".
    # read_manifest() adopts the log head (and repairs the cache).
    from etl_ray.state.manifest import LakeTable

    m_mid = LakeTable(lake).read_manifest()
    applied_mid = len(m_mid["applied_segments"])
    assert applied_mid < 1 + len(paths["segments"]), "nothing left to resume"

    # restart: must apply only the pending segments and converge
    p = _cli(["replay", "--lake", lake, "--wal", paths["wal_dir"]])
    out, _ = p.communicate(timeout=300)
    assert p.returncode == 0
    stats = json.loads(out.decode().strip().splitlines()[-1])
    assert stats["segments_applied"] == 1 + len(paths["segments"]) - applied_mid

    # final state == oracle (import-light comparison inside this process)
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import pyarrow as pa

    m = json.load(open(os.path.join(lake, "MANIFEST.json")))
    files = [os.path.join(lake, part["file"]) for part in m["partitions"].values()]
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    live = tbl.filter(pc.invert(tbl.column("_deleted"))).drop_columns(["_lsn", "_deleted"])
    live = live.take(pc.sort_indices(live, sort_keys=[("url", "ascending")]))
    oracle = replay_oracle(paths["base"], paths["segments"])
    assert live.equals(oracle)


@pytest.mark.slow
def test_sigkill_mid_delta_replay_then_resume(tmp_path):
    """Same driver-death drill in merge-on-read mode: the committed
    prefix of delta transactions survives, the restart applies only the
    pending segments (new deltas appended, nothing double-applied), and
    base ∪ chains LWW-reduce to the oracle."""
    from etl_ray.gen import WalSpec, generate_dataset
    from etl_ray.oracle import replay_oracle

    data = str(tmp_path / "data")
    spec = WalSpec(n_urls=500, n_events=4000, n_segments=8, seed=13)
    paths = generate_dataset(data, spec)
    lake = str(tmp_path / "lake" / "pages")

    p = _cli(["bootstrap", "--lake", lake, "--base", paths["base"], "--partitions", "8"])
    assert p.wait(timeout=240) == 0

    p = _cli(["replay", "--lake", lake, "--wal", paths["wal_dir"],
              "--max-segments-per-tx", "1", "--merge-mode", "delta"])
    deadline = time.time() + 240
    killed = False
    while time.time() < deadline:
        try:
            m = json.load(open(os.path.join(lake, "MANIFEST.json")))
            if len(m["applied_segments"]) >= 3:
                os.kill(p.pid, signal.SIGKILL)
                killed = True
                break
        except Exception:
            pass
        time.sleep(0.2)
    p.wait(timeout=30)
    assert killed, "replay finished before we could kill it; enlarge the WAL"

    # AUTHORITATIVE head, not the MANIFEST.json cache: SIGKILL can land
    # between the commit-log conditional put (commit N durable) and the
    # root-cache refresh, leaving the cache one commit behind — the
    # resume would then look like it applied one segment "twice".
    # read_manifest() adopts the log head (and repairs the cache).
    from etl_ray.state.manifest import LakeTable

    m_mid = LakeTable(lake).read_manifest()
    applied_mid = len(m_mid["applied_segments"])
    assert applied_mid < 1 + len(paths["segments"]), "nothing left to resume"

    p = _cli(["replay", "--lake", lake, "--wal", paths["wal_dir"],
              "--merge-mode", "delta"])
    out, _ = p.communicate(timeout=300)
    assert p.returncode == 0
    stats = json.loads(out.decode().strip().splitlines()[-1])
    assert stats["segments_applied"] == 1 + len(paths["segments"]) - applied_mid

    # base ∪ chains LWW-reduce to the oracle (no Ray needed)
    import pyarrow as pa
    import pyarrow.compute as pc

    from etl_ray.stages.merge import load_partition_state

    m = json.load(open(os.path.join(lake, "MANIFEST.json")))
    assert any(part.get("deltas") for part in m["partitions"].values())
    tables = [
        load_partition_state(lake, part) for part in m["partitions"].values()
    ]
    tbl = pa.concat_tables(tables, promote_options="default")
    live = tbl.filter(pc.invert(tbl.column("_deleted"))).drop_columns(["_lsn", "_deleted"])
    live = live.take(pc.sort_indices(live, sort_keys=[("url", "ascending")]))
    oracle = replay_oracle(paths["base"], paths["segments"])
    assert live.equals(oracle)
