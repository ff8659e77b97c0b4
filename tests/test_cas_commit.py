"""Object-store-atomic commit: the conditional-put (put-if-absent)
primitive and the commit protocols built on it.

The decisive step of every publish — lake transaction, group pointer,
view snapshot — is ``create_exclusive_json`` on the next sequenced
``commits/{seq:09d}.json`` record, which maps 1:1 onto S3/GCS native
conditional puts.  These tests drive two uncoordinated writers at each
protocol and assert: exactly one wins, the loser fails LOUDLY
(CommitConflict / FileExistsError), and the committed state is never a
torn mix of the two."""

import json
import os
import threading

import pyarrow as pa
import pytest

from etl_ray.state.fs import resolve
from etl_ray.state.manifest import CommitConflict, LakeTable

ADAPTERS = ["local-os", "pyarrow-local"]


@pytest.mark.parametrize("spec", ADAPTERS)
def test_conditional_put_exactly_one_winner(tmp_path, spec):
    """N threads race the put-if-absent on ONE path: exactly one wins
    and the object holds exactly that writer's payload (never a mix)."""
    fs = resolve(spec)
    path = str(tmp_path / "commits" / "000000001.json")
    fs.makedirs(str(tmp_path / "commits"))
    wins, losses = [], []
    barrier = threading.Barrier(8)

    def attempt(i):
        barrier.wait()
        try:
            fs.create_exclusive_json(path, {"writer": i})
            wins.append(i)
        except FileExistsError:
            losses.append(i)

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1 and len(losses) == 7
    assert fs.read_json(path) == {"writer": wins[0]}
    # no stray tmp files left behind by the losers
    assert fs.listdir(str(tmp_path / "commits")) == ["000000001.json"]


@pytest.mark.parametrize("spec", ADAPTERS)
def test_lake_commit_second_writer_loses_cleanly(tmp_path, spec):
    """Two writers read the SAME manifest (tx_seq N) and both try to
    commit N+1: the first wins, the second raises CommitConflict and
    publishes nothing — the table is the winner's state, not a merge."""
    root = str(tmp_path / "lake")
    lake = LakeTable(root, num_partitions=4, fs=spec)
    base = lake.init(pa.schema([("url", pa.string())]))

    lake.commit(base, "tx000001", [], ["seg-A"], (1, 10))
    with pytest.raises(CommitConflict):
        # second writer still holds the stale base manifest
        LakeTable(root, fs=spec).commit(base, "tx000001", [], ["seg-B"], (1, 10))

    m = lake.read_manifest()
    assert m["tx_seq"] == 1
    assert m["applied_segments"] == ["seg-A"]  # no torn/merged ledger


@pytest.mark.parametrize("spec", ADAPTERS)
def test_lake_init_race(tmp_path, spec):
    """Two initializers on one root: the second raises CommitConflict."""
    root = str(tmp_path / "lake")
    schema = pa.schema([("url", pa.string())])
    LakeTable(root, fs=spec).init(schema)
    with pytest.raises(CommitConflict):
        LakeTable(root, fs=spec).init(schema)


@pytest.mark.parametrize("spec", ADAPTERS)
def test_read_manifest_recovers_commit_head(tmp_path, spec):
    """Crash window: a writer won the conditional put but died before
    refreshing the MANIFEST.json cache.  The next read adopts the commit
    head and repairs the cache; a MISSING root still raises (the log
    supplements the root, it does not replace it)."""
    root = str(tmp_path / "lake")
    lake = LakeTable(root, num_partitions=4, fs=spec)
    base = lake.init(pa.schema([("url", pa.string())]))
    m1 = lake.commit(base, "tx000001", [], ["seg-A"], (1, 10))

    # simulate the crash: hand-publish seq 2 in the log only
    m2 = dict(m1)
    m2["tx_seq"] = 2
    m2["txid"] = "tx000002"
    m2["applied_segments"] = m1["applied_segments"] + ["seg-B"]
    lake.fs.create_exclusive_json(lake._commit_path(2), m2)

    got = LakeTable(root, fs=spec).read_manifest()
    assert got["txid"] == "tx000002"
    # cache was repaired in place
    assert lake.fs.read_json(lake.manifest_path)["txid"] == "tx000002"
    # missing root is still an error, not a silent log fallback
    lake.fs.remove(lake.manifest_path)
    with pytest.raises(FileNotFoundError):
        LakeTable(root, fs=spec).read_manifest()


def test_stale_writer_cannot_fork_history(tmp_path):
    """A writer stale by SEVERAL transactions must conflict on its own
    (long-since-taken) sequence number — the commit log blocks the fork
    even though the head has moved far past it."""
    root = str(tmp_path / "lake")
    lake = LakeTable(root, num_partitions=4, fs="local-os")
    base = lake.init(pa.schema([("url", pa.string())]))
    m = base
    for i in range(1, 4):
        m = lake.commit(m, f"tx{i:06d}", [], [f"seg-{i}"], (i, i))
    with pytest.raises(CommitConflict):
        lake.commit(base, "tx000001", [], ["seg-fork"], (99, 99))
    assert lake.read_manifest()["tx_seq"] == 3


def test_group_publish_race_mints_distinct_gtxids(tmp_path):
    """Two group publishers racing the pointer: both records survive
    with DISTINCT gtxids (the old read-modify-write could mint the same
    gtxid twice and silently drop one history entry)."""
    from etl_ray.pipelines.groups import _group_head

    fs = resolve("local-os")
    group_root = str(tmp_path / "group")
    cdir = os.path.join(group_root, "commits")
    fs.makedirs(cdir)

    results = []
    barrier = threading.Barrier(2)

    def publish(tag):
        barrier.wait()
        for _ in range(4):
            head = _group_head(fs, group_root)
            seq = (head[0] + 1) if head else 1
            rec = {"gtxid": f"gtx{seq:06d}", "members": {tag: {}},
                   "history": []}
            try:
                fs.create_exclusive_json(
                    os.path.join(cdir, f"{seq:09d}.json"), rec
                )
            except FileExistsError:
                continue
            results.append(rec["gtxid"])
            return

    threads = [threading.Thread(target=publish, args=(t,)) for t in "AB"]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(results) == ["gtx000001", "gtx000002"]


def test_view_refresh_conflicts_on_moved_base(tmp_path, ray_session):
    """An incremental view publish derived from a stale base must lose:
    its rows embed the old head's state, so silently swapping them in
    would corrupt the retraction algebra."""
    import ray

    from etl_ray.pipelines.views import _publish

    view_root = str(tmp_path / "view")
    rows = [{"host": "a", "n_pages": 1, "text_chars": 2, "bucket": 0}]
    ds = ray.data.from_items(rows)
    _publish(view_root, ds, "tx000005")  # unconditional (full build)
    # a refresher that computed its delta from tx000001 must conflict
    with pytest.raises(CommitConflict):
        _publish(view_root, ds, "tx000009", expect_base="tx000001")
    # and one based on the true head commits fine
    meta = _publish(view_root, ds, "tx000009", expect_base="tx000005")
    assert meta["txid"] == "tx000009" and meta["seq"] == 2


def test_vacuum_keeps_commit_tail(tmp_path):
    """vacuum prunes the commit log to a 64-deep tail — old records are
    reclaimed, the head and its guard window survive."""
    from etl_ray.pipelines.maintenance import vacuum

    root = str(tmp_path / "lake")
    lake = LakeTable(root, num_partitions=4, fs="local-os")
    m = lake.init(pa.schema([("url", pa.string())]))
    for i in range(1, 70):
        m = lake.commit(m, f"tx{i:06d}", [], [f"seg-{i}"], (i, i))
    res = vacuum(root)
    assert res["removed_commits"] == 70 - 64
    left = sorted(os.listdir(os.path.join(root, "commits")))
    assert len(left) == 64 and left[-1] == "000000069.json"
    assert lake.read_manifest()["tx_seq"] == 69
