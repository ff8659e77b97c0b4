"""Timestamp time travel: read_table(at_ts=...) resolves the last
transaction whose manifest committed_at stamp is <= the given instant
(state/manifest.resolve_txid_at_ts) — wall-clock addressing on top of
the same immutable per-tx snapshots at_txid serves."""

import datetime
import time

import pytest


def _build_two_commits(small_wal, tmp_path):
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], segments=small_wal["segments"][:2])
    mid_state = read_table_arrow(root)
    mid_txid = LakeTable(root).read_manifest()["txid"]
    t_between = int(time.time() * 1_000_000)
    # commit stamps are µs-resolution wall clock; make sure the next
    # commit lands strictly after t_between
    time.sleep(0.002)
    replay(root, small_wal["wal_dir"])
    return root, mid_txid, mid_state, t_between


def test_at_ts_resolves_between_commits(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.replay import read_table, read_table_arrow
    from etl_ray.state.manifest import resolve_txid_at_ts

    root, mid_txid, mid_state, t_between = _build_two_commits(small_wal, tmp_path)
    head = read_table_arrow(root)
    assert not head.equals(mid_state)

    assert resolve_txid_at_ts(root, t_between) == mid_txid
    assert read_table_arrow(root, at_ts=t_between).equals(mid_state)
    # far future -> head; datetime accepted
    future = datetime.datetime.now(datetime.timezone.utc) + datetime.timedelta(days=1)
    assert read_table_arrow(root, at_ts=future).equals(head)
    # streaming reader takes the same parameter
    assert read_table(root, at_ts=t_between).count() == mid_state.num_rows


def test_at_ts_before_first_commit_raises(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.replay import read_table_arrow

    root, _, _, _ = _build_two_commits(small_wal, tmp_path)
    with pytest.raises(ValueError, match="committed at or before"):
        read_table_arrow(root, at_ts=0)


def test_at_ts_mutually_exclusive_with_txid_and_tag(
    ray_session, small_wal, tmp_path
):
    from etl_ray.pipelines.replay import read_table_arrow

    root, mid_txid, _, t_between = _build_two_commits(small_wal, tmp_path)
    with pytest.raises(ValueError, match="at most one"):
        read_table_arrow(root, at_txid=mid_txid, at_ts=t_between)


def test_cli_get_at_ts(ray_session, small_wal, tmp_path, capsys):
    import json

    from etl_ray.pipelines.cli import main

    root, _, mid_state, t_between = _build_two_commits(small_wal, tmp_path)
    some_url = mid_state.column("url")[0].as_py()
    assert main(["get", "--lake", root, "--url", some_url,
                 "--at-ts", str(t_between)]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["rows"][0]["url"] == some_url


def test_change_feed_ts_endpoints(ray_session, small_wal, tmp_path):
    """table_diff/table_delta/table_changelog accept wall-clock endpoint
    addressing: ts form must equal the txid form exactly."""
    import time as _t

    from etl_ray.pipelines.diff import table_changelog, table_diff
    from etl_ray.pipelines.replay import bootstrap_lake, replay
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], segments=small_wal["segments"][:2])
    mid_txid = LakeTable(root).read_manifest()["txid"]
    t_mid = int(_t.time() * 1_000_000)
    _t.sleep(0.002)
    replay(root, small_wal["wal_dir"])
    head_txid = LakeTable(root).read_manifest()["txid"]
    t_head = int(_t.time() * 1_000_000)

    by_txid = table_diff(root, mid_txid, head_txid).to_pandas()
    by_ts = table_diff(root, from_ts=t_mid, to_ts=t_head).to_pandas()
    key = ["pid", "op", "url"]
    assert by_txid.sort_values(key).reset_index(drop=True).equals(
        by_ts.sort_values(key).reset_index(drop=True)
    )
    assert len(by_txid) > 0

    cl_tx = table_changelog(root, mid_txid, head_txid).to_pandas()
    cl_ts = table_changelog(root, from_ts=t_mid, to_ts=t_head).to_pandas()
    assert len(cl_tx) == len(cl_ts) > 0

    with pytest.raises(ValueError, match="not both"):
        table_diff(root, from_txid=mid_txid, from_ts=t_mid, to_txid=head_txid)
    with pytest.raises(ValueError, match="both endpoints"):
        table_diff(root, from_txid=mid_txid)


def test_get_rows_at_ts(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.replay import get_rows

    root, _, mid_state, t_between = _build_two_commits(small_wal, tmp_path)
    some_url = mid_state.column("url")[0].as_py()
    hit = get_rows(root, [some_url], at_ts=t_between)
    want = mid_state.filter(
        __import__("pyarrow.compute", fromlist=["equal"]).equal(
            mid_state.column("url"), some_url
        )
    )
    assert hit.column("url").to_pylist() == want.column("url").to_pylist()
    assert hit.column("warc_ts").to_pylist() == want.column("warc_ts").to_pylist()
