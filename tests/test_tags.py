"""Named snapshot tags: pin / read-at-tag / vacuum protection /
CAS races / CLI verb."""

import json
import os

import pytest


def _build_lake(small_wal, tmp_path, n_segments_first=2):
    """Lake with a PARTIAL replay committed (first two WAL segments
    only) — a genuine historical state to pin, with pending segments
    left for later commits."""
    from etl_ray.pipelines.replay import bootstrap_lake, replay
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"],
           segments=small_wal["segments"][:n_segments_first])
    mid_txid = LakeTable(root).read_manifest()["txid"]
    return root, mid_txid


def test_tag_read_and_time_travel(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.replay import read_table_arrow, replay
    from etl_ray.pipelines.tags import create_tag, list_tags, resolve_tag

    root, mid = _build_lake(small_wal, tmp_path)
    snapshot = read_table_arrow(root)

    tags = create_tag(root, "v1")  # default: current head
    assert tags == {"v1": mid}
    assert resolve_tag(root, "v1") == mid

    # advance the lake past the tag
    replay(root, small_wal["wal_dir"])
    head = read_table_arrow(root)
    assert not head.equals(snapshot)

    # read-at-tag == the pinned historical state, via BOTH readers
    assert read_table_arrow(root, at_tag="v1").equals(snapshot)
    from etl_ray.pipelines.replay import read_table

    streamed = read_table(root, at_tag="v1")
    assert streamed.count() == snapshot.num_rows

    assert list_tags(root) == {"v1": mid}


def test_tag_protects_snapshot_from_vacuum(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import compact, vacuum
    from etl_ray.pipelines.replay import read_table_arrow, replay
    from etl_ray.pipelines.tags import create_tag, delete_tag

    root, mid = _build_lake(small_wal, tmp_path)
    snapshot = read_table_arrow(root)
    create_tag(root, "pinned")

    replay(root, small_wal["wal_dir"])
    compact(root, assume_caught_up=True)  # rewrites parts -> old ones orphan
    vacuum(root)

    # tagged snapshot survives the GC wholesale
    assert read_table_arrow(root, at_tag="pinned").equals(snapshot)

    # dropping the tag releases the files to the NEXT vacuum
    delete_tag(root, "pinned")
    res = vacuum(root)
    assert res["removed_parts"] > 0
    with pytest.raises(FileNotFoundError):
        read_table_arrow(root, at_txid=mid)


def test_tag_name_semantics(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.replay import replay
    from etl_ray.pipelines.tags import create_tag, delete_tag, resolve_tag
    from etl_ray.state.manifest import LakeTable

    root, mid = _build_lake(small_wal, tmp_path)
    create_tag(root, "rel")
    # same (name, txid) re-pin is idempotent, not an error
    create_tag(root, "rel")
    replay(root, small_wal["wal_dir"])
    head = LakeTable(root).read_manifest()["txid"]

    # moving without replace= is refused
    with pytest.raises(ValueError, match="already pins"):
        create_tag(root, "rel")
    create_tag(root, "rel", replace=True)
    assert resolve_tag(root, "rel") == head

    # unknown txid refused before publish; unknown delete raises
    with pytest.raises(FileNotFoundError):
        create_tag(root, "bad", txid="tx999999")
    with pytest.raises(KeyError):
        delete_tag(root, "ghost")
    with pytest.raises(ValueError, match="at most one"):
        from etl_ray.pipelines.replay import read_table_arrow

        read_table_arrow(root, at_txid=head, at_tag="rel")


def test_tag_cas_loser_retries_no_lost_update(ray_session, small_wal, tmp_path):
    """Simulate losing the conditional put: pre-create the seq file the
    first attempt would claim; the publisher must reload and land on the
    next seq with BOTH tags present."""
    from etl_ray.pipelines.tags import _tags_root, create_tag, list_tags
    from etl_ray.state.fs import resolve

    root, mid = _build_lake(small_wal, tmp_path)
    f = resolve(None)
    cdir = os.path.join(_tags_root(root), "commits")
    f.makedirs(cdir)
    # a "concurrent" tagger already committed seq 1 with tag other=mid
    f.create_exclusive_json(
        os.path.join(cdir, f"{1:09d}.json"),
        {"seq": 1, "tags": {"other": mid}},
    )
    create_tag(root, "mine")
    assert list_tags(root) == {"other": mid, "mine": mid}


def test_tag_cli_roundtrip(ray_session, small_wal, tmp_path, capsys):
    from etl_ray.pipelines.cli import main
    from etl_ray.pipelines.replay import replay

    root, mid = _build_lake(small_wal, tmp_path)
    assert main(["tag", "--lake", root, "--create", "release-1"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["tags"] == {"release-1": mid}

    assert main(["tag", "--lake", root, "--list"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["tags"] == {"release-1": mid}

    assert main(["tag", "--lake", root, "--delete", "release-1"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["tags"] == {}
