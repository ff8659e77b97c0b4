"""Metadata-only column drop (drop_column): no file rewrite, reads
exclude the dead bytes, replay ignores WAL payloads still carrying the
column, time travel serves pre-drop snapshots, rewrites remove the
bytes physically, and retired names can never be reborn."""

import json
import os

import pyarrow.parquet as pq
import pytest

from etl_ray.oracle import replay_oracle


def _dropped_oracle(small_wal, col, segments=None):
    t = replay_oracle(small_wal["base"], segments or small_wal["segments"])
    return t.drop_columns([col])


def _part_files(root):
    from etl_ray.state.manifest import LakeTable, partition_file_list

    m = LakeTable(root).read_manifest()
    return sorted(
        rel for p in m["partitions"].values() for rel in partition_file_list(p)
    )


def test_drop_is_metadata_only_and_reads_exclude(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import drop_column
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"])
    files_before = _part_files(root)

    lin = drop_column(root, "lang")
    assert lin["partitions_rewritten"] == 0  # metadata-only
    assert _part_files(root) == files_before  # no file rewrite

    got = read_table_arrow(root)
    assert "lang" not in got.column_names
    assert got.equals(_dropped_oracle(small_wal, "lang"))
    # the dead bytes are still physically present (proof the drop was lazy)
    raw = pq.read_schema(os.path.join(root, files_before[0]))
    assert "lang" in raw.names


def test_replay_after_drop_ignores_wal_payloads(ray_session, small_wal, tmp_path):
    """Upstream sources keep emitting a column after the target drops it;
    additive evolution must not resurrect the name."""
    from etl_ray.pipelines.maintenance import drop_column
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], segments=small_wal["segments"][:2])
    drop_column(root, "lang")
    replay(root, small_wal["wal_dir"])  # remaining segments still carry lang

    got = read_table_arrow(root)
    assert "lang" not in got.column_names
    assert got.equals(_dropped_oracle(small_wal, "lang"))
    assert "lang" not in LakeTable(root).schema().names


def test_drop_time_travel_serves_predrop_snapshot(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import drop_column
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay
    from etl_ray.pipelines.tags import create_tag
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], segments=small_wal["segments"][:2])
    pre_txid = LakeTable(root).read_manifest()["txid"]
    pre_state = read_table_arrow(root)
    create_tag(root, "pre-drop")

    drop_column(root, "lang")
    replay(root, small_wal["wal_dir"])

    old_view = read_table_arrow(root, at_txid=pre_txid)
    assert "lang" in old_view.column_names
    assert old_view.equals(pre_state)
    assert read_table_arrow(root, at_tag="pre-drop").equals(pre_state)


def test_rewrite_is_the_physical_removal_point(ray_session, small_wal, tmp_path):
    """repartition after a drop rewrites every file WITHOUT the dead
    column; zorder does the same per-file."""
    from etl_ray.pipelines.maintenance import drop_column, repartition, vacuum
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"])
    drop_column(root, "lang")
    expect = _dropped_oracle(small_wal, "lang")

    repartition(root, 4)
    vacuum(root)
    for rel in _part_files(root):
        assert "lang" not in pq.read_schema(os.path.join(root, rel)).names
    assert read_table_arrow(root).equals(expect)


def test_drop_delta_mode_and_fold(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import compact_deltas, drop_column, vacuum
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], segments=small_wal["segments"][:2])
    drop_column(root, "lang")
    replay(root, small_wal["wal_dir"], merge_mode="delta")
    expect = _dropped_oracle(small_wal, "lang")
    assert read_table_arrow(root).equals(expect)
    compact_deltas(root)
    vacuum(root)
    assert read_table_arrow(root).equals(expect)
    # the fold physically removed the dead column from the new bases
    for rel in _part_files(root):
        assert "lang" not in pq.read_schema(os.path.join(root, rel)).names


def test_drop_after_rename_and_name_retirement(ray_session, small_wal, tmp_path):
    """Chains compose: rename then drop excludes both era names; retired
    names (rename-chain members, dropped columns) can never be reused."""
    from etl_ray.pipelines.maintenance import drop_column, rename_column
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], segments=small_wal["segments"][:2])
    rename_column(root, "lang", "language")
    drop_column(root, "language")
    replay(root, small_wal["wal_dir"])

    got = read_table_arrow(root)
    assert "lang" not in got.column_names
    assert "language" not in got.column_names
    assert got.equals(_dropped_oracle(small_wal, "lang"))

    # retired names are refused as rename targets forever
    with pytest.raises(ValueError, match="retired"):
        rename_column(root, "text", "language")  # dropped name
    with pytest.raises(ValueError, match="retired"):
        rename_column(root, "text", "lang")  # historical chain name


def test_drop_refusals(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import drop_column
    from etl_ray.pipelines.replay import bootstrap_lake, replay

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], segments=small_wal["segments"][:1])

    with pytest.raises(ValueError, match="identity"):
        drop_column(root, "url")
    with pytest.raises(ValueError, match="identity"):
        drop_column(root, "warc_ts")
    with pytest.raises(ValueError, match="no column"):
        drop_column(root, "ghost")


def test_drop_blocks_stale_change_feed_requests(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.diff import table_changelog, table_delta
    from etl_ray.pipelines.maintenance import drop_column
    from etl_ray.pipelines.replay import bootstrap_lake, replay
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], segments=small_wal["segments"][:2])
    a = LakeTable(root).read_manifest()["txid"]
    drop_column(root, "lang")
    replay(root, small_wal["wal_dir"])
    b = LakeTable(root).read_manifest()["txid"]

    with pytest.raises(ValueError, match="dropped"):
        table_delta(root, a, b, value_cols=("lang",))
    with pytest.raises(ValueError, match="dropped"):
        table_changelog(root, a, b, image_cols=("lang",))
    # current-era columns still flow
    assert table_delta(root, a, b, value_cols=("text",)).count() >= 0


def test_drop_cli(ray_session, small_wal, tmp_path, capsys):
    from etl_ray.pipelines.cli import main
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"])
    assert main(["drop-column", "--lake", root, "--column", "lang"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["dropped"] == "lang"
    assert "lang" not in read_table_arrow(root).column_names
