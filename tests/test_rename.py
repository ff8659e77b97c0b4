"""Metadata-only column rename (rename_column): no file rewrite, reads
normalize through the chain, WAL payloads with source-era names keep
landing in the renamed column, time travel serves each era's names."""

import json
import os

import pyarrow.parquet as pq
import pytest

from etl_ray.oracle import replay_oracle


def _renamed_oracle(small_wal, old, new):
    t = replay_oracle(small_wal["base"], small_wal["segments"])
    return t.rename_columns([new if c == old else c for c in t.column_names])


def _part_files(root):
    from etl_ray.state.manifest import LakeTable, partition_file_list

    m = LakeTable(root).read_manifest()
    return sorted(
        rel for p in m["partitions"].values() for rel in partition_file_list(p)
    )


def test_rename_is_metadata_only_and_reads_normalize(
    ray_session, small_wal, tmp_path
):
    from etl_ray.pipelines.maintenance import rename_column
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"])
    before = read_table_arrow(root)
    files_before = _part_files(root)

    lin = rename_column(root, "lang", "language")
    assert lin["partitions_rewritten"] == 0  # metadata-only
    assert _part_files(root) == files_before  # no file rewrite

    after = read_table_arrow(root)
    assert "language" in after.column_names and "lang" not in after.column_names
    assert after.equals(
        before.rename_columns(
            ["language" if c == "lang" else c for c in before.column_names]
        )
    )
    # stored files still carry the OLD name (proof the rename was lazy)
    raw = pq.read_schema(os.path.join(root, files_before[0]))
    assert "lang" in raw.names


def test_replay_after_rename_maps_wal_payloads(ray_session, small_wal, tmp_path):
    """WAL segments still use the source-era name; after rename_column
    their payloads must land in the NEW column, not resurrect the old."""
    from etl_ray.pipelines.maintenance import rename_column
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], segments=small_wal["segments"][:2])
    rename_column(root, "lang", "language")
    replay(root, small_wal["wal_dir"])  # applies the remaining segments

    got = read_table_arrow(root)
    assert "lang" not in got.column_names
    assert got.equals(_renamed_oracle(small_wal, "lang", "language"))


def test_rename_html_keeps_text_extraction(ray_session, small_wal, tmp_path):
    """Renaming a derive-source column must not silently disable the
    byte-identical text extraction contract."""
    from etl_ray.pipelines.maintenance import rename_column
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], segments=small_wal["segments"][:2])
    rename_column(root, "html", "page_html")
    replay(root, small_wal["wal_dir"])

    got = read_table_arrow(root)
    assert got.equals(_renamed_oracle(small_wal, "html", "page_html"))
    # text really was extracted for post-rename winners
    assert got.column("text").null_count == 0


def test_rename_time_travel_serves_era_names(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import rename_column
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay
    from etl_ray.pipelines.tags import create_tag
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], segments=small_wal["segments"][:2])
    pre_txid = LakeTable(root).read_manifest()["txid"]
    pre_state = read_table_arrow(root)
    create_tag(root, "pre-rename")

    rename_column(root, "lang", "language")
    replay(root, small_wal["wal_dir"])

    # historical reads serve the OLD name
    old_view = read_table_arrow(root, at_txid=pre_txid)
    assert "lang" in old_view.column_names
    assert old_view.equals(pre_state)
    assert read_table_arrow(root, at_tag="pre-rename").equals(pre_state)


def test_rename_chain_and_get_rows(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import rename_column
    from etl_ray.pipelines.replay import (
        bootstrap_lake,
        get_rows,
        read_table_arrow,
        replay,
    )

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"])
    rename_column(root, "lang", "lang2")
    rename_column(root, "lang2", "language")  # two-step chain

    got = read_table_arrow(root)
    assert got.equals(_renamed_oracle(small_wal, "lang", "language"))

    url = got.column("url")[0].as_py()
    row = get_rows(root, [url])
    assert "language" in row.column_names and row.num_rows == 1


def test_rename_then_maintenance_roundtrip(ray_session, small_wal, tmp_path):
    """compact + zorder + export after a rename: state preserved under
    the new name, old-name files rewritten or normalized transparently."""
    from etl_ray.pipelines.maintenance import (
        compact,
        export_partitioned,
        rename_column,
        vacuum,
        zorder_rewrite,
    )
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"])
    rename_column(root, "lang", "language")
    expect = _renamed_oracle(small_wal, "lang", "language")

    compact(root, assume_caught_up=True)
    vacuum(root)
    assert read_table_arrow(root).equals(expect)

    zorder_rewrite(root, ["warc_ts", "language"])
    assert read_table_arrow(root).equals(expect)

    out = str(tmp_path / "export")
    res = export_partitioned(root, out)
    assert res["rows"] == expect.num_rows


def test_rename_delta_mode_and_fold(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import compact_deltas, rename_column
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], segments=small_wal["segments"][:2])
    rename_column(root, "lang", "language")
    replay(root, small_wal["wal_dir"], merge_mode="delta")
    expect = _renamed_oracle(small_wal, "lang", "language")
    assert read_table_arrow(root).equals(expect)
    compact_deltas(root)
    assert read_table_arrow(root).equals(expect)


def test_rename_refusals(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import rename_column
    from etl_ray.pipelines.replay import bootstrap_lake, replay

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], segments=small_wal["segments"][:1])

    with pytest.raises(ValueError, match="identity"):
        rename_column(root, "url", "link")
    with pytest.raises(ValueError, match="identity"):
        rename_column(root, "warc_ts", "ts")
    with pytest.raises(ValueError, match="no column"):
        rename_column(root, "ghost", "x")
    with pytest.raises(ValueError, match="already in use"):
        rename_column(root, "lang", "html")


def test_rename_cli(ray_session, small_wal, tmp_path, capsys):
    from etl_ray.pipelines.cli import main
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"])
    assert main(["rename-column", "--lake", root, "--from", "lang",
                 "--to", "language"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["renamed"] == {"from": "lang", "to": "language"}
    assert "language" in read_table_arrow(root).column_names
