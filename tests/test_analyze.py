"""ANALYZE TABLE: per-column statistics (rows/nulls/HLL NDV/min-max/
avg length) computed in one distributed pass over the live state and
published into the manifest (pipelines/maintenance.analyze)."""

import json

import pyarrow.compute as pc
import pytest


def _lake(small_wal, tmp_path):
    from etl_ray.pipelines.replay import bootstrap_lake, replay

    lake = str(tmp_path / "lake" / "pages")
    bootstrap_lake(lake, small_wal["base"], num_partitions=8)
    replay(lake, small_wal["wal_dir"])
    return lake


def test_analyze_publishes_accurate_stats(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import analyze, table_stats
    from etl_ray.pipelines.replay import read_table_arrow

    lake = _lake(small_wal, tmp_path)
    live = read_table_arrow(lake)
    stats = analyze(lake)

    assert stats["rows"] == live.num_rows
    assert set(stats["columns"]) == set(live.column_names)

    # url is the unique upsert key: NDV estimate within HLL error of
    # exact, capped at the non-null population
    exact = pc.count_distinct(live.column("url")).as_py()
    ndv = stats["columns"]["url"]["ndv"]
    assert abs(ndv - exact) <= max(3, 0.05 * exact)
    assert stats["columns"]["url"]["nulls"] == 0
    assert stats["columns"]["url"]["min"] == pc.min(live.column("url")).as_py()
    assert stats["columns"]["url"]["max"] == pc.max(live.column("url")).as_py()
    assert stats["columns"]["url"]["avg_len"] > 0

    # lang: tiny vocabulary, exact small-range HLL; null fraction matches
    lang = live.column("lang")
    assert stats["columns"]["lang"]["ndv"] == pc.count_distinct(lang).as_py()
    assert stats["columns"]["lang"]["nulls"] == lang.null_count
    # timestamps survive the JSON roundtrip as strings
    assert isinstance(stats["columns"]["warc_ts"]["min"], str)
    json.dumps(stats)  # manifest-storable end to end

    # reader returns the committed record; freshness stamp matches
    got = table_stats(lake)
    assert got["columns"] == stats["columns"]
    assert got["as_of_txid"] < got["analyzed_txid"]


def test_analyze_subset_staleness_and_errors(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import analyze, delete_where, table_stats
    from etl_ray.state.manifest import LakeTable

    lake = _lake(small_wal, tmp_path)
    assert table_stats(lake) is None  # never analyzed

    stats = analyze(lake, ["url", "lang"])
    assert set(stats["columns"]) == {"url", "lang"}

    with pytest.raises(ValueError, match="not in schema"):
        analyze(lake, ["nope"])

    # a later write makes the record stale but keeps it readable
    delete_where(lake, "url", "prefix", table_stats(lake)["columns"]["url"]["min"][:12])
    m = LakeTable(lake).read_manifest()
    assert table_stats(lake)["as_of_txid"] != m["txid"]


def test_cli_analyze(ray_session, small_wal, tmp_path, capsys):
    from tests.test_cli import _run

    lake = _lake(small_wal, tmp_path)
    rec = _run(capsys, "analyze", "--lake", lake, "--column", "url",
               "--column", "html")
    assert set(rec["columns"]) == {"url", "html"}
    assert rec["columns"]["html"]["avg_len"] > 0
