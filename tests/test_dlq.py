"""Dead-letter queue: malformed change events are quarantined atomically
with the transaction that rejected them — never applied, never lost,
never duplicated under redelivery (stages/validate.py)."""

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from etl_ray.gen import WAL_SCHEMA_V0, make_html
from etl_ray.oracle import replay_oracle
from tests.test_replay import assert_tables_equal


def _dirty_segment(path: str, lsn0: int) -> tuple[pa.Table, pa.Table]:
    """A WAL segment mixing valid and malformed events.  Returns
    (full segment, valid-rows-only) tables."""
    ts = [1_700_000_000_000_000 + i for i in range(6)]
    urls = [
        "https://dlq.example.com/a",   # valid insert
        None,                          # null key
        "https://dlq.example.com/b",   # null ts
        "https://dlq.example.com/c",   # bad op
        "https://dlq.example.com/d",   # valid update
        None,                          # null key AND bad op -> null_key wins
    ]
    tbl = pa.table(
        {
            "lsn": pa.array([lsn0 + i for i in range(6)], pa.int64()),
            "op": pa.array(
                ["insert", "update", "insert", "frobnicate", "update", "merge"],
                pa.string(),
            ),
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                [ts[0], ts[1], None, ts[3], ts[4], ts[5]], pa.timestamp("us")
            ),
            "html": pa.array(
                [
                    make_html(u or "https://x.example.com/", 1)
                    for u in urls
                ],
                pa.binary(),
            ),
        },
        schema=WAL_SCHEMA_V0,
    )
    valid = tbl.take(pa.array([0, 4]))
    pq.write_table(tbl, path)
    return tbl, valid


@pytest.fixture()
def dirty_wal(small_wal, tmp_path):
    """small_wal plus one appended dirty segment; also a clean variant of
    that segment (valid rows only) for the oracle."""
    wal_dir = str(tmp_path / "wal")
    shutil.copytree(small_wal["wal_dir"], wal_dir)
    last_lsn = max(
        pq.read_table(s, columns=["lsn"])["lsn"].to_numpy().max()
        for s in small_wal["segments"]
    )
    dirty_path = os.path.join(wal_dir, "segment-dirty-00099.parquet")
    _, valid = _dirty_segment(dirty_path, int(last_lsn) + 1)
    clean_path = str(tmp_path / "clean-segment.parquet")
    pq.write_table(valid, clean_path)
    return {
        "base": small_wal["base"],
        "wal_dir": wal_dir,
        "segments": sorted(
            [s for s in small_wal["segments"]] + [dirty_path]
        ),
        "oracle_segments": sorted(
            [s for s in small_wal["segments"]] + [clean_path]
        ),
    }


def _replay_dirty(lake_root, dirty_wal, **kw):
    from etl_ray.pipelines.replay import bootstrap_lake, replay

    bootstrap_lake(lake_root, dirty_wal["base"], num_partitions=16)
    return replay(lake_root, dirty_wal["wal_dir"], **kw)


def test_event_reasons_classification():
    from etl_ray.stages.validate import event_reasons

    batch = pa.table(
        {
            "lsn": pa.array([1, 2, 3, 4], pa.int64()),
            "op": pa.array(["insert", "frobnicate", "delete", None], pa.string()),
            "url": pa.array(["u", "u", None, "u"], pa.string()),
            "warc_ts": pa.array([1, None, 1, 1], pa.timestamp("us")),
        }
    )
    reasons = event_reasons(batch, "url", "warc_ts")
    assert reasons.to_pylist() == [None, "null_ts", "null_key", "bad_op"]


def test_dlq_quarantines_and_state_matches_clean_oracle(
    ray_session, dirty_wal, tmp_path
):
    from etl_ray.pipelines.replay import read_dlq, read_table_arrow

    lake = str(tmp_path / "lake" / "pages")
    _replay_dirty(lake, dirty_wal)

    # final table state == oracle over ONLY the valid events
    oracle = replay_oracle(dirty_wal["base"], dirty_wal["oracle_segments"])
    assert_tables_equal(read_table_arrow(lake), oracle)

    # the 4 malformed rows are quarantined with first-match reasons
    dlq = read_dlq(lake)
    assert dlq.num_rows == 4
    got = dict(zip(dlq["lsn"].to_pylist(), dlq["reason"].to_pylist()))
    lsns = sorted(got)
    assert [got[k] for k in lsns] == ["null_key", "null_ts", "bad_op", "null_key"]

    # lineage records the quarantine count on the committing tx
    from etl_ray.state.manifest import LakeTable

    m = LakeTable(lake).read_manifest()
    assert sum(e["rows"] for e in m["dlq"]) == 4


def test_dlq_exactly_once_under_redelivery(ray_session, dirty_wal, tmp_path):
    from etl_ray.pipelines.replay import read_dlq, replay

    lake = str(tmp_path / "lake" / "pages")
    _replay_dirty(lake, dirty_wal)
    stats2 = replay(lake, dirty_wal["wal_dir"])  # full redelivery
    assert stats2.transactions == 0
    assert read_dlq(lake).num_rows == 4


def test_dlq_salted_and_delta_modes(ray_session, dirty_wal, tmp_path):
    from etl_ray.pipelines.replay import read_dlq, read_table_arrow

    oracle = replay_oracle(dirty_wal["base"], dirty_wal["oracle_segments"])

    lake_s = str(tmp_path / "lake_salted" / "pages")
    _replay_dirty(lake_s, dirty_wal, salting="on", salt=4)
    assert_tables_equal(read_table_arrow(lake_s), oracle)
    assert read_dlq(lake_s).num_rows == 4

    lake_d = str(tmp_path / "lake_delta" / "pages")
    _replay_dirty(lake_d, dirty_wal, merge_mode="delta", max_segments_per_tx=3)
    assert_tables_equal(read_table_arrow(lake_d), oracle)
    assert read_dlq(lake_d).num_rows == 4


def test_clean_wal_produces_no_dlq(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.replay import bootstrap_lake, read_dlq, replay
    from etl_ray.state.manifest import LakeTable

    lake = str(tmp_path / "lake" / "pages")
    bootstrap_lake(lake, small_wal["base"], num_partitions=16)
    replay(lake, small_wal["wal_dir"])
    assert read_dlq(lake).num_rows == 0
    assert "dlq" not in LakeTable(lake).read_manifest()
    assert not os.path.isdir(os.path.join(lake, "dlq"))


def test_dlq_cli_and_fsck(ray_session, dirty_wal, tmp_path, capsys):
    import json

    from etl_ray.pipelines.cli import main as cli_main
    from etl_ray.pipelines.maintenance import fsck

    lake = str(tmp_path / "lake" / "pages")
    _replay_dirty(lake, dirty_wal)

    assert cli_main(["dlq", "--lake", lake, "--limit", "2"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["dlq_rows"] == 4
    assert out["by_reason"] == {"null_key": 2, "null_ts": 1, "bad_op": 1}
    assert len(out["rows"]) == 2

    rep = fsck(lake)
    assert rep["mismatches"] == []

    # corrupt the quarantine: fsck must notice
    from etl_ray.state.manifest import LakeTable

    m = LakeTable(lake).read_manifest()
    os.remove(os.path.join(lake, m["dlq"][0]["file"]))
    rep2 = fsck(lake)
    assert any(p["what"] == "dlq_missing" for p in rep2["mismatches"])


def test_vacuum_reclaims_dlq_orphans_keeps_referenced(
    ray_session, dirty_wal, tmp_path
):
    from etl_ray.pipelines.maintenance import vacuum
    from etl_ray.pipelines.replay import read_dlq
    from etl_ray.state.manifest import LakeTable

    lake = str(tmp_path / "lake" / "pages")
    _replay_dirty(lake, dirty_wal)
    lk = LakeTable(lake)

    # plant an orphan from a "crashed" old tx and a file from an
    # in-flight future tx — vacuum must remove the first, keep the second
    orphan = os.path.join(lk.dlq_dir, "dlq-00003-tx000001.parquet")
    inflight = os.path.join(lk.dlq_dir, "dlq-00004-tx999999.parquet")
    ref = lk.dlq_files()[0]
    shutil.copyfile(ref, orphan)
    shutil.copyfile(ref, inflight)

    rep = vacuum(lake)
    assert rep["removed_dlq"] == 1
    assert not os.path.exists(orphan)
    assert os.path.exists(inflight)
    os.remove(inflight)
    assert read_dlq(lake).num_rows == 4  # committed quarantine intact
