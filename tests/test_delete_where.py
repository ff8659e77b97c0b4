"""Predicate delete (GDPR purge): matching payloads physically removed in
one manifest transaction, footer-statistics pruning skips untouched
partitions, and the purge tombstone keeps its original LWW order key so
a late WAL event older than the purged row cannot resurrect the data
(pipelines/maintenance.py delete_where)."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from etl_ray.gen import WAL_SCHEMA_V0, make_html


def _lake(small_wal, tmp_path, name, **replay_kw):
    from etl_ray.pipelines.replay import bootstrap_lake, replay

    root = str(tmp_path / name / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], **replay_kw)
    return root


def test_prefix_purge_matches_filter_oracle(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import delete_where
    from etl_ray.pipelines.replay import read_table_arrow

    root = _lake(small_wal, tmp_path, "lake_prefix")
    before = read_table_arrow(root)
    host = before.column("url")[0].as_py().split("/")[2]
    prefix = f"https://{host}/"
    match = pc.starts_with(before.column("url"), prefix)
    n_match = pc.sum(match).as_py()
    assert n_match > 0

    lin = delete_where(root, "url", "prefix", prefix)
    assert lin["rows_purged"] == n_match
    assert lin["delete_where"] == {"column": "url", "op": "prefix", "value": prefix}
    # hash partitioning spreads every host across partitions, but
    # key-sorted part files still let footer stats prove SOME partitions
    # can't contain this prefix
    assert lin["partitions_scanned"] + lin["partitions_pruned"] == 8

    after = read_table_arrow(root)
    assert after.equals(before.filter(pc.invert(match)))


def test_purged_payload_gone_from_storage(ray_session, small_wal, tmp_path):
    """The purge is physical in the rewritten files: no rewritten part
    file retains the payload bytes of a purged row (only the key + order
    columns survive in the tombstone until compaction)."""
    from etl_ray.pipelines.maintenance import delete_where
    from etl_ray.pipelines.replay import read_table_arrow
    from etl_ray.state.manifest import LakeTable

    root = _lake(small_wal, tmp_path, "lake_phys")
    before = read_table_arrow(root)
    url = before.column("url")[3].as_py()
    delete_where(root, "url", "eq", url)

    lake = LakeTable(root)
    m = lake.read_manifest()
    seen = 0
    for f in lake.data_files(m):
        t = pq.read_table(f, columns=["url", "html", "text", "_deleted"])
        hit = pc.equal(t.column("url"), url)
        n = pc.sum(hit).as_py() or 0
        if not n:
            continue
        seen += n
        row = t.filter(hit)
        assert pc.all(row.column("_deleted")).as_py() is True
        assert row.column("html").null_count == n
        assert row.column("text").null_count == n
    assert seen > 0


def test_no_match_is_metadata_only_noop(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import delete_where
    from etl_ray.state.manifest import LakeTable

    root = _lake(small_wal, tmp_path, "lake_noop")
    seq0 = LakeTable(root).read_manifest()["tx_seq"]
    assert delete_where(root, "url", "eq", "zzzz://no.such.url/") is None
    assert delete_where(root, "url", "prefix", "zzzz://") is None
    assert LakeTable(root).read_manifest()["tx_seq"] == seq0  # no tx minted


def test_purge_tombstone_blocks_older_event_allows_newer(
    ray_session, small_wal, tmp_path
):
    """A purged row keeps its original (warc_ts, _lsn) order key: a WAL
    event OLDER than the purged version loses LWW and cannot resurrect
    the payload; a genuinely NEWER event recreates the key."""
    from etl_ray.pipelines.maintenance import delete_where
    from etl_ray.pipelines.replay import read_table_arrow, replay
    from etl_ray.state.manifest import LakeTable

    root = _lake(small_wal, tmp_path, "lake_lww")
    # private WAL copy: this test appends synthetic segments, and the
    # session-scoped fixture directory must stay pristine for later tests
    import shutil

    wal_dir = str(tmp_path / "wal_copy")
    shutil.copytree(small_wal["wal_dir"], wal_dir)
    before = read_table_arrow(root)
    url = before.column("url")[7].as_py()
    ts0 = before.filter(pc.equal(before.column("url"), url)).column("warc_ts")[0]
    lsn_hi = max(
        hi for lo, hi in LakeTable(root).read_manifest()["applied_lsn_ranges"]
    )

    delete_where(root, "url", "eq", url)

    def seg(path, lsn, ts_us, version=5):
        tbl = pa.table(
            {
                "lsn": pa.array([lsn], pa.int64()),
                "op": pa.array(["update"], pa.string()),
                "url": pa.array([url], pa.string()),
                "warc_ts": pa.array([ts_us], pa.timestamp("us")),
                "html": pa.array([make_html(url, version)], pa.binary()),
            },
            schema=WAL_SCHEMA_V0,
        )
        pq.write_table(tbl, path)

    # late redelivery: new LSN but ts strictly older than the purged row
    old_us = ts0.cast(pa.int64()).as_py() - 1_000_000
    seg(os.path.join(wal_dir, "segment-late-00090.parquet"), lsn_hi + 1, old_us)
    replay(root, wal_dir)
    t = read_table_arrow(root)
    assert pc.sum(pc.equal(t.column("url"), url)).as_py() == 0  # stays purged

    # genuinely newer event: the key comes back with fresh content
    new_us = ts0.cast(pa.int64()).as_py() + 5_000_000
    seg(os.path.join(wal_dir, "segment-new-00091.parquet"), lsn_hi + 2, new_us, 9)
    replay(root, wal_dir)
    t = read_table_arrow(root)
    row = t.filter(pc.equal(t.column("url"), url))
    assert row.num_rows == 1
    assert row.column("html")[0].as_py() == make_html(url, 9)


def test_purge_on_delta_lake_folds_chain(ray_session, small_wal, tmp_path):
    """delete_where over a merge-on-read lake: the rewrite folds each
    partition's delta chain, and the result equals the rewrite-mode lake
    purged with the same predicate."""
    from etl_ray.pipelines.maintenance import delete_where
    from etl_ray.pipelines.replay import read_table_arrow

    root_d = _lake(
        small_wal, tmp_path, "lake_delta",
        merge_mode="delta", max_segments_per_tx=2,
    )
    root_r = _lake(small_wal, tmp_path, "lake_rw")
    host = read_table_arrow(root_r).column("url")[0].as_py().split("/")[2]
    prefix = f"https://{host}/"
    delete_where(root_d, "url", "prefix", prefix)
    delete_where(root_r, "url", "prefix", prefix)
    assert read_table_arrow(root_d).equals(read_table_arrow(root_r))


def test_time_travel_then_compact_then_vacuum_forgets(
    ray_session, small_wal, tmp_path
):
    """Full-forget sequence: snapshots still serve pre-purge data until
    compaction GCs the tombstone and vacuum reclaims superseded files."""
    from etl_ray.pipelines.maintenance import compact, delete_where, vacuum
    from etl_ray.pipelines.replay import read_table_arrow
    from etl_ray.state.manifest import LakeTable

    root = _lake(small_wal, tmp_path, "lake_forget")
    before = read_table_arrow(root)
    pre_txid = LakeTable(root).read_manifest()["lineage"][-1]["txid"]
    url = before.column("url")[11].as_py()

    delete_where(root, "url", "eq", url)
    # time travel still serves the pre-purge row (until vacuum)
    t_old = read_table_arrow(root, at_txid=pre_txid)
    assert pc.sum(pc.equal(t_old.column("url"), url)).as_py() == 1

    lin = compact(root, assume_caught_up=True)
    assert lin["tombstones_dropped"] >= 1
    vacuum(root)
    # the key no longer appears in ANY referenced part file
    lake = LakeTable(root)
    for f in lake.data_files(lake.read_manifest()):
        t = pq.read_table(f, columns=["url"])
        assert pc.sum(pc.equal(t.column("url"), url)).as_py() in (0, None)


def test_predicate_validation(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import delete_where

    root = _lake(small_wal, tmp_path, "lake_val")
    with pytest.raises(ValueError, match="op must be one of"):
        delete_where(root, "url", "like", "x%")
    with pytest.raises(ValueError, match="not in table schema"):
        delete_where(root, "nope", "eq", "x")
    with pytest.raises(ValueError, match="internal column"):
        delete_where(root, "_lsn", "eq", 1)


def test_timestamp_range_and_in_predicates(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import delete_where
    from etl_ray.pipelines.replay import read_table_arrow

    root = _lake(small_wal, tmp_path, "lake_ts")
    before = read_table_arrow(root)
    cutoff = pc.quantile(before.column("warc_ts").cast(pa.int64()), 0.25)[0].as_py()
    cutoff_ts = pa.scalar(int(cutoff), pa.timestamp("us")).as_py()
    match = pc.less(before.column("warc_ts"), cutoff_ts)
    lin = delete_where(root, "warc_ts", "lt", cutoff_ts)
    assert lin["rows_purged"] == pc.sum(match).as_py()
    assert lin["delete_where"]["value"] == str(cutoff_ts)  # JSON-safe lineage
    after = read_table_arrow(root)
    assert after.equals(before.filter(pc.invert(match)))

    urls = [after.column("url")[i].as_py() for i in (0, 5, 9)]
    lin = delete_where(root, "url", "in", urls)
    assert lin["rows_purged"] == 3
    t = read_table_arrow(root)
    assert pc.sum(pc.is_in(t.column("url"), value_set=pa.array(urls))).as_py() == 0
