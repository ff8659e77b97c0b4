"""Compaction + vacuum: tombstones dropped, state preserved, orphans GC'd."""

import os

import pyarrow as pa
import pyarrow.compute as pc

from etl_ray.oracle import replay_oracle


def test_compact_drops_tombstones_preserves_live(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import compact, vacuum
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"])
    before = read_table_arrow(root)

    # tombstones exist before compaction
    import pyarrow.parquet as pq

    lake = LakeTable(root)
    m = lake.read_manifest()
    n_tomb = 0
    for f in lake.data_files(m):
        t = pq.read_table(f, columns=["_deleted"])
        n_tomb += pc.sum(t.column("_deleted")).as_py() or 0
    assert n_tomb > 0

    # default is conservative: drop nothing (the WAL may still be tailed)
    lineage = compact(root)
    assert lineage["tombstones_dropped"] == 0
    # caller asserts the WAL has ended -> gap-free prefix rule applies
    lineage = compact(root, assume_caught_up=True)
    assert lineage["compaction"] is True
    assert lineage["tombstones_dropped"] == n_tomb

    after = read_table_arrow(root)
    assert after.equals(before)  # live rows untouched
    # and the oracle still matches
    assert after.equals(replay_oracle(small_wal["base"], small_wal["segments"]))

    # old part files are now orphans; vacuum removes them
    res = vacuum(root)
    assert res["removed_parts"] > 0
    # readers unaffected
    assert read_table_arrow(root).equals(before)


def test_vacuum_removes_crash_staging_keeps_inflight(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import vacuum
    from etl_ray.pipelines.replay import bootstrap_lake, replay
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake2" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"])
    seq = LakeTable(root).read_manifest()["tx_seq"]
    staging = os.path.join(root, "staging")
    # crash leftover from a superseded transaction -> removed
    dead = os.path.join(staging, f"tx{seq:06d}")
    os.makedirs(dead, exist_ok=True)
    open(os.path.join(dead, "part-00000.parquet"), "wb").write(b"junk")
    # concurrently in-flight transaction (tx_seq + 1) -> must survive
    inflight = os.path.join(staging, f"tx{seq + 1:06d}")
    os.makedirs(inflight, exist_ok=True)
    open(os.path.join(inflight, "part-00000.parquet"), "wb").write(b"wip")
    res = vacuum(root)
    assert res["removed_staging_dirs"] == 1
    assert not os.path.exists(dead)
    assert os.path.exists(os.path.join(inflight, "part-00000.parquet"))


def test_compact_between_ordered_and_redelivered_segments(ray_session, small_wal, tmp_path):
    """Tombstone compaction must not let a redelivered (already-applied)
    segment resurrect deleted rows: the replay combiner drops events whose
    lsn is inside a committed range (event-level exactly-once)."""
    from etl_ray.pipelines.maintenance import compact
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    segs = small_wal["segments"]
    ordered = [s for s in segs if "redelivered" not in s]
    redelivered = [s for s in segs if "redelivered" in s]
    assert redelivered, "fixture must include a redelivered segment"

    root = str(tmp_path / "lake3" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], segments=ordered)
    # drops tombstones up to the contiguous applied prefix
    compact(root, assume_caught_up=True)
    replay(root, small_wal["wal_dir"], segments=redelivered)

    oracle = replay_oracle(small_wal["base"], small_wal["segments"])
    assert read_table_arrow(root).equals(oracle)


def test_compact_watermark_stops_at_gap(ray_session, small_wal, tmp_path):
    """Out-of-order segment application leaves a gap in the applied LSN
    ranges; even under ``assume_caught_up=True`` compaction must then drop
    NOTHING — the pending segment may carry late (old-warc_ts) events for
    deleted keys, and only the tombstones guard those under event-time
    LWW."""
    from etl_ray.pipelines.maintenance import compact, contiguous_applied_prefix
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay
    from etl_ray.state.manifest import LakeTable

    segs = [s for s in small_wal["segments"] if "redelivered" not in s]
    skipped, later = segs[2], segs[:2] + segs[3:]

    root = str(tmp_path / "lake4" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], segments=later)
    m = LakeTable(root).read_manifest()
    his = [hi for _, hi in m["applied_lsn_ranges"]]
    assert contiguous_applied_prefix(m) < max(his)  # gap detected
    lineage = compact(root, assume_caught_up=True)
    assert lineage["tombstones_dropped"] == 0  # gap -> drop nothing
    replay(root, small_wal["wal_dir"], segments=[skipped])

    oracle = replay_oracle(small_wal["base"], small_wal["segments"][:-1])
    assert read_table_arrow(root).equals(oracle)


def test_repartition_mid_stream_preserves_replay(ray_session, small_wal, tmp_path):
    """Replay half the WAL at P=8, repartition to P=5 mid-stream, replay
    the rest: final state must still equal the oracle (tombstones and
    exactly-once offsets survive the re-bucketing)."""
    import shutil

    from etl_ray.pipelines.maintenance import repartition
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    segs = small_wal["segments"]
    wal_a = str(tmp_path / "wal_a")
    os.makedirs(wal_a)
    for s in segs[:3]:
        shutil.copy(s, wal_a)
    replay(root, wal_a)

    before = read_table_arrow(root)
    lin = repartition(root, 5)
    assert lin["partitions_rewritten"] == 5 or lin["rows_total"] == before.num_rows
    m = LakeTable(root).read_manifest()
    assert m["num_partitions"] == 5
    assert len(m["partitions"]) == 5
    # visible state unchanged by the re-bucketing
    assert read_table_arrow(root).equals(before)

    replay(root, small_wal["wal_dir"])  # remaining segments at the new P
    oracle = replay_oracle(small_wal["base"], segs)
    got = read_table_arrow(root)
    assert got.num_rows == oracle.num_rows
    assert got.equals(oracle)


def test_repartition_is_a_time_travel_boundary(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import repartition
    from etl_ray.pipelines.replay import bootstrap_lake, read_table, read_table_arrow, replay
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"])
    tx_before = LakeTable(root).read_manifest()["txid"]
    before = read_table_arrow(root)
    repartition(root, 12)
    # pre-repartition snapshot still readable via time travel
    old = read_table(root, at_txid=tx_before)
    assert old.count() == before.num_rows
    assert read_table_arrow(root).equals(before)


def test_fsck_clean_and_detects_corruption(ray_session, small_wal, tmp_path):
    """fsck recomputes per-file live rows + checksums vs committed
    lineage: green on a healthy delta-mode lake (base AND chain files),
    red after silent on-disk corruption of one part file."""
    import json
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from etl_ray.pipelines.maintenance import fsck
    from etl_ray.pipelines.replay import bootstrap_lake, replay
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], max_segments_per_tx=2, merge_mode="delta")

    rep = fsck(root)
    assert rep["mismatches"] == []
    assert rep["files"] > rep["partitions"]  # chains audited too

    # historical snapshot audits green as well
    m = LakeTable(root).read_manifest()
    first_tx = m["lineage"][0]["txid"]
    assert fsck(root, at_txid=first_tx)["mismatches"] == []

    # silently drop one row from one base part file
    victim = next(
        os.path.join(root, meta["file"])
        for meta in m["partitions"].values()
        if meta.get("file")
    )
    tbl = pq.read_table(victim)
    pq.write_table(tbl.slice(1), victim)

    bad = fsck(root)
    assert len(bad["mismatches"]) == 1
    assert "rows" in bad["mismatches"][0]["what"]


def test_backfill_rederives_column_and_folds_chains(ray_session, small_wal, tmp_path):
    """backfill(column, fn) recomputes a derived column on the folded
    state: an extract_text re-run is a fixpoint (byte-identical), a
    changed 'extractor' rewrites every live row, chains fold in
    passing, LWW identity survives (fsck green, replay still no-op)."""
    import pyarrow.compute as pc

    from etl_ray.oracle import replay_oracle
    from etl_ray.pipelines.maintenance import backfill, fsck
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], max_segments_per_tx=2, merge_mode="delta")
    oracle = replay_oracle(small_wal["base"], small_wal["segments"])

    # 1. re-running the SAME extractor is a fixpoint
    def reextract(tbl):
        from etl_ray.extract import extract_text

        import pyarrow as pa

        return pa.array(
            [extract_text(h) for h in tbl.column("html").to_pylist()], pa.string()
        )

    lin = backfill(root, "text", reextract)
    assert lin["backfill"] == "text"
    assert read_table_arrow(root).equals(oracle)
    # chains folded by the rewrite
    from etl_ray.state.manifest import LakeTable

    m = LakeTable(root).read_manifest()
    assert all(not p.get("deltas") for p in m["partitions"].values())
    assert fsck(root)["mismatches"] == []

    # 2. a NEW extractor version changes the column everywhere
    def upper_text(tbl):
        return pc.utf8_upper(tbl.column("text"))

    backfill(root, "text", upper_text)
    got = read_table_arrow(root)
    exp_text = pc.utf8_upper(oracle.column("text"))
    assert got.column("text").combine_chunks().equals(
        exp_text.combine_chunks()
    )
    # identity columns untouched: everything but text still matches
    assert got.drop_columns(["text"]).equals(oracle.drop_columns(["text"]))
    assert fsck(root)["mismatches"] == []
    # ledger untouched: replay remains a no-op
    assert replay(root, small_wal["wal_dir"]).transactions == 0


def test_compact_bounded_lateness(ray_session, tmp_path):
    """lateness_us compaction drops only tombstones older than
    (max applied event time - lateness); a late event INSIDE the
    contract replays to the identical state whether or not the
    compaction ran first."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from etl_ray.gen import make_html
    from etl_ray.pipelines.maintenance import compact
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay
    from etl_ray.state.manifest import LakeTable

    T0 = 1_700_000_000_000_000

    def seg(path, rows):
        pq_.write_table(
            pa.table(
                {
                    "lsn": pa.array([r[0] for r in rows], pa.int64()),
                    "op": pa.array([r[1] for r in rows], pa.string()),
                    "url": pa.array([r[2] for r in rows], pa.string()),
                    "warc_ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
                    "html": pa.array(
                        [make_html(r[2], 1) if r[1] != "delete" else None for r in rows],
                        pa.binary(),
                    ),
                }
            ),
            path,
            )

    u_old = "https://l.example.com/old"   # deleted long ago -> GC-able
    u_new = "https://l.example.com/new"   # deleted recently -> must survive
    wal1 = tmp_path / "wal1"; wal1.mkdir()
    seg(str(wal1 / "seg-00000.parquet"), [
        (1, "insert", u_old, T0),
        (2, "insert", u_new, T0),
        (3, "delete", u_old, T0 + 1_000_000),        # old tombstone
        (4, "delete", u_new, T0 + 50_000_000),       # recent tombstone
        (5, "insert", "https://l.example.com/live", T0 + 60_000_000),
    ])

    def build(run_compact: bool):
        lake = str(tmp_path / f"lake_{run_compact}" / "pages")
        bootstrap_lake(lake, None, num_partitions=4)
        replay(lake, str(wal1))
        if run_compact:
            # watermark = (T0+60s) - 30s -> drops ONLY the old tombstone
            lin = compact(lake, lateness_us=30_000_000)
            assert lin["tombstones_dropped"] == 1
            assert lin["watermark_ts_us"] == T0 + 30_000_000
        # a LATE event inside the contract (ts >= watermark): tries to
        # resurrect u_new (ts below its tombstone -> must stay deleted)
        # and re-inserts u_old at a fresh ts (wins either way)
        wal2 = tmp_path / f"wal2_{run_compact}"; wal2.mkdir(exist_ok=True)
        seg(str(wal2 / "seg-00001.parquet"), [
            (6, "update", u_new, T0 + 40_000_000),   # loses to tombstone
            (7, "insert", u_old, T0 + 55_000_000),   # resurrects legitimately
        ])
        replay(lake, str(wal2))
        return read_table_arrow(lake).select(["url", "warc_ts"])

    with_gc = build(True)
    without_gc = build(False)
    assert with_gc.equals(without_gc)  # compaction changed nothing visible
    urls = with_gc["url"].to_pylist()
    assert u_old in urls and u_new not in urls


def test_zorder_rewrite_preserves_state_and_prunes(ray_session, small_wal, tmp_path):
    """Z-order clustering rewrite: live state is byte-identical, the
    pre-rewrite snapshot stays time-travelable, point lookups still
    work, and row-group min/max stats become SELECTIVE for a narrow
    time-range predicate (the clustering's whole point)."""
    import numpy as np
    import pyarrow.parquet as pq

    from etl_ray.pipelines.maintenance import zorder_rewrite
    from etl_ray.pipelines.replay import (
        bootstrap_lake, get_rows, read_table_arrow, replay,
    )
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=4)
    replay(root, small_wal["wal_dir"])
    before = read_table_arrow(root)
    tx_pre = LakeTable(root).read_manifest()["txid"]

    ts = before.column("warc_ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    lo, hi = np.quantile(ts, 0.45), np.quantile(ts, 0.55)
    import os as _os

    def band_overlap():
        m = LakeTable(root).read_manifest()
        total = overlapping = 0
        for meta in m["partitions"].values():
            f = pq.ParquetFile(_os.path.join(root, meta["file"]))
            idx = f.schema_arrow.names.index("warc_ts")
            for rg in range(f.metadata.num_row_groups):
                st = f.metadata.row_group(rg).column(idx).statistics
                total += 1
                gmin = pa.scalar(st.min).cast(pa.int64()).as_py()
                gmax = pa.scalar(st.max).cast(pa.int64()).as_py()
                if gmin <= hi and gmax >= lo:
                    overlapping += 1
        return overlapping, total

    # key-sorted baseline at the SAME row-group granularity: ts is
    # random within every group, so a 10% ts band touches almost all
    zorder_rewrite(root, ["url"], row_group_size=16)
    base_hit, base_total = band_overlap()

    lineage = zorder_rewrite(root, ["warc_ts", "lang"], row_group_size=16)
    assert lineage["rows_total"] == before.num_rows

    after = read_table_arrow(root)
    assert after.equals(before)
    # pre-rewrite snapshot still readable (immutable part files)
    assert read_table_arrow(root, at_txid=tx_pre).equals(before)
    # point lookup still exact post-rewrite
    probe = before.column("url")[0].as_py()
    assert get_rows(root, [probe]).num_rows == 1

    z_hit, z_total = band_overlap()
    assert base_total >= 8 and z_total >= 8
    # the band must prune materially better than under key sort
    assert base_hit >= 0.8 * base_total, (base_hit, base_total)
    assert z_hit / z_total <= 0.75 * (base_hit / base_total), (
        z_hit, z_total, base_hit, base_total,
    )
