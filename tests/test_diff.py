"""Snapshot diff (reverse CDC): engine table_diff == independently
computed winner-state diff from the flattened event oracle."""

import os
import shutil

import pandas as pd
import pytest


def _winners(base, segs):
    """url -> (warc_ts, lsn, op) LWW winner from the flat event table."""
    from etl_ray.oracle import flat_events_table

    df = flat_events_table(base, segs).select(["url", "warc_ts", "lsn", "op"]).to_pandas()
    df = df.sort_values(["url", "warc_ts", "lsn"]).groupby("url").tail(1)
    return {
        r.url: (r.warc_ts, r.lsn, r.op) for r in df.itertuples()
    }


def _expected_diff(base, segs_a, segs_b):
    wa = {u: v for u, v in _winners(base, segs_a).items() if v[2] != "delete"}
    wb = {u: v for u, v in _winners(base, segs_b).items() if v[2] != "delete"}
    exp = set()
    for u, (ts, lsn, _) in wb.items():
        if u not in wa:
            exp.add(("insert", u, ts))
        elif wa[u][1] != lsn:
            exp.add(("update", u, ts))
    for u, (ts, _, _) in wa.items():
        if u not in wb:
            exp.add(("delete", u, ts))
    return exp


def test_table_diff_matches_oracle(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.diff import table_diff
    from etl_ray.pipelines.replay import bootstrap_lake, replay
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    tx_boot = LakeTable(root).read_manifest()["txid"]

    segs = small_wal["segments"]
    wal_a = str(tmp_path / "wal_a")
    os.makedirs(wal_a)
    for s in segs[:3]:
        shutil.copy(s, wal_a)
    replay(root, wal_a)
    tx_a = LakeTable(root).read_manifest()["txid"]
    replay(root, small_wal["wal_dir"])  # exactly-once: applies only the rest
    tx_b = LakeTable(root).read_manifest()["txid"]
    assert tx_b != tx_a

    got = table_diff(root, tx_a, tx_b).to_pandas()
    got_set = {(r.op, r.url, r.warc_ts.to_pydatetime()) for r in got.itertuples()}
    exp = _expected_diff(small_wal["base"], segs[:3], segs)
    exp = {(op, u, pd.Timestamp(ts).to_pydatetime()) for op, u, ts in exp}
    assert got_set == exp and len(exp) > 0

    # diff from the bootstrap snapshot = net effect of the whole WAL
    got0 = table_diff(root, tx_boot, tx_b).to_pandas()
    exp0 = _expected_diff(small_wal["base"], [], segs)
    exp0 = {(op, u, pd.Timestamp(ts).to_pydatetime()) for op, u, ts in exp0}
    got0_set = {(r.op, r.url, r.warc_ts.to_pydatetime()) for r in got0.itertuples()}
    assert got0_set == exp0


def test_table_diff_identity_is_empty(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.diff import table_diff
    from etl_ray.pipelines.replay import bootstrap_lake, replay
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"])
    tx = LakeTable(root).read_manifest()["txid"]
    out = table_diff(root, tx, tx)
    assert out.count() == 0
    assert out.schema().names == ["pid", "op", "url", "warc_ts"]


def test_table_changelog_images(ray_session, small_wal, tmp_path):
    """Changelog rows carry correct before/after images: insert has a
    null before side, delete a null after side, update both — and the
    md5 image digests match the independently computed winner states."""
    import hashlib

    from etl_ray.oracle import flat_events_table
    from etl_ray.pipelines.diff import table_changelog
    from etl_ray.pipelines.replay import bootstrap_lake, replay
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    tx_boot = LakeTable(root).read_manifest()["txid"]
    replay(root, small_wal["wal_dir"])
    tx_head = LakeTable(root).read_manifest()["txid"]

    got = table_changelog(root, tx_boot, tx_head, image_cols=("text",)).to_pandas()
    assert got.loc[got.op == "insert", "before_warc_ts"].isna().all()
    assert got.loc[got.op == "insert", "before_text_md5"].isna().all()
    assert got.loc[got.op == "delete", "after_warc_ts"].isna().all()
    assert got.loc[got.op == "update", "before_text_md5"].notna().all()
    assert got.loc[got.op == "update", "after_text_md5"].notna().all()

    # independent winner state for the after images
    df = flat_events_table(small_wal["base"], small_wal["segments"]).to_pandas()
    win = df.sort_values(["url", "warc_ts", "lsn"]).groupby("url").tail(1)
    win_text = {r.url: (r.op, r.text) for r in win.itertuples()}
    base = pd.read_parquet(small_wal["base"])
    base_text = dict(zip(base.url, base.text))

    for r in got.itertuples():
        if r.op in ("insert", "update"):
            assert r.after_text_md5 == hashlib.md5(
                win_text[r.url][1].encode()
            ).hexdigest()
        if r.op in ("delete", "update"):
            assert r.before_text_md5 == hashlib.md5(
                base_text[r.url].encode()
            ).hexdigest()
    assert (got.op == "update").any() and (got.op == "delete").any()
