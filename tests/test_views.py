"""Incremental view maintenance: delta refresh == full rebuild, host
retraction, noop refresh, and the signed delta stream itself."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from etl_ray.pipelines.replay import bootstrap_lake, replay
from etl_ray.pipelines.views import build_view, read_view, refresh_view
from etl_ray.state.manifest import LakeTable


def _canon(t: pa.Table) -> pa.Table:
    return t.take(pc.sort_indices(t, sort_keys=[("host", "ascending")]))


def _lake(tmp_path, small_wal, name, n_segments=None):
    root = str(tmp_path / name / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    segs = small_wal["segments"]
    if n_segments is not None:
        replay(root, small_wal["wal_dir"], segments=segs[:n_segments])
    else:
        replay(root, small_wal["wal_dir"])
    return root


def test_refresh_equals_full_rebuild(ray_session, small_wal, tmp_path):
    root = _lake(tmp_path, small_wal, "ivm", n_segments=3)
    view_inc = str(tmp_path / "ivm" / "view_inc")
    build_view(view_inc, root)

    replay(root, small_wal["wal_dir"])  # remaining segments
    refresh_view(view_inc, root)

    view_full = str(tmp_path / "ivm" / "view_full")
    build_view(view_full, root)

    assert _canon(read_view(view_inc)).equals(_canon(read_view(view_full)))
    # both consistent with the head txid
    head = LakeTable(root).read_manifest()["txid"]
    import json

    for v in (view_inc, view_full):
        with open(os.path.join(v, "VIEW.json")) as f:
            assert json.load(f)["txid"] == head


def test_refresh_noop_at_head(ray_session, small_wal, tmp_path):
    root = _lake(tmp_path, small_wal, "noop")
    view = str(tmp_path / "noop" / "view")
    build_view(view, root)
    before = _canon(read_view(view))
    meta = refresh_view(view, root)
    assert meta.get("noop") is True
    assert _canon(read_view(view)).equals(before)


def test_signed_delta_retracts_old_values(ray_session, small_wal, tmp_path):
    """Sum of sign-weighted char contributions over the delta equals the
    change in total live chars between the two snapshots."""
    from etl_ray.pipelines.diff import table_delta
    from etl_ray.pipelines.replay import read_table_arrow

    root = _lake(tmp_path, small_wal, "delta", n_segments=3)
    lk = LakeTable(root)
    tx_a = lk.read_manifest()["txid"]
    chars_a = pc.sum(
        pc.utf8_length(read_table_arrow(root).column("text"))
    ).as_py()

    replay(root, small_wal["wal_dir"])
    tx_b = lk.read_manifest()["txid"]
    chars_b = pc.sum(
        pc.utf8_length(read_table_arrow(root).column("text"))
    ).as_py()

    delta = table_delta(root, tx_a, tx_b, value_cols=("text",))
    tot = 0
    for b in delta.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            sign = b.column("sign").to_numpy(zero_copy_only=False).astype("int64")
            ln = pc.fill_null(pc.utf8_length(b.column("text")), 0).to_numpy(
                zero_copy_only=False
            )
            tot += int((sign * ln).sum())
    assert tot == chars_b - chars_a


def test_host_leaves_view_when_all_pages_deleted(ray_session, tmp_path):
    """Synthetic 2-host lake: delete every page of one host, refresh —
    that host must disappear from the view (n_pages reaches 0)."""
    import pyarrow.parquet as pq

    base = pa.table(
        {
            "url": [f"https://gone.example/{i}" for i in range(4)]
            + [f"https://stays.example/{i}" for i in range(3)],
            "warc_ts": pa.array([1_600_000_000_000_000] * 7, pa.timestamp("us")),
            "html": [b"<p>x</p>"] * 7,
        }
    )
    base_path = str(tmp_path / "base.parquet")
    pq.write_table(base, base_path)
    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, base_path, num_partitions=4)
    view = str(tmp_path / "view")
    build_view(view, root)
    hosts0 = set(read_view(view).column("host").to_pylist())
    assert hosts0 == {"gone.example", "stays.example"}

    wal_dir = tmp_path / "wal"
    wal_dir.mkdir()
    events = pa.table(
        {
            "lsn": pa.array(range(1, 5), pa.int64()),
            "op": ["delete"] * 4,
            "url": [f"https://gone.example/{i}" for i in range(4)],
            "warc_ts": pa.array([1_700_000_000_000_000] * 4, pa.timestamp("us")),
            "html": pa.array([None] * 4, pa.binary()),
        }
    )
    pq.write_table(events, str(wal_dir / "seg-000.parquet"))
    replay(root, str(wal_dir))
    refresh_view(view, root)
    out = read_view(view)
    assert set(out.column("host").to_pylist()) == {"stays.example"}
    row = out.to_pylist()[0]
    assert row["n_pages"] == 3


def test_refresh_across_delta_mode_txs(ray_session, small_wal, tmp_path):
    """View maintenance over a merge-on-read lake: the signed delta
    stream LWW-reduces each changed partition's base ∪ chain, so an
    incremental refresh across UNFOLDED delta transactions equals a
    full rebuild at head."""
    root = str(tmp_path / "ivmd" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    segs = small_wal["segments"]
    replay(root, small_wal["wal_dir"], segments=segs[:3], merge_mode="delta")
    view = str(tmp_path / "ivmd" / "view")
    build_view(view, root)

    replay(root, small_wal["wal_dir"], merge_mode="delta")  # chains grow
    refresh_view(view, root)

    view_full = str(tmp_path / "ivmd" / "view_full")
    build_view(view_full, root)
    assert _canon(read_view(view)).equals(_canon(read_view(view_full)))
