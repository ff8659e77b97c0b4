"""Differential correctness: Ray engine replay == single-process oracle.

SURVEY.md §5 target strategy item 2 — final table must equal the oracle
exactly (row set + byte-identical `text` per url).
"""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from etl_ray.oracle import replay_oracle


def _canon(tbl: pa.Table) -> pa.Table:
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("url", "ascending")]))


def assert_tables_equal(a: pa.Table, b: pa.Table):
    assert a.schema.equals(b.schema), f"{a.schema}\n!=\n{b.schema}"
    assert a.num_rows == b.num_rows
    a, b = _canon(a), _canon(b)
    for name in a.column_names:
        ca, cb = a.column(name), b.column(name)
        if not ca.equals(cb):
            for i, (x, y) in enumerate(zip(ca.to_pylist(), cb.to_pylist())):
                assert x == y, f"col {name} row {i}: {x!r} != {y!r}"
            raise AssertionError(f"col {name} differs")


@pytest.fixture()
def lake_root(tmp_path):
    return str(tmp_path / "lake" / "pages")


def test_replay_matches_oracle_single_tx(ray_session, small_wal, lake_root):
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    bootstrap_lake(lake_root, small_wal["base"], num_partitions=16)
    stats = replay(lake_root, small_wal["wal_dir"])
    assert stats.transactions == 1
    assert stats.schema_version == 0  # lang already in base schema

    oracle = replay_oracle(small_wal["base"], small_wal["segments"])
    engine = read_table_arrow(lake_root)
    assert_tables_equal(engine, oracle)
    assert stats.rows_live == oracle.num_rows


def test_replay_incremental_matches_oracle(ray_session, small_wal, tmp_path):
    """Per-segment transactions (incremental tailing) reach the same state;
    tombstone retention makes late events across tx boundaries correct."""
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    root = str(tmp_path / "lake2" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    stats = replay(root, small_wal["wal_dir"], max_segments_per_tx=2)
    assert stats.transactions >= 3

    oracle = replay_oracle(small_wal["base"], small_wal["segments"])
    assert_tables_equal(read_table_arrow(root), oracle)


def test_replay_is_idempotent(ray_session, small_wal, lake_root):
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay
    from etl_ray.state.manifest import LakeTable

    bootstrap_lake(lake_root, small_wal["base"], num_partitions=16)
    replay(lake_root, small_wal["wal_dir"])
    m1 = LakeTable(lake_root).read_manifest()
    # second replay over the same WAL: ledger says nothing pending -> no-op
    stats2 = replay(lake_root, small_wal["wal_dir"])
    assert stats2.transactions == 0 and stats2.events_applied == 0
    m2 = LakeTable(lake_root).read_manifest()
    assert m1["txid"] == m2["txid"]
    assert m1["partitions"] == m2["partitions"]


def test_replay_salting_on_matches_oracle(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    root = str(tmp_path / "lake3" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], salting="on", salt=4)
    oracle = replay_oracle(small_wal["base"], small_wal["segments"])
    assert_tables_equal(read_table_arrow(root), oracle)


def test_replay_without_base(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    root = str(tmp_path / "lake4" / "pages")
    bootstrap_lake(root, None, num_partitions=8)
    replay(root, small_wal["wal_dir"])
    oracle = replay_oracle(None, small_wal["segments"])
    assert_tables_equal(read_table_arrow(root), oracle)


def test_lineage_recorded(ray_session, small_wal, lake_root):
    from etl_ray.pipelines.replay import bootstrap_lake, replay
    from etl_ray.state.manifest import LakeTable

    bootstrap_lake(lake_root, small_wal["base"], num_partitions=16)
    replay(lake_root, small_wal["wal_dir"])
    m = LakeTable(lake_root).read_manifest()
    assert m["applied_lsn_ranges"], "lsn ranges recorded"
    # per-segment ranges: merged coverage spans the whole WAL
    assert min(lo for lo, _ in m["applied_lsn_ranges"]) <= 1
    assert max(hi for _, hi in m["applied_lsn_ranges"]) == small_wal["spec"].n_events
    assert all("checksum" in p for p in m["partitions"].values())
    assert m["lineage"][-1]["events_applied"] > 0


def test_time_travel_read(ray_session, small_wal, tmp_path):
    """read_table(at_txid=...) reconstructs any committed snapshot from
    the immutable per-tx manifest — each intermediate state must equal
    the oracle over exactly the segments applied by then."""
    import json
    import os

    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake_tt" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], max_segments_per_tx=2)

    lake = LakeTable(root)
    m = lake.read_manifest()
    seg_by_name = {os.path.basename(s): s for s in small_wal["segments"]}
    applied_so_far: list[str] = []
    checked = 0
    for entry in m["lineage"]:
        txid = entry["txid"]
        rec = json.load(open(os.path.join(root, "manifests", f"{txid}.json")))
        applied_so_far += [
            seg_by_name[s] for s in rec["applied_segments"] if s in seg_by_name
        ]
        snap = read_table_arrow(root, at_txid=txid)
        oracle = replay_oracle(small_wal["base"], applied_so_far)
        assert snap.equals(oracle), f"time-travel mismatch at {txid}"
        checked += 1
    assert checked >= 3  # bootstrap + >=2 replay txs
    # the newest snapshot equals the current read
    assert read_table_arrow(root, at_txid=m["txid"]).equals(read_table_arrow(root))


def test_replay_hash_shuffle_mode(ray_session, small_wal, lake_root, monkeypatch):
    """ETLRAY_SHUFFLE=hash swaps the pid exchange from sort-shuffle to the
    streaming hash-shuffle (aggregator actors) — final state must be
    byte-identical to the oracle either way.  Sort stays the default (5x
    faster on the single-box bench, see _replay_chunk comment); this pins
    the alternative so a cluster re-measure can flip it safely."""
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    monkeypatch.setenv("ETLRAY_SHUFFLE", "hash")
    bootstrap_lake(lake_root, small_wal["base"], num_partitions=16)
    stats = replay(lake_root, small_wal["wal_dir"])
    assert stats.transactions == 1
    oracle = replay_oracle(small_wal["base"], small_wal["segments"])
    assert_tables_equal(read_table_arrow(lake_root), oracle)


def test_read_table_column_pruning(ray_session, small_wal, tmp_path):
    """columns= prunes the scan at the parquet layer and equals a select
    of the full read, in flat AND delta-chain modes, including files
    written before an additive evolution (null-filled)."""
    import pyarrow as pa

    from etl_ray.pipelines.replay import bootstrap_lake, read_table, replay

    lake = str(tmp_path / "lake_prune" / "pages")
    bootstrap_lake(lake, small_wal["base"], num_partitions=8)
    replay(lake, small_wal["wal_dir"])

    def collect(ds):
        t = pa.concat_tables(
            [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
             for b in ds.iter_batches(batch_format="pyarrow")]
        )
        return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))

    full = collect(read_table(lake)).select(["url", "lang"])
    pruned = collect(read_table(lake, columns=["url", "lang"]))
    assert pruned.equals(full)

    # delta-chain path: a lake with unfolded merge-on-read deltas
    lake_d = str(tmp_path / "lake_prune_d" / "pages")
    bootstrap_lake(lake_d, small_wal["base"], num_partitions=8)
    replay(lake_d, small_wal["wal_dir"], merge_mode="delta", max_segments_per_tx=3)
    full_d = collect(read_table(lake_d)).select(["url", "lang"])
    pruned_d = collect(read_table(lake_d, columns=["url", "lang"]))
    assert pruned_d.equals(full_d)
    assert pruned_d.equals(full)  # delta == rewrite state, pruned alike


def test_read_table_predicate_pushdown(ray_session, small_wal, tmp_path):
    """predicate= equals a post-hoc filter of the full read in flat AND
    delta modes (flat pushes into the parquet scan; delta applies
    post-merge so no winning version is lost)."""
    import pyarrow.dataset as pads

    from etl_ray.pipelines.replay import bootstrap_lake, read_table, replay

    pred = pads.field("lang") == "en"

    def collect(ds):
        df = ds.to_pandas()
        return df.sort_values("url").reset_index(drop=True)

    lake = str(tmp_path / "lake_pred" / "pages")
    bootstrap_lake(lake, small_wal["base"], num_partitions=8)
    replay(lake, small_wal["wal_dir"])
    full = collect(read_table(lake))
    exp = full[full.lang == "en"].reset_index(drop=True)
    assert collect(read_table(lake, predicate=pred)).equals(exp)

    lake_d = str(tmp_path / "lake_pred_d" / "pages")
    bootstrap_lake(lake_d, small_wal["base"], num_partitions=8)
    replay(lake_d, small_wal["wal_dir"], merge_mode="delta", max_segments_per_tx=3)
    assert collect(read_table(lake_d, predicate=pred)).equals(exp)
