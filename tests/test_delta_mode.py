"""Merge-on-read delta mode: replay(merge_mode="delta") stages only each
transaction's change rows; readers reduce base ∪ chain under LWW.

Differential contract: for ANY interleaving of delta txs, rewrite txs,
chain folds and tombstone GC, the served live state equals the
single-process oracle — write amplification is the only thing that
changes, never the answer.
"""

import pyarrow as pa
import pyarrow.compute as pc

from etl_ray.oracle import replay_oracle


def assert_tables_equal(a: pa.Table, b: pa.Table):
    assert a.schema.equals(b.schema), f"{a.schema}\n!=\n{b.schema}"
    assert a.num_rows == b.num_rows
    key = [("url", "ascending")]
    a = a.take(pc.sort_indices(a, sort_keys=key))
    b = b.take(pc.sort_indices(b, sort_keys=key))
    assert a.equals(b), "table contents differ"


def _chains(root):
    from etl_ray.state.manifest import LakeTable

    m = LakeTable(root).read_manifest()
    return {int(k): len(v.get("deltas", [])) for k, v in m["partitions"].items()}


def test_delta_replay_matches_oracle(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    stats = replay(
        root, small_wal["wal_dir"], max_segments_per_tx=2, merge_mode="delta"
    )
    assert stats.transactions >= 3
    chains = _chains(root)
    assert max(chains.values()) >= 2, "expected multi-file delta chains"
    oracle = replay_oracle(small_wal["base"], small_wal["segments"])
    assert_tables_equal(read_table_arrow(root), oracle)


def test_compact_deltas_folds_and_preserves_state(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.maintenance import compact_deltas, vacuum
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], max_segments_per_tx=2, merge_mode="delta")
    oracle = replay_oracle(small_wal["base"], small_wal["segments"])

    lin = compact_deltas(root)
    assert lin is not None and lin["partitions_folded"] > 0
    assert sum(_chains(root).values()) == 0
    assert_tables_equal(read_table_arrow(root), oracle)

    # superseded delta files become orphans; state survives the vacuum
    gc = vacuum(root)
    assert gc["removed_parts"] > 0
    assert_tables_equal(read_table_arrow(root), oracle)

    # exactly-once ledger unaffected by folding
    stats = replay(root, small_wal["wal_dir"], merge_mode="delta")
    assert stats.transactions == 0

    # nothing left to fold
    assert compact_deltas(root) is None


def test_rewrite_after_delta_folds_chain(ray_session, small_wal, tmp_path):
    """A later rewrite-mode tx reads base ∪ chain and its commit clears
    the chain for every pid it touches — mixed-mode replay is safe."""
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    segs = small_wal["segments"]
    replay(root, small_wal["wal_dir"], segments=segs[:3], merge_mode="delta")
    assert sum(_chains(root).values()) > 0
    replay(root, small_wal["wal_dir"], merge_mode="rewrite")
    # every partition touched by the rewrite lost its chain; the small
    # fixture touches all of them
    assert sum(_chains(root).values()) == 0
    oracle = replay_oracle(small_wal["base"], segs)
    assert_tables_equal(read_table_arrow(root), oracle)


def test_delta_schema_evolution(ray_session, small_wal, tmp_path):
    """Additive evolution mid-chain: older delta files lack `lang`; the
    merged read null-backfills them against the current schema."""
    from etl_ray.gen import PAGES_SCHEMA
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay
    from etl_ray.state.manifest import LakeTable

    spec = small_wal["spec"]
    v1 = spec.resolved_v1_start()
    segs = small_wal["segments"][: spec.n_segments]  # drop redelivered tail
    schema_no_lang = pa.schema([f for f in PAGES_SCHEMA if f.name != "lang"])
    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, None, num_partitions=8, schema=schema_no_lang)

    replay(root, small_wal["wal_dir"], segments=segs[:v1], merge_mode="delta")
    assert LakeTable(root).read_manifest()["schema_version"] == 0
    stats = replay(root, small_wal["wal_dir"], segments=segs, merge_mode="delta")
    assert stats.schema_version == 1

    engine = read_table_arrow(root)
    oracle = replay_oracle(None, segs)
    assert_tables_equal(engine, oracle)
    langs = engine.column("lang")
    assert 0 < langs.null_count < engine.num_rows


def test_time_travel_across_delta_txs(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    segs = small_wal["segments"]
    replay(root, small_wal["wal_dir"], segments=segs[:3], merge_mode="delta")
    tx_mid = LakeTable(root).read_manifest()["txid"]
    replay(root, small_wal["wal_dir"], merge_mode="delta")

    snap = read_table_arrow(root, at_txid=tx_mid)
    assert_tables_equal(snap, replay_oracle(small_wal["base"], segs[:3]))
    final = LakeTable(root).read_manifest()["txid"]
    assert read_table_arrow(root, at_txid=final).equals(read_table_arrow(root))


def test_compact_skips_delta_partitions(ray_session, small_wal, tmp_path):
    """Tombstone GC reads only base files, so it must skip (not corrupt)
    partitions that still carry a chain."""
    from etl_ray.pipelines.maintenance import compact
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], merge_mode="delta")
    lin = compact(root, assume_caught_up=True)
    assert lin["skipped_delta_pids"] > 0
    oracle = replay_oracle(small_wal["base"], small_wal["segments"])
    assert_tables_equal(read_table_arrow(root), oracle)


def test_table_diff_across_delta_txs(ray_session, small_wal, tmp_path):
    """Manifest pruning extends to chains: diff between two delta-mode
    snapshots reads changed partitions' file lists and LWW-reduces them
    before classifying — net change stream matches the rewrite-mode
    diff semantics (insert/update/delete by winning lsn)."""
    from etl_ray.pipelines.diff import table_diff
    from etl_ray.pipelines.replay import bootstrap_lake, replay
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    segs = small_wal["segments"]
    replay(root, small_wal["wal_dir"], segments=segs[:3], merge_mode="delta")
    tx_a = LakeTable(root).read_manifest()["txid"]
    replay(root, small_wal["wal_dir"], merge_mode="delta")
    tx_b = LakeTable(root).read_manifest()["txid"]

    got = table_diff(root, tx_a, tx_b).to_pandas()
    from test_diff import _expected_diff

    exp = _expected_diff(small_wal["base"], segs[:3], segs)
    got_set = {(r.op, r.url, r.warc_ts.to_pydatetime()) for r in got.itertuples()}
    import pandas as pd

    exp = {(op, u, pd.Timestamp(ts).to_pydatetime()) for op, u, ts in exp}
    assert got_set == exp


def test_get_rows_point_lookup(ray_session, small_wal, tmp_path):
    """Point lookup reads only the touched partitions and serves the
    freshest version — across both write paths and time travel."""
    from etl_ray.pipelines.replay import (
        bootstrap_lake, get_rows, read_table_arrow, replay,
    )
    from etl_ray.state.manifest import LakeTable

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    segs = small_wal["segments"]
    replay(root, small_wal["wal_dir"], segments=segs[:3], merge_mode="delta")
    tx_mid = LakeTable(root).read_manifest()["txid"]
    replay(root, small_wal["wal_dir"], merge_mode="delta")

    full = read_table_arrow(root)
    urls = full.column("url").to_pylist()
    probe = [urls[0], urls[len(urls) // 2], urls[-1], "https://nope.example/x"]
    got = get_rows(root, probe)
    assert got.num_rows == 3
    by_url = {r["url"]: r for r in got.to_pylist()}
    for r in full.to_pylist():
        if r["url"] in by_url:
            assert by_url[r["url"]] == r  # freshest version, full payload

    # a url deleted by the WAL must not resolve
    oracle_mid = replay_oracle(small_wal["base"], segs[:3])
    mid_urls = set(oracle_mid.column("url").to_pylist())
    gone = sorted(mid_urls - set(urls))
    if gone:
        assert get_rows(root, [gone[0]]).num_rows == 0
        # ... but time travel still sees it at the earlier snapshot
        assert get_rows(root, [gone[0]], at_txid=tx_mid).num_rows == 1


def test_follow_auto_folds_delta_chains(ray_session, small_wal, tmp_path):
    """follow(fold_chain_over=N) bounds read amplification while tailing
    in delta mode: chains never exceed N after an applying poll."""
    import os
    import shutil
    import threading
    import time

    from etl_ray.pipelines.replay import bootstrap_lake, follow, read_table_arrow

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    segs = small_wal["segments"]
    half = len(segs) // 2
    for s in segs[:half]:
        shutil.copy(s, wal)

    def drip():
        time.sleep(0.8)
        for s in segs[half:]:
            tmp = os.path.join(wal, "." + os.path.basename(s))
            shutil.copy(s, tmp)
            os.replace(tmp, os.path.join(wal, os.path.basename(s)))
            time.sleep(0.2)

    t = threading.Thread(target=drip)
    t.start()
    stats = follow(
        root, wal, poll_interval=0.4, idle_exit_after=4,
        merge_mode="delta", max_segments_per_tx=1, fold_chain_over=1,
    )
    t.join()
    assert stats.segments_applied == len(segs)
    assert max(_chains(root).values()) <= 1
    oracle = replay_oracle(small_wal["base"], segs)
    assert_tables_equal(read_table_arrow(root), oracle)
