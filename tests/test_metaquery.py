"""Metadata-only queries (pipelines/metaquery.py): exact counts decided
from manifest stats, boundary-only scans, and the manifest-as-tables
inspection surface."""

import pyarrow.compute as pc

from etl_ray.pipelines.metaquery import (
    count_rows,
    files,
    history,
    partitions_table,
)


def _build(tmp_path, small_wal, name, **replay_kw):
    from etl_ray.pipelines.replay import bootstrap_lake, replay

    root = str(tmp_path / name / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"], **replay_kw)
    return root


def test_bare_count_is_metadata_only(ray_session, small_wal, tmp_path):
    from etl_ray.pipelines.replay import read_table_arrow

    root = _build(tmp_path, small_wal, "mc")
    full = read_table_arrow(root)
    rep = count_rows(root)
    assert rep["count"] == full.num_rows
    # flat lake: every partition answered from the manifest, none read
    assert rep["from_stats"] == rep["partitions_total"]
    assert rep["scanned"] == 0


def test_filtered_count_matches_and_reports_layers(
    ray_session, small_wal, tmp_path
):
    from etl_ray.pipelines.replay import read_table_arrow

    root = _build(tmp_path, small_wal, "mf")
    full = read_table_arrow(root)
    import pyarrow as pa

    tsmin = pc.min(full["warc_ts"]).as_py()
    tsmax = pc.max(full["warc_ts"]).as_py()

    # beyond-range: all partitions skipped, nothing scanned, count 0
    rep = count_rows(root, [("warc_ts", ">", tsmax)])
    assert rep["count"] == 0
    assert rep["skipped"] == rep["partitions_total"]
    assert rep["scanned"] == 0

    # whole-range (>= min): stats prove ALL-MATCH everywhere -> again
    # metadata-only, exact
    rep = count_rows(root, [("warc_ts", ">=", tsmin)])
    assert rep["count"] == full.num_rows
    assert rep["from_stats"] == rep["partitions_total"]
    assert rep["scanned"] == 0

    # a mid-range cut straddles every partition (hash partitioning):
    # boundary scan, still exact
    cut = pc.quantile(full["warc_ts"].cast(pa.int64()), 0.5).to_pylist()[0]
    cut_ts = pa.scalar(int(cut), pa.timestamp("us")).as_py()
    rep = count_rows(root, [("warc_ts", ">=", cut_ts)])
    want = pc.sum(
        pc.greater_equal(full["warc_ts"], pa.scalar(cut_ts))
    ).as_py()
    assert rep["count"] == want
    assert rep["scanned"] >= 1

    # equality filter on a categorical column
    lang = sorted(
        {v for v in full.column("lang").to_pylist() if v is not None}
    )[0]
    rep = count_rows(root, [("lang", "==", lang)])
    assert rep["count"] == pc.sum(pc.equal(full["lang"], lang)).as_py()


def test_count_on_delta_chain_lake_scans_but_is_exact(
    ray_session, small_wal, tmp_path
):
    from etl_ray.pipelines.replay import read_table_arrow

    root = _build(tmp_path, small_wal, "md", merge_mode="delta")
    full = read_table_arrow(root)
    rep = count_rows(root)
    # chains double-count superseded versions, so metadata can't decide
    assert rep["scanned"] >= 1
    assert rep["count"] == full.num_rows
    # filtered count on the chain lake is exact too
    lang = sorted(
        {v for v in full.column("lang").to_pylist() if v is not None}
    )[0]
    rep = count_rows(root, [("lang", "==", lang)])
    assert rep["count"] == pc.sum(pc.equal(full["lang"], lang)).as_py()


def test_files_and_partitions_tables(ray_session, small_wal, tmp_path):
    from etl_ray.state.manifest import LakeTable

    root = _build(tmp_path, small_wal, "mi")
    m = LakeTable(root).read_manifest()
    ft = files(root)
    assert ft.num_rows == sum(
        (1 if p.get("file") else 0) + len(p.get("deltas", []) or [])
        for p in m["partitions"].values()
    )
    assert pc.all(ft.column("has_stats")).as_py()
    assert pc.min(ft.column("bytes")).as_py() > 0
    assert set(ft.column("kind").to_pylist()) == {"base"}

    pt = partitions_table(root)
    assert pt.num_rows == len(m["partitions"])
    assert pc.sum(pt.column("version_rows")).as_py() == sum(
        p["rows"] for p in m["partitions"].values()
    )

    # delta lake shows chains
    root_d = _build(tmp_path, small_wal, "mid", merge_mode="delta")
    ftd = files(root_d)
    assert "delta" in set(ftd.column("kind").to_pylist())
    ptd = partitions_table(root_d)
    assert pc.max(ptd.column("delta_files")).as_py() >= 1


def test_history_lists_transactions(ray_session, small_wal, tmp_path):
    root = _build(tmp_path, small_wal, "mh")
    h = history(root)
    assert h.num_rows >= 2  # bootstrap + >=1 replay tx
    txids = h.column("txid").to_pylist()
    assert txids == sorted(txids)
    assert pc.min(h.column("committed_at_us")).as_py() > 0


def test_cli_count_and_explain(ray_session, small_wal, tmp_path, capsys):
    import json

    from etl_ray.pipelines.cli import main

    root = _build(tmp_path, small_wal, "mcli")
    assert main(["count", "--lake", root]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["count"] > 0 and rep["scanned"] == 0

    assert (
        main(
            [
                "explain",
                "--lake",
                root,
                "--where",
                "warc_ts:>=:9999999999999999",
            ]
        )
        == 0
    )
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["partitions_skipped"] == rep["partitions_total"]

    assert main(
        ["count", "--lake", root, "--where", "warc_ts:>=:9999999999999999"]
    ) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["count"] == 0 and rep["scanned"] == 0


def test_column_range_metadata_only_on_flat_lake(
    ray_session, small_wal, tmp_path
):
    from etl_ray.pipelines.metaquery import column_range
    from etl_ray.pipelines.replay import read_table_arrow

    root = _build(tmp_path, small_wal, "mr")
    full = read_table_arrow(root)

    # timestamp: exact encoded bounds -> zero scan
    r = column_range(root, "warc_ts")
    assert r["scanned"] == 0 and r["from_stats"] > 0
    assert r["min"] == pc.min(full["warc_ts"]).as_py()
    assert r["max"] == pc.max(full["warc_ts"]).as_py()

    # short strings (urls) are exact too
    r = column_range(root, "url")
    assert r["scanned"] == 0
    assert r["min"] == pc.min(full["url"]).as_py()
    assert r["max"] == pc.max(full["url"]).as_py()

    # long text bounds are truncation-widened -> must scan, still exact
    r = column_range(root, "text")
    assert r["scanned"] > 0
    assert r["min"] == pc.min(full["text"]).as_py()
    assert r["max"] == pc.max(full["text"]).as_py()
    assert r["nulls"] == full.column("text").null_count


def test_column_range_delta_chain_scans_exactly(
    ray_session, small_wal, tmp_path
):
    from etl_ray.pipelines.metaquery import column_range
    from etl_ray.pipelines.replay import read_table_arrow

    root = _build(tmp_path, small_wal, "mrd", merge_mode="delta")
    full = read_table_arrow(root)
    r = column_range(root, "warc_ts")
    # chains cannot answer from union bounds (superseded extremes)
    assert r["scanned"] > 0
    assert r["min"] == pc.min(full["warc_ts"]).as_py()
    assert r["max"] == pc.max(full["warc_ts"]).as_py()


def test_filtered_resumable_export(ray_session, small_wal, tmp_path):
    """export_partitioned(filters=): matching rows only, stats-pruned
    partitions never read, and a different predicate can't silently mix
    shards with a previous run (filter-identity name tag)."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_ray.pipelines.maintenance import export_partitioned
    from etl_ray.pipelines.replay import read_table_arrow

    root = _build(tmp_path, small_wal, "mx")
    full = read_table_arrow(root)
    out = str(tmp_path / "mx_out")

    lang = sorted(
        {v for v in full.column("lang").to_pylist() if v is not None}
    )[0]
    rep = export_partitioned(
        root, out, columns=["url", "lang"], filters=[("lang", "==", lang)]
    )
    want = full.filter(pc.equal(full["lang"], lang))
    assert rep["rows"] == want.num_rows
    shards = glob.glob(os.path.join(out, "pid=*", "part-*.parquet"))
    got = pa.concat_tables([pq.read_table(f) for f in shards])
    assert got.num_rows == want.num_rows
    assert set(got.column_names) == {"url", "lang"}
    assert set(got.column("lang").to_pylist()) == {lang}
    # shard names carry the filter tag
    assert all("-f" in os.path.basename(f) for f in shards)

    # re-run: everything skipped, nothing rewritten
    rep2 = export_partitioned(
        root, out, columns=["url", "lang"], filters=[("lang", "==", lang)]
    )
    assert rep2["written"] == 0 and rep2["skipped"] == rep["written"]

    # a DIFFERENT predicate writes its own shards (no silent mixing)
    lang2 = sorted(
        {v for v in full.column("lang").to_pylist() if v is not None}
    )[1]
    rep3 = export_partitioned(
        root, out, columns=["url", "lang"], filters=[("lang", "==", lang2)]
    )
    assert rep3["written"] > 0
    shards_all = glob.glob(os.path.join(out, "pid=*", "part-*.parquet"))
    assert len({os.path.basename(s).split("-f")[1] for s in shards_all}) == 2

    # beyond-range filters prune every partition before any task runs
    tsmax = pc.max(full["warc_ts"]).as_py()
    rep4 = export_partitioned(
        root, str(tmp_path / "mx_none"),
        filters=[("warc_ts", ">", tsmax)],
    )
    assert rep4["pruned"] == 8 and rep4["rows"] == 0
