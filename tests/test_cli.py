"""CLI surface: gen -> bootstrap -> replay -> show/stats -> export -> compact.

Drives `etl_ray.pipelines.cli.main(argv)` in-process (the ray_session
fixture owns the Ray session; _init_ray is a no-op re-init)."""

import json

import pyarrow.parquet as pq


def _run(capsys, *argv) -> dict:
    from etl_ray.pipelines.cli import main

    assert main(list(argv)) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_cli_end_to_end(ray_session, tmp_path, capsys):
    data = str(tmp_path / "cdc")
    lake = str(tmp_path / "lake" / "pages")
    out = str(tmp_path / "export")

    r = _run(capsys, "gen", "--out", data, "--urls", "200", "--events", "1000",
             "--segments", "4")
    assert r["segments"] == 5  # 4 + redelivered

    _run(capsys, "bootstrap", "--lake", lake, "--base", f"{data}/base/pages.parquet",
         "--partitions", "8")
    rep = _run(capsys, "replay", "--lake", lake, "--wal", f"{data}/wal")
    assert rep["transactions"] == 1 and rep["rows_live"] > 0

    show = _run(capsys, "show", "--lake", lake)
    assert show["rows_live"] == rep["rows_live"]

    stats = _run(capsys, "stats", "--lake", lake)
    assert stats["transactions"] == 2  # bootstrap + replay
    assert stats["events_applied_total"] == rep["events_applied"]
    assert stats["per_tx"][-1]["events_per_sec"] > 0

    exp = _run(capsys, "export", "--lake", lake, "--out", out)
    assert exp["rows"] == rep["rows_live"]
    exported = pq.read_table(out)
    assert exported.num_rows == rep["rows_live"]
    assert "_deleted" not in exported.column_names  # internal cols dropped

    comp = _run(capsys, "compact", "--lake", lake, "--assume-caught-up")
    assert comp["compaction"] is True
    # state unchanged for readers after compaction + vacuum
    show2 = _run(capsys, "show", "--lake", lake)
    assert show2["rows_live"] == rep["rows_live"]

    view = str(tmp_path / "view")
    v1 = _run(capsys, "view-refresh", "--lake", lake, "--view", view)
    assert v1["txid"] == show2["txid"]  # first call = full build at head
    v2 = _run(capsys, "view-refresh", "--lake", lake, "--view", view)
    assert v2.get("noop") is True

    rp = _run(capsys, "repartition", "--lake", lake, "--num-partitions", "5")
    assert rp["repartition"] is True
    show3 = _run(capsys, "show", "--lake", lake)
    assert show3["rows_live"] == rep["rows_live"]
    # view refresh across the repartition boundary: every partition file
    # changed, but the maintained stats are unchanged -> delta sums to 0
    v3 = _run(capsys, "view-refresh", "--lake", lake, "--view", view)
    assert v3["txid"] == show3["txid"] and "noop" not in v3


def test_cli_delta_mode_and_get(ray_session, tmp_path, capsys):
    """--merge-mode delta replay -> get point lookup -> compact-deltas."""
    data = str(tmp_path / "cdc")
    lake = str(tmp_path / "lake" / "pages")

    _run(capsys, "gen", "--out", data, "--urls", "200", "--events", "1000",
         "--segments", "4")
    _run(capsys, "bootstrap", "--lake", lake, "--base",
         f"{data}/base/pages.parquet", "--partitions", "8")
    rep = _run(capsys, "replay", "--lake", lake, "--wal", f"{data}/wal",
               "--merge-mode", "delta", "--max-segments-per-tx", "2")
    assert rep["transactions"] >= 2

    from etl_ray.pipelines.replay import read_table_arrow

    full = read_table_arrow(lake)
    url = full.column("url")[0].as_py()
    got = _run(capsys, "get", "--lake", lake, "--url", url,
               "--url", "https://nope.example/x")
    assert got["found"] == 1 and got["asked"] == 2
    assert got["rows"][0]["url"] == url
    assert "html" not in got["rows"][0] and got["rows"][0]["html_bytes"] > 0

    cd = _run(capsys, "compact-deltas", "--lake", lake)
    assert cd["partitions_folded"] > 0
    # unchanged after folding
    assert read_table_arrow(lake).equals(full)
    got2 = _run(capsys, "get", "--lake", lake, "--url", url)
    assert got2["found"] == 1


def test_cli_follow_metrics_path(ray_session, tmp_path, capsys):
    """replay --follow --metrics-path emits per-poll JSONL records."""
    import json as _json

    data = str(tmp_path / "cdcm")
    lake = str(tmp_path / "lakem" / "pages")
    _run(capsys, "gen", "--out", data, "--urls", "100", "--events", "500",
         "--segments", "2")
    _run(capsys, "bootstrap", "--lake", lake,
         "--base", f"{data}/base/pages.parquet", "--partitions", "4")
    mpath = str(tmp_path / "follow_metrics.jsonl")
    rep = _run(capsys, "replay", "--lake", lake, "--wal", f"{data}/wal",
               "--follow", "--poll-interval", "0.1",
               "--idle-exit-after", "1", "--metrics-path", mpath)
    assert rep["segments_applied"] == 3  # 2 + redelivered
    recs = [_json.loads(l) for l in open(mpath)]
    assert recs and recs[0]["segments_applied"] == 3
    assert recs[0]["events_per_sec"] > 0
    assert recs[-1]["lag_segments"] == 0


def test_cli_export_resumable(ray_session, tmp_path, capsys):
    import os

    data = str(tmp_path / "cdc")
    lake = str(tmp_path / "lake" / "pages")
    out = str(tmp_path / "exp_resumable")
    _run(capsys, "gen", "--out", data, "--urls", "100", "--events", "400",
         "--segments", "2")
    _run(capsys, "bootstrap", "--lake", lake, "--base", f"{data}/base/pages.parquet",
         "--partitions", "4")
    rep = _run(capsys, "replay", "--lake", lake, "--wal", f"{data}/wal")

    e1 = _run(capsys, "export", "--lake", lake, "--out", out, "--resumable")
    assert e1["written"] == 4 and e1["skipped"] == 0
    assert e1["rows"] == rep["rows_live"]
    # second run: everything already published -> all skipped
    e2 = _run(capsys, "export", "--lake", lake, "--out", out, "--resumable")
    assert e2["written"] == 0 and e2["skipped"] == 4
    assert sorted(os.listdir(out)) == [f"pid={i:05d}" for i in range(4)]


def test_cli_zorder_and_replay_group(ray_session, tmp_path, capsys):
    data = str(tmp_path / "cdc")
    _run(capsys, "gen", "--out", data, "--urls", "150", "--events", "700",
         "--segments", "4")

    lake_a = str(tmp_path / "ga" / "pages")
    lake_b = str(tmp_path / "gb" / "pages")
    for lake in (lake_a, lake_b):
        _run(capsys, "bootstrap", "--lake", lake,
             "--base", f"{data}/base/pages.parquet", "--partitions", "4")

    grp = _run(
        capsys, "replay-group", "--group", str(tmp_path / "grp"),
        "--stream", f"a={lake_a}:{data}/wal",
        "--stream", f"b={lake_b}:{data}/wal",
    )
    assert grp["gtxid"] == "gtx000001"
    assert grp["members"]["a"]["txid"] == grp["members"]["b"]["txid"]
    assert grp["events_applied"]["a"] > 0

    before = _run(capsys, "show", "--lake", lake_a)
    z = _run(capsys, "zorder", "--lake", lake_a, "--by", "warc_ts,lang",
             "--row-group-size", "64")
    assert z["zorder"] == ["warc_ts", "lang"]
    after = _run(capsys, "show", "--lake", lake_a)
    assert after["rows_live"] == before["rows_live"]

    # jsonl resumable export through the CLI
    exp = _run(capsys, "export", "--lake", lake_a, "--out",
               str(tmp_path / "ndj"), "--resumable", "--fmt", "jsonl",
               "--columns", "url,text,lang")
    assert exp["rows"] == after["rows_live"] and exp["written"] == 4
    exp2 = _run(capsys, "export", "--lake", lake_a, "--out",
                str(tmp_path / "ndj"), "--resumable", "--fmt", "jsonl",
                "--columns", "url,text,lang")
    assert exp2["skipped"] == 4 and exp2["written"] == 0


def test_cli_delete_where(ray_session, tmp_path, capsys):
    import pyarrow.compute as pc

    from etl_ray.pipelines.replay import read_table_arrow

    data = str(tmp_path / "cdc_dw")
    lake = str(tmp_path / "lake_dw" / "pages")
    _run(capsys, "gen", "--out", data, "--urls", "200", "--events", "1000",
         "--segments", "4")
    _run(capsys, "bootstrap", "--lake", lake, "--base",
         f"{data}/base/pages.parquet", "--partitions", "8")
    _run(capsys, "replay", "--lake", lake, "--wal", f"{data}/wal")

    before = read_table_arrow(lake)
    host = before.column("url")[0].as_py().split("/")[2]
    prefix = f"https://{host}/"
    n = pc.sum(pc.starts_with(before.column("url"), prefix)).as_py()
    lin = _run(capsys, "delete-where", "--lake", lake, "--column", "url",
               "--op", "prefix", "--value", prefix)
    assert lin["rows_purged"] == n > 0
    after = read_table_arrow(lake)
    assert after.num_rows == before.num_rows - n

    # timestamp coercion path + noop path
    noop = _run(capsys, "delete-where", "--lake", lake, "--column", "warc_ts",
                "--op", "lt", "--value", "1", "--value-type", "ts-us")
    assert noop == {"rows_purged": 0, "noop": True}


def test_cli_constraint(ray_session, tmp_path, capsys):
    data = str(tmp_path / "cdc_ct")
    lake = str(tmp_path / "lake_ct" / "pages")
    _run(capsys, "gen", "--out", data, "--urls", "100", "--events", "500",
         "--segments", "3")
    _run(capsys, "bootstrap", "--lake", lake, "--base",
         f"{data}/base/pages.parquet", "--partitions", "8")

    lin = _run(capsys, "constraint", "set", "--lake", lake,
               "--name", "url_https", "--column", "url",
               "--op", "prefix", "--value", "https://")
    assert lin["set_constraint"]["name"] == "url_https"
    _run(capsys, "constraint", "set", "--lake", lake,
         "--name", "html_present", "--column", "html", "--op", "notnull")
    got = _run(capsys, "constraint", "list", "--lake", lake)
    assert set(got) == {"url_https", "html_present"}
    assert got["html_present"]["value"] is None
    _run(capsys, "constraint", "drop", "--lake", lake, "--name", "url_https")
    assert set(_run(capsys, "constraint", "list", "--lake", lake)) == {
        "html_present"
    }


def test_cli_requeue_dlq(ray_session, tmp_path, capsys):
    import shutil as _sh

    from tests.test_dlq import _dirty_segment

    data = str(tmp_path / "cdc_rq")
    lake = str(tmp_path / "lake_rq" / "pages")
    _run(capsys, "gen", "--out", data, "--urls", "100", "--events", "500",
         "--segments", "3")
    wal = f"{data}/wal"
    last = max(
        int(pq.read_table(f"{wal}/{f}", columns=["lsn"])["lsn"].to_numpy().max())
        for f in __import__("os").listdir(wal)
    )
    _dirty_segment(f"{wal}/segment-dirty-00097.parquet", last + 1)
    _run(capsys, "bootstrap", "--lake", lake, "--base",
         f"{data}/base/pages.parquet", "--partitions", "8")
    _run(capsys, "replay", "--lake", lake, "--wal", wal)
    # built-in-malformed rows stay malformed: requeue is a counted no-op
    res = _run(capsys, "requeue-dlq", "--lake", lake)
    assert res == {"requeued": 0, "kept": 4, "transactions": 0}
    res2 = _run(capsys, "requeue-dlq", "--lake", lake, "--reason", "bad_op")
    assert res2["requeued"] == 0
