"""Round-4 operators: weighted sampling (Bernoulli + A-ES top-k),
regex span extraction, ordered string aggregation, median/MAD outliers.

Each test is a differential against an independent same-semantics
reference (DuckDB SQL or direct NumPy/pandas over the full table), the
repo's standard oracle pattern."""

import hashlib

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray

from etl_ray.stages.sampling import (
    aes_keys,
    weighted_mask,
    weighted_sample,
    weighted_topk,
)

SF = "/root/testdata/sf0.001"


def _docs_table() -> pa.Table:
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang", "n_chars"])


# ---------------------------------------------------------------------------
# weighted Bernoulli sample
# ---------------------------------------------------------------------------


def test_weighted_mask_matches_duckdb_predicate():
    t = _docs_table()
    m = weighted_mask(t, "doc_id", "n_chars", scale=400)
    got = sorted(t.filter(pa.array(m)).column("doc_id").to_pylist())
    want = [
        r[0]
        for r in duckdb.sql(
            f"""
        SELECT doc_id FROM read_parquet('{SF}/documents.parquet')
        WHERE ('0x' || substr(md5('wb1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              * 400 < n_chars * 4294967296
        ORDER BY doc_id
        """
        ).fetchall()
    ]
    assert got == want
    assert 0 < len(got) < t.num_rows  # non-degenerate at this scale


def test_weighted_mask_inclusion_proportional_to_weight():
    # two weight classes, many keys: empirical rates track w/scale
    n = 20000
    t = pa.table(
        {
            "k": pa.array(np.arange(n, dtype=np.int64)),
            "w": pa.array(np.where(np.arange(n) % 2 == 0, 100, 400).astype(np.int64)),
        }
    )
    m = weighted_mask(t, "k", "w", scale=800)
    lo = m[::2].mean()  # expect 100/800 = 0.125
    hi = m[1::2].mean()  # expect 400/800 = 0.5
    assert abs(lo - 0.125) < 0.02
    assert abs(hi - 0.5) < 0.02


def test_weighted_sample_layout_independent(ray_session):
    t = _docs_table()
    a = weighted_sample(
        ray.data.from_arrow(t).repartition(1), "doc_id", "n_chars", 400
    ).take_all()
    b = weighted_sample(
        ray.data.from_arrow(t).repartition(7), "doc_id", "n_chars", 400
    ).take_all()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)


# ---------------------------------------------------------------------------
# A-ES weighted top-k (without replacement)
# ---------------------------------------------------------------------------


def _aes_reference(t: pa.Table, k: int) -> list[int]:
    """Full-sort reference with the SAME arithmetic as the engine."""
    skey = aes_keys(t, "doc_id", "n_chars")
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -skey))  # skey desc, id asc
    return ids[order][:k].tolist()


def test_weighted_topk_matches_full_sort_reference(ray_session):
    t = _docs_table()
    k = 100
    got = weighted_topk(
        ray.data.from_arrow(t).repartition(5), "doc_id", "n_chars", k=k
    ).take_all()
    got_ids = [r["doc_id"] for r in got]
    assert got_ids == _aes_reference(t, k)  # exact rows, exact order
    assert len(set(got_ids)) == k  # without replacement


def test_weighted_topk_prefers_heavy_rows():
    # weights 1 vs 1000: the top-k should be overwhelmingly heavy keys
    n = 4000
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "n_chars": pa.array(
                np.where(np.arange(n) < n // 2, 1, 1000).astype(np.int64)
            ),
        }
    )
    ids = _aes_reference(t, 100)
    heavy = sum(1 for i in ids if i >= n // 2)
    assert heavy >= 95


def test_weighted_topk_rejects_nonpositive_weights():
    t = pa.table({"doc_id": pa.array([1, 2]), "n_chars": pa.array([5, 0])})
    with pytest.raises(ValueError):
        aes_keys(t, "doc_id", "n_chars")


# ---------------------------------------------------------------------------
# regex span extraction
# ---------------------------------------------------------------------------


def test_regex_extract_matches_re_reference(ray_session):
    import re

    import pyarrow.parquet as pq

    from etl_ray.stages.text import RegexExtractor

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    out = (
        ray.data.from_arrow(t)
        .map_batches(
            RegexExtractor,
            fn_constructor_kwargs={"pattern": "[a-z]{8,}"},
            batch_format="pyarrow",
            concurrency=(1, 2),
        )
        .take_all()
    )
    got = sorted((r["doc_id"], r["idx"], r["term"]) for r in out)
    rx = re.compile("[a-z]{8,}")
    want = []
    for did, txt in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        for i, m in enumerate(rx.findall(txt or ""), 1):
            want.append((did, i, m))
    assert got == sorted(want)
    assert len(want) > 0


# ---------------------------------------------------------------------------
# grouped ordered concat
# ---------------------------------------------------------------------------


def test_grouped_concat_matches_pandas(ray_session):
    import pandas as pd
    import pyarrow.parquet as pq

    from etl_ray.stages.analytic import grouped_concat

    t = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_type", "ts", "event_id"]
    )
    out = grouped_concat(
        ray.data.from_arrow(t).repartition(4),
        key="user_id",
        order_by=["ts", "event_id"],
        value_col="event_type",
        out_col="journey",
    ).take_all()
    got = {r["user_id"]: r["journey"] for r in out}
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    want = df.groupby("user_id")["event_type"].agg(",".join).to_dict()
    assert got == want


# ---------------------------------------------------------------------------
# median/MAD outliers
# ---------------------------------------------------------------------------


def test_mad_outliers_matches_reference(ray_session):
    import pyarrow.parquet as pq

    from etl_ray.pipelines.queries import mad_outliers_events

    got = sorted(r["event_id"] for r in mad_outliers_events(SF).take_all())
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "value"])
    v = t.column("value").to_numpy()
    n = len(v)
    # engine quantile convention: ascending value at floor(q*(n-1))
    med = np.sort(v)[int(np.floor(0.5 * (n - 1)))]
    dev = np.abs(v - med)
    mad = np.sort(dev)[int(np.floor(0.5 * (n - 1)))]
    want = sorted(
        t.column("event_id").to_numpy()[dev > 3.0 * mad].tolist()
    )
    assert got == want
    assert 0 < len(got) < n


# ---------------------------------------------------------------------------
# resumable partitioned export
# ---------------------------------------------------------------------------


def test_export_partitioned_resumes_and_matches(ray_session, small_wal, tmp_path):
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from etl_ray.pipelines.maintenance import export_partitioned
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8)
    replay(root, small_wal["wal_dir"])
    out = str(tmp_path / "export")

    rep = export_partitioned(root, out)
    assert rep["partitions"] == 8 and rep["written"] == 8 and rep["skipped"] == 0

    def read_export():
        files = sorted(
            os.path.join(out, d, f)
            for d in os.listdir(out)
            for f in os.listdir(os.path.join(out, d))
            if f.endswith(".parquet")
        )
        t = pa.concat_tables([pq.read_table(f) for f in files])
        return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))

    live = read_table_arrow(root)
    exported = read_export()
    assert exported.select(sorted(exported.column_names)).equals(
        live.select(sorted(live.column_names))
    )

    # crash simulation: lose three partitions; the re-run rewrites ONLY
    # those and leaves finished files untouched (byte-identical mtimes)
    victims = sorted(os.listdir(out))[:3]
    kept = {
        d: os.stat(os.path.join(out, d, os.listdir(os.path.join(out, d))[0])).st_mtime_ns
        for d in sorted(os.listdir(out))[3:]
    }
    for d in victims:
        import shutil

        shutil.rmtree(os.path.join(out, d))
    rep2 = export_partitioned(root, out)
    assert rep2["written"] == 3 and rep2["skipped"] == 5
    assert rep2["rows"] == rep["rows"]
    for d, mt in kept.items():
        f = os.path.join(out, d, os.listdir(os.path.join(out, d))[0])
        assert os.stat(f).st_mtime_ns == mt  # untouched, not rewritten
    assert read_export().equals(exported)

    # column projection exports only the requested payload columns
    out2 = str(tmp_path / "export_narrow")
    rep3 = export_partitioned(root, out2, columns=["url", "lang"])
    f0 = os.path.join(out2, "pid=00000", f"part-{rep3['txid']}.parquet")
    assert pq.read_schema(f0).names == ["url", "lang"]


# ---------------------------------------------------------------------------
# grouped quantiles: non-binary q edge agreement with DuckDB
# ---------------------------------------------------------------------------


def test_grouped_quantiles_matches_duckdb_at_p95(ray_session):
    import pyarrow.parquet as pq

    from etl_ray.stages.quantiles import grouped_quantiles

    t = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "value"])
    out = grouped_quantiles(
        ray.data.from_arrow(t).repartition(4),
        key="user_id",
        value_col="value",
        qs=[0.95],
        out_cols=["p95"],
    ).take_all()
    got = {r["user_id"]: r["p95"] for r in out}
    con = duckdb.connect()
    con.register("ev", t)
    want = dict(
        con.execute(
            "SELECT user_id, quantile_disc(value, 0.95) FROM ev GROUP BY user_id"
        ).fetchall()
    )
    assert got == want


def test_export_partitioned_ignores_crash_tmp_files(ray_session, small_wal, tmp_path):
    """A crash BETWEEN tmp-write and rename leaves a .tmp file; the
    resumed export must redo that partition (no final file) and never
    promote or trip over the orphan."""
    import os

    from etl_ray.pipelines.maintenance import export_partitioned
    from etl_ray.pipelines.replay import bootstrap_lake, replay

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=4)
    replay(root, small_wal["wal_dir"])
    out = str(tmp_path / "exp")
    rep = export_partitioned(root, out)

    # simulate the crash: partition 1 has only a stale tmp, no final file
    pdir = os.path.join(out, "pid=00001")
    final = [f for f in os.listdir(pdir) if not ".tmp." in f][0]
    os.rename(os.path.join(pdir, final), os.path.join(pdir, f"{final}.tmp.999"))

    rep2 = export_partitioned(root, out)
    assert rep2["written"] == 1 and rep2["skipped"] == 3
    assert rep2["rows"] == rep["rows"]
    names = os.listdir(pdir)
    assert final in names  # the real file is back


def test_export_jsonl_roundtrip_and_resume(ray_session, small_wal, tmp_path):
    """fmt='jsonl': shards hold exactly the live rows (values intact
    through the JSON roundtrip), binary columns are rejected with a
    clear error, and a re-run skips every finished partition."""
    import json as _json
    import os

    import pandas as pd
    import pytest

    from etl_ray.pipelines.maintenance import export_partitioned
    from etl_ray.pipelines.replay import bootstrap_lake, read_table_arrow, replay

    root = str(tmp_path / "lake" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=4)
    replay(root, small_wal["wal_dir"])

    with pytest.raises(Exception, match="binary"):
        export_partitioned(
            root, str(tmp_path / "bad"), fmt="jsonl"
        )  # html is binary

    out = str(tmp_path / "out_jsonl")
    res = export_partitioned(
        root, out, columns=["url", "text", "lang"], fmt="jsonl"
    )
    assert res["written"] == 4 and res["skipped"] == 0

    rows = []
    for pid_dir in sorted(os.listdir(out)):
        for f in sorted(os.listdir(os.path.join(out, pid_dir))):
            assert f.endswith(".jsonl")
            with open(os.path.join(out, pid_dir, f)) as fh:
                rows.extend(_json.loads(line) for line in fh)
    got = pd.DataFrame(rows).sort_values("url").reset_index(drop=True)
    want = (
        read_table_arrow(root)
        .select(["url", "text", "lang"])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["url", "text", "lang"]], want)
    assert res["rows"] == len(want)

    # resume: everything skips, nothing rewritten
    res2 = export_partitioned(
        root, out, columns=["url", "text", "lang"], fmt="jsonl"
    )
    assert res2["written"] == 0 and res2["skipped"] == 4
    assert res2["rows"] == len(want)
