"""Cross-feature edges for stats pruning: filters on a column added by
mid-stream schema evolution (mixed-era files: old files lack the column
AND its stats), and the filters= path over a coalesce (partial-image)
lake end-to-end."""

import pyarrow as pa
import pyarrow.compute as pc

from etl_ray.gen import PAGES_SCHEMA

SCHEMA_NO_LANG = pa.schema([f for f in PAGES_SCHEMA if f.name != "lang"])


def test_filters_on_evolved_column_mixed_era_files(
    ray_session, small_wal, tmp_path
):
    """A column added by additive evolution: transactions before the
    evolution wrote files without it (and without stats for it).  A
    filter on that column must stay correct — unknown columns never
    prune, null-filled rows never match — across the era boundary."""
    from etl_ray.pipelines import replay as R

    spec = small_wal["spec"]
    v1 = spec.resolved_v1_start()
    segs = small_wal["segments"][: spec.n_segments]
    root = str(tmp_path / "lake" / "pages")
    R.bootstrap_lake(root, None, num_partitions=8, schema=SCHEMA_NO_LANG)
    R.replay(root, small_wal["wal_dir"], segments=segs[:v1])  # era 0
    R.replay(root, small_wal["wal_dir"], segments=segs)  # evolution + era 1
    full = R.read_table_arrow(root)
    assert full.column("lang").null_count > 0  # mixed eras present

    lang = sorted(
        {v for v in full.column("lang").to_pylist() if v is not None}
    )[0]
    got = R.read_table(root, filters=[("lang", "==", lang)]).take_all()
    want = full.filter(pc.equal(full["lang"], lang))
    assert len(got) == want.num_rows
    assert {r["url"] for r in got} == set(want.column("url").to_pylist())

    # range filter on the evolved column's sibling (always-present ts)
    # still prunes/filters correctly on the mixed-era lake
    tsmax = pc.max(full["warc_ts"]).as_py()
    assert R.read_table(root, filters=[("warc_ts", ">", tsmax)]).count() == 0


def test_filters_on_coalesce_lake(ray_session, tmp_path):
    """filters= over a coalesce lake: the served row mixes column
    values from different files, which is exactly the case union_stats
    exists for — end-to-end equality against the manual filter."""
    import random

    from etl_ray.config import TableSpec
    from etl_ray.pipelines.replay import (
        bootstrap_lake,
        read_table,
        read_table_arrow,
        replay,
    )

    spec = TableSpec(
        name="users_partial",
        key="user_id",
        ts_col="ts",
        schema_v0=pa.schema(
            [
                ("user_id", pa.string()),
                ("ts", pa.timestamp("us")),
                ("email", pa.string()),
                ("city", pa.string()),
                ("score", pa.float64()),
            ]
        ),
        derive_text=False,
        coalesce_partial=True,
    )
    rng = random.Random(7)
    cols = ["email", "city", "score"]
    evs = []
    for i in range(2000):
        uid = f"u{rng.randrange(120):04d}"
        ts = 1_700_000_000_000_000 + rng.randrange(10_000) * 1_000_000
        ev = dict(lsn=i + 1, op="update", user_id=uid, ts=ts)
        subset = [c for c in cols if rng.random() < 0.5] or ["city"]
        for c in subset:
            ev[c] = (
                rng.uniform(0, 100)
                if c == "score"
                else f"{c[0]}{rng.randrange(50)}"
            )
        evs.append(ev)
    wal = str(tmp_path / "wal")
    import os

    import pyarrow.parquet as pq

    os.makedirs(wal)
    per = len(evs) // 4
    for s in range(4):
        chunk = evs[s * per : (s + 1) * per] if s < 3 else evs[3 * per :]
        arrays = {
            "lsn": pa.array([e["lsn"] for e in chunk], pa.int64()),
            "op": pa.array([e["op"] for e in chunk], pa.string()),
            "user_id": pa.array([e["user_id"] for e in chunk], pa.string()),
            "ts": pa.array([e["ts"] for e in chunk], pa.timestamp("us")),
        }
        for c in cols:
            typ = pa.float64() if c == "score" else pa.string()
            arrays[c] = pa.array([e.get(c) for e in chunk], typ)
        pq.write_table(pa.table(arrays), os.path.join(wal, f"seg-{s:04d}.parquet"))

    root = str(tmp_path / "lake" / "users_partial")
    bootstrap_lake(root, None, num_partitions=8, schema=spec.schema_v0)
    replay(root, wal, spec=spec)

    full = read_table_arrow(root, key="user_id", ts_col="ts")
    cut = 50.0
    got = read_table(
        root, key="user_id", ts_col="ts",
        filters=[("score", ">=", cut)],
    ).take_all()
    want = full.filter(pc.greater_equal(full["score"], cut))
    assert len(got) == want.num_rows
    assert {r["user_id"] for r in got} == set(
        want.column("user_id").to_pylist()
    )

    # string-column filter exercises the union path on city too
    city = sorted(
        {v for v in full.column("city").to_pylist() if v is not None}
    )[0]
    got = read_table(
        root, key="user_id", ts_col="ts", filters=[("city", "==", city)]
    ).take_all()
    want = full.filter(pc.equal(full["city"], city))
    assert len(got) == want.num_rows
