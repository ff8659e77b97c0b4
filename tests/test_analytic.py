"""stages/analytic.py: partitioned window functions (rn / lag / lead /
segmented cumsum) — vectorized edges: single-row keys, null handling,
string keys, bucket-boundary independence."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from etl_ray.stages.analytic import partitioned_analytics


def _run(tbl, **kw):
    ds = ray.data.from_arrow(tbl)
    out = partitioned_analytics(ds, **kw)
    t = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow")],
        promote_options="default",
    )
    return t.to_pydict(), t


def _by_row(d, id_col="id"):
    cols = list(d)
    return {d[id_col][i]: {c: d[c][i] for c in cols} for i in range(len(d[id_col]))}


@pytest.fixture()
def events_tbl():
    # 3 users, interleaved arrival, deterministic values
    return pa.table(
        {
            "id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
            "user": pa.array([10, 20, 10, 10, 20, 30, 10], pa.int64()),
            "ts": pa.array([5, 1, 2, 9, 4, 7, 2], pa.int64()),
            "v": pa.array([100, 10, 200, 300, 20, 1, 400], pa.int64()),
        }
    )


def test_rn_lag_lead_cumsum(ray_session, events_tbl):
    d, _ = _run(
        events_tbl,
        key="user",
        order_by=["ts", "id"],
        lag_cols=["ts"],
        lead_cols=["ts"],
        cum_cols=["v"],
    )
    rows = _by_row(d)
    # user 10 ordered by (ts, id): id3(ts2) < id7(ts2, higher id) < id1(ts5) < id4(ts9)
    assert [rows[i]["rn"] for i in (3, 7, 1, 4)] == [1, 2, 3, 4]
    assert rows[3]["ts_prev"] is None and rows[7]["ts_prev"] == 2
    assert rows[1]["ts_prev"] == 2 and rows[4]["ts_prev"] == 5
    assert rows[4]["ts_next"] is None and rows[1]["ts_next"] == 9
    assert [rows[i]["cum_v"] for i in (3, 7, 1, 4)] == [200, 600, 700, 1000]
    # single-row key: rn=1, null lag/lead, cum = own value
    assert rows[6]["rn"] == 1 and rows[6]["ts_prev"] is None
    assert rows[6]["ts_next"] is None and rows[6]["cum_v"] == 1


def test_bucket_count_invariance(ray_session, events_tbl):
    kw = dict(key="user", order_by=["ts", "id"], lag_cols=["ts"], cum_cols=["v"])
    d1, _ = _run(events_tbl, n_buckets=1, **kw)
    d2, _ = _run(events_tbl, n_buckets=64, **kw)
    assert _by_row(d1) == _by_row(d2)


def test_string_keys(ray_session):
    tbl = pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "url": pa.array(["a.com", "b.com", "a.com", "b.com"], pa.string()),
            "ts": pa.array([4, 1, 2, 8], pa.int64()),
            "v": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    d, _ = _run(tbl, key="url", order_by=["ts", "id"], cum_cols=["v"])
    rows = _by_row(d)
    assert rows[3]["rn"] == 1 and rows[1]["rn"] == 2
    assert rows[1]["cum_v"] == 4  # 3 then 1
    assert rows[2]["rn"] == 1 and rows[4]["rn"] == 2 and rows[4]["cum_v"] == 6


def test_matches_numpy_reference(ray_session):
    rng = np.random.default_rng(7)
    n = 5000
    tbl = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "user": pa.array(rng.integers(0, 97, n), pa.int64()),
            "ts": pa.array(rng.integers(0, 1000, n), pa.int64()),
            "v": pa.array(rng.integers(-50, 50, n), pa.int64()),
        }
    )
    d, _ = _run(tbl, key="user", order_by=["ts", "id"], lag_cols=["v"], cum_cols=["v"])
    rows = _by_row(d)
    users = tbl["user"].to_numpy()
    ts = tbl["ts"].to_numpy()
    ids = tbl["id"].to_numpy()
    vs = tbl["v"].to_numpy()
    for u in (0, 13, 96):
        member = np.flatnonzero(users == u)
        order = member[np.lexsort((ids[member], ts[member]))]
        run = 0
        prev = None
        for rn0, i in enumerate(order):
            run += int(vs[i])
            r = rows[int(ids[i])]
            assert r["rn"] == rn0 + 1
            assert r["cum_v"] == run
            assert r["v_prev"] == prev
            prev = int(vs[i])


def test_ordered_cumsum_matches_numpy(ray_session):
    import numpy as np
    import ray

    from etl_ray.stages.analytic import ordered_cumsum

    rng = np.random.default_rng(5)
    ids = rng.permutation(10_000).astype("int64")  # unique, arbitrary order
    vals = rng.integers(0, 100, size=10_000).astype("int64")
    import pyarrow as pa

    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(ids), "v": pa.array(vals)})
    ).repartition(9)
    out = ordered_cumsum(ds, order_col="k", value_col="v", n_buckets=16)
    t = pa.concat_tables(
        [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
         for b in out.iter_batches(batch_format="pyarrow")]
    )
    got = dict(zip(t["k"].to_pylist(), t["cum_v"].to_pylist()))
    order = np.argsort(ids)
    expect = np.cumsum(vals[order])
    for k, e in zip(ids[order].tolist(), expect.tolist()):
        assert got[k] == e
    assert len(got) == 10_000


def test_ordered_cumsum_single_bucket_small_span(ray_session):
    import pyarrow as pa
    import ray

    from etl_ray.stages.analytic import ordered_cumsum

    ds = ray.data.from_arrow(
        pa.table({"k": pa.array([3, 1, 2], pa.int64()),
                  "v": pa.array([10, 1, 5], pa.int64())})
    )
    out = ordered_cumsum(ds, order_col="k", value_col="v", n_buckets=256)
    rows = {r["k"]: r["cum_v"] for r in out.take_all()}
    assert rows == {1: 1, 2: 6, 3: 16}


def test_rolling_sum_range_vs_brute(ray_session):
    """Time-RANGE trailing sum equals the brute per-row definition
    (all same-key rows with ts in [ts_i - W, ts_i], PEERS included),
    with duplicate timestamps present."""
    import ray.data as rd

    rng = np.random.default_rng(5)
    n = 3_000
    key = rng.integers(0, 40, n)
    ts = rng.integers(0, 10_000, n) * 7  # collisions guaranteed
    val = rng.integers(-50, 100, n)
    eid = np.arange(n)

    from etl_ray.stages.analytic import rolling_sum_range

    t = pa.table(
        {
            "k": pa.array(key, pa.int64()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "v": pa.array(val, pa.int64()),
            "eid": pa.array(eid, pa.int64()),
        }
    )
    W = 5_000
    out = (
        rolling_sum_range(
            rd.from_arrow(t).repartition(7),
            key="k",
            ts_col="ts",
            order_by=["ts", "eid"],
            value_col="v",
            window=W,
            out_col="trail",
        )
        .to_pandas()
        .set_index("eid")["trail"]
    )
    for i in rng.choice(n, 200, replace=False):
        mask = (key == key[i]) & (ts >= ts[i] - W) & (ts <= ts[i])
        assert out.loc[i] == val[mask].sum(), i
