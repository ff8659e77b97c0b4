"""Distributed as-of join vs a brute-force single-process reference."""

import numpy as np
import pyarrow as pa
import pytest

import ray


def _brute_asof(left_rows, right_rows):
    """(key, lts, lval) x (key, rts, tie, rval) -> backward as-of, max-tie."""
    out = []
    for k, lts, lval in left_rows:
        cand = [r for r in right_rows if r[0] == k and r[1] <= lts]
        if not cand:
            continue
        best = max(cand, key=lambda r: (r[1], r[2]))
        out.append((k, lts, lval, best[2], best[3]))
    return sorted(out)


def _make(seed, n_left=500, n_right=300, n_keys=40, key_fn=None):
    rng = np.random.default_rng(seed)
    key_fn = key_fn or (lambda i: int(i))
    left = [
        (key_fn(rng.integers(n_keys)), int(rng.integers(0, 10_000)), int(i))
        for i in range(n_left)
    ]
    right = [
        (key_fn(rng.integers(n_keys)), int(rng.integers(0, 10_000)), int(i), float(i) * 0.5)
        for i in range(n_right)
    ]
    return left, right


def _run_asof(left, right, key_type):
    from etl_ray.stages.asof import asof_join

    lt = pa.table(
        {
            "k": pa.array([r[0] for r in left], key_type),
            "lts": pa.array([r[1] for r in left], pa.int64()),
            "lval": pa.array([r[2] for r in left], pa.int64()),
        }
    )
    rt = pa.table(
        {
            "k": pa.array([r[0] for r in right], key_type),
            "rts": pa.array([r[1] for r in right], pa.int64()),
            "tie": pa.array([r[2] for r in right], pa.int64()),
            "rval": pa.array([r[3] for r in right], pa.float64()),
        }
    )
    out = asof_join(
        ray.data.from_arrow(lt),
        ray.data.from_arrow(rt),
        on="k",
        left_ts="lts",
        right_ts="rts",
        tiebreak="tie",
        n_buckets=8,
    ).to_pandas()
    return sorted(
        (r.k, int(r.lts), int(r.lval), int(r.tie), float(r.rval))
        for r in out.itertuples(index=False)
    )


def test_asof_matches_brute_int_keys(ray_session):
    left, right = _make(11)
    got = _run_asof(left, right, pa.int64())
    assert got == _brute_asof(left, right)
    assert len(got) > 100  # non-trivial match rate


def test_asof_matches_brute_string_keys(ray_session):
    left, right = _make(13, key_fn=lambda i: f"https://host-{int(i)}.example/x")
    got = _run_asof(left, right, pa.string())
    assert got == _brute_asof(left, right)


def test_asof_ts_ties_pick_max_tiebreak(ray_session):
    # two right rows share (key, ts); the greater tie column must win
    left = [(1, 100, 0)]
    right = [(1, 100, 5, 0.5), (1, 100, 9, 4.5), (1, 99, 7, 3.5)]
    got = _run_asof(left, right, pa.int64())
    assert got == [(1, 100, 0, 9, 4.5)]


def test_asof_inner_drops_unmatched(ray_session):
    left = [(1, 50, 0), (2, 50, 1)]  # key 2 has no right row; key 1 only later rows
    right = [(1, 60, 3, 1.5)]
    got = _run_asof(left, right, pa.int64())
    assert got == []


def test_asof_rejects_column_collision(ray_session):
    from etl_ray.stages.asof import asof_join

    t = pa.table({"k": [1], "ts": [1], "x": [1]})
    with pytest.raises(ValueError):
        asof_join(
            ray.data.from_arrow(t),
            ray.data.from_arrow(t),
            on="k",
            left_ts="ts",
            right_ts="ts",
            tiebreak="x",
        )


def _brute_interval(left, right, lo, hi, k=None):
    out = []
    for key, lts, lval in left:
        cand = sorted(
            (r for r in right if r[0] == key and lts + lo <= r[1] <= lts + hi),
            key=lambda r: (r[1], r[2]),
        )
        if k is not None:
            cand = cand[-k:]
        for _, rts, tie, rval in cand:
            out.append((key, lts, lval, rts, tie, rval))
    return sorted(out)


def _run_interval(left, right, lo, hi, key_type, k=None):
    from etl_ray.stages.asof import interval_join

    lt = pa.table(
        {
            "k": pa.array([r[0] for r in left], key_type),
            "lts": pa.array([r[1] for r in left], pa.int64()),
            "lval": pa.array([r[2] for r in left], pa.int64()),
        }
    )
    rt = pa.table(
        {
            "k": pa.array([r[0] for r in right], key_type),
            "rts": pa.array([r[1] for r in right], pa.int64()),
            "tie": pa.array([r[2] for r in right], pa.int64()),
            "rval": pa.array([r[3] for r in right], pa.float64()),
        }
    )
    out = interval_join(
        ray.data.from_arrow(lt),
        ray.data.from_arrow(rt),
        on="k",
        left_ts="lts",
        right_ts="rts",
        lo_offset=lo,
        hi_offset=hi,
        max_matches=k,
        n_buckets=8,
    ).to_pandas()
    return sorted(
        (r.k, int(r.lts), int(r.lval), int(r.rts), int(r.tie), float(r.rval))
        for r in out.itertuples(index=False)
    )


def test_interval_join_matches_brute(ray_session):
    left, right = _make(17)
    got = _run_interval(left, right, -500, 200, pa.int64())
    assert got == _brute_interval(left, right, -500, 200)
    assert len(got) > 200  # non-trivial expansion


def test_interval_join_inclusive_bounds_and_empty(ray_session):
    left = [(1, 100, 0)]
    right = [(1, 50, 1, 0.5), (1, 100, 2, 1.5), (1, 101, 3, 2.5)]
    # window [lts-50, lts] inclusive both ends: rts 50 and 100 match, 101 not
    assert _run_interval(left, right, -50, 0, pa.int64()) == _brute_interval(
        left, right, -50, 0
    )
    # empty window
    assert _run_interval(left, right, -5, -3, pa.int64()) == []


def test_interval_join_max_matches_keeps_latest(ray_session):
    # max_matches truncation keeps the LATEST matches; ts ties are broken
    # toward the later-sorted (tie-larger) right row, matching the brute
    left, right = _make(19, n_left=200, n_right=400, n_keys=10)
    got = _run_interval(left, right, -2000, 0, pa.int64(), k=2)
    assert got == _brute_interval(left, right, -2000, 0, k=2)
