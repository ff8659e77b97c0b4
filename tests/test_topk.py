"""Grouped top-k vs a brute-force reference."""

import numpy as np
import pyarrow as pa

import ray


def _brute_topk(rows, k):
    """rows = (group, val, uid) -> top-k per group by (val desc, uid desc)."""
    by_group = {}
    for g, v, u in rows:
        by_group.setdefault(g, []).append((v, u))
    out = []
    for g, items in by_group.items():
        items.sort(key=lambda t: (-t[0], -t[1]))
        for rk, (v, u) in enumerate(items[:k], 1):
            out.append((g, v, u, rk))
    return sorted(out)


def _run(rows, k, group_type):
    from etl_ray.stages.topk import grouped_topk

    t = pa.table(
        {
            "g": pa.array([r[0] for r in rows], group_type),
            "val": pa.array([r[1] for r in rows], pa.float64()),
            "uid": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    out = grouped_topk(
        ray.data.from_arrow(t),
        group_col="g",
        order_by=[("val", "desc"), ("uid", "desc")],
        k=k,
        n_buckets=16,
    ).to_pandas()
    return sorted(
        (r.g, float(r.val), int(r.uid), int(r.rk)) for r in out.itertuples(index=False)
    )


def test_grouped_topk_matches_brute(ray_session):
    rng = np.random.default_rng(5)
    rows = [
        (int(rng.integers(50)), float(rng.integers(100)), i) for i in range(2000)
    ]
    assert _run(rows, 3, pa.int64()) == _brute_topk(rows, 3)


def test_grouped_topk_string_groups_small_groups(ray_session):
    # groups smaller than k keep all rows; value ties break on uid desc
    rows = [("a", 1.0, 1), ("a", 1.0, 2), ("b", 9.0, 3)]
    got = _run(rows, 5, pa.string())
    assert got == [("a", 1.0, 1, 2), ("a", 1.0, 2, 1), ("b", 9.0, 3, 1)]
