"""HyperLogLog sketch: deterministic, order/parallelism-free, within the
published error bound vs exact distinct counts."""

import numpy as np
import pyarrow as pa
import pytest

from etl_ray.stages.sketch import hll_estimate, hll_merge, hll_partial


def _err(est: float, truth: int) -> float:
    return abs(est - truth) / max(truth, 1)


@pytest.mark.parametrize("n_distinct", [100, 5_000, 200_000])
def test_hll_error_bound_int_keys(n_distinct):
    rng = np.random.default_rng(7)
    vals = rng.integers(0, n_distinct, size=n_distinct * 3)  # dups included
    truth = len(np.unique(vals))
    regs = hll_partial(pa.array(vals, pa.int64()), p=14)
    # 5 sigma of the 1.04/sqrt(m) standard error
    assert _err(hll_estimate(regs), truth) < 5 * 1.04 / np.sqrt(1 << 14)


def test_hll_string_keys_and_null_skip():
    urls = pa.array(
        [f"https://e.com/{i}" for i in range(10_000)] + [None] * 50, pa.string()
    )
    est = hll_estimate(hll_partial(urls, p=14))
    assert _err(est, 10_000) < 0.05


def test_hll_merge_equals_single_pass_and_order_free():
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 50_000, size=120_000)
    whole = hll_partial(pa.array(vals, pa.int64()))
    chunks = np.array_split(vals, 7)
    parts = [hll_partial(pa.array(c, pa.int64())) for c in chunks]
    assert np.array_equal(hll_merge(parts), whole)
    assert np.array_equal(hll_merge(parts[::-1]), whole)


def test_hll_deterministic_across_calls():
    vals = pa.array(list(range(1000)), pa.int64())
    assert np.array_equal(hll_partial(vals), hll_partial(vals))


def test_hll_small_range_linear_counting():
    est = hll_estimate(hll_partial(pa.array(list(range(30)), pa.int64())))
    assert round(est) == 30  # linear counting is near-exact here


def test_approx_distinct_dataset(ray_session):
    import ray

    from etl_ray.stages.sketch import approx_distinct

    ds = ray.data.range(100_000)  # column "id", all distinct
    est = approx_distinct(ds, "id", p=14)
    assert _err(est, 100_000) < 0.05


def test_heavy_hitters_superset_and_bounds(ray_session):
    import numpy as np
    import ray

    # skewed corpus: zipf-ish — a few hot items dominate
    rng = np.random.default_rng(3)
    hot = np.repeat([f"hot{i}" for i in range(5)], [40_000, 20_000, 10_000, 5_000, 2_500])
    cold = np.array([f"cold{i}" for i in rng.integers(0, 50_000, size=80_000)])
    vals = np.concatenate([hot, cold])
    rng.shuffle(vals)
    t = pa.table({"w": pa.array(vals.tolist(), pa.string())})
    ds = ray.data.from_arrow(t).repartition(8)

    from etl_ray.stages.sketch import heavy_hitters

    out = heavy_hitters(ds, "w", k=10, m=2048)
    got = dict(zip(out["item"].to_pylist(), out["count_lo"].to_pylist()))
    # exact truth
    import collections

    truth = collections.Counter(vals.tolist())
    for i in range(5):
        name = f"hot{i}"
        assert name in got  # superset property for real heavy hitters
        lo = got[name]
        hi = dict(zip(out["item"].to_pylist(), out["count_hi"].to_pylist()))[name]
        assert lo <= truth[name] <= hi  # bracket holds
    # hot items in rank order at the top
    assert out["item"].to_pylist()[:5] == [f"hot{i}" for i in range(5)]


def test_heavy_hitters_empty_batch(ray_session):
    """An empty block must not break the per-batch partial (round-3
    advice: pruned_max had length 1 on a 0-row batch)."""
    import ray

    from etl_ray.stages.sketch import heavy_hitters

    t = pa.table({"w": pa.array(["a", "a", "b"], pa.string())})
    empty = pa.table({"w": pa.array([], pa.string())})
    ds = ray.data.from_arrow([t, empty])
    out = heavy_hitters(ds, "w", k=2, m=16)
    assert out["item"].to_pylist() == ["a", "b"]
    assert out["count_lo"].to_pylist() == [2, 1]
