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


# ---------------------------------------------------------------------------
# mergeable quantile summary
# ---------------------------------------------------------------------------


def _rank_bounds(sorted_exact, value):
    """[lo, hi] ranks a value could occupy in the exact sorted array."""
    import numpy as np

    lo = int(np.searchsorted(sorted_exact, value, side="left"))
    hi = int(np.searchsorted(sorted_exact, value, side="right"))
    return lo, hi


def test_quantile_sketch_rank_bound_and_merge_laws():
    import numpy as np
    import pyarrow as pa

    from etl_ray.stages.sketch import quantile_merge_estimate, quantile_partial

    rng = np.random.default_rng(5)
    # skewed data: lognormal + heavy point mass (ties stress the bound)
    v = np.concatenate(
        [rng.lognormal(0, 2, 30_000), np.full(5_000, 7.25)]
    )
    rng.shuffle(v)
    n = len(v)
    m = 256
    blocks = np.array_split(v, 13)  # uneven block sizes
    partials = [quantile_partial(pa.array(b), m) for b in blocks]
    eps = sum(len(b) / min(m, len(b)) for b in blocks)  # deterministic bound
    exact = np.sort(v)
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    est = quantile_merge_estimate(partials, qs)
    for q, e in zip(qs, est):
        lo, hi = _rank_bounds(exact, e)
        target = q * n
        assert lo - eps <= target <= hi + eps, (q, e, lo, hi, target, eps)

    # merge is order-free
    import random

    shuffled = partials[:]
    random.Random(1).shuffle(shuffled)
    assert quantile_merge_estimate(shuffled, qs) == est
    # deterministic: rebuilding partials reproduces identical estimates
    partials2 = [quantile_partial(pa.array(b), m) for b in blocks]
    assert quantile_merge_estimate(partials2, qs) == est


def test_quantile_sketch_exact_when_m_covers_block():
    import numpy as np
    import pyarrow as pa

    from etl_ray.stages.sketch import quantile_merge_estimate, quantile_partial

    rng = np.random.default_rng(9)
    v = rng.normal(0, 1, 400)
    p = quantile_partial(pa.array(v), m=1000)  # m >= n: keeps everything
    exact = np.sort(v)
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        est = quantile_merge_estimate([p], [q])[0]
        want = exact[int(np.floor(q * (len(v) - 1)))]
        assert est == want, (q, est, want)


def test_approx_quantiles_dataset_path(ray_session):
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from etl_ray.stages.sketch import approx_quantiles

    t = pq.read_table("/root/testdata/sf0.001/events.parquet", columns=["value"])
    ds = ray.data.from_arrow(t).repartition(7)
    out = approx_quantiles(ds, "value", [0.25, 0.5, 0.75], m=128)
    exact = np.sort(t.column("value").to_numpy())
    n = len(exact)
    eps = 7 * (n / 7) / 128 + 7  # sum over blocks of n_b/m + rounding slack
    for q, e in zip(
        out.column("q").to_pylist(), out.column("value").to_pylist()
    ):
        lo = np.searchsorted(exact, e, "left")
        hi = np.searchsorted(exact, e, "right")
        assert lo - eps <= q * n <= hi + eps


def test_exact_topk_frequent_matches_groupby(ray_session):
    """Zipf-ish data: two-pass certified path returns the EXACT top-k
    (same as a full groupby) under the (count DESC, item ASC) order."""
    import collections

    import ray

    from etl_ray.stages.sketch import exact_topk_frequent

    rng = np.random.default_rng(11)
    vals = (rng.zipf(1.5, size=40_000) % 500).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"k": vals})).repartition(8)
    got = exact_topk_frequent(ds, "k", k=10, m=256)
    truth = sorted(
        ((str(k), v) for k, v in collections.Counter(vals.tolist()).items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    assert list(zip(got["item"].to_pylist(), got["cnt"].to_pylist())) == truth


def test_exact_topk_frequent_flat_fallback(ray_session):
    """Adversarially flat distribution with tiny m: the certificate
    fails and the groupby fallback still yields the exact answer."""
    import collections

    import ray

    from etl_ray.stages.sketch import exact_topk_frequent

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 2_000, size=20_000)  # near-uniform
    ds = ray.data.from_arrow(pa.table({"k": vals})).repartition(16)
    got = exact_topk_frequent(ds, "k", k=5, m=8)  # m << distinct → fallback
    truth = sorted(
        ((str(k), v) for k, v in collections.Counter(vals.tolist()).items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:5]
    assert list(zip(got["item"].to_pylist(), got["cnt"].to_pylist())) == truth


def test_cms_one_sided_bound_and_merge(ray_session):
    """Count-Min: never undercounts, overcount bounded by eN/w w.h.p.,
    partial sums merge order-free, deterministic across runs."""
    import collections

    import ray

    from etl_ray.stages.sketch import approx_counts, cms_estimate, cms_partial

    rng = np.random.default_rng(23)
    vals = (rng.zipf(1.3, size=60_000) % 2_000).astype(np.int64)
    truth = collections.Counter(vals.tolist())
    col = pa.array([str(v) for v in vals], pa.string())

    d, w = 4, 16384
    sk = cms_partial(col, d, w)
    # merge law: two halves sum to the whole
    sk2 = cms_partial(col[:30_000], d, w) + cms_partial(col[30_000:], d, w)
    assert (sk == sk2).all()

    probe = [str(k) for k in list(truth)[:200]]
    est = cms_estimate(sk, pa.array(probe, pa.string()), d)
    t = np.array([truth[int(k)] for k in probe])
    assert (est >= t).all()  # one-sided, always
    bound = np.e * len(vals) / w
    assert (est - t <= bound).mean() > 0.98  # 1 - e^-d ≈ 0.982

    # dataset path equals the local sketch on the same keys
    ds = ray.data.from_arrow(pa.table({"k": col})).repartition(8)
    got = approx_counts(ds, "k", probe[:20], d=d, w=w)
    assert got["est"].to_pylist() == est[:20].astype(int).tolist()
