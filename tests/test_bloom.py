"""Distributed Bloom filter: no false negatives, bounded FP rate,
order-free merge; semi/anti joins stay exact through the prefiltered
shuffle path."""

import numpy as np
import pyarrow as pa
import pytest

from etl_ray.stages.bloom import (
    bloom_build,
    bloom_contains,
    bloom_merge,
    bloom_params,
    bloom_partial,
)


def test_no_false_negatives_and_fp_bound():
    keys = pa.array([f"https://k.example.com/{i}" for i in range(50_000)])
    m, k = bloom_params(50_000)
    words = bloom_partial(keys, m, k)
    assert bloom_contains(words, keys, k).all()  # every inserted key hits
    probes = pa.array([f"https://other.example.com/{i}" for i in range(50_000)])
    fp = bloom_contains(words, probes, k).mean()
    assert fp < 0.03  # ~1% design point at 10 bits/key


def test_merge_equals_single_pass_and_order_free():
    a = pa.array([f"u{i}" for i in range(10_000)])
    b = pa.array([f"v{i}" for i in range(10_000)])
    m, k = bloom_params(20_000)
    whole = bloom_partial(pa.concat_arrays([a, b]), m, k)
    pa_, pb = bloom_partial(a, m, k), bloom_partial(b, m, k)
    assert np.array_equal(bloom_merge([pa_, pb]), whole)
    assert np.array_equal(bloom_merge([pb, pa_]), whole)


def test_int_keys_supported():
    keys = pa.array(np.arange(1000), pa.int64())
    m, k = bloom_params(1000)
    words = bloom_partial(keys, m, k)
    assert bloom_contains(words, keys, k).all()


def test_bloom_build_dataset(ray_session):
    import ray

    ds = ray.data.range(20_000).materialize()  # column "id"
    words, k = bloom_build(ds, "id", n_keys=20_000)
    hit = bloom_contains(words, pa.array(np.arange(20_000), pa.int64()), k)
    assert hit.all()


@pytest.mark.parametrize("anti", [False, True])
def test_key_filter_join_bloom_shuffle_path_exact(ray_session, anti, monkeypatch):
    import ray

    from etl_ray.stages.joins import key_filter_join

    monkeypatch.setenv("ETLRAY_BROADCAST_LIMIT", "0")  # force shuffle path
    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(list(range(5000)), pa.int64()),
                "payload": pa.array([f"p{i}" for i in range(5000)]),
            }
        )
    )
    keys = ray.data.from_arrow(
        pa.table({"k": pa.array(list(range(0, 5000, 7)), pa.int64())})
    )
    out = key_filter_join(left, keys, left_on="k", right_on="k", anti=anti)
    got = sorted(r["k"] for r in out.take_all())
    member = set(range(0, 5000, 7))
    expect = sorted(
        i for i in range(5000) if (i not in member) if anti
    ) if anti else sorted(i for i in range(5000) if i in member)
    assert got == expect
