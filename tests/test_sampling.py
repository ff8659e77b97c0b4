"""Deterministic hash sampling: reproducibility, disjoint splits,
stratified rates, and block-layout independence."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from etl_ray.stages.sampling import (
    hash_sample,
    rate_threshold_hex,
    sample_mask,
    split,
    stratified_mask,
    stratified_sample,
)


def _docs(n=2000):
    rng = np.random.default_rng(11)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(rng.choice(["en", "de", "zh"], size=n).tolist()),
        }
    )


def test_mask_deterministic_and_rate():
    t = _docs()
    m1 = sample_mask(t, "doc_id", 0.25)
    m2 = sample_mask(t, "doc_id", 0.25)
    assert (m1 == m2).all()
    assert 0.18 < m1.mean() < 0.32  # binomial(2000, .25) well within 6 sigma
    # monotone in rate: a smaller sample is a subset of a larger one
    m_small = sample_mask(t, "doc_id", 0.1)
    assert (m_small <= m1).all()


def test_rate_edges():
    t = _docs(200)
    assert not sample_mask(t, "doc_id", 0.0).any()
    assert sample_mask(t, "doc_id", 1.0).all()
    assert rate_threshold_hex(0.25) == "40000000"


def test_salts_give_independent_samples():
    t = _docs()
    a = sample_mask(t, "doc_id", 0.5, salt="a:")
    b = sample_mask(t, "doc_id", 0.5, salt="b:")
    assert (a != b).any()
    # overlap ~= product of rates, not equality
    assert 0.15 < (a & b).mean() < 0.35


def test_stratified_rates_per_group():
    t = _docs()
    m = stratified_mask(t, "doc_id", "lang", {"en": 0.0, "zh": 1.0}, default_rate=0.5)
    lang = np.array(t.column("lang").to_pylist())
    assert not m[lang == "en"].any()
    assert m[lang == "zh"].all()
    de = m[lang == "de"].mean()
    assert 0.4 < de < 0.6


def test_dataset_sample_independent_of_block_layout(ray_session):
    t = _docs()
    one = hash_sample(ray.data.from_arrow(t), "doc_id", 0.3)
    many = hash_sample(
        ray.data.from_arrow(t).repartition(13), "doc_id", 0.3
    )
    ids_one = sorted(r["doc_id"] for r in one.take_all())
    ids_many = sorted(r["doc_id"] for r in many.take_all())
    assert ids_one == ids_many


def test_split_is_a_partition(ray_session):
    t = _docs()
    train, ev = split(ray.data.from_arrow(t), "doc_id", eval_rate=0.2)
    tr = {r["doc_id"] for r in train.take_all()}
    ev_ids = {r["doc_id"] for r in ev.take_all()}
    assert not (tr & ev_ids)
    assert len(tr) + len(ev_ids) == t.num_rows
    assert 0.12 < len(ev_ids) / t.num_rows < 0.28


def test_stratified_dataset_matches_mask(ray_session):
    t = _docs()
    rates = {"en": 0.125, "zh": 1.0}
    ds = stratified_sample(
        ray.data.from_arrow(t), "doc_id", "lang", rates, default_rate=0.5
    )
    got = sorted(r["doc_id"] for r in ds.take_all())
    want = (
        t.column("doc_id")
        .to_numpy()[stratified_mask(t, "doc_id", "lang", rates, default_rate=0.5)]
        .tolist()
    )
    assert got == want


def test_string_keys_supported():
    t = pa.table({"url": pa.array([f"https://x.org/{i}" for i in range(500)])})
    m = sample_mask(t, "url", 0.5)
    assert 0.35 < m.mean() < 0.65
