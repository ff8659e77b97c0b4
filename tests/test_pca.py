"""Distributed PCA == single-matrix numpy PCA (same arithmetic), plus
basis invariants: orthonormality, descending explained variance,
deterministic sign, and exact projection given the fitted basis."""

import numpy as np
import pyarrow as pa


def _ds(m, ids):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in m], pa.list_(pa.float32())
                ),
            }
        )
    ).repartition(6)


def test_pca_matches_numpy_reference(ray_session):
    from etl_ray.stages.similarity import pca_fit, pca_project

    rng = np.random.default_rng(17)
    d, n, k = 16, 4_000, 3
    # anisotropic data so the spectrum is well separated
    base = rng.normal(size=(n, d)) * np.linspace(5.0, 0.3, d)
    m = (base @ rng.normal(size=(d, d))).astype(np.float32)
    ds = _ds(m, np.arange(n))

    mean, w, ev = pca_fit(ds, "embedding", k=k)

    x = m.astype(np.float64)
    ref_mean = x.mean(axis=0)
    ref_cov = np.cov(x, rowvar=False)
    rl, rv = np.linalg.eigh(ref_cov)
    order = np.argsort(rl)[::-1][:k]
    ref_w = rv[:, order]
    piv = np.argmax(np.abs(ref_w), axis=0)
    ref_w = ref_w * np.sign(ref_w[piv, np.arange(k)])

    assert np.allclose(mean, ref_mean, atol=1e-8)
    assert np.allclose(ev, rl[order], rtol=1e-8)
    assert np.allclose(w, ref_w, atol=1e-6)

    # invariants
    assert np.allclose(w.T @ w, np.eye(k), atol=1e-10)  # orthonormal
    assert ev[0] >= ev[1] >= ev[2] > 0

    got = (
        pca_project(ds, mean, w)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    proj = (x - mean) @ w
    assert np.allclose(got[["pc1", "pc2", "pc3"]].to_numpy(), proj, atol=1e-8)
    # variance along pc1 ~ top eigenvalue
    assert abs(np.var(proj[:, 0], ddof=1) - ev[0]) / ev[0] < 1e-6


def test_pca_deterministic_across_block_layouts(ray_session):
    from etl_ray.stages.similarity import pca_fit

    rng = np.random.default_rng(3)
    m = rng.normal(size=(1_000, 8)).astype(np.float32)
    a = pca_fit(_ds(m, np.arange(1_000)), "embedding", k=2)
    b = pca_fit(
        _ds(m, np.arange(1_000)).repartition(1), "embedding", k=2
    )
    assert np.allclose(a[0], b[0], atol=1e-9)
    assert np.allclose(a[1], b[1], atol=1e-7)
