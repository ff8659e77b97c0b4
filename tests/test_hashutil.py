"""stages/hashutil: vectorized byte hashing — no Ray needed."""

import numpy as np
import pyarrow as pa

from etl_ray.stages.hashutil import bytes_poly_hash, hash64, hash_bucket, mix64


def test_bytes_poly_hash_distinguishes_content():
    vals = ["", "a", "b", "ab", "ba", "a\x00", "\x00a", "aa", None, "aaa"]
    arr = pa.array(vals, pa.string())
    h = bytes_poly_hash(arr)
    # all non-null distinct strings hash differently (tiny set, no collisions)
    non_null = [h[i] for i, v in enumerate(vals) if v is not None]
    assert len(set(non_null)) == len(non_null)
    # deterministic across calls and across chunking
    chunked = pa.chunked_array([pa.array(vals[:4], pa.string()), pa.array(vals[4:], pa.string())])
    assert np.array_equal(bytes_poly_hash(chunked), h)


def test_bytes_poly_hash_matches_sliced_array():
    # hashes must ignore the arrow array offset (sliced buffers)
    arr = pa.array(["xx", "hello", "world", "yy"], pa.string())
    full = bytes_poly_hash(arr)
    sliced = bytes_poly_hash(arr.slice(1, 2))
    assert np.array_equal(sliced, full[1:3])


def test_hash64_int_vs_string_types():
    ints = pa.array([0, 1, -1, 2**40], pa.int64())
    hi = hash64(ints)
    assert len(set(hi.tolist())) == 4
    # binary columns route through the byte hash
    b = pa.array([b"\x01\x02", b"\x01\x03"], pa.binary())
    hb = hash64(b)
    assert hb[0] != hb[1]


def test_hash_bucket_bounds_and_determinism():
    keys = pa.array([f"url-{i}" for i in range(1000)], pa.string())
    b1 = hash_bucket(keys, 64).to_numpy()
    b2 = hash_bucket(keys, 64).to_numpy()
    assert np.array_equal(b1, b2)
    assert b1.min() >= 0 and b1.max() < 64
    # reasonable spread: no bucket holds more than 10% of 1000 keys
    assert np.bincount(b1, minlength=64).max() < 100


def test_mix64_wraps_without_error():
    x = np.array([0, 1, 2**63, 2**64 - 1], np.uint64)
    out = mix64(x.copy())
    assert out.dtype == np.uint64
    assert len(set(out.tolist())) == 4
