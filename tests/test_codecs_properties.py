"""Property tests (hypothesis): codec roundtrips over arbitrary shapes
and content; canonicalization idempotence over adversarial URL-ish
strings."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_ray.stages.codecs import decode_png, decode_wav, encode_png, encode_wav
from etl_ray.stages.urlops import canonicalize_urls


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.sampled_from([1, 3, 4]),
    filt=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, c, filt, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, c)).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(arr, filter_type=filt)), arr)


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 600),
    ch=st.integers(1, 3),
    rate=st.sampled_from([8000, 22050, 48000]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-(2**15), 2**15, size=(n, ch)).astype(np.int16)
    out, got_rate = decode_wav(encode_wav(samples, rate))
    assert got_rate == rate
    assert np.array_equal(out, samples)


_URLISH = st.text(
    alphabet="abcXYZ019:/?&=#_.%-", min_size=0, max_size=60
) | st.builds(
    lambda scheme, host, port, path, params, frag: f"{scheme}://{host}{port}{path}{params}{frag}",
    scheme=st.sampled_from(["http", "https", "HTTP", "HTTPS", "ftp"]),
    host=st.sampled_from(["A.b.COM", "x.y.io", "W-W.Example.ORG"]),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=st.sampled_from(["", "/", "/P/x", "/a%20b"]),
    params=st.sampled_from(
        ["", "?a=1", "?utm_source=t", "?utm_a=1&b=2", "?b=2&utm_c=3&d=4"]
    ),
    frag=st.sampled_from(["", "#f", "#a?b&c"]),
)


@settings(max_examples=60, deadline=None)
@given(url=_URLISH)
def test_canonicalize_idempotent_property(url):
    t = pa.table({"url": pa.array([url], pa.string())})
    once = canonicalize_urls(t).column("url_canon").to_pylist()[0]
    twice = (
        canonicalize_urls(pa.table({"url": pa.array([once], pa.string())}))
        .column("url_canon")
        .to_pylist()[0]
    )
    assert twice == once
    # canonical URLs never keep fragments or utm params
    assert "#" not in once or "://" not in url
    if "://" in once:
        assert "utm_" not in once.split("?")[-1] or "?" not in once
