"""Pure-stdlib PNG/WAV codecs: roundtrip exactness across every filter,
corruption detection, resize semantics, and the actor-pool decode stages
over the real-media fixture."""

import numpy as np
import pytest

from etl_ray.stages.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    png_info,
    resize_nearest,
)


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_roundtrip_every_filter_and_channel_count(filt, channels):
    rng = np.random.default_rng(filt * 10 + channels)
    arr = rng.integers(0, 256, size=(23, 17, channels)).astype(np.uint8)
    data = encode_png(arr, filter_type=filt)
    assert png_info(data) == (17, 23, channels)
    out = decode_png(data)
    assert out.shape == (23, 17, channels)
    assert np.array_equal(out, arr)


def test_png_gradient_roundtrip():
    # non-random content is where filter math errors actually show
    y, x = np.mgrid[0:40, 0:40]
    arr = np.stack([y * 6, x * 6, (y + x) * 3], axis=-1).astype(np.uint8)
    for filt in range(5):
        assert np.array_equal(decode_png(encode_png(arr, filt)), arr)


def test_png_rejects_garbage_and_corruption():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x00" * 64)
    good = encode_png(np.zeros((4, 4, 3), np.uint8))
    bad = bytearray(good)
    bad[40] ^= 0xFF  # flip a byte inside IDAT -> chunk CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(3)
    mono = rng.integers(-30000, 30000, size=500).astype(np.int16)
    s, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and s.shape == (500, 1)
    assert np.array_equal(s[:, 0], mono)
    stereo = rng.integers(-30000, 30000, size=(300, 2)).astype(np.int16)
    s2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and np.array_equal(s2, stereo)


def test_resize_nearest_semantics():
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    up = resize_nearest(arr, 8, 8)
    assert up.shape == (8, 8, 1)
    # each source pixel becomes a 2x2 block
    assert np.array_equal(up[0:2, 0:2, 0], np.zeros((2, 2), np.uint8))
    down = resize_nearest(up, 4, 4)
    assert np.array_equal(down, arr)


def test_image_decoder_real_path_matches_fixture(ray_session):
    import ray
    import zlib

    from etl_ray.stages.multimodal import ImageDecoder, make_real_media_table

    t = make_real_media_table(n_images=15, n_audio=0)
    out = (
        ray.data.from_arrow(t)
        .map_batches(
            ImageDecoder,
            fn_constructor_kwargs={"fake": False},
            batch_format="pyarrow",
            batch_size=8,
            concurrency=(1, 2),
        )
        .take_all()
    )
    for r in out:
        assert r["dec_width"] == r["width"]
        assert r["dec_height"] == r["height"]
        assert r["dec_channels"] == r["channels"]
        assert r["dec_crc32"] == r["crc32_pre"]


def test_image_decoder_strict_raises_on_non_png():
    import pyarrow as pa

    from etl_ray.stages.multimodal import ImageDecoder

    dec = ImageDecoder(fake=False)
    batch = pa.table({"payload": pa.array([b"\xff\xd8\xff not a png"], pa.binary())})
    with pytest.raises(ValueError, match="unsupported image format"):
        dec(batch)


def test_image_resizer_roundtrips_through_png(ray_session):
    import ray
    import zlib

    from etl_ray.stages.multimodal import ImageResizer, make_real_media_table

    t = make_real_media_table(n_images=6, n_audio=0)
    out = (
        ray.data.from_arrow(t)
        .map_batches(
            ImageResizer,
            fn_constructor_kwargs={"out_h": 8, "out_w": 8},
            batch_format="pyarrow",
            batch_size=4,
            concurrency=(1, 2),
        )
        .take_all()
    )
    for r in out:
        thumb = decode_png(r["thumb"])
        assert thumb.shape[:2] == (8, 8)
        assert zlib.crc32(thumb.tobytes()) & 0xFFFFFFFF == r["thumb_crc32"]


def test_audio_features_match_fixture(ray_session):
    import ray

    from etl_ray.stages.multimodal import AudioFeatures, make_real_media_table

    t = make_real_media_table(n_images=0, n_audio=8)
    out = (
        ray.data.from_arrow(t)
        .map_batches(
            AudioFeatures, batch_format="pyarrow", batch_size=4, concurrency=(1, 2)
        )
        .take_all()
    )
    for r in out:
        assert r["dec_rate"] == r["sample_rate"]
        assert r["dec_crc32"] == r["crc32_pre"]
        assert r["dec_samples"] == r["n_samples"]
        assert r["dec_channels"] == r["channels"]
        assert r["dec_peak"] == r["peak"]
