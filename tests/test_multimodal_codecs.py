"""Real numpy codecs: BMP / WAV / CBMV round trips and the decode-backed
resize + frame-sampling operators."""

from __future__ import annotations

import numpy as np
import pytest

from cie_spark.operators import multimodal as mm


@pytest.mark.parametrize("w,h", [(4, 4), (5, 3), (7, 2), (16, 12)])
def test_bmp_round_trip_exact(w, h):
    rng = np.random.default_rng(w * 100 + h)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (mm.decode_bmp(mm.encode_bmp(img)) == img).all()  # incl. row padding


def test_wav_round_trip_exact():
    samples = (np.sin(np.arange(4000) * 0.05) * 20000).astype(np.int16)
    out, rate = mm.decode_wav(mm.encode_wav(samples, 16000))
    assert rate == 16000
    assert (out == samples).all()


def test_cbmv_frame_walk():
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8) for _ in range(4)]
    payload = mm.encode_cbmv(frames, frame_ms=250)
    walked = list(mm.cbmv_frames(payload))
    assert [t for t, _ in walked] == [0, 250, 500, 750]
    for (_, blob), orig in zip(walked, frames):
        assert (mm.decode_bmp(blob) == orig).all()


def test_resize_nearest_shape_and_identity():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(10, 20, 3), dtype=np.uint8)
    out = mm.resize_nearest(img, 5, 40)
    assert out.shape == (40, 5, 3)
    assert (mm.resize_nearest(img, 20, 10) == img).all()  # same-size = identity


def test_resize_images_actually_resizes(spark):
    media = mm.synthesize_media(spark, n=9).cache()
    rows = mm.resize_images(media, width=32, height=24).collect()
    assert rows
    for r in rows:
        assert r.resized is True  # synthetic images are BMP -> real path
        img = mm.decode_bmp(bytes(r.payload))
        assert img.shape == (24, 32, 3)
        assert (r.meta.width, r.meta.height) == (32, 24)
    media.unpersist()


def test_sample_frames_returns_decodable_payloads(spark):
    media = mm.synthesize_media(spark, n=9)
    rows = mm.sample_frames(media, every_ms=100).collect()
    assert rows
    for r in rows:
        assert r.frame_payload is not None  # cbmv = real container walk
        img = mm.decode_bmp(bytes(r.frame_payload))
        assert img.shape == (8, 8, 3)


def test_unsupported_codec_is_declared():
    with pytest.raises(NotImplementedError, match="external library"):
        mm.decode_feature(b"\x89PNG...", "image", "png")


def test_feature_math_is_real():
    # a solid-red image must put all its mean energy in channel 0
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:, :, 0] = 255
    f = mm.decode_feature(mm.encode_bmp(img), "image", "bmp")
    assert f[0] == pytest.approx(1.0) and f[1] == 0.0 and f[2] == 0.0
    assert f[3] == f[4] == f[5] == 0.0  # zero variance per channel
