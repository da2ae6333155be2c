"""JPEG decoder (ml/jpeg.py, baseline + progressive) cross-checked against the JVM's
ImageIO decoder via Spark's `image` data source — two independent
implementations agreeing within IDCT/chroma-upsample rounding."""

import glob
import os

import numpy as np
import pytest

from hydra_spark.ml.jpeg import decode_jpeg

FIXTURES = sorted(
    glob.glob(
        os.path.join(os.environ.get("SPARK_HOME", "/opt/spark"),
                     "data/mllib/images/origin/**/*.jpg"),
        recursive=True,
    )
)

pytestmark = pytest.mark.skipif(not FIXTURES, reason="no Spark sample JPEGs")


def _ref_pixels(spark, path):
    row = spark.read.format("image").load(path).select("image.*").first()
    ref = np.frombuffer(bytes(row.data), dtype=np.uint8).reshape(
        row.height, row.width, row.nChannels
    )
    return ref[:, :, ::-1] if row.nChannels == 3 else ref[:, :, 0]


EXTRA = [p for p in ("/usr/share/doc/nodejs/thin-white-stripe.jpg",
                     "/usr/share/doc/nodejs/full-white-stripe.jpg") if os.path.exists(p)]


def test_jpegs_match_imageio(spark):
    checked = 0
    for path in FIXTURES + EXTRA:
        data = open(path, "rb").read()
        ours = decode_jpeg(data)
        ref = _ref_pixels(spark, path)
        assert ours.shape == ref.shape, path
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert diff.mean() < 2.5, (path, diff.mean())
        assert np.percentile(diff, 99) <= 16, (path, np.percentile(diff, 99))
        checked += 1
    assert checked >= 5  # baseline AND progressive fixtures all decoded


def test_progressive_grayscale_decodes():
    prog = [p for p in FIXTURES if "grayscale" in p]
    if not prog:
        pytest.skip("no progressive fixture")
    px = decode_jpeg(open(prog[0], "rb").read())
    assert px.shape == (215, 300)  # SOF2, single component


def test_truncated_stream_returns_partial():
    data = open(FIXTURES[0], "rb").read()
    full = decode_jpeg(data)
    part = decode_jpeg(data[: len(data) // 2])
    assert part.shape == full.shape  # dimensions from the header survive


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02\x03")


def test_multimodal_routes_jpeg():
    from hydra_spark.ml.multimodal import decode_image

    data = open(FIXTURES[0], "rb").read()
    px = decode_image(data)
    assert px.dtype == np.uint8 and px.ndim == 3
