"""Baseline JPEG decoder (ml/jpeg.py) cross-checked against the JVM's
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


def test_baseline_jpegs_match_imageio(spark):
    checked = 0
    for path in FIXTURES:
        data = open(path, "rb").read()
        try:
            ours = decode_jpeg(data)
        except NotImplementedError:
            continue  # progressive fixtures are gated by design
        ref = _ref_pixels(spark, path)
        assert ours.shape == ref.shape, path
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert diff.mean() < 2.5, (path, diff.mean())
        assert np.percentile(diff, 99) <= 16, (path, np.percentile(diff, 99))
        checked += 1
    assert checked >= 3  # several baseline fixtures actually decoded


def test_progressive_gated():
    prog = [p for p in FIXTURES if "grayscale" in p]
    if not prog:
        pytest.skip("no progressive fixture")
    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg(open(prog[0], "rb").read())


def test_truncated_stream_returns_partial():
    baseline = None
    for path in FIXTURES:
        data = open(path, "rb").read()
        try:
            full = decode_jpeg(data)
            baseline = (data, full)
            break
        except NotImplementedError:
            continue
    if baseline is None:
        pytest.skip("no baseline fixture")
    data, full = baseline
    part = decode_jpeg(data[: len(data) // 2])
    assert part.shape == full.shape  # dimensions from the header survive


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02\x03")


def test_multimodal_routes_jpeg():
    from hydra_spark.ml.multimodal import decode_image

    for path in FIXTURES:
        data = open(path, "rb").read()
        try:
            px = decode_image(data)
        except NotImplementedError:
            continue
        assert px.dtype == np.uint8 and px.ndim == 3
        return
    pytest.skip("no baseline fixture")
