"""Multimodal crawl E2E: a media corpus (real PNG/WAV payloads) crawled
by the same frontier machinery, mime-sniffed from magic bytes, and fed
into the multimodal pipeline (header probe → real decode features →
resize)."""

import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from hydra_spark.config import DEFAULT
from hydra_spark.crawl.loop import init_state, run_crawl
from hydra_spark.datagen import generate_frontier, generate_media_pages
from hydra_spark.ml.multimodal import (
    decode_png,
    extract_features,
    probe_image_meta,
    resize_images,
)
from hydra_spark.storage import StateStore


@pytest.fixture(scope="module")
def crawled_media(spark):
    pages = generate_media_pages(spark, 60, n_hosts=6).cache()
    store = StateStore(tempfile.mkdtemp(prefix="hydra_media_"))
    init_state(store, generate_frontier(spark, pages))
    run_crawl(spark, store, pages, DEFAULT.with_(batch_size=60), rounds=1)
    return store, pages


def test_media_mime_sniffed_and_not_analysed(spark, crawled_media):
    store, _ = crawled_media
    checks = store.checks.read(spark)
    mimes = {r.mime_type for r in checks.select("mime_type").distinct().collect()}
    assert "image/png" in mimes and "audio/x-wav" in mimes
    # media payloads must NOT enter the tabular analysis path
    assert checks.where(
        F.col("mime_type").startswith("image/") & F.col("parsing_table").isNotNull()
    ).count() == 0
    assert checks.where(F.col("mime_type") == "image/png").count() == 30
    assert checks.where(F.col("mime_type") == "audio/x-wav").count() == 30


def test_media_pipeline_over_crawled_payloads(spark, crawled_media):
    _, pages = crawled_media
    assets = pages.select(
        F.xxhash64("url").alias("asset_id"),
        F.when(F.col("url").endswith(".png"), F.lit("image"))
        .otherwise(F.lit("audio")).alias("media_type"),
        F.col("html").alias("payload"),
    )
    meta = probe_image_meta(assets.where("media_type = 'image'"))
    probed = meta.where((F.col("format") == "png") & (F.col("width") == 10)
                        & (F.col("height") == 12)).count()
    assert probed == 30

    feats = extract_features(assets, fake=False)
    rows = feats.collect()
    assert len(rows) == 60
    for r in rows:
        assert r.features is not None and len(r.features) == 16
        assert abs(sum(r.features[4:]) - 1.0) < 1e-3 if r.media_type == "audio" else True

    resized = resize_images(assets.where("media_type = 'image'"), 6, 6).collect()
    assert all(r.width == 6 for r in resized)
    px = decode_png(bytes(resized[0].payload))
    assert px.shape == (6, 6, 3)
