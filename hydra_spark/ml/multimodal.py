"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video assets travel as `binary` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched `mapInPandas` stages. The actual codec work is STUBBED
(no image/audio libraries in this container): `decode_image` raises
NotImplementedError unless `fake=True`, in which case a deterministic
byte-histogram "feature" is produced — the Spark-side plumbing (schema,
partitioning, UDF signatures, batch shapes) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Real decode needs PIL/libvips — not in this container."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an image library (PIL/libvips); "
            "run with fake=True for the deterministic stand-in"
        )
    # deterministic stand-in: 16-bin byte histogram, L1-normalized
    a = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(a >> 4, minlength=16).astype(np.float32)
    return hist / max(hist.sum(), 1.0)


def extract_features(assets: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction — one Arrow batch at a time, no
    shuffle; the decode itself is the stub above."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                nbytes.append(len(b))
                feats.append(decode_image(b, fake=fake).tolist() if b else None)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": nbytes,
                    "features": feats,
                }
            )

    return assets.mapInPandas(gen, schema=FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Frame sampling for video assets: emits one row per sampled frame
    (frame payload = stubbed slice of the source bytes). Real frame
    extraction would shell to ffmpeg per Arrow batch."""
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_ts_ms", T.IntegerType(), False),
            T.StructField("frame_payload", T.BinaryType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, mt, payload, meta in pdf[
                ["asset_id", "media_type", "payload", "meta"]
            ].itertuples(index=False):
                if mt != "video" or payload is None or meta is None:
                    continue
                if not fake:
                    raise NotImplementedError("video decode requires ffmpeg")
                duration = meta["duration_ms"] or 0
                n = max(duration // every_ms, 0)
                b = bytes(payload)
                for i in range(n):
                    lo = (i * len(b)) // max(n, 1)
                    rows.append((int(aid), i, i * every_ms, b[lo : lo + 64]))
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_idx", "frame_ts_ms", "frame_payload"]
            )

    return assets.mapInPandas(gen, schema=out_schema)


def synthetic_assets(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic asset table for tests/bench (payload = repeated
    hash bytes; metadata typed)."""
    df = spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.encode(
            F.repeat(F.md5(F.concat(F.lit(seed), F.col("id"))), 8), "UTF-8"
        ).alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            (F.pmod(F.col("id"), F.lit(5)) * 1000 + 2000).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )
    return df
