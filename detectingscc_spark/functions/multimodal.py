"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode step is STUBBED (codec libraries are not in this container):
`decode_image` raises NotImplementedError unless `fake=True`, in which
case a deterministic fake decoder derives a fixed-shape feature vector
from the bytes themselves. Everything Spark-side — schema, Arrow batch
shape, mapInPandas signature, partitioning — is real and tested, so a
real decoder drops in by replacing one function body.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, kind string, meta struct<width:int,height:int,sample_rate:int>, payload binary"


def synthetic_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("id") % 3 + 1).cast("int")).alias("kind"),
        F.struct(
            (F.col("id") % 32 + 16).cast("int").alias("width"),
            (F.col("id") % 24 + 16).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
        F.sha2(F.concat(F.lit(f"media-{seed}-"), F.col("id")), 256).cast("binary").alias("payload"),
    )
    return df


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real codec: stretch a sha256 stream of
    the payload into `dim` floats in [0,1)."""
    out = np.empty(dim, dtype=np.float64)
    h = payload or b""
    i = 0
    while i < dim:
        h = hashlib.sha256(h).digest()
        chunk = np.frombuffer(h, dtype=np.uint8).astype(np.float64) / 256.0
        take = min(dim - i, len(chunk))
        out[i : i + take] = chunk[:take]
        i += take
    return out


def extract_features(media: DataFrame, dim: int = 16, fake: bool = True) -> DataFrame:
    """(media_id, kind, feature: array<double>) via Arrow-batched
    mapInPandas. With fake=False this is where a real image/audio decoder
    would run (per-batch, vectorized)."""
    if not fake:
        raise NotImplementedError(
            "real media decoding requires codec libraries not present in this "
            "environment; run with fake=True for the deterministic stub"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [list(_fake_decode(p, dim)) for p in pdf["payload"].values]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].values, "kind": pdf["kind"].values, "feature": feats}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        decode, schema="media_id long, kind string, feature array<double>"
    )


def frame_sample(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Pretend-frame sampling for video rows: emits (media_id, frame_idx)
    for frames 0, every_n, 2*every_n ... bounded by meta.width (stand-in
    for frame count). Pure built-ins — the sampling plan itself is real."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("meta.width") - 1, F.lit(every_n))).alias("frame_idx"),
        )
    )
