"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

Two decode paths behind the same Arrow mapInPandas seam:

  fake=True   deterministic stand-in (sha256-stream features) — exercises
              schema/batch-shape/partitioning without codec deps.
  fake=False  REAL pure-stdlib decoders: binary PPM (P6) images and RIFF
              PCM16 WAV audio, dispatched on magic bytes per payload.
              Heavier codecs (JPEG/MP3/H.264) are not in this container;
              they would slot into _REAL_DECODERS the same way.

`encode_ppm` / `encode_wav` build real byte-exact fixtures so tests can
round-trip decode without any media library.
"""

from __future__ import annotations

import hashlib
import struct
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


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Binary PPM (P6) encoder: header + raw RGB triplets. `pixels` must
    be exactly width*height*3 bytes."""
    if len(pixels) != width * height * 3:
        raise ValueError("encode_ppm: pixels must be width*height*3 bytes")
    return f"P6\n{width} {height}\n255\n".encode() + pixels


def encode_wav(samples: list[int], sample_rate: int = 16000, channels: int = 1) -> bytes:
    """Minimal RIFF/WAVE encoder: PCM16 mono/stereo, fmt + data chunks."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * channels * 2, channels * 2, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_ppm(payload: bytes, dim: int) -> np.ndarray:
    """Parse a binary PPM (P6) image and derive `dim` scalar features:
    [width, height, maxval, mean/std per RGB channel (0-1), global
    min/max/mean, luma mean] zero-padded. Header per the Netpbm spec:
    ASCII tokens separated by whitespace, `#` comments allowed."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # tokenize the header: magic, width, height, maxval
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raw pixel data
    w, h, maxval = tokens
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    rgb = px.reshape(h, w, 3).astype(np.float64) / maxval
    out = np.zeros(dim, dtype=np.float64)
    vals = [
        float(w), float(h), float(maxval),
        *rgb.mean(axis=(0, 1)).tolist(), *rgb.std(axis=(0, 1)).tolist(),
        float(rgb.min()), float(rgb.max()), float(rgb.mean()),
        float((rgb * [0.299, 0.587, 0.114]).sum(axis=2).mean()),
    ]
    out[: min(dim, len(vals))] = vals[:dim]
    return out


def _decode_wav(payload: bytes, dim: int) -> np.ndarray:
    """Parse a RIFF/WAVE PCM16 payload and derive `dim` scalar features:
    [channels, sample_rate, n_samples, mean, rms, zero-crossing rate,
    min, max] zero-padded. Walks the chunk list (fmt /data) per the RIFF
    spec — unknown chunks are skipped, as a real parser must."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV payload missing fmt /data chunk")
    audio_format, channels, sample_rate = fmt[0], fmt[1], fmt[2]
    if audio_format != 1 or fmt[5] != 16:
        raise ValueError("only PCM16 WAV is supported")
    x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    zc = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
    out = np.zeros(dim, dtype=np.float64)
    vals = [
        float(channels), float(sample_rate), float(len(x)),
        float(x.mean()) if len(x) else 0.0,
        float(np.sqrt(np.mean(x * x))) if len(x) else 0.0,
        zc,
        float(x.min()) if len(x) else 0.0,
        float(x.max()) if len(x) else 0.0,
    ]
    out[: min(dim, len(vals))] = vals[:dim]
    return out


def _real_decode(payload: bytes, dim: int) -> np.ndarray:
    """Dispatch on magic bytes — the container-format sniffing a real
    ingest pipeline does (payload `kind` metadata can lie)."""
    if payload.startswith(b"P6"):
        return _decode_ppm(payload, dim)
    if payload.startswith(b"RIFF"):
        return _decode_wav(payload, dim)
    raise ValueError(f"unsupported media container (magic={payload[:4]!r})")


def extract_features(media: DataFrame, dim: int = 16, fake: bool = True) -> DataFrame:
    """(media_id, kind, feature: array<double>) via Arrow-batched
    mapInPandas. fake=True uses the deterministic sha256-stream stub;
    fake=False runs the REAL pure-stdlib decoders (PPM images, PCM16 WAV
    audio) dispatched on payload magic bytes."""
    decoder = _fake_decode if fake else _real_decode

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [list(decoder(p, dim)) for p in pdf["payload"].values]
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
