"""Multimodal (binary) column plumbing.

Images/audio/video travel as opaque BinaryType payloads plus a typed
metadata struct; decode/feature steps are Arrow-batched mapInPandas
functions. The actual codecs (PIL/librosa/ffmpeg) are NOT in this
container, so decode_image is a deterministic fake behind the real Spark
plumbing (schema, batching, partitioning are production-shaped — swap
`_fake_decode` for a real decoder and nothing else changes), and
decode_audio documents the contract with NotImplementedError.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_mean", T.DoubleType(), True),
        T.StructField("byte_std", T.DoubleType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)


def attach_meta(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Wrap raw binary rows into the canonical media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[float, float, int]:
    """Deterministic stand-in for image decoding: byte statistics and a
    64-bit 'perceptual hash' from the byte histogram. Replace with a real
    decoder (PIL etc.) in production — same signature, same plumbing."""
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return 0.0, 0.0, 0
    mean = float(arr.mean())
    std = float(arr.std())
    hist = np.histogram(arr, bins=64, range=(0, 256))[0]
    bits = (hist > np.median(hist)).astype(np.uint64)
    phash = int(np.bitwise_or.reduce(bits << np.arange(64, dtype=np.uint64)))
    # wrap to signed 64-bit for LongType
    if phash >= 2**63:
        phash -= 2**64
    return mean, std, phash


def image_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over media batches (Arrow transfer,
    one python worker per partition — the only sanctioned python hot path)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                mean, std, phash = _fake_decode(b)
                rows.append((mid, len(b), mean, std, phash))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_bytes", "byte_mean", "byte_std", "phash"],
            )

    return df.select("media_id", "payload").mapInPandas(
        extract, schema=IMAGE_FEATURES_SCHEMA
    )


def decode_audio(df: DataFrame) -> DataFrame:
    """Audio decode contract (sample rate, duration, loudness). Requires
    an audio codec library not present in this container."""
    raise NotImplementedError(
        "audio decoding requires librosa/ffmpeg; plumbing contract: "
        "mapInPandas over (media_id, payload) -> (media_id, sr, duration_s, rms)"
    )
