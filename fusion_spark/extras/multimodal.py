"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libraries in this container):
`decode_stub=True` produces a deterministic fake feature vector from the
bytes' sha256 so schema, partitioning, UDF signature and batch shape are
real and testable; `decode_stub=False` raises NotImplementedError at the
exact point where a real decoder (PIL/librosa/ffmpeg) would plug in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", StringType()),  # binary in prod; hex here for test ease
        StructField("meta_width", LongType()),
        StructField("meta_height", LongType()),
        StructField("meta_duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _fake_feature(payload_hex: str, dim: int = 8) -> list[float]:
    # Deterministic stand-in for a decoded feature vector: sha256 of the hex
    # payload string → byte[i]/256. byte/256 needs ≤8 mantissa bits, so the
    # value is exactly representable in BOTH float32 and float64 — the fake
    # feature is bit-identical across engines (no float-rounding ambiguity
    # in cross-engine checks).
    h = hashlib.sha256(payload_hex.encode()).digest()
    return [h[i] / 256.0 for i in range(dim)]


def extract_features(
    media: DataFrame, dim: int = 8, decode_stub: bool = True, batch_hint: int = 256
) -> DataFrame:
    """mapInPandas feature extraction over media rows. The Arrow batch shape
    (one pandas frame per partition chunk) and output schema are the real
    production plumbing; only the decode body is a stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/librosa/ffmpeg — not in this container"
                )
            payload_hex = pdf["payload"].fillna("")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    # decoded-payload size (hex → bytes); the feature hash
                    # runs on the hex string itself (see _fake_feature)
                    "n_bytes": payload_hex.map(lambda s: len(s) // 2),
                    "feature": payload_hex.map(lambda s: _fake_feature(s, dim)),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms) —
    pure JVM sequence explode; the decode of each frame is the stubbed step."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("meta_duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
