"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

Two decode paths share the same Spark plumbing (schema, partitioning, UDF
signature, Arrow batch shape):

* `decode_stub=True` (default, the driver-gated path) — a deterministic
  fake feature from the payload's sha256, cross-engine reproducible in SQL.
* `decode_stub=False` — REAL decoders, dependency-free and pure public
  knowledge: netpbm images (PGM `P5` / PPM `P6`, the format family from
  Poskanzer's pbmplus, documented at netpbm.sourceforge.net) and RIFF/WAVE
  PCM audio (the Microsoft/IBM WAVE spec) are parsed from the raw bytes and
  summarized into a fixed-dim stats feature. Unrecognized payloads raise
  ValueError naming the magic bytes. Heavier codecs (JPEG/MP3/video) would
  plug in at the same dispatch point with PIL/librosa/ffmpeg.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
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


def decode_image_netpbm(data: bytes) -> dict:
    """Parse a binary netpbm image — PGM (`P5`, grayscale) or PPM (`P6`,
    RGB). Header: magic, then width/height/maxval as ASCII ints separated
    by whitespace (with `#` comments), one whitespace byte, then the raster
    (1 byte per sample for maxval<256, else 2 bytes big-endian).
    Returns {width, height, maxval, channels, pixels} with pixels a flat
    float64 array of raw sample values."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError(f"not a binary netpbm payload (magic {data[:2]!r})")
    channels = 1 if data[:2] == b"P5" else 3
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(data):
            raise ValueError("truncated netpbm header")
        c = data[pos : pos + 1]
        if c == b"#":  # comment to end of line
            while pos < len(data) and data[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
        elif c.isspace():
            pos += 1
        elif c.isdigit():
            start = pos
            while pos < len(data) and data[pos : pos + 1].isdigit():
                pos += 1
            fields.append(int(data[start:pos]))
        else:
            raise ValueError(f"bad netpbm header byte {c!r} at offset {pos}")
    width, height, maxval = fields
    if width < 1 or height < 1:
        raise ValueError(f"netpbm dimensions {width}x{height} out of range")
    if not (0 < maxval < 65536):
        raise ValueError(f"netpbm maxval {maxval} out of range")
    if not data[pos : pos + 1].isspace():
        raise ValueError(
            f"netpbm header not followed by a whitespace byte "
            f"(got {data[pos : pos + 1]!r} at offset {pos})"
        )
    pos += 1  # exactly one whitespace byte separates header and raster
    n = width * height * channels
    dtype = np.dtype(">u2") if maxval > 255 else np.dtype(np.uint8)
    raster = data[pos : pos + n * dtype.itemsize]
    if len(raster) != n * dtype.itemsize:
        raise ValueError(
            f"netpbm raster truncated: want {n * dtype.itemsize} bytes, "
            f"have {len(raster)}"
        )
    pixels = np.frombuffer(raster, dtype=dtype).astype(np.float64)
    return {
        "width": width,
        "height": height,
        "maxval": maxval,
        "channels": channels,
        "pixels": pixels,
    }


def decode_audio_wav(data: bytes) -> dict:
    """Parse a RIFF/WAVE file with integer PCM samples (format tag 1,
    8-bit unsigned or 16/32-bit signed little-endian — the canonical WAV
    layout). Walks the chunk list for `fmt ` and `data`. Returns
    {n_channels, sample_rate, bits, samples} with samples a flat float64
    array normalized to [-1, 1]."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE payload (magic {data[:4]!r}/{data[8:12]!r})")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        if pos + 8 + size > len(data):
            raise ValueError(
                f"WAVE chunk {cid!r} truncated: declares {size} bytes, "
                f"only {len(data) - pos - 8} remain"
            )
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError(f"WAVE fmt chunk too short ({size} bytes, need 16)")
            tag, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if tag != 1:
                raise ValueError(f"only integer PCM supported (format tag {tag})")
            fmt = {"n_channels": n_ch, "sample_rate": rate, "bits": bits}
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAVE missing fmt/data chunk")
    bits = fmt["bits"]
    if bits in (8, 16, 32) and len(pcm) % (bits // 8):
        raise ValueError(
            f"WAVE data chunk length {len(pcm)} is not a multiple of the "
            f"{bits // 8}-byte sample width"
        )
    if bits == 8:  # unsigned, midpoint 128
        samples = (np.frombuffer(pcm, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 16:
        samples = np.frombuffer(pcm, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 32:
        samples = np.frombuffer(pcm, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM bit depth {bits}")
    return {**fmt, "samples": samples}


def _real_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Dispatch on magic bytes and summarize the decoded media into a
    fixed-dim feature: images → [width, height, channels, maxval,
    mean, std, min, max] (pixel stats normalized by maxval); audio →
    [n_channels, sample_rate, bits, n_samples, mean, rms, min, max]
    (samples normalized to [-1,1]). Padded/truncated to `dim`."""
    if payload[:2] in (b"P5", b"P6"):
        img = decode_image_netpbm(payload)
        px = img["pixels"] / img["maxval"]
        vec = [
            float(img["width"]), float(img["height"]), float(img["channels"]),
            float(img["maxval"]), float(px.mean()), float(px.std()),
            float(px.min()), float(px.max()),
        ]
    elif payload[:4] == b"RIFF":
        wav = decode_audio_wav(payload)
        s = wav["samples"]
        vec = [
            float(wav["n_channels"]), float(wav["sample_rate"]), float(wav["bits"]),
            float(len(s)), float(s.mean()) if len(s) else 0.0,
            float(np.sqrt((s * s).mean())) if len(s) else 0.0,
            float(s.min()) if len(s) else 0.0, float(s.max()) if len(s) else 0.0,
        ]
    else:
        raise ValueError(
            f"unrecognized media payload (magic {payload[:4]!r}) — netpbm P5/P6 "
            "and RIFF/WAVE PCM decode here; other codecs plug in at this dispatch"
        )
    return (vec + [0.0] * dim)[:dim]


def extract_features(
    media: DataFrame, dim: int = 8, decode_stub: bool = True, batch_hint: int = 256
) -> DataFrame:
    """mapInPandas feature extraction over media rows. The Arrow batch shape
    (one pandas frame per partition chunk) and output schema are identical on
    both paths; `decode_stub` only switches the per-payload kernel between
    the sha256 fake (cross-engine-reproducible, driver-gated) and the real
    netpbm/WAV decoders (`_real_feature`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload_hex = pdf["payload"].fillna("")
            if decode_stub:
                feats = payload_hex.map(lambda s: _fake_feature(s, dim))
            else:
                feats = payload_hex.map(lambda s: _real_feature(bytes.fromhex(s), dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    # decoded-payload size (hex → bytes); the stub feature
                    # hash runs on the hex string itself (see _fake_feature)
                    "n_bytes": payload_hex.map(lambda s: len(s) // 2),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms) —
    pure JVM sequence explode; the decode of each frame would run through
    the same `_real_feature`-style dispatch once a video codec plugs in."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("meta_duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
