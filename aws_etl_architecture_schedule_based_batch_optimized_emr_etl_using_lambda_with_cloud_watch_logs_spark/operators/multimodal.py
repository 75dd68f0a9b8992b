"""Multimodal column plumbing (SURVEY §2.M — charter extension).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing is real and tested: schema, Arrow-batched
``mapInPandas`` iteration, partition sizing, batch shapes. The codec
step itself (PIL/ffmpeg/librosa) is NOT available in this
environment, so decode is stubbed: ``decode_stub="fake"`` produces a
deterministic feature vector from the bytes (so downstream operators
and tests have real data to chew on); ``decode_stub="raise"`` marks
the integration point with ``NotImplementedError``.

Scale notes: binary payloads dominate row size — keep
``spark.sql.files.maxPartitionBytes`` modest and never collect; the
``mapInPandas`` path streams Arrow batches so peak executor memory is
one batch of payloads, not one partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_sha", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def _fake_decode(content: bytes, media_type: str, feat_dim: int) -> dict:
    """Deterministic stand-in for a real codec: dimensions and a
    feature vector derived from a sha256 of the payload. Replace with
    PIL/ffmpeg in a full environment — the surrounding plumbing does
    not change."""
    digest = hashlib.sha256(content or b"").digest()
    width = 1 + digest[0] % 64
    height = 1 + digest[1] % 64
    feats = [
        (digest[(2 + i) % len(digest)] / 255.0) for i in range(feat_dim)
    ]
    return {
        "n_bytes": len(content or b""),
        "content_sha": digest.hex(),
        "width": width,
        "height": height,
        "features": feats,
    }


def extract_features(
    assets: DataFrame, feat_dim: int = 8, decode_stub: str = "fake"
) -> DataFrame:
    """Decode/feature-extract over ``mapInPandas`` (Arrow batches).

    The pandas function receives an iterator of batches — the real
    decode slots into ``_fake_decode``'s place unchanged.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "media codecs not available in this environment; "
                    "plug PIL/ffmpeg here"
                )
            rows = [
                {
                    "asset_id": row.asset_id,
                    "media_type": row.media_type,
                    **_fake_decode(row.content, row.media_type, feat_dim),
                }
                for row in batch.itertuples()
            ]
            yield pd.DataFrame(rows)

    return assets.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def frame_sample_plan(
    assets: DataFrame, every_n: int = 10, max_frames: int = 16
) -> DataFrame:
    """Frame-sampling *plan* for video assets: emits one row per
    requested frame index (``sequence`` + ``explode`` — plan-time
    fan-out, no decode). A downstream ``mapInPandas`` decode consumes
    (asset_id, frame_idx) pairs."""
    n_frames = F.least(
        F.lit(max_frames),
        (F.length("content") / F.lit(every_n)).cast("int") + 1,
    )
    return (
        assets.filter(F.col("media_type") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), n_frames - 1)
            ).alias("frame_idx"),
        )
        .withColumn("frame_offset", F.col("frame_idx") * every_n)
    )


def resize_stub(features: DataFrame, width: int, height: int) -> DataFrame:
    """Resize marker: records target dims in the plan; the pixel work
    belongs to the codec UDF (stubbed here)."""
    return features.withColumn("target_width", F.lit(width)).withColumn(
        "target_height", F.lit(height)
    )


def audio_chunk_plan(
    assets: DataFrame, chunk_ms: int = 1000, bytes_per_ms: int = 16
) -> DataFrame:
    """Audio chunking *plan*: one row per fixed-duration chunk with
    byte offsets (``sequence`` + ``explode``, no decode — same
    plan-time fan-out shape as :func:`frame_sample_plan`). A
    downstream codec UDF consumes (asset_id, byte_start, byte_end)
    slices; ``bytes_per_ms`` comes from the asset's sample-rate
    metadata in a real pipeline."""
    chunk_bytes = chunk_ms * bytes_per_ms
    n_chunks = (
        (F.length("content") + F.lit(chunk_bytes - 1)) / F.lit(chunk_bytes)
    ).cast("int")
    return (
        assets.filter(F.col("media_type") == "audio")
        .select(
            "asset_id",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
            F.length("content").alias("n_bytes"),
        )
        .withColumn("byte_start", F.col("chunk_idx") * chunk_bytes)
        .withColumn(
            "byte_end",
            F.least(F.col("byte_start") + chunk_bytes, F.col("n_bytes")),
        )
        .drop("n_bytes")
    )
