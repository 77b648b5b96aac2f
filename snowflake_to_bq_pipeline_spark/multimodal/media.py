"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

The Spark-side machinery (schema, partition sizing, UDF signatures, batch
shapes) is real and tested; the codec itself is a deterministic fake
behind ``decode_image`` because media libraries are intentionally not a
dependency of the engine — production swaps `_fake_decode` for
Pillow/ffmpeg without touching any plan.

Scale: mapInPandas streams Arrow batches, so a 100 TB media table flows
through without materializing rows in Python one at a time. Media blobs
stay opaque bytes end-to-end — Spark never interprets them — and
``repartition_for_media`` sizes partitions by expected decode cost rather
than row count.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("mime_type", StringType()),
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("feat_mean", LongType()),
        StructField("feat_max", LongType()),
    ]
)


def _fake_decode(content: bytes) -> list[int]:
    """Deterministic stand-in for a real codec.

    Production: replace with Pillow/torchaudio/ffmpeg. Raising
    NotImplementedError here would be the other documented option; a
    deterministic fake keeps the downstream plumbing testable.
    """
    return list(content[:64])


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode + featurize media blobs via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = [
                _fake_decode(bytes(c)) if c is not None else []
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [
                        len(bytes(c)) if c is not None else 0
                        for c in pdf["content"]
                    ],
                    "checksum": [
                        hashlib.md5(bytes(c)).hexdigest() if c is not None else None
                        for c in pdf["content"]
                    ],
                    "feat_mean": [
                        int(sum(f) / len(f)) if f else 0 for f in feats
                    ],
                    "feat_max": [max(f) if f else 0 for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def repartition_for_media(
    media: DataFrame, target_bytes_per_partition: int = 256 * 1024 * 1024
) -> DataFrame:
    """Repartition by decode cost (total blob bytes), not row count.

    A media table's rows vary by orders of magnitude in size; partitioning
    by byte budget keeps executor memory bounded during decode.
    """
    stats = media.agg(
        F.sum(F.length("content")).alias("total"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    total = stats["total"] or 0
    n_parts = max(1, int(total / target_bytes_per_partition) + 1)
    return media.repartition(n_parts, "media_id")


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for tests/demos."""
    rows = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("content"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        F.lit(1000).cast("int").alias("duration_ms"),
    )
    return rows
