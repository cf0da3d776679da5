"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata struct;
decode / feature-extraction stages are Arrow-batched ``mapInPandas`` with
real schemas, partitioning and batch shapes.  The actual codec calls are
STUBBED (Pillow/ffmpeg are not in this container): ``decode_images`` with
``stub=False`` raises NotImplementedError; with the default deterministic
stub it derives a fake fixed-size feature vector from the bytes so the
whole distributed plumbing is testable end-to-end.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_DDL = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)


def synthetic_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-random bytes)."""
    df = spark.range(n).withColumn("h", F.xxhash64("id", F.lit(seed)))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("h"), F.lit(3)) + 1).cast("int"),
    )
    payload = F.encode(F.concat(F.lit("BLOB:"), F.col("h"), F.lit(":"), F.col("id")), "utf-8")
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        (F.pmod(F.col("h"), F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(F.col("h"), F.lit(1080)) + 1).cast("int").alias("height"),
        (F.pmod(F.col("h"), F.lit(60000)) + 1).cast("int").alias("duration_ms"),
    )


def _stub_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake feature vector from payload bytes."""
    h = hashlib.sha256(bytes(payload)).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    return rng.randn(dim).astype(float).tolist()


def decode_images(df: DataFrame, dim: int = 16, stub: bool = True) -> DataFrame:
    """image rows → feature vectors (Arrow batches; decode step stubbed).

    Real deployment swaps ``_stub_features`` for a Pillow/torchvision call
    with the SAME signature and batch shape — the Spark plan is unchanged.
    """
    if not stub:
        raise NotImplementedError(
            "real image decode requires Pillow/torchvision (not in this container)"
        )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_stub_features(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "features": feats,
                    "checksum": [zlib.crc32(bytes(p)) for p in pdf["payload"]],
                }
            )

    return df.filter(F.col("kind") == "image").mapInPandas(
        run, "media_id long, features array<double>, checksum long"
    )


def sample_frames(df: DataFrame, every_ms: int = 1000, stub: bool = True) -> DataFrame:
    """video rows → (media_id, frame_ts_ms) sampling grid; the frame decode
    itself is stubbed, but the explode/partition shape is the real one."""
    if not stub:
        raise NotImplementedError("real frame sampling requires ffmpeg")
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
