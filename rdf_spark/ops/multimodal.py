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


def resize_images(df: DataFrame, width: int, height: int, stub: bool = True) -> DataFrame:
    """image rows → resized payloads + updated metadata (codec stubbed).

    The Spark-side contract is the real one: a narrow Arrow-batched
    ``mapInPandas`` that rewrites (payload, width, height) and preserves
    every other column; a real deployment swaps the stub body for
    Pillow's ``Image.resize`` with identical batch shape.  The stub is a
    deterministic payload transform (seeded bytes of the target size) so
    downstream stages see realistic size distributions.
    """
    if not stub:
        raise NotImplementedError(
            "real image resize requires Pillow (not in this container)"
        )
    out_ddl = MEDIA_DDL

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = max(16, (width * height) // 256)  # fake compressed size
        for pdf in it:
            payloads = []
            for p in pdf["payload"]:
                h = hashlib.sha256(bytes(p)).digest()
                rng = np.random.RandomState(int.from_bytes(h[4:8], "big"))
                payloads.append(rng.bytes(target))
            out = pdf.copy()
            out["payload"] = payloads
            out["width"] = width
            out["height"] = height
            yield out

    return df.filter(F.col("kind") == "image").mapInPandas(run, out_ddl)


def media_near_duplicates(
    df: DataFrame, dim: int = 16, threshold: float = 0.999, n_tables: int = 4
) -> DataFrame:
    """Near-duplicate media via the decode→feature→LSH pipeline: the
    multimodal twin of text near-dup.  Feature extraction is the (stubbed)
    decode stage; candidate generation and exact verification are the
    same bucketed `ops.ann` path used for document embeddings — identical
    payloads always collide (same features), so exact media dups are
    guaranteed found without any all-pairs comparison."""
    from rdf_spark.ops import ann

    feats = decode_images(df, dim=dim).select(
        F.col("media_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    return ann.embedding_near_duplicates(
        feats, dim=dim, threshold=threshold, n_tables=n_tables
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
