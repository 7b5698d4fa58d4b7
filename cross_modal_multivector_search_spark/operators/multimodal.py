"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star extra (BASELINE.json): image/audio/video travel as
``binary`` columns with a metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages. The
decode kernels themselves are STUBBED (codec libraries are not in this
container — clearly marked below); the Spark-side contract — schema,
batch shape, partitioning, UDF signature — is real and tested.

Design for 100 TB: payloads stay in their own column so column pruning
skips them unless a stage touches them; metadata-only predicates
(width/height/duration filters) push down to the Parquet scan without
reading a single payload byte.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, LongType,
                               StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("modality", StringType(), False),   # image|audio|video
    StructField("payload", BinaryType(), False),
    StructField("format", StringType(), True),
    StructField("width", LongType(), True),
    StructField("height", LongType(), True),
    StructField("duration_ms", LongType(), True),
])

_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("feature", ArrayType(FloatType(), False), False),
])


def decode_image(payload: bytes) -> np.ndarray:
    """STUB: real implementation requires an image codec (PIL/cv2),
    which is not available in this container."""
    raise NotImplementedError(
        "image decode requires a codec library; use "
        "fake_feature_extractor for plumbing tests")


def fake_feature_extractor(dim: int = 16) -> Callable[[bytes], np.ndarray]:
    """Deterministic stand-in for a decode+embed kernel: hashes the
    payload into a unit-norm pseudo-embedding. Lets the full pipeline
    (scan -> mapInPandas -> downstream vector ops) run end-to-end with
    real data flow and fake math."""
    def extract(payload: bytes) -> np.ndarray:
        h = hashlib.sha256(payload).digest()
        need = dim * 4
        buf = (h * (need // len(h) + 1))[:need]
        v = np.frombuffer(buf, dtype=np.uint32).astype(np.float64)
        v = v / np.linalg.norm(v)
        return v.astype(np.float32)
    return extract


def extract_features(media: DataFrame,
                     extractor: Callable[[bytes], np.ndarray] | None = None,
                     dim: int = 16) -> DataFrame:
    """(media_id, payload, ...) -> (media_id, feature: array<float>).

    Arrow-batched: one Python roundtrip per batch, payloads never
    collected to the driver. Partitioning is whatever the scan produced —
    repartition upstream if payload sizes are skewed.
    """
    extractor = extractor or fake_feature_extractor(dim)

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [extractor(bytes(p)).tolist()
                     for p in pdf["payload"]]
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "feature": feats})

    return media.select("media_id", "payload").mapInPandas(
        run, schema=_FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame timestamp.

    Pure-relational stage (sequence + explode) — the expensive decode of
    each frame happens later in extract_features; planning frames
    relationally means Spark sizes the decode stage's parallelism from
    real row counts.
    """
    return (media.filter(F.col("modality") == "video")
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0),
                        F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                        F.lit(every_ms))).alias("frame_ts_ms")))


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    import random
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(128 + i))
        rows.append((i, modality, payload, "raw",
                     64 if modality == "image" else None,
                     64 if modality == "image" else None,
                     5000 if modality != "image" else None))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
