"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star extra (BASELINE.json): image/audio/video travel as
``binary`` columns with a metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages.
Decode is REAL for the uncompressed container formats — binary netpbm
P5/P6, uncompressed 24/32-bit BMP, 8/16-bit PCM WAV — in pure NumPy;
compressed codecs (JPEG/PNG/...) need an external codec library that is
not in this container and raise a clearly-marked NotImplementedError
(swap the dispatch for PIL/cv2 where available). The Spark-side
contract — schema, batch shape, partitioning, UDF signature — is
exercised end-to-end with real image bytes in the tests.

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


def _netpbm_tokens(payload: bytes, need: int) -> tuple[list[int], int]:
    """First ``need`` whitespace-separated integer tokens after the
    magic, skipping ``#`` comments; returns (tokens, payload offset)."""
    toks: list[int] = []
    i = 2
    while len(toks) < need:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        toks.append(int(payload[i:j]))
        i = j
    return toks, i + 1          # single whitespace after maxval


def _decode_netpbm(payload: bytes) -> np.ndarray:
    """Binary netpbm: P5 (grayscale) -> (h, w), P6 (RGB) -> (h, w, 3)."""
    channels = 3 if payload[:2] == b"P6" else 1
    (w, h, maxval), off = _netpbm_tokens(payload, 3)
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    pix = np.frombuffer(payload, dtype=np.uint8, count=w * h * channels,
                        offset=off)
    return pix.reshape((h, w, 3)) if channels == 3 else \
        pix.reshape((h, w))


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP -> (h, w, 3|4) RGB(A), top-down rows."""
    import struct
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BMP supported "
            f"(bpp={bpp}, compression={compression})")
    nch = bpp // 8
    bottom_up = h > 0
    h = abs(h)
    stride = (w * nch + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=data_off).reshape((h, stride))
    img = rows[:, :w * nch].reshape((h, w, nch))
    if bottom_up:
        img = img[::-1]
    # BGR(A) storage order -> RGB(A)
    return img[..., [2, 1, 0] + ([3] if nch == 4 else [])]


def decode_image(payload: bytes) -> np.ndarray:
    """Decode a raster payload to a pixel array, pure NumPy.

    Real decoders for the uncompressed container formats (binary netpbm
    P5/P6, uncompressed 24/32-bit BMP) — no codec library needed.
    Compressed codecs (JPEG/PNG/WebP/...) need an external library that
    is not available in this container and raise NotImplementedError;
    swap this dispatch for PIL/cv2 when deploying with codecs installed.
    """
    if payload[:2] in (b"P5", b"P6"):
        return _decode_netpbm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise NotImplementedError(
        "compressed image codecs (JPEG/PNG/...) require a codec "
        "library not present in this container; supported here: "
        "netpbm P5/P6, uncompressed BMP")


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> ((frames, channels) int16/uint8 array, sample_rate).

    Pure-NumPy RIFF chunk walk; non-PCM encodings (float, ADPCM, MP3...)
    raise NotImplementedError.
    """
    import struct
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("only RIFF/WAVE audio supported")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"only 8/16-bit PCM WAV supported (format={audio_format}, "
            f"bits={bits})")
    dtype = np.int16 if bits == 16 else np.uint8
    samples = np.frombuffer(data, dtype=dtype)
    return samples.reshape((-1, channels)), rate


def resize_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (pure index math, any channel count)."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h // out_h).astype(np.int64)
    ci = (np.arange(out_w) * w // out_w).astype(np.int64)
    return img[ri][:, ci]


def image_feature_extractor(dim: int = 16) -> Callable[[bytes], np.ndarray]:
    """Decode + featurize kernel over the REAL decoders: per-channel
    mean/std plus a grayscale histogram, L2-normalized to ``dim``.
    Deterministic, so pipelines using it stay oracle-checkable."""
    def extract(payload: bytes) -> np.ndarray:
        img = decode_image(payload).astype(np.float64)
        if img.ndim == 2:
            img = img[:, :, None]
        gray = img.mean(axis=2)
        stats = []
        for c in range(img.shape[2]):
            stats.extend([img[:, :, c].mean(), img[:, :, c].std()])
        hist, _ = np.histogram(gray, bins=max(dim - len(stats), 1),
                               range=(0.0, 255.0))
        v = np.concatenate([np.asarray(stats), hist.astype(np.float64)])
        v = v[:dim] if len(v) >= dim else np.pad(v, (0, dim - len(v)))
        n = np.linalg.norm(v)
        return (v / n if n > 0 else v).astype(np.float32)
    return extract


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
