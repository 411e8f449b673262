"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extract run as Arrow-batched ``mapInPandas``
kernels.  The actual media decode is STUBBED (codec libraries are not
in this container): ``decode_stub=True`` substitutes a deterministic
fake feature vector derived from the payload hash, so the Spark-side
plumbing — schema, batch iteration, partitioning — is real and tested,
and a real decoder drops in by replacing one function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads with metadata)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 5)
        rows.append((i, kind, bytearray(payload), 64 + i % 32, 64, 1000 + i))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_real(payload: bytes, kind: str) -> np.ndarray:
    raise NotImplementedError(
        "media decode requires codec libraries not present in this "
        "environment; swap this function for a real decoder (PIL/librosa/"
        "pyav) on a full cluster image"
    )


def _decode_fake(payload: bytes, kind: str, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in: hash the payload into a unit vector."""
    h = hashlib.sha256(payload).digest()
    v = np.frombuffer(h[: dim * 4], dtype=np.uint32).astype(np.float32)
    v = (v / np.float32(2**32)) - np.float32(0.5)
    n = float(np.linalg.norm(v)) or 1.0
    return v / np.float32(n)


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Arrow batches stream through the Python worker; each batch is
    processed column-at-a-time.  Partitioning, schema, and batch shape
    are production-real; only the innermost decode is stubbed.
    """
    decode = _decode_fake if decode_stub else _decode_real

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(bytes(p), k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "feature": feats,
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame (pure
    DataFrame math — the decode of each frame would be a second
    mapInPandas over (media_id, ts_ms) with the real codec)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("ts_ms"),
        )
        .orderBy("media_id", "ts_ms")
    )
