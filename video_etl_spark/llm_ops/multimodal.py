"""Multimodal column plumbing (SURVEY.md D2/S1/P10/U1-U7 Spark surface).

Media (image/audio/video frames) are opaque ``binary`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` stages — the layout the
reference's per-frame UDF pipeline maps onto (paper §F: user fns over
frames; D2 frame schema).

The actual codecs (cv2/PyAV/ffmpeg) are NOT in this container, so the
decode step is stubbed exactly as the build brief prescribes: a real decode
request raises ``NotImplementedError``; the deterministic fake path derives
a payload/feature vector from md5 so every piece of Spark plumbing —
schemas, binary columns, Arrow batch shapes, partitioning — is real and
tested end-to-end.

Scale posture: binary payloads never enter a shuffle — feature extraction
is a narrow ``mapInPandas`` right after the scan, and only the small feature
vectors/metadata flow onward (SURVEY §7.3 "keep frames out of shuffles").
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

FEATURES_SCHEMA = (
    "doc_id long, modality string, n_bytes long, features array<float>"
)


def attach_fake_payload(docs: DataFrame, modality: str = "image") -> DataFrame:
    """Give each document a deterministic binary payload + metadata columns
    (the D2 frame-record shape: id, modality, payload, height/width)."""
    return docs.select(
        "doc_id",
        F.lit(modality).alias("modality"),
        F.unbase64(F.base64(F.md5(F.col("text")).cast("binary"))).alias("payload"),
        F.lit(720).alias("h"),
        F.lit(1280).alias("w"),
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a model embedding (U1-U7 stub)."""
    h = hashlib.md5(payload).digest()
    rng = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    reps = int(np.ceil(FEATURE_DIM / len(rng)))
    vec = np.tile(rng, reps)[:FEATURE_DIM]
    return ((vec - 127.5) / 127.5).tolist()


def extract_features(
    frames: DataFrame, real_decode: bool = False
) -> DataFrame:
    """mapInPandas feature-extraction stage (U1-U7 shape).

    ``real_decode=True`` is the hook for actual codec/model work and raises
    until those extras exist in the environment.
    """
    from video_etl_spark.session import ensure_executor_package

    ensure_executor_package(frames.sparkSession)
    if real_decode:
        raise NotImplementedError(
            "media codecs/models are not available in this environment; "
            "plug cv2/PyAV + a model here (executor-local lazy cache, "
            "scalar-iter pattern per SURVEY.md §2.9)"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": pdf["payload"].map(_fake_features),
                }
            )

    return frames.mapInPandas(run, FEATURES_SCHEMA)


def features_summary(feats: DataFrame, scale: int = 1_000_000) -> DataFrame:
    """Driver-canonicalizable projection of an ``extract_features`` output.

    Raw ``array<float>`` columns crash order-insensitive canonicalizers
    (pandas cannot factorize list cells), so the registered query exposes the
    vector as one scalar 60-bit checksum: each float is cast to double,
    quantized to ``round(x * scale)`` BIGINTs (exact, order-stable), joined
    into a CSV string, and md5-prefix-hashed.  Any change to any feature
    value changes the checksum, so the oracle still verifies the full vector.
    """
    quantized = F.expr(
        "transform(features, x -> "
        f"CAST(CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT) AS STRING))"
    )
    checksum = F.conv(
        F.substring(F.md5(F.array_join(quantized, ",")), 1, 15), 16, 10
    ).cast("long")
    return feats.select(
        "doc_id",
        "modality",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        checksum.alias("features_checksum"),
    )


def sample_frames(frames: DataFrame, stride: int, frame_col: str = "doc_id") -> DataFrame:
    """S11/P1: keep every `stride`-th frame (`runtime.py:94-105`,
    `covid_measures.py:271-278`)."""
    return frames.filter(F.pmod(F.col(frame_col), F.lit(stride)) == 0)
