"""S9/S10 — audio-extraction source and ASR transcription surface.

The reference extracts an audio track from video
(`/root/reference/code/workloads/streaming/runtime.py:47-54`, moviepy/
ffmpeg) and runs ASR over fixed windows (`runtime.py:56-61`, paper §J).  Codecs and speech models are not in this
container, so — as with the image path (`multimodal.py`) and the MLP
embedder (`models.py`) — the *Spark plumbing* is real and tested while the
decode/model step is a deterministic fake behind a ``real_asr`` gate:

* segmentation (S9) is pure JVM: the binary payload is windowed with
  ``substring`` over an exploded segment index — the exact shape a PCM
  byte-stream splitter has, with zero Python in the plan;
* transcription (S10) is a scalar-iterator pandas UDF with a lazy
  executor-local model cache (the S15 pattern shared with
  `models.get_model`) — a whisper-style model drops into the same slot;
* the fake transcript is a vocab lookup on the payload's hex digits, so a
  DuckDB oracle replays the whole pipeline in SQL and the correctness gate
  hash-matches transcripts end-to-end (no rows-only weakening).

Scale posture: audio bytes never shuffle — segmentation and transcription
are narrow maps after the scan; only (doc_id, seg_idx, transcript) rows
flow on, and downstream text analysis reuses the U23 operators unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

SEG_HEX_CHARS = 8  # hex chars per segment window
N_SEGMENTS = 4  # 32-char md5 payload -> 4 windows

# 16-word fake-ASR vocabulary, indexed by one hex digit.
ASR_VOCAB = (
    "pan", "tilt", "zoom", "cut", "fade", "pause", "roll", "sync",
    "frame", "track", "focus", "gain", "mix", "dub", "trim", "mark",
)


def attach_fake_audio(docs: DataFrame) -> DataFrame:
    """Deterministic stand-in for S9's demuxed audio track: the payload is
    the 32-byte ascii-hex md5 of the text, with sample-rate/duration
    metadata in the D2 record shape."""
    return docs.select(
        "doc_id",
        F.lit("audio").alias("modality"),
        F.md5(F.col("text")).cast("binary").alias("payload"),
        F.lit(16_000).alias("sample_rate"),
        (F.lit(N_SEGMENTS * 2)).alias("duration_s"),
    )


def segment_audio(audio: DataFrame, payload_col: str = "payload") -> DataFrame:
    """S9 windowing, fully JVM-side: explode a segment index and slice the
    byte payload with ``substring`` — no Python, no shuffle; at scale this
    pipelines with the scan."""
    seg = F.explode(F.sequence(F.lit(0), F.lit(N_SEGMENTS - 1))).alias("seg_idx")
    out = audio.select("doc_id", F.col(payload_col), seg)
    return out.select(
        "doc_id",
        F.col("seg_idx").cast("long").alias("seg_idx"),
        F.expr(
            f"substring({payload_col}, seg_idx * {SEG_HEX_CHARS} + 1, "
            f"{SEG_HEX_CHARS})"
        ).alias("segment"),
    )


class FakeASR:
    """Vocab-lookup 'model' standing in for a whisper-style transcriber."""

    def __init__(self) -> None:
        self.vocab = ASR_VOCAB

    def transcribe(self, segments: pd.Series) -> pd.Series:
        def one(seg: bytes) -> str:
            return " ".join(self.vocab[int(chr(c), 16)] for c in seg)

        return segments.map(one)


_ASR_CACHE: dict[str, FakeASR] = {}


def get_asr(name: str = "fake-asr", on_init=None) -> FakeASR:
    model = _ASR_CACHE.get(name)
    if model is None:
        model = FakeASR()
        _ASR_CACHE[name] = model
        if on_init is not None:
            on_init()
    return model


def transcribe_segments(
    segments: DataFrame,
    real_asr: bool = False,
    init_counter=None,
    model_name: str = "fake-asr",
) -> DataFrame:
    """S10 transcription: scalar-iterator pandas UDF, one lazy model init
    per executor python worker (S15 cache pattern).  ``real_asr=True`` is
    the slot for an actual speech model and raises until one exists in the
    environment."""
    from video_etl_spark.session import ensure_executor_package

    ensure_executor_package(segments.sparkSession)
    if real_asr:
        raise NotImplementedError(
            "no speech model in this environment; plug a whisper-style "
            "transcriber into get_asr() (executor-local lazy cache)"
        )

    on_init = (lambda: init_counter.add(1)) if init_counter is not None else None

    def run(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = get_asr(model_name, on_init=on_init)
        for seg in batches:
            yield model.transcribe(seg)

    udf = pandas_udf(run, T.StringType())
    return segments.select(
        "doc_id",
        "seg_idx",
        udf(F.col("segment")).alias("transcript"),
    ).withColumn(
        "n_words",
        F.size(F.split("transcript", " ")).cast("long"),
    )


def asr_oracle_sql() -> str:
    """DuckDB SQL replaying segmentation + fake ASR bit-for-bit: segment
    s of doc d transcribes hex chars [8s+1, 8s+8] of md5(text) through the
    vocab table."""
    vocab_lit = "[" + ", ".join(f"'{w}'" for w in ASR_VOCAB) + "]"
    return f"""
    WITH segs AS (
      SELECT doc_id, s.seg_idx AS seg_idx,
             substr(md5(text), s.seg_idx * {SEG_HEX_CHARS} + 1,
                    {SEG_HEX_CHARS}) AS seg
      FROM documents,
           (SELECT unnest(generate_series(0, {N_SEGMENTS - 1})) AS seg_idx) s)
    SELECT doc_id,
           CAST(seg_idx AS BIGINT) AS seg_idx,
           array_to_string(
             [({vocab_lit})[CAST(('0x' || substr(seg, i, 1)) AS INTEGER) + 1]
              FOR i IN generate_series(1, {SEG_HEX_CHARS})], ' ') AS transcript,
           CAST({SEG_HEX_CHARS} AS BIGINT) AS n_words
    FROM segs
    """
