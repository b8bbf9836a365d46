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
from pyspark.sql import Window
from pyspark.sql import functions as F

FEATURE_DIM = 16

FEATURES_SCHEMA = (
    "doc_id long, modality string, n_bytes long, features array<float>"
)


def attach_fake_payload(
    docs: DataFrame, modality: str = "image", collide_near_dups: bool = False
) -> DataFrame:
    """Give each document a deterministic binary payload + metadata columns
    (the D2 frame-record shape: id, modality, payload, height/width).

    ``collide_near_dups=True`` keys the payload of every ``doc_id % 5 ==
    0`` doc on its ``doc_id div 10`` bucket instead of its text, so the
    bucket's two members (ids 10k and 10k+5) carry IDENTICAL payloads —
    deterministic near-duplicate frames for the phash gate queries
    (round-7 verdict #3: the all-distinct payload seam made their oracle
    instances vacuous 0-row comparisons at gate scale).  Bucket size is
    exactly 2 at every scale factor, so pair volume stays LINEAR in the
    corpus; the split also crosses the ``doc_id % 10 == 0`` batch
    boundary the incremental queries use, making both gates non-empty.
    md5-derived pixels can only collide at Hamming 0 (distinct payloads
    land ~32 bits apart), so positive distances 1–3 stay covered by the
    crafted-signature unit tests.
    """
    payload_hex = F.md5(F.col("text"))
    if collide_near_dups:
        payload_hex = F.when(
            F.col("doc_id") % 5 == 0,
            F.md5(
                F.concat(
                    F.lit("ph|"),
                    F.expr("doc_id div 10").cast("string"),
                )
            ),
        ).otherwise(payload_hex)
    return docs.select(
        "doc_id",
        F.lit(modality).alias("modality"),
        F.unbase64(F.base64(payload_hex.cast("binary"))).alias("payload"),
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


# ---------------------------------------------------------------------------
# P3/P10 — color conversion + spatial downsampling with REAL array math
# (reference: BGR→gray `covid_measures.py:154` / `covid_workload.py:59`;
# resize/normalize `covid_measures.py:60-65`, `feature_extraction.py:51-56`).
# The fake decode derives an (H, W, 3) uint8 frame from an md5 byte stream
# (codecs are container-absent), but everything downstream is genuine image
# processing: integer-weighted RGB->gray, 2x2 box pooling, position-weighted
# reduction.  Because gray + box-sum + position weighting are all linear in
# the input bytes, the final checksum equals an integer-weighted sum over
# the byte stream — which a DuckDB oracle replays exactly, verifying every
# pixel's PLACEMENT (any transpose/offset/channel-order bug changes it).

FRAME_H = 24
FRAME_W = 32
_GRAY_W = (299, 587, 114)  # integer Rec.601 weights (x1000)


def decode_fake_frame(payload: bytes, h: int = FRAME_H, w: int = FRAME_W) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 frame from an md5 counter stream."""
    n = h * w * 3
    blocks = -(-n // 16)
    buf = b"".join(
        hashlib.md5(payload + b"|%d" % i).digest() for i in range(blocks)
    )[:n]
    return np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3)


def rgb_to_gray_int(frame: np.ndarray) -> np.ndarray:
    """P3: integer Rec.601 luma (x1000) — real channel math, exact in i64."""
    return (
        frame[:, :, 0].astype(np.int64) * _GRAY_W[0]
        + frame[:, :, 1].astype(np.int64) * _GRAY_W[1]
        + frame[:, :, 2].astype(np.int64) * _GRAY_W[2]
    )


def box_downsample_sum(gray: np.ndarray) -> np.ndarray:
    """P10: 2x2 box pooling (sum form — exact integers)."""
    h, w = gray.shape
    return gray.reshape(h // 2, 2, w // 2, 2).sum(axis=(1, 3))


def preprocess_checksum(frames: DataFrame) -> DataFrame:
    """decode -> gray -> 2x2 pool -> position-weighted integer total.

    mapInPandas narrow stage (binary never shuffles); output one BIGINT per
    frame that the SQL oracle reproduces byte-for-byte."""
    from collections.abc import Iterator as _It

    from pyspark.sql import types as T

    from video_etl_spark.session import ensure_executor_package

    ensure_executor_package(frames.sparkSession)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_h", T.LongType()),
            T.StructField("frame_w", T.LongType()),
            T.StructField("preprocess_checksum", T.LongType()),
        ]
    )
    oh, ow = FRAME_H // 2, FRAME_W // 2
    pos = (np.arange(oh)[:, None] * ow + np.arange(ow)[None, :] + 1).astype(np.int64)

    def run(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            sums = []
            for p in pdf["payload"]:
                pooled = box_downsample_sum(rgb_to_gray_int(decode_fake_frame(bytes(p))))
                sums.append(int((pooled * pos).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_h": FRAME_H,
                    "frame_w": FRAME_W,
                    "preprocess_checksum": sums,
                }
            )

    return frames.mapInPandas(run, schema)


def preprocess_oracle_sql() -> str:
    """DuckDB replay: checksum = sum over byte index b of byte(b)·coef(b),
    with byte(b) = byte (b%16) of md5(md5(text)||'|'||(b//16)) and coef(b)
    = gray_weight(channel) · (1 + output-cell index of the pixel)."""
    n = FRAME_H * FRAME_W * 3
    ow = FRAME_W // 2
    byte_expr = (
        "CAST(('0x' || substr(md5(md5(text) || '|' || CAST(b // 16 AS VARCHAR)), "
        "2 * (b % 16) + 1, 2)) AS BIGINT)"
    )
    coef_expr = (
        f"(CASE b % 3 WHEN 0 THEN {_GRAY_W[0]} WHEN 1 THEN {_GRAY_W[1]} "
        f"ELSE {_GRAY_W[2]} END) * "
        f"((((b // 3) // {FRAME_W}) // 2) * {ow} + (((b // 3) % {FRAME_W}) // 2) + 1)"
    )
    return f"""
    SELECT doc_id,
           CAST({FRAME_H} AS BIGINT) AS frame_h,
           CAST({FRAME_W} AS BIGINT) AS frame_w,
           CAST(list_sum([{byte_expr} * {coef_expr}
                     FOR b IN generate_series(0, {n - 1})]) AS BIGINT)
             AS preprocess_checksum
    FROM documents
    """


def bilinear_resize(frame: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """P10 general resize: vectorized bilinear interpolation (align_corners
    = False, the cv2.INTER_LINEAR convention).  Float path — property- and
    differentially-tested rather than oracle-hashed."""
    h, w = frame.shape[:2]
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    f = frame.astype(np.float64)
    if f.ndim == 2:
        f = f[:, :, None]
    top = f[y0][:, x0] * (1 - wx[..., None]) + f[y0][:, x1] * wx[..., None]
    bot = f[y1][:, x0] * (1 - wx[..., None]) + f[y1][:, x1] * wx[..., None]
    out = top * (1 - wy[..., None]) + bot * wy[..., None]
    return out[:, :, 0] if frame.ndim == 2 else out


# ---------------------------------------------------------------------------
# U21⊕ (round 7) — PERCEPTUAL-HASH IMAGE DEDUP: the multimodal member of
# the dedup family (exact/minhash/simhash/embedding cover text and
# vectors; frames were the gap).  Average-hash (aHash): decode to an 8×8
# grayscale grid, threshold each pixel against the grid mean → 64 bits;
# near-duplicate frames are signatures within a small Hamming distance.
# Candidate generation blocks on 4 × 16-bit chunks exactly like
# `dedup.simhash_pairs` (pigeonhole: ≤ 3 flipped bits cannot touch all 4
# chunks), so the pair space is collision-bounded, never corpus².
#
# The decode step follows this module's sanctioned seam: real codecs are
# env-blocked, so the "grid" is derived deterministically from the fake
# payload bytes by salted md5 — pure integer arithmetic both engines can
# replay, which is what lets `phash_near_dup_pairs` carry a full DuckDB
# oracle.  With a real decoder, only `phash_signatures`'s pixel source
# changes (grid bytes from the resized image instead of salted md5);
# thresholding, chunking, and the blocked join are decoder-agnostic.

PHASH_GRID = 64  # 8×8 grid → 64-bit hash
_PHASH_SALTS = tuple(f"p{j}|" for j in range(4))  # 16 pixels per salt


def phash_signatures(
    frames: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """(doc_id, chunk0..chunk3): 64-bit aHash as four 16-bit chunks.
    The whole family keys on ``doc_id`` (a configurable id column here
    would be unusable — every downstream join hardcodes it; rename
    upstream instead).

    Pixels: byte ``t`` of md5("p{j}|" + payload-as-ascii) is grid cell
    16j+t (0..255).  Bit i = (pixel_i > grid mean), computed exactly as
    ``64 * pixel_i > sum(pixels)`` — no floats.  Chunk c packs bits
    16c..16c+15; keeping the signature AS chunks (not one signed long)
    means every downstream xor/bit_count runs on small non-negative ints,
    identical in Spark and DuckDB.  One narrow projection fused with the
    scan — no shuffle, no Python.
    """
    # Round-15 NOTE (re-measured in the optimization round): the
    # below-parallelism scan spread was benched here TWICE and reverted
    # both times — alone (+0.9–1.2 s: racing consumers re-ran the spread
    # scan as 32-task stages) AND together with an eager cache populate
    # (rep-interleaved A/B: phash_overlap_stats 2.32 → 2.82 s min,
    # phash_near_dup_pairs 1.27 → 2.05 s min — every E sample above
    # every A sample).  Unlike simhash, the per-row hash math here is
    # NOT the family's bottleneck (4 md5s over short payloads); the
    # spread's round-robin exchange (plus its sort-before-repartition
    # pass over the payload strings) costs more than it parallelizes.
    payload_str = F.col(payload_col).cast("string")
    hexes = frames.select(
        F.col("doc_id"),
        *[
            F.md5(F.concat(F.lit(salt), payload_str)).alias(f"hx{j}")
            for j, salt in enumerate(_PHASH_SALTS)
        ],
    )
    px_exprs = []
    for idx in range(PHASH_GRID):
        j, t = divmod(idx, 16)
        px_exprs.append(
            f"cast(conv(substr(hx{j}, {2 * t + 1}, 2), 16, 10) as bigint)"
            f" as px{idx}"
        )
    px = hexes.selectExpr("doc_id", *px_exprs)
    total = " + ".join(f"px{i}" for i in range(PHASH_GRID))
    chunk_exprs = [
        " + ".join(
            f"(case when 64 * px{16 * c + t} > __tot then {1 << t} "
            "else 0 end)"
            for t in range(16)
        )
        for c in range(4)
    ]
    return px.withColumn("__tot", F.expr(total)).selectExpr(
        "doc_id",
        *[
            f"cast({e} as bigint) as chunk{c}"
            for c, e in enumerate(chunk_exprs)
        ],
    )


_PHASH_CHUNKS = tuple(f"chunk{c}" for c in range(4))


def _require_chunk_recall(max_hamming: int) -> None:
    """ONE definition of the pigeonhole bound for the whole family — the
    direct, incremental, and index-backed paths must never diverge on the
    radius guarantee."""
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the 4-chunk blocking "
            "guarantee (recall is only complete for distance <= 3); use "
            "more/finer chunks for larger radii"
        )


def _chunk_side(sigs: DataFrame, id_out: str, prefix: str) -> DataFrame:
    """Stacked join side: (id, all 4 chunks for the Hamming re-check,
    c, chunk) — one row per doc per chunk, so the 4 blocking joins
    collapse into one equi-join on the composite (c, chunk) key."""
    return sigs.select(
        F.col("doc_id").alias(id_out),
        *[F.col(c).alias(f"{prefix}{c}") for c in _PHASH_CHUNKS],
        F.posexplode(F.array(*_PHASH_CHUNKS)).alias("c", "chunk"),
    )


def _hamming4() -> F.Column:
    """Hamming distance between the a_/b_ chunk column sets."""
    return sum(
        F.bit_count(F.col(f"a_chunk{c}").bitwiseXOR(F.col(f"b_chunk{c}")))
        for c in range(4)
    )


def _phash_rep_structures(
    sigs: DataFrame, max_hamming: int, pinned: list | None = None
) -> tuple[DataFrame, DataFrame]:
    """The collapse-guarded core :func:`phash_pairs` and
    :func:`phash_overlap_stats` share — the multimodal twin of
    ``dedup._simhash_rep_structures``: ``(mem, rep_pairs)`` with one
    representative per distinct 64-bit hash.  ``pinned`` collects
    persisted downstream intermediates for eager callers that unpersist
    in ``finally``; the rep structures themselves are a localCheckpoint
    since round 16 (released by GC + ContextCleaner).

    Round-16 (guide §2.4/§5, r15-verdict #2): round 15 rejected three
    restructures here (lazy grp-persist flipped the mem joins BHJ→SMJ on
    unknown cache stats; eager grp.count() was serial latency; spreading
    the post-md5 rows cost more than the race).  The window form
    sidesteps all three failure modes at once: min(doc_id) OVER
    (PARTITION BY chunk cols) computes every doc's representative with
    NO mem join at all (so there is no join strategy to destabilize),
    and the eager localCheckpoint replaces the racing per-consumer
    re-plans/re-runs with one materialized frame.  Rep-interleaved A/B
    at sf0.1: sum of per-query mins 3.55 → 2.52 s (stats 2.06 → 1.47,
    pairs 1.50 → 1.06), every sample improved; results bit-identical
    (all-pairs oracle re-proved)."""
    win = sigs.withColumn(
        "__rep", F.min("doc_id").over(Window.partitionBy(*_PHASH_CHUNKS))
    ).localCheckpoint()
    mem = win.select(F.col("__rep").alias("rep"), "doc_id")
    reps = win.filter(F.col("doc_id") == F.col("__rep")).select(
        "doc_id", *_PHASH_CHUNKS
    )
    a = _chunk_side(reps, "doc_a", "a_")
    b = _chunk_side(reps, "doc_b", "b_")
    rep_pairs = (
        a.join(b, ["c", "chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", _hamming4().cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .distinct()
    )
    return mem, rep_pairs


def phash_overlap_stats(
    sigs: DataFrame, max_hamming: int = 3, eager: bool = False
) -> DataFrame:
    """COUNT-grain perceptual-hash readout: per frame, how many near-dup
    partners within ``max_hamming`` bits and the closest distance —
    ≤ 1 row per frame at ANY duplicate density, completing the
    count-grain symmetry across the pair families (simhash ✓ winnowing ✓
    phash ✓).  Computed analytically at representative grain via
    ``dedup.rep_grain_overlap_stats`` — a stadium-broadcast frame
    repeated 20k times costs one group row here where the pair grain
    emits ~2×10⁸ rows; the DuckDB oracle takes the exhaustive all-pairs
    route, re-proving the shortcut on every attestation.

    ``eager=True`` materializes the bounded result and unpersists the
    signature/rep/pair frames in ``finally`` (sweeping-caller mode —
    driver gate, bench); corpus-scale callers keep the lazy plan."""
    from video_etl_spark.llm_ops.dedup import (
        collect_and_unpersist,
        rep_grain_overlap_stats,
    )

    _require_chunk_recall(max_hamming)
    pinned: list | None = [] if eager else None
    mem, rep_pairs = _phash_rep_structures(sigs, max_hamming, pinned)
    out = rep_grain_overlap_stats(mem, rep_pairs, pinned)
    if eager:
        return collect_and_unpersist(out, pinned)
    return out


def phash_pairs(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(doc_a, doc_b, hamming) near-dup frame pairs from
    :func:`phash_signatures` output, via the 16-bit chunk-blocked
    self-join.

    Recall is complete only for ``max_hamming`` <= 3 (4-chunk pigeonhole)
    — larger radii raise rather than silently miss pairs, same contract
    as ``dedup.simhash_pairs``.  EAGER AT BUILD (round 16): constructing
    this frame materializes the signature window via localCheckpoint
    (see ``_phash_rep_structures``), so building the plan — e.g. for an
    explain/plan capture — already runs the signature jobs; blocks are
    id + 4 small ints, released by GC + ContextCleaner.

    Hot-key guard (round-7 verdict #1, the multimodal leg): the chunk
    self-join runs over ONE representative per distinct 64-bit hash,
    then expands to member pairs — cross-hash pairs via the membership
    map, same-hash pairs directly at Hamming 0.  Identical to
    ``dedup.simhash_pairs``'s guard; the output SET is unchanged (the
    all-pairs oracle pins it), but n identical frames no longer push
    n(n−1)/2 rows through one chunk key with 4× fan-out + a distinct
    shuffle.
    """
    _require_chunk_recall(max_hamming)
    mem, rep_pairs = _phash_rep_structures(sigs, max_hamming)
    cross = (
        rep_pairs.join(
            mem.select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("xa")),
            "doc_a",
        )
        .join(
            mem.select(F.col("rep").alias("doc_b"), F.col("doc_id").alias("xb")),
            "doc_b",
        )
        .select(
            F.least("xa", "xb").alias("doc_a"),
            F.greatest("xa", "xb").alias("doc_b"),
            "hamming",
        )
    )
    intra = (
        mem.select("rep", F.col("doc_id").alias("doc_a"))
        .join(mem.select("rep", F.col("doc_id").alias("doc_b")), "rep")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.lit(0).cast("long").alias("hamming"))
    )
    return cross.unionByName(intra)


def incremental_phash_dedup(
    new_sigs: DataFrame, hist_sigs: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """ASYMMETRIC perceptual-hash dedup: match a new frame batch against
    the existing corpus index — (new_doc, dup_of, n_candidates,
    min_hamming) — without ever generating a history×history pair
    (the multimodal twin of ``dedup.incremental_dedup`` /
    ``incremental_simhash_dedup``).

    Both inputs are :func:`phash_signatures` frames; at 100 TB the
    history side lives as a persisted signature table (chunk-bucketed,
    like ``write_band_index``) and each crawl batch joins against it
    without re-hashing the corpus.  Same pigeonhole recall bound as
    :func:`phash_pairs`.

    Hot-key guard: the NEW side probes by one representative per
    distinct hash and members expand to the representative's result
    (the quadratic new-dups × old-dups key blowup becomes
    1 × old-dups); history stays raw — pre-collapsing it would cost a
    corpus-wide aggregation per batch.  Output unchanged
    (oracle-pinned).
    """
    _require_chunk_recall(max_hamming)
    grp = new_sigs.groupBy(*_PHASH_CHUNKS).agg(
        F.min("doc_id").alias("doc_id")
    )
    mem = new_sigs.join(
        grp.select(*_PHASH_CHUNKS, F.col("doc_id").alias("new_rep")),
        list(_PHASH_CHUNKS),
    ).select("new_rep", F.col("doc_id").alias("new_doc"))
    n = _chunk_side(grp.select("doc_id", *_PHASH_CHUNKS), "new_rep", "a_")
    o = _chunk_side(hist_sigs, "old_doc", "b_")
    per_rep = (
        n.join(o, ["c", "chunk"])
        .withColumn("hamming", _hamming4().cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("new_rep", "old_doc", "hamming")
        .distinct()
        .groupBy("new_rep")
        .agg(
            F.min("old_doc").alias("dup_of"),
            F.count(F.lit(1)).alias("n_candidates"),
            F.min("hamming").alias("min_hamming"),
        )
    )
    return mem.join(per_rep, "new_rep").select(
        "new_doc", "dup_of", "n_candidates", "min_hamming"
    )


# ---------------------------------------------------------------------------
# U21⊕ (round 7 cont.) — the persistent 100 TB form of the frame-dedup
# index, mirroring dedup.write_band_index: chunk rows (doc, c, chunk, all
# four chunks for the Hamming re-check) persisted as a bucketed table on
# the composite chunk key, so each crawl batch's candidate join reads
# co-located index buckets and shuffles ONLY the new batch.


def phash_index_rows(sigs: DataFrame) -> DataFrame:
    """Long-format index rows over :func:`phash_signatures` output:
    (doc_id, chunk0..chunk3, ckey) — one row per doc per chunk,
    ckey = "<c>|<chunk>" so a single string column is both the join key
    and the bucket key (same convention as ``dedup.band_index_rows``)."""
    return sigs.select(
        "doc_id",
        *_PHASH_CHUNKS,
        F.posexplode(F.array(*_PHASH_CHUNKS)).alias("c", "chunk"),
    ).select(
        "doc_id",
        *_PHASH_CHUNKS,
        F.concat_ws("|", F.col("c"), F.col("chunk")).alias("ckey"),
    )


def write_phash_index(
    sigs: DataFrame, table: str, path: str, n_buckets: int = 32,
    files_per_bucket: int = 1,
) -> None:
    """Persist the corpus frame-signature index as a bucketed external
    table on ``ckey``."""
    from video_etl_spark.operators.io import write_bucketed

    write_bucketed(phash_index_rows(sigs), table, path, ["ckey"],
                   n_buckets, files_per_bucket)


def incremental_phash_against_index(
    new_sigs: DataFrame,
    index: DataFrame | list[DataFrame] | tuple[DataFrame, ...],
    max_hamming: int = 3,
) -> DataFrame:
    """:func:`incremental_phash_dedup` against a persisted chunk index
    (``spark.table(...)`` written by :func:`write_phash_index`).

    Same output contract (new_doc, dup_of, n_candidates, min_hamming).
    With the bucketed table the join plan has NO exchange on the index
    side — only the new batch shuffles (plan-asserted in tests) — the
    property that keeps per-crawl frame dedup independent of corpus
    size.

    ``index`` may also be a LIST of chunk-row frames — the
    compaction-boundary case (the bucketed compacted generation plus
    the small raw tail, see
    ``streaming.frame_dedup.compact_stream_frame_index``).  Each frame
    joins the probe SEPARATELY so the bucketed generation keeps its
    exchange-free scan, only the thin (new_rep, old_doc, hamming) hit
    triples union, and with more than one frame the union is globally
    de-duplicated: a frame visible through both sides of an overlapping
    boundary must count once (its hamming is hash-determined, so the
    triple is identical in every frame it appears in).

    Hot-key guard: the batch probes by one representative per distinct
    hash and members expand to the representative's result (same as
    :func:`incremental_phash_dedup`); the per-doc index stays raw — its
    rows are the shared prober contract.
    """
    _require_chunk_recall(max_hamming)
    frames = list(index) if isinstance(index, (list, tuple)) else [index]
    if not frames:
        raise ValueError("incremental_phash_against_index: empty index list")
    grp = new_sigs.groupBy(*_PHASH_CHUNKS).agg(
        F.min("doc_id").alias("doc_id")
    )
    mem = new_sigs.join(
        grp.select(*_PHASH_CHUNKS, F.col("doc_id").alias("new_rep")),
        list(_PHASH_CHUNKS),
    ).select("new_rep", F.col("doc_id").alias("new_doc"))
    new_rows = phash_index_rows(grp.select("doc_id", *_PHASH_CHUNKS)).select(
        F.col("doc_id").alias("new_rep"),
        *[F.col(c).alias(f"a_{c}") for c in _PHASH_CHUNKS],
        "ckey",
    )
    hits = None
    for f in frames:
        hist_rows = f.select(
            F.col("doc_id").alias("old_doc"),
            *[F.col(c).alias(f"b_{c}") for c in _PHASH_CHUNKS],
            "ckey",
        )
        h = (
            new_rows.join(hist_rows, "ckey")
            .withColumn("hamming", _hamming4().cast("long"))
            .filter(F.col("hamming") <= max_hamming)
            .select("new_rep", "old_doc", "hamming")
        )
        hits = h if hits is None else hits.unionByName(h)
    # exactly ONE distinct over the (thin, probe-sized) triple union —
    # collapses multi-chunk collisions AND cross-frame re-sightings of
    # the same doc in one shuffle (per-frame distincts before it would
    # shuffle the same triples twice; distinct partial-aggregates
    # map-side, so the union is collapsed before the wire either way)
    hits = hits.distinct()
    per_rep = (
        hits
        .groupBy("new_rep")
        .agg(
            F.min("old_doc").alias("dup_of"),
            F.count(F.lit(1)).alias("n_candidates"),
            F.min("hamming").alias("min_hamming"),
        )
    )
    return mem.join(per_rep, "new_rep").select(
        "new_doc", "dup_of", "n_candidates", "min_hamming"
    )
