"""Non-SQL-expressible operator queries (rows-only driver checks).

Each of these is a genuinely iterative / stateful / pandas-UDF-backed
operator per the driver contract's escape hatch; their correctness is
covered by pytest against oracle-verified baselines or golden semantics
instead of DuckDB SQL:

* simhash_near_dup_pairs / incremental_simhash_dedup — oracle-backed
  since the round-6 continuation (the signature moved to a pure
  relational formulation, see llm_ops.dedup.simhash_signatures); still
  tested against exact-dup ground truth in tests/test_llm_ops.py.
* knn_lsh_bucketed — LSH ANN scale path (U22); tested for subset-
  consistency against the oracle-verified brute-force query.
* sort_tracker_synthetic — per-key ordered tracker state (W2/J2/U12).
* switch_log_replay — the full C1/C2 control loop over 2 s chunks (E1);
  golden-tested in tests/test_control.py + tests/test_streaming.py.

``multimodal_features`` (binary-column mapInPandas plumbing, D2/U1-U7) is
fully oracle-checked since round 2: the deterministic fake embedding is a
pure function of md5 bytes, so DuckDB replicates the whole vector and the
query exposes it as a scalar 60-bit checksum (raw array<float> cells crash
the driver's pandas canonicalizer — CORRECTNESS_r01).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from video_etl_spark.registry import query
from video_etl_spark.session import load_table

ROWS_ONLY_QUERIES = frozenset(
    {
        "sort_tracker_synthetic",
        "switch_log_replay",
        "approx_count_distinct",
        # knn_lsh_bucketed / knn_ivf / knn_pq RETIRED from the registry
        # in round 13 (verdict #6 retirement policy, see COVERAGE.md):
        # each is strictly dominated by its indexed successor
        # (knn_lsh_indexed / knn_ivf_indexed / knn_pq_indexed, all
        # FULL-oracle) that exercises the same library function through
        # the persisted-index path.  The library functions (lsh_topk /
        # ivf_topk / pq_topk) and their recall/equivalence tests remain.
        "lstm_user_states",
        "lflstm_fusion_users",
        # t-digest sketch (round 5): engines' quantile sketches differ by
        # construction; exact twin `value_percentiles_by_type` is the
        # oracle baseline, pytest bounds the rank error.
        "value_percentiles_approx",
        # simhash_near_dup_pairs / incremental_simhash_dedup left this set
        # in the round-6 continuation: the signature moved to a pure
        # relational formulation, so both now carry full DuckDB oracles.
    }
)


def _duck_simhash_sig_cte() -> str:
    """DuckDB CTE ending in `chunks`(doc_id, simhash, chunk0..chunk3) —
    the oracle twin of ``llm_ops.dedup.simhash_signatures`` (64-bit md5
    SimHash, weighted by token occurrence, empty docs = -2^63).  All bit
    extraction is unsigned HUGEINT div/mod arithmetic — no reliance on
    either engine's signed-shift semantics."""
    bits = ",\n             ".join(
        f"sum(w * (2 * CAST((h_u // {1 << i}) % 2 AS BIGINT) - 1)) AS s{i}"
        for i in range(64)
    )
    sig_terms = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(63)
    )
    chunk_cols = ", ".join(
        f"CAST((u // {1 << (16 * c)}) % 65536 AS BIGINT) AS chunk{c}"
        for c in range(4)
    )
    return rf"""
    WITH occ AS (
      SELECT doc_id,
             unnest(list_filter(
               string_split_regex(trim(lower(text)), '\s+'),
               x -> x <> '')) AS tok
      FROM documents),
    w AS (SELECT doc_id, tok, count(*) AS w FROM occ GROUP BY doc_id, tok),
    hh AS (
      SELECT doc_id, w,
             CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)::HUGEINT
               * 4294967296
               + CAST(('0x' || substr(md5(tok), 9, 8)) AS BIGINT) AS h_u
      FROM w),
    sums AS (SELECT doc_id, {bits} FROM hh GROUP BY doc_id),
    sig0 AS (
      SELECT doc_id,
             {sig_terms}
               + (CASE WHEN s63 > 0 THEN 0
                       ELSE CAST(-9223372036854775808 AS BIGINT) END)
               AS simhash
      FROM sums),
    sig AS (
      SELECT d.doc_id,
             coalesce(s.simhash, CAST(-9223372036854775808 AS BIGINT))
               AS simhash
      FROM documents d LEFT JOIN sig0 s USING (doc_id)),
    chunks AS (
      SELECT doc_id, simhash, {chunk_cols}
      FROM (SELECT doc_id, simhash,
                   CASE WHEN simhash < 0
                        THEN simhash::HUGEINT + 18446744073709551616
                        ELSE simhash::HUGEINT END AS u
            FROM sig))"""


_DUCK_CHUNK_MATCH = (
    "(a.chunk0 = b.chunk0 OR a.chunk1 = b.chunk1 "
    "OR a.chunk2 = b.chunk2 OR a.chunk3 = b.chunk3)"
)


@query(
    "simhash_near_dup_pairs",
    oracle=_duck_simhash_sig_cte()
    + f""",
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      FROM chunks a JOIN chunks b
        ON a.doc_id < b.doc_id AND {_DUCK_CHUNK_MATCH})
    SELECT DISTINCT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3
    """,
)
def simhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAIR-grain SimHash evidence.  Output grows quadratically with
    duplicate mass by definition (n exact copies -> n(n-1)/2 rows), so at
    100 TB this grain is for BOUNDED investigations; the corpus-wide
    monitoring default is ``simhash_overlap_stats`` (<= 1 row/doc at any
    density), and component-grain consumers should prefer the CC chain."""
    from video_etl_spark.llm_ops.dedup import simhash_pairs

    docs = load_table(spark, sf_dir, "documents")
    return simhash_pairs(docs, max_hamming=3)


@query(
    "simhash_overlap_stats",
    oracle=_duck_simhash_sig_cte()
    + f""",
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      FROM chunks a JOIN chunks b
        ON a.doc_id < b.doc_id AND {_DUCK_CHUNK_MATCH}),
    dpairs AS (
      SELECT DISTINCT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3),
    bidir AS (
      SELECT doc_a AS doc_id, hamming FROM dpairs
      UNION ALL
      SELECT doc_b AS doc_id, hamming FROM dpairs)
    SELECT doc_id,
           count(*) AS n_partners,
           CAST(min(hamming) AS BIGINT) AS min_hamming
    FROM bidir GROUP BY doc_id
    """,
)
def simhash_overlap_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-grain SimHash readout (round-8 verdict #7): per-doc partner
    count + closest Hamming distance, <= 1 row/doc at any duplicate
    density.  The Spark side computes partners ANALYTICALLY at
    representative grain (llm_ops.dedup.simhash_overlap_stats — a 20k-copy
    hot page is one group row, never ~2x10^8 expanded pairs); the oracle
    is the exhaustive doc-grain pair aggregate, so every attestation
    re-proves the analytic shortcut against the quadratic ground truth.
    ``eager=True``: sweeping callers (driver gate, bench) must not leave
    pinned frames behind (round-9 verdict #7)."""
    return simhash_overlap_stats_build(spark, sf_dir, eager=True)


def simhash_overlap_stats_build(
    spark: SparkSession, sf_dir: str, eager: bool = False
) -> DataFrame:
    """The ONE construction the registry entry (eager=True) and the
    plan-golden test (eager=False — the lazy plan is what executes)
    share, so a parameter change here cannot silently diverge from what
    the golden asserts."""
    from video_etl_spark.llm_ops.dedup import simhash_overlap_stats

    docs = load_table(spark, sf_dir, "documents")
    return simhash_overlap_stats(docs, max_hamming=3, eager=eager)


@query(
    "incremental_simhash_dedup",
    oracle=_duck_simhash_sig_cte()
    + f""",
    news AS (SELECT * FROM chunks WHERE doc_id % 10 = 0),
    olds AS (SELECT * FROM chunks WHERE doc_id % 10 <> 0),
    cand AS (
      SELECT DISTINCT a.doc_id AS new_doc, b.doc_id AS old_doc,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      FROM news a JOIN olds b ON {_DUCK_CHUNK_MATCH})
    SELECT new_doc,
           min(old_doc) AS dup_of,
           count(*) AS n_candidates,
           CAST(min(hamming) AS BIGINT) AS min_hamming
    FROM cand WHERE hamming <= 3 GROUP BY new_doc
    """,
)
def incremental_simhash_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-space incremental dedup: new crawl batch (doc_id % 10 = 0)
    vs corpus via the asymmetric 16-bit-chunk equi-join (llm_ops.dedup.
    incremental_simhash_dedup) — the SimHash member of the incremental
    family (band / simhash / embedding)."""
    from video_etl_spark.llm_ops.dedup import incremental_simhash_dedup

    docs = load_table(spark, sf_dir, "documents")
    return incremental_simhash_dedup(
        docs.filter(F.col("doc_id") % 10 == 0),
        docs.filter(F.col("doc_id") % 10 != 0),
        max_hamming=3,
    )


# S9/S10 — audio segmentation + fake-ASR transcription, fully
# oracle-checked (the DuckDB side replays the vocab lookup in SQL).
from video_etl_spark.llm_ops.audio import asr_oracle_sql


@query("audio_transcripts", oracle=asr_oracle_sql())
def audio_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from video_etl_spark.llm_ops.audio import (
        attach_fake_audio,
        segment_audio,
        transcribe_segments,
    )

    docs = load_table(spark, sf_dir, "documents")
    return transcribe_segments(segment_audio(attach_fake_audio(docs)))


# P3/P10 — decode -> gray -> 2x2 pool, verified byte-for-byte: the linear
# pipeline collapses to a position-weighted integer sum the oracle replays.
from video_etl_spark.llm_ops.multimodal import preprocess_oracle_sql


@query("frame_preprocess_checksum", oracle=preprocess_oracle_sql())
def frame_preprocess_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from video_etl_spark.llm_ops.multimodal import (
        attach_fake_payload,
        preprocess_checksum,
    )

    docs = load_table(spark, sf_dir, "documents")
    return preprocess_checksum(attach_fake_payload(docs))


def knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U22 PQ ANN scale path: codes replace raw vectors for the scan; exact
    re-rank on a bounded shortlist.  Recall-tested vs the brute-force twin
    in tests/test_llm_ops.py.

    Registry-retired round 13 (superseded by the FULL-oracle
    ``knn_pq_indexed``); kept as a library-level example wrapper."""
    from video_etl_spark.llm_ops.similarity import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("vec_id") >= 5)
    return pq_topk(corpus, queries_df, k=10)


def knn_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry-retired round 13 (superseded by the FULL-oracle
    ``knn_lsh_indexed``); kept as a library-level example wrapper."""
    from video_etl_spark.llm_ops.similarity import lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("vec_id") >= 5)
    return lsh_topk(corpus, queries_df, k=10)


# The fake payload is the 32-char md5(text) hex string as bytes, and each
# feature byte i is byte i of md5(payload) = md5(md5(text)) — so DuckDB can
# recompute the entire 16-float vector and its quantized checksum exactly
# (float32 arithmetic == double-then-cast-FLOAT, verified exhaustively for
# all 256 byte values).
_MM_FEATURE_EXPR = (
    "CAST(CAST(round(CAST(CAST((CAST(('0x' || substr(md5(md5(text)), 2*i-1, 2)) "
    "AS BIGINT) - 127.5) / 127.5 AS FLOAT) AS DOUBLE) * 1000000) AS BIGINT) "
    "AS VARCHAR)"
)

_MM_ORACLE = f"""
SELECT doc_id,
       'image' AS modality,
       CAST(32 AS BIGINT) AS n_bytes,
       CAST(('0x' || substr(md5(array_to_string(
           [{_MM_FEATURE_EXPR} FOR i IN generate_series(1, 16)],
           ',')), 1, 15)) AS BIGINT) AS features_checksum
FROM documents
WHERE doc_id % 2 = 0
"""


@query("multimodal_features", oracle=_MM_ORACLE)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2/U1-U7 plumbing: binary payload scan → mapInPandas feature extract →
    scalar checksum projection (raw vectors stay a library-level API)."""
    from video_etl_spark.llm_ops.multimodal import (
        attach_fake_payload,
        extract_features,
        features_summary,
        sample_frames,
    )

    docs = load_table(spark, sf_dir, "documents")
    frames = attach_fake_payload(sample_frames(docs, stride=2))
    return features_summary(extract_features(frames))


def _mlp_oracle() -> str:
    from video_etl_spark.llm_ops.models import mlp_oracle_sql

    return mlp_oracle_sql()


@query("mlp_embedding", oracle=_mlp_oracle())
def mlp_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S15 pattern end-to-end with a REAL (numpy) model: binary payloads →
    scalar-iter pandas UDF with an executor-local lazy model cache →
    quantized BIGINT embedding columns.  The DuckDB oracle replays the
    entire MLP (generated from the same weights), so this is a full
    hash-checked model-inference path, not a stub."""
    from video_etl_spark.llm_ops.models import mlp_embed_quantized
    from video_etl_spark.llm_ops.multimodal import (
        attach_fake_payload,
        sample_frames,
    )

    docs = load_table(spark, sf_dir, "documents")
    frames = attach_fake_payload(sample_frames(docs, stride=2))
    return mlp_embed_quantized(frames)


@query("sort_tracker_synthetic")
def sort_tracker_synthetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic detections (derived from lineitem) through
    the SORT-style tracker — exercises the shuffle-once-then-ordered-state
    layout on real table data.

    The stream key is (returnflag × orderkey%16) ≈ 48 camera streams, the
    multi-camera shape the tracker is built for: parallelism scales with
    the stream count (one applyInPandas group per stream), and per-frame
    detection density stays bounded (~tens of boxes) so the Hungarian
    association's O(n³) inner step never sees a pathological frame.  The
    earlier 3-stream formulation put ~400 boxes in every frame — a 70 s
    single-task hotspot at sf0.01 and a non-starter at 100×."""
    from video_etl_spark.operators.tracking import sort_tracker

    li = load_table(spark, sf_dir, "lineitem")
    dets = li.select(
        F.concat(
            F.col("l_returnflag"), F.lit("-"), (F.col("l_orderkey") % 16)
        ).alias("stream"),
        (F.col("l_orderkey") % 50).alias("frame_no"),
        (F.col("l_partkey") % 100).cast("double").alias("x0"),
        (F.col("l_suppkey") % 80).cast("double").alias("y0"),
        ((F.col("l_partkey") % 100) + 12).cast("double").alias("x1"),
        ((F.col("l_suppkey") % 80) + 9).cast("double").alias("y1"),
    )
    return sort_tracker(dets)


@query("switch_log_replay")
def switch_log_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 batch replay: 2 s chunk scores through the C1 switcher, emitting
    the D15 switch log."""
    from video_etl_spark.control.buffer import ProcessingBuffer
    from video_etl_spark.control.switcher import KnobSwitcher, Profile

    ev = load_table(spark, sf_dir, "events")
    # Driver-side collect is the SURVEY §2.10 design: the switcher is a
    # sequential <1 ms/decision control loop over per-chunk AGGREGATES —
    # one row per 2 s window, never raw events.  Size is bounded by the
    # stream's wall-clock span (a year of 2 s chunks ≈ 16 M tiny rows),
    # not by data volume; _MAX_CHUNKS keeps a mis-scoped call loud.
    _MAX_CHUNKS = 2_000_000
    chunks = (
        ev.groupBy(F.window("ts", "2 seconds").alias("w"))
        .agg(
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100)
            .cast("double")
            .alias("value_sum"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(F.col("w.start").alias("window_start"), "value_sum", "n_events")
        .orderBy("window_start")
        .limit(_MAX_CHUNKS + 1)
        .collect()
    )
    if len(chunks) > _MAX_CHUNKS:
        raise ValueError(
            f"switch_log_replay: more than {_MAX_CHUNKS} 2s chunks; replay "
            "a narrower time slice (the switcher is a sequential control "
            "loop — it cannot consume an unbounded chunk stream at once)"
        )
    quality = [[0.9, 0.6, 0.2], [0.7, 0.5, 0.1], [0.3, 0.2, 0.05]]
    profile = Profile(
        runtime=(1.9, 1.0, 0.4, 1.2, 0.7, 0.3),
        cloud_cost=(0.0, 0.0, 0.0, 2.0, 1.5, 1.0),
        knob_config=(0, 1, 2, 0, 1, 2),
        size_bytes=(1e8,) * 6,
    )
    switcher = KnobSwitcher(
        quality,
        profile,
        ProcessingBuffer(16e9, profile.config_sizes()),
        cloud_budget=0.0,
        planning_interval=100,
        initial_histogram=[1.0, 1.0, 1.0],
    )
    rows = []
    for r in chunks:
        # score normalized into the quality range [0, 1]
        score = min(1.0, abs(r["value_sum"]) / (500.0 * max(r["n_events"], 1)))
        d = switcher.switch(score)
        rows.append(
            (d.chunk_id, r["window_start"], d.config, d.placement,
             d.cloud_cost, d.runtime, score)
        )
    from video_etl_spark.session import local_frame

    return local_frame(
        spark,
        rows,
        "chunk_id long, window_start timestamp, config int, placement int, "
        "cloud_cost double, runtime double, score double",
    )


@query("approx_count_distinct")
def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11's approximate-aggregation surface (HLL++). Rows-only: Spark's
    and DuckDB's HLL sketches differ by construction; the exact-count twin
    `count_distinct_lineitem` is the oracle-verified baseline, and pytest
    bounds the relative error against it."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("approx_supps"),
    )


def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U22's IVF scale path (KMeans-partitioned ANN). Rows-only: the KMeans
    fit is iterative; recall is pytest-bounded against the oracle-verified
    brute-force twin.

    Registry-retired round 13 (superseded by the FULL-oracle
    ``knn_ivf_indexed``); kept as a library-level example wrapper."""
    from video_etl_spark.llm_ops.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("vec_id") >= 5)
    return ivf_topk(corpus, queries_df, k=10)


@query("lflstm_fusion_users")
def lflstm_fusion_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U8 assembled end-to-end (reference lflstm.py:56-133): MOSEI-shaped
    text/visual/acoustic channels per event row → three numpy-LSTM legs →
    concat → fusion FC → per-user label + quantized logits, all inside one
    applyInPandas group pass.  Rows-only: the recurrent tanh/sigmoid chain
    is not SQL-replayable; the full forward pass is differentially tested
    against a single-process numpy reference (tests/test_llm_ops.py)."""
    from video_etl_spark.llm_ops.models import lflstm_fusion

    ev = load_table(spark, sf_dir, "events")
    return lflstm_fusion(ev)


@query("lstm_user_states")
def lstm_user_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U8 LFLSTM pattern: numpy LSTM over per-user ordered event values
    (applyInPandas, executor-cached weights). Rows-only: the recurrent
    tanh/sigmoid chain is not SQL-replayable; the cell is differentially
    tested against a per-gate scalar reference."""
    from video_etl_spark.llm_ops.models import lstm_user_states as _lstm

    ev = load_table(spark, sf_dir, "events")
    return _lstm(ev)


# --------------------------------------------------------------------------
# U10 — GCN layer as a RELATIONAL plan (reference TransMOT's graph conv,
# `workloads/transMOT/` GCN stack): one round of neighborhood message
# passing H = ReLU((A+I) X W) over the nation graph (edges = shared
# region, self-loops included).  Features are md5-derived integers, W is
# dyadic (k/16), accumulation is exact integer arithmetic until one final
# double division — so the whole layer hash-matches the DuckDB oracle.
# The Spark shape IS the scale shape: adjacency as an equi-join on the
# blocking key, aggregation as groupBy(dst) — a billion-edge graph runs
# the same plan.
_GCN_W = [  # deterministic 4x4 dyadic weights (k/16, k in [-8, 8])
    [3, -5, 7, 1], [-2, 4, -6, 8], [5, -1, 2, -7], [-8, 6, -3, 4],
]


def _gcn_feature_exprs(engine: str) -> list[str]:
    """x_i(node) = byte i of md5(nation name), engine-specific SQL."""
    if engine == "spark":
        return [
            f"cast(conv(substr(md5(n_name), {2 * i + 1}, 2), 16, 10) as bigint)"
            for i in range(4)
        ]
    return [
        f"CAST(('0x' || substr(md5(n_name), {2 * i + 1}, 2)) AS BIGINT)"
        for i in range(4)
    ]


def _gcn_oracle_sql() -> str:
    x = _gcn_feature_exprs("duck")
    feat = ", ".join(f"{e} AS x{i}" for i, e in enumerate(x))
    agg = ", ".join(f"sum(b.x{i}) AS s{i}" for i in range(4))
    outs = []
    for j in range(4):
        terms = " + ".join(f"s{i} * ({_GCN_W[i][j]})" for i in range(4))
        outs.append(
            f"CAST(greatest(CAST(({terms}) AS DOUBLE) / 16, 0) AS DOUBLE) AS h{j}"
        )
    return f"""
    WITH feat AS (
      SELECT n_nationkey, n_regionkey, n_name, {feat} FROM nation),
    msg AS (
      SELECT a.n_nationkey AS dst, {agg}
      FROM feat a JOIN feat b ON a.n_regionkey = b.n_regionkey
      GROUP BY a.n_nationkey)
    SELECT dst AS n_nationkey, {", ".join(outs)} FROM msg
    """


@query("gcn_layer_nations", oracle=_gcn_oracle_sql())
def gcn_layer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    x = _gcn_feature_exprs("spark")
    feat = nation.select(
        "n_nationkey", "n_regionkey",
        *[F.expr(e).alias(f"x{i}") for i, e in enumerate(x)],
    )
    a = feat.select(
        F.col("n_nationkey").alias("dst"), F.col("n_regionkey").alias("rg")
    )
    b = feat.select(
        F.col("n_regionkey").alias("rg"),
        *[F.col(f"x{i}") for i in range(4)],
    )
    # (A+I)X: neighbors = same region (self included by the equi-join)
    msg = (
        a.join(b, "rg")
        .groupBy("dst")
        .agg(*[F.sum(f"x{i}").alias(f"s{i}") for i in range(4)])
    )
    outs = []
    for j in range(4):
        lin = None
        for i in range(4):
            term = F.col(f"s{i}") * F.lit(_GCN_W[i][j])
            lin = term if lin is None else lin + term
        outs.append(
            F.greatest(lin.cast("double") / 16, F.lit(0.0))
            .cast("double").alias(f"h{j}")
        )
    return msg.select(F.col("dst").alias("n_nationkey"), *outs)


# --------------------------------------------------------------------------
# U9 — TransMOT-style graph ATTENTION layer as a relational plan
# (reference `workloads/transMOT/` spatial-graph transformer): per-edge
# scores from projected features, per-destination softmax, attention-
# weighted neighbor aggregation.  Edge scores use exact integer
# arithmetic; only exp() introduces engine ulp differences, absorbed by
# round(.., 6) on both sides (same convention as tfidf's ln).  The plan —
# edge equi-join, groupBy(dst) softmax denominator, weighted sum — is the
# standard distributed-attention shape.
def _gat_oracle_sql() -> str:
    x = _gcn_feature_exprs("duck")
    feat = ", ".join(f"{e} AS x{i}" for i, e in enumerate(x))
    # scalar projections: p = sum_i x_i * w_i / 16 (dyadic), exact halves
    p_src = " + ".join(f"a.x{i} * ({_GCN_W[0][i]})" for i in range(4))
    p_dst = " + ".join(f"b.x{i} * ({_GCN_W[1][i]})" for i in range(4))
    return f"""
    WITH feat AS (
      SELECT n_nationkey, n_regionkey, n_name, {feat} FROM nation),
    edges AS (
      SELECT b.n_nationkey AS dst, a.n_nationkey AS src,
             exp(CAST(({p_src}) + ({p_dst}) AS DOUBLE) / 4096) AS escore,
             a.x0 AS sx0, a.x1 AS sx1, a.x2 AS sx2, a.x3 AS sx3
      FROM feat a JOIN feat b ON a.n_regionkey = b.n_regionkey),
    attn AS (
      SELECT dst, src, escore / sum(escore) OVER (PARTITION BY dst) AS alpha,
             sx0, sx1, sx2, sx3
      FROM edges)
    SELECT dst AS n_nationkey,
           round(sum(alpha * sx0), 6) AS a0,
           round(sum(alpha * sx1), 6) AS a1,
           round(sum(alpha * sx2), 6) AS a2,
           round(sum(alpha * sx3), 6) AS a3
    FROM attn GROUP BY dst
    """


@query("gat_attention_nations", oracle=_gat_oracle_sql())
def gat_attention_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    nation = load_table(spark, sf_dir, "nation")
    x = _gcn_feature_exprs("spark")
    feat = nation.select(
        "n_nationkey", "n_regionkey",
        *[F.expr(e).alias(f"x{i}") for i, e in enumerate(x)],
    )
    a = feat.select(
        F.col("n_nationkey").alias("src"), F.col("n_regionkey").alias("rg"),
        *[F.col(f"x{i}").alias(f"sx{i}") for i in range(4)],
    )
    b = feat.select(
        F.col("n_nationkey").alias("dst"), F.col("n_regionkey").alias("rg"),
        *[F.col(f"x{i}").alias(f"dx{i}") for i in range(4)],
    )
    p_src = sum(
        (F.col(f"sx{i}") * F.lit(_GCN_W[0][i]) for i in range(1, 4)),
        F.col("sx0") * F.lit(_GCN_W[0][0]),
    )
    p_dst = sum(
        (F.col(f"dx{i}") * F.lit(_GCN_W[1][i]) for i in range(1, 4)),
        F.col("dx0") * F.lit(_GCN_W[1][0]),
    )
    edges = a.join(b, "rg").withColumn(
        "escore", F.exp((p_src + p_dst).cast("double") / 4096)
    )
    w = Window.partitionBy("dst")
    attn = edges.withColumn("alpha", F.col("escore") / F.sum("escore").over(w))
    return attn.groupBy(F.col("dst").alias("n_nationkey")).agg(
        *[
            F.round(F.sum(F.col("alpha") * F.col(f"sx{i}")), 6).alias(f"a{i}")
            for i in range(4)
        ]
    )


# --------------------------------------------------------------------------
# U10 (deep) — TWO stacked GCN layers, still oracle-EXACT: weight
# denominators are deferred (W holds integer numerators, /16 per layer →
# /256 once at the end), ReLU on integers is exact greatest(x, 0), so both
# rounds of message passing accumulate in BIGINTs.  Composition = two
# chained (equi-join → groupBy) blocks — the multi-layer GNN training shape
# with zero floating point until the final projection.
def _gcn2_oracle_sql() -> str:
    x = _gcn_feature_exprs("duck")
    feat = ", ".join(f"{e} AS x{i}" for i, e in enumerate(x))
    agg1 = ", ".join(f"sum(b.x{i}) AS s{i}" for i in range(4))
    h1 = []
    for j in range(4):
        terms = " + ".join(f"s{i} * ({_GCN_W[i][j]})" for i in range(4))
        h1.append(f"greatest({terms}, 0) AS h{j}")  # integer ReLU
    agg2 = ", ".join(f"sum(b2.h{i}) AS t{i}" for i in range(4))
    outs = []
    for j in range(4):
        # layer-2 weights: transpose of _GCN_W for variety, still dyadic
        terms = " + ".join(f"t{i} * ({_GCN_W[j][i]})" for i in range(4))
        outs.append(
            f"CAST(greatest(CAST(({terms}) AS DOUBLE) / 256, 0) AS DOUBLE)"
            f" AS z{j}"
        )
    return f"""
    WITH feat AS (
      SELECT n_nationkey, n_regionkey, n_name, {feat} FROM nation),
    msg1 AS (
      SELECT a.n_nationkey AS node, a.n_regionkey AS rg, {agg1}
      FROM feat a JOIN feat b ON a.n_regionkey = b.n_regionkey
      GROUP BY a.n_nationkey, a.n_regionkey),
    lay1 AS (
      SELECT node, rg, {", ".join(h1)} FROM msg1),
    msg2 AS (
      SELECT a2.node AS node, {agg2}
      FROM lay1 a2 JOIN lay1 b2 ON a2.rg = b2.rg
      GROUP BY a2.node)
    SELECT node AS n_nationkey, {", ".join(outs)} FROM msg2
    """


@query("gcn_two_layer_nations", oracle=_gcn2_oracle_sql())
def gcn_two_layer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    x = _gcn_feature_exprs("spark")
    feat = nation.select(
        "n_nationkey", "n_regionkey",
        *[F.expr(e).alias(f"x{i}") for i, e in enumerate(x)],
    )

    def message_pass(df, val_prefix, out_prefix):
        a = df.select(
            F.col("n_nationkey").alias("node"), F.col("n_regionkey").alias("rg")
        )
        b = df.select(
            F.col("n_regionkey").alias("rg"),
            *[F.col(f"{val_prefix}{i}") for i in range(4)],
        )
        return (
            a.join(b, "rg")
            .groupBy("node", "rg")
            .agg(*[F.sum(f"{val_prefix}{i}").alias(f"{out_prefix}{i}") for i in range(4)])
        )

    msg1 = message_pass(feat, "x", "s")
    h1 = msg1.select(
        F.col("node").alias("n_nationkey"), F.col("rg").alias("n_regionkey"),
        *[
            F.greatest(
                sum(
                    (F.col(f"s{i}") * F.lit(_GCN_W[i][j]) for i in range(1, 4)),
                    F.col("s0") * F.lit(_GCN_W[0][j]),
                ),
                F.lit(0),
            ).alias(f"h{j}")
            for j in range(4)
        ],
    )
    msg2 = message_pass(h1, "h", "t")
    outs = []
    for j in range(4):
        lin = sum(
            (F.col(f"t{i}") * F.lit(_GCN_W[j][i]) for i in range(1, 4)),
            F.col("t0") * F.lit(_GCN_W[j][0]),
        )
        outs.append(
            F.greatest(lin.cast("double") / 256, F.lit(0.0))
            .cast("double").alias(f"z{j}")
        )
    return msg2.select(F.col("node").alias("n_nationkey"), *outs)


# --------------------------------------------------------------------------
# U9 (full) — TransMOT stacked encoder/decoder as ONE relational program
# (reference `workloads/transMOT/transmot.py:149-252`): feature embedding →
# 2-layer SPATIAL graph-attention encoder (per-timestep, region graph) →
# TEMPORAL attention encoder over the T=5 sliding history per node (the W1
# window) → cross-attention DECODER whose memory is padded with the
# reference's constant-1 virtual SOURCE row (`transmot.py:224-227`),
# emitting per-node association features plus the virtual-source
# (new-track) score.  Every stage is the same scale shape as the single
# GAT layer: edge equi-join → window softmax → groupBy weighted sum; the
# decoder's memory side is a bounded 26-row broadcast.  Layer outputs are
# (attention + residual) / 2, keeping magnitudes constant so the
# dot-product attention argument (p_src·p_dst / 2^24 — the reference's
# TransformerEncoder uses scaled dot-product, not additive-GAT scores)
# stays within ±16 regardless of depth.  exp is the only
# engine-divergent op (1 ulp); round(.., 6) on the final outputs absorbs
# it — same convention as `gat_attention_nations`.
_TM_T = 5  # sliding-history length (W1)
_TM_LAYERS = (  # (wa_row, wb_row) into _GCN_W per attention stage
    (0, 1),  # spatial layer 1
    (2, 3),  # spatial layer 2
    (1, 2),  # temporal layer
    (3, 0),  # decoder cross-attention
)


def _tm_oracle_sql() -> str:
    x = _gcn_feature_exprs("duck")
    feats = ", ".join(
        f"({e} + t * {i + 1}) AS x{i}" for i, e in enumerate(x)
    )
    emb = ", ".join(
        "CAST(greatest("
        + " + ".join(f"x{i} * ({_GCN_W[i][j]})" for i in range(4))
        + ", 0) AS DOUBLE) / 16 AS f0_" + str(j)
        for j in range(4)
    )

    w = _GCN_W
    sp1 = _TM_LAYERS[0]
    sp2 = _TM_LAYERS[1]
    tmp = _TM_LAYERS[2]
    dec = _TM_LAYERS[3]

    def edge_block(name, src, keys, fin, fout, lay, part_extra, carry):
        wa, wb = w[lay[0]], w[lay[1]]
        p_src = " + ".join(f"a.{fin}{i} * ({wa[i]})" for i in range(4))
        p_dst = " + ".join(f"b.{fin}{i} * ({wb[i]})" for i in range(4))
        on = " AND ".join(f"a.{k} = b.{k}" for k in keys)
        carry_cols = ", ".join(f"b.{c} AS {c}" for c in carry)
        part = ", ".join(part_extra)
        sums = ", ".join(f"sum(alpha * s{i}) AS at{i}" for i in range(4))
        gb = ", ".join(["dst_id"] + list(carry))
        res_on = " AND ".join(
            [f"r.{c} = o.{c}" for c in carry] + ["r.node = o.dst_id"]
        )
        res = ", ".join(
            f"(o.at{i} + r.{fin}{i}) / 2 AS {fout}{i}" for i in range(4)
        )
        return f"""
    {name}_edges AS (
      SELECT {carry_cols}{"," if carry else ""} b.node AS dst_id,
             exp(CAST(({p_src}) * ({p_dst}) AS DOUBLE) / 16777216) AS sc,
             {", ".join(f"a.{fin}{i} AS s{i}" for i in range(4))}
      FROM {src} a JOIN {src} b ON {on}),
    {name}_attn AS (
      SELECT *, sc / sum(sc) OVER (PARTITION BY {part}) AS alpha
      FROM {name}_edges),
    {name}_out AS (
      SELECT {gb}, {sums} FROM {name}_attn GROUP BY {gb}),
    {name} AS (
      SELECT {", ".join(f"o.{c}" for c in carry)}{"," if carry else ""}
             o.dst_id AS node, {res}
      FROM {name}_out o JOIN {src} r ON {res_on})"""

    sp1_sql = edge_block(
        "sp1", "emb", ["t", "rg"], "f0_", "f1_", sp1,
        ["dst_id", "t"], ["t", "rg"],
    )
    sp2_sql = edge_block(
        "sp2", "sp1", ["t", "rg"], "f1_", "f2_", sp2,
        ["dst_id", "t"], ["t", "rg"],
    )
    # temporal: attends across the T history per node (join key = node,
    # softmax per (node, dst t)); 'carry' is the destination timestep
    wa, wb = w[tmp[0]], w[tmp[1]]
    p_src = " + ".join(f"a.f2_{i} * ({wa[i]})" for i in range(4))
    p_dst = " + ".join(f"b.f2_{i} * ({wb[i]})" for i in range(4))
    tmp_sql = f"""
    tp_edges AS (
      SELECT b.node AS node, b.t AS t,
             exp(CAST(({p_src}) * ({p_dst}) AS DOUBLE) / 16777216) AS sc,
             {", ".join(f"a.f2_{i} AS s{i}" for i in range(4))}
      FROM sp2 a JOIN sp2 b ON a.node = b.node),
    tp_attn AS (
      SELECT *, sc / sum(sc) OVER (PARTITION BY node, t) AS alpha
      FROM tp_edges),
    tp_out AS (
      SELECT node, t, {", ".join(f"sum(alpha * s{i}) AS at{i}" for i in range(4))}
      FROM tp_attn GROUP BY node, t),
    tp AS (
      SELECT o.node, o.t,
             {", ".join(f"(o.at{i} + r.f2_{i}) / 2 AS g{i}" for i in range(4))}
      FROM tp_out o JOIN sp2 r ON r.node = o.node AND r.t = o.t)"""
    # decoder memory: temporal output at the current frame + the constant-1
    # virtual source row (transmot.py pads memory with value 1)
    wa, wb = w[dec[0]], w[dec[1]]
    p_dec = " + ".join(f"d.f2_{i} * ({wa[i]})" for i in range(4))
    p_mem = " + ".join(f"m.g{i} * ({wb[i]})" for i in range(4))
    dec_sql = f"""
    memory AS (
      SELECT node AS mem_id, g0, g1, g2, g3 FROM tp WHERE t = {_TM_T - 1}
      UNION ALL
      SELECT -1 AS mem_id, 1.0 AS g0, 1.0 AS g1, 1.0 AS g2, 1.0 AS g3),
    dec_in AS (
      SELECT node, f2_0, f2_1, f2_2, f2_3 FROM sp2 WHERE t = {_TM_T - 1}),
    dec_edges AS (
      SELECT d.node AS node, m.mem_id,
             exp(CAST(({p_dec}) * ({p_mem}) AS DOUBLE) / 16777216) AS sc,
             m.g0 AS m0, m.g1 AS m1, m.g2 AS m2, m.g3 AS m3
      FROM dec_in d CROSS JOIN memory m),
    dec_attn AS (
      SELECT *, sc / sum(sc) OVER (PARTITION BY node) AS alpha
      FROM dec_edges)"""
    return f"""
    WITH grid AS (
      SELECT n_nationkey AS node, n_regionkey AS rg, n_name, t
      FROM nation, (SELECT unnest(generate_series(0, {_TM_T - 1})) AS t) ts),
    feat AS (
      SELECT node, rg, t, {feats} FROM grid),
    emb AS (
      SELECT node, rg, t, {emb} FROM feat),{sp1_sql},{sp2_sql},{tmp_sql},{dec_sql}
    SELECT node AS n_nationkey,
           {", ".join(f"round(sum(alpha * m{i}), 6) AS z{i}" for i in range(4))},
           round(sum(CASE WHEN mem_id = -1 THEN alpha ELSE 0 END), 6)
             AS src_score
    FROM dec_attn GROUP BY node
    """


def _tm_attn_layer(df, part_keys, fin, fout, wa, wb):
    """One attention stage: edge equi-join on ``part_keys`` → softmax per
    (part_keys, dst) → attention-weighted sum + residual, halved.  ``df``
    must carry ``node`` + part_keys + ``{fin}0..3``; output has the same
    shape with ``{fout}0..3``."""
    from pyspark.sql import Window

    a = df.select(
        *part_keys,
        *[F.col(f"{fin}{i}").alias(f"s{i}") for i in range(4)],
    )
    b = df.select(
        *part_keys,
        F.col("node").alias("dst_id"),
        *[F.col(f"{fin}{i}").alias(f"d{i}") for i in range(4)],
    )
    p_src = sum(
        (F.col(f"s{i}") * F.lit(wa[i]) for i in range(1, 4)),
        F.col("s0") * F.lit(wa[0]),
    )
    p_dst = sum(
        (F.col(f"d{i}") * F.lit(wb[i]) for i in range(1, 4)),
        F.col("d0") * F.lit(wb[0]),
    )
    edges = a.join(b, list(part_keys)).withColumn(
        "sc", F.exp((p_src * p_dst).cast("double") / 16777216)
    )
    w_sm = Window.partitionBy(*part_keys, "dst_id")
    attn = edges.withColumn("alpha", F.col("sc") / F.sum("sc").over(w_sm))
    out = attn.groupBy(*part_keys, "dst_id").agg(
        *[F.sum(F.col("alpha") * F.col(f"s{i}")).alias(f"at{i}") for i in range(4)]
    )
    res = df.select(
        *part_keys,
        F.col("node").alias("dst_id"),
        *[F.col(f"{fin}{i}").alias(f"r{i}") for i in range(4)],
    )
    return out.join(res, [*part_keys, "dst_id"]).select(
        *part_keys,
        F.col("dst_id").alias("node"),
        *[
            ((F.col(f"at{i}") + F.col(f"r{i}")) / 2).alias(f"{fout}{i}")
            for i in range(4)
        ],
    )


@query("transmot_stack_nations", oracle=_tm_oracle_sql())
def transmot_stack_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = _GCN_W
    nation = load_table(spark, sf_dir, "nation")
    x = _gcn_feature_exprs("spark")
    grid = nation.select(
        F.col("n_nationkey").alias("node"),
        F.col("n_regionkey").alias("rg"),
        "n_name",
        F.explode(F.expr(f"sequence(0, {_TM_T - 1})")).alias("t"),
    )
    feat = grid.select(
        "node", "rg", "t",
        *[
            (F.expr(e) + F.col("t") * F.lit(i + 1)).alias(f"x{i}")
            for i, e in enumerate(x)
        ],
    )
    # embedding: ReLU(X·We)/16 — the reference's Linear+relu input stage
    emb = feat.select(
        "node", "rg", "t",
        *[
            (
                F.greatest(
                    sum(
                        (F.col(f"x{i}") * F.lit(w[i][j]) for i in range(1, 4)),
                        F.col("x0") * F.lit(w[0][j]),
                    ),
                    F.lit(0),
                ).cast("double")
                / 16
            ).alias(f"f0_{j}")
            for j in range(4)
        ],
    )
    # spatial encoder ×2 (region graph per timestep), temporal encoder ×1
    sp1 = _tm_attn_layer(emb, ["t", "rg"], "f0_", "f1_",
                         w[_TM_LAYERS[0][0]], w[_TM_LAYERS[0][1]])
    sp2 = _tm_attn_layer(sp1, ["t", "rg"], "f1_", "f2_",
                         w[_TM_LAYERS[1][0]], w[_TM_LAYERS[1][1]])
    # temporal attention joins on node (full attention over the T history);
    # reuse the layer with part_keys=[node] and dst=t requires a rename:
    # treat t as the "node" within each node-partition.
    sp2_t = sp2.select(
        F.col("node").alias("track"), F.col("t").alias("node"),
        *[F.col(f"f2_{i}") for i in range(4)],
    )
    tp = _tm_attn_layer(sp2_t, ["track"], "f2_", "g",
                        w[_TM_LAYERS[2][0]], w[_TM_LAYERS[2][1]]).select(
        F.col("track").alias("node"), F.col("node").alias("t"),
        *[F.col(f"g{i}") for i in range(4)],
    )
    # decoder memory = temporal output at the current frame + the
    # constant-1 virtual source row (transmot.py:224-227 F.pad value=1)
    virtual = spark.range(1).select(
        F.lit(-1).cast("long").alias("mem_id"),
        *[F.lit(1.0).alias(f"g{i}") for i in range(4)],
    )
    memory = (
        tp.filter(F.col("t") == _TM_T - 1)
        .select(F.col("node").cast("long").alias("mem_id"),
                *[F.col(f"g{i}") for i in range(4)])
        .unionByName(virtual)
    )
    dec_in = sp2.filter(F.col("t") == _TM_T - 1).select(
        "node", *[F.col(f"f2_{i}") for i in range(4)]
    )
    wa, wb = w[_TM_LAYERS[3][0]], w[_TM_LAYERS[3][1]]
    p_dec = sum(
        (F.col(f"f2_{i}") * F.lit(wa[i]) for i in range(1, 4)),
        F.col("f2_0") * F.lit(wa[0]),
    )
    p_mem = sum(
        (F.col(f"g{i}") * F.lit(wb[i]) for i in range(1, 4)),
        F.col("g0") * F.lit(wb[0]),
    )
    # memory is bounded (current-frame tracks + 1 virtual row) → broadcast
    dec_edges = dec_in.crossJoin(F.broadcast(memory)).withColumn(
        "sc", F.exp((p_dec * p_mem).cast("double") / 16777216)
    )
    w_sm = Window.partitionBy("node")
    dec_attn = dec_edges.withColumn(
        "alpha", F.col("sc") / F.sum("sc").over(w_sm)
    )
    return dec_attn.groupBy(F.col("node").alias("n_nationkey")).agg(
        *[
            F.round(F.sum(F.col("alpha") * F.col(f"g{i}")), 6).alias(f"z{i}")
            for i in range(4)
        ],
        F.round(
            F.sum(F.when(F.col("mem_id") == -1, F.col("alpha")).otherwise(0.0)),
            6,
        ).alias("src_score"),
    )


# --------------------------------------------------------------------------
# U10⊕ — PageRank over the TRADE-FLOW graph (round 5): a weighted digraph
# derived from real table data (edge supp_nation → cust_nation weighted by
# lineitem count, plus a weight-1 self-loop per nation so no node
# dangles), iterated a FIXED 5 rounds in EXACT integer arithmetic: ranks
# live in 1e6 micro-units, each edge contributes
# floor(rank_src * w / out_w) (per-term exact → order-independent sums),
# damping is (flow * 85) div 100 + 150000.  Both engines execute the
# identical integer program, so the oracle matches bit for bit — the same
# parity discipline as the GCN stack (integer accumulation, no float
# until never).  Scale shape per iteration: edges ⋈ ranks (shuffle on
# src), groupBy(dst) — the standard distributed PageRank plan; the
# 25-node rank table broadcasts, and at a 100 TB edge set AQE picks
# SMJ/bucketed joins on the same program.
_PR_SCALE = 1_000_000
_PR_BASE = 150_000  # 0.15 * SCALE
_PR_ITERS = 5


def _pr_edges_sql() -> str:
    return """
    flows AS (
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst, count(*) AS w
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY s.s_nationkey, c.c_nationkey),
    loops AS (
      SELECT n_nationkey AS src, n_nationkey AS dst, 1 AS w FROM nation),
    edges AS (
      SELECT src, dst, CAST(sum(w) AS BIGINT) AS w
      FROM (SELECT * FROM flows UNION ALL SELECT * FROM loops)
      GROUP BY src, dst),
    outw AS (
      SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM edges GROUP BY src),
    nodes AS (
      SELECT n_nationkey AS node FROM nation)"""


def _pr_oracle_sql() -> str:
    its = [
        f"""
    rank0 AS (
      SELECT node, CAST({_PR_SCALE} AS BIGINT) AS rank FROM nodes)"""
    ]
    for k in range(1, _PR_ITERS + 1):
        its.append(f"""
    contrib{k} AS (
      SELECT e.dst, sum((r.rank * e.w) // t.ow) AS flow
      FROM rank{k - 1} r
      JOIN edges e ON e.src = r.node
      JOIN outw t ON t.src = e.src
      GROUP BY e.dst),
    rank{k} AS (
      SELECT n.node,
             CAST({_PR_BASE} + (COALESCE(c.flow, 0) * 85) // 100 AS BIGINT)
               AS rank
      FROM nodes n LEFT JOIN contrib{k} c ON c.dst = n.node)""")
    return (
        "WITH " + _pr_edges_sql().lstrip() + "," + ",".join(its)
        + f"""
    SELECT node AS n_nationkey, rank AS pagerank_micros
    FROM rank{_PR_ITERS}
    """
    )


def pagerank_iterate(
    nodes: DataFrame,
    edges_n: DataFrame,
    iters: int = _PR_ITERS,
    checkpoint_every: int = 6,
) -> DataFrame:
    """Run ``iters`` exact-integer PageRank rounds over a prepared graph.

    ``nodes`` has one ``node`` column; ``edges_n`` has ``src, dst, w, ow``
    (edge weight + source out-weight).  Every ``checkpoint_every`` rounds
    the rank frame is ``localCheckpoint``-ed so the plan tree stays O(k)
    instead of O(iters) — the same iterative-join lineage truncation as
    ``llm_ops.dedup.connected_components``; without it 20+ rounds explode
    Catalyst optimization time exactly like the pre-fix CC loop.  The
    default of 6 leaves the fixed 5-round oracle query's plan untouched.
    """
    ranks = nodes.withColumn("rank", F.lit(_PR_SCALE).cast("long"))
    for i in range(iters):
        contrib = (
            ranks.join(edges_n, ranks["node"] == edges_n["src"])
            .select(
                "dst",
                F.expr("(rank * w) div ow").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("flow"))
        )
        ranks = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (
                F.lit(_PR_BASE)
                + F.expr("(COALESCE(flow, 0) * 85) div 100")
            ).cast("long").alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iters:
            ranks = ranks.localCheckpoint()
    return ranks


def pagerank_iterate_bounded(
    nodes: DataFrame, edges_n: DataFrame, iters: int = _PR_ITERS
) -> DataFrame:
    """``pagerank_iterate`` for a graph KNOWN to be bounded (the
    nation-level trade graph: ≤ 25 nodes / ≤ 650 edges at ANY corpus
    scale — the scaling work is the flows aggregation upstream, never
    the iteration).  Runs the identical integer program in ONE
    single-partition Arrow task instead of ``iters`` × (join + groupBy +
    join) distributed rounds: round-15 profiling measured the
    distributed loop at ~40 jobs / 2.2–3.4 s of almost pure scheduling
    overhead for 18 KB of data (guide §8: use what you know that the
    optimizer does not — here, that the iteration state is constant-size).
    Differential-tested against ``pagerank_iterate`` and pinned by the
    same DuckDB oracle; per-term exact integer arithmetic makes the sum
    order-independent, so results are bit-identical.

    Contract: real edges carry ``w >= 1`` (node markers are injected
    internally as zero-weight self-loops so rank rows exist for
    edge-less nodes, exactly like the distributed form's left join).
    """
    marked = edges_n.select("src", "dst", "w", "ow").unionByName(
        nodes.select(
            F.col("node").alias("src"),
            F.col("node").alias("dst"),
            F.lit(0).cast("long").alias("w"),
            F.lit(1).cast("long").alias("ow"),
        )
    )

    # close over plain ints (pickled by value) so the worker-side
    # function needs no import of this module
    scale, base, n_iters = _PR_SCALE, _PR_BASE, iters

    def run(batches):
        import pandas as pd

        srcs, dsts, ws, ows = [], [], [], []
        for b in batches:
            srcs.extend(int(x) for x in b["src"])
            dsts.extend(int(x) for x in b["dst"])
            ws.extend(int(x) for x in b["w"])
            ows.extend(int(x) for x in b["ow"])
        # node set = marker rows (w == 0); matches the distributed
        # form's ranks/nodes frame exactly
        node_set = sorted(s for s, w in zip(srcs, ws) if w == 0)
        rank = {n: scale for n in node_set}
        edges = [
            (s, d, w, ow)
            for s, d, w, ow in zip(srcs, dsts, ws, ows)
            if w > 0 and s in rank
        ]
        for _ in range(n_iters):
            flow: dict[int, int] = {}
            for s, d, w, ow in edges:
                flow[d] = flow.get(d, 0) + (rank[s] * w) // ow
            rank = {
                n: base + (flow.get(n, 0) * 85) // 100 for n in node_set
            }
        yield pd.DataFrame(
            {"node": node_set, "rank": [rank[n] for n in node_set]}
        )

    return marked.coalesce(1).mapInPandas(run, schema="node long, rank long")


@query("pagerank_trade_flow", oracle=_pr_oracle_sql())
def pagerank_trade_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    flows = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    loops = nation.select(
        F.col("n_nationkey").alias("src"),
        F.col("n_nationkey").alias("dst"),
        F.lit(1).alias("w"),
    )
    edges = (
        flows.unionByName(loops)
        .groupBy("src", "dst")
        .agg(F.sum("w").cast("long").alias("w"))
        .persist()
    )
    outw = edges.groupBy("src").agg(F.sum("w").cast("long").alias("ow"))
    edges_n = edges.join(outw, "src")
    nodes = nation.select(F.col("n_nationkey").alias("node"))

    # Round-15: the nation graph is constant-size (≤ 25 nodes) at any
    # corpus scale, so iterate it in one Arrow task instead of 5
    # distributed rounds (~40 jobs of scheduling overhead — see
    # pagerank_iterate_bounded; pagerank_iterate remains the general
    # unbounded-graph form and its differential test pins equality).
    ranks = pagerank_iterate_bounded(nodes, edges_n, _PR_ITERS)
    # One node per nation (25 rows): materializing via localCheckpoint is
    # ~free and lets us unpersist ``edges`` deterministically instead of
    # leaning on LRU eviction across a long session (round-5 advice).
    result = ranks.select(
        F.col("node").alias("n_nationkey"),
        F.col("rank").alias("pagerank_micros"),
    ).localCheckpoint()
    edges.unpersist()
    return result
