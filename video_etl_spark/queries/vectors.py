"""Embedding / vector queries over the `embeddings` table (SURVEY.md U22,
P13, U4-U7's embedding-column downstream ops).

Covers: brute-force cosine top-k (the ANN baseline — U22), embedding-cosine
near-duplicate pairs (U21's embedding variant), mean-pooling per group (P13,
`transmot.py:175-184`'s view+mean re-expressed as posexplode+agg), and vector
norms (scalar math family §2.7).

Cross-engine determinism: float math is quantized to integer micro-units
(round(x*1e6) as BIGINT) before any aggregation, so dot products and norms
are *exact* integer arithmetic in both engines; only the final
divide/sqrt runs in IEEE double, which is bit-reproducible.  The LSH-bucketed
scale path lives in llm_ops/similarity.py (rows-only check: result quality is
asserted against this brute-force oracle in tests).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from video_etl_spark.operators.skew import spread_small_scan
from video_etl_spark.registry import query
from video_etl_spark.session import load_table

# Quantized-vector helpers --------------------------------------------------

_SPARK_QUANT = (
    "transform(embedding, x -> cast(round(cast(x as double) * 1000000) as bigint))"
)
_DUCK_QUANT = (
    "[CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) FOR x IN embedding]"
)

# dot(qa, qb) as exact BIGINT, then cast to double
_SPARK_DOT = (
    "aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
)
_DUCK_DOT = "list_sum([qa[i] * qb[i] FOR i IN generate_series(1, len(qa))])"

_SPARK_SQ = "aggregate(transform(q, x -> x * x), 0L, (acc, v) -> acc + v)"
_DUCK_SQ = "list_sum([x * x FOR x IN q])"


# --------------------------------------------------------------------------
# U22 — brute-force cosine top-k (ANN baseline): 5 query vectors against the
# rest of the corpus; rank per query.  The scan side never shuffles: the tiny
# query set is broadcast and similarity+top-k run map-side then TakeOrdered.
@query(
    "knn_cosine_bruteforce",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, {_DUCK_QUANT} AS q FROM embeddings
    ), n AS (
      SELECT vec_id, q, CAST({_DUCK_SQ} AS DOUBLE) AS sq FROM q
    ), pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             CAST({_DUCK_DOT.replace('qa', 'a.q').replace('len(qa)', 'len(a.q)').replace('qb', 'b.q')} AS DOUBLE)
               / (sqrt(a.sq) * sqrt(b.sq)) AS cos_sim
      FROM n a JOIN n b ON a.vec_id < 5 AND b.vec_id >= 5)
    SELECT query_id, neighbor_id, cos_sim,
           CAST(rn AS BIGINT) AS rn
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, neighbor_id) AS rn
          FROM pairs)
    WHERE rn <= 10
    """,
)
def knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "q", F.expr(_SPARK_QUANT)
    ).withColumn("sq", F.expr(_SPARK_SQ).cast("double")).persist()
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qa"),
        F.col("sq").alias("sqa"),
    )
    corpus = emb.filter(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("q").alias("qb"),
        F.col("sq").alias("sqb"),
    )
    pairs = corpus.join(F.broadcast(queries)).withColumn(
        "cos_sim",
        F.expr(_SPARK_DOT).cast("double")
        / (F.sqrt(F.col("sqa")) * F.sqrt(F.col("sqb"))),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 10)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


# --------------------------------------------------------------------------
# U21 — embedding-cosine near-duplicate pairs within a label bucket
# (blocked all-pairs; blocking key bounds the pair space like LSH buckets).
@query(
    "embedding_near_dup_pairs",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label, {_DUCK_QUANT} AS q FROM embeddings
    ), n AS (
      SELECT vec_id, label, q, CAST({_DUCK_SQ} AS DOUBLE) AS sq FROM q)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST({_DUCK_DOT.replace('qa', 'a.q').replace('len(qa)', 'len(a.q)').replace('qb', 'b.q')} AS DOUBLE)
             / (sqrt(a.sq) * sqrt(b.sq)) AS cos_sim
    FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE CAST({_DUCK_DOT.replace('qa', 'a.q').replace('len(qa)', 'len(a.q)').replace('qb', 'b.q')} AS DOUBLE)
             / (sqrt(a.sq) * sqrt(b.sq)) >= 0.5
    """,
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "q", F.expr(_SPARK_QUANT)
    ).withColumn("sq", F.expr(_SPARK_SQ).cast("double"))
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("label"),
        F.col("q").alias("qa"), F.col("sq").alias("sqa"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("label_b"),
        F.col("q").alias("qb"), F.col("sq").alias("sqb"),
    )
    sim = F.expr(_SPARK_DOT).cast("double") / (F.sqrt("sqa") * F.sqrt("sqb"))
    return (
        a.join(b, (F.col("label") == F.col("label_b")) & (F.col("vec_a") < F.col("vec_b")))
        .withColumn("cos_sim", sim)
        .filter(F.col("cos_sim") >= 0.5)
        .select("vec_a", "vec_b", "cos_sim")
    )


# --------------------------------------------------------------------------
# P13 — mean-pool per (label, dim): posexplode + exact integer aggregation
# (the reference's view+mean feature pooling, transmot.py:175-184).
@query(
    "embedding_mean_pool",
    oracle=f"""
    WITH q AS (
      SELECT label,
             unnest({_DUCK_QUANT}) AS qv,
             unnest(generate_series(1, len(embedding))) AS dim
      FROM embeddings)
    SELECT label, CAST(dim AS BIGINT) AS dim,
           CAST(CAST(sum(qv) AS DOUBLE) / (count(*) * 1000000) AS DOUBLE) AS mean_val,
           count(*) AS n_vectors
    FROM q GROUP BY label, dim
    """,
)
def embedding_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").withColumn("q", F.expr(_SPARK_QUANT))
    exploded = emb.select(
        "label", F.posexplode("q").alias("dim0", "qv")
    ).withColumn("dim", (F.col("dim0") + 1).cast("long"))
    return exploded.groupBy("label", "dim").agg(
        (
            (F.sum("qv") / (F.count(F.lit(1)) * 1_000_000))
        ).cast("double").alias("mean_val"),
        F.count(F.lit(1)).alias("n_vectors"),
    )


# --------------------------------------------------------------------------
# §2.7 math family — vector L2 norms via higher-order functions, top-k.
@query(
    "vector_norms_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id, label, {_DUCK_QUANT} AS q FROM embeddings)
    SELECT vec_id, label,
           sqrt(CAST({_DUCK_SQ} AS DOUBLE)) / 1000000 AS l2_norm
    FROM q
    ORDER BY l2_norm DESC, vec_id
    LIMIT 10
    """,
)
def vector_norms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").withColumn("q", F.expr(_SPARK_QUANT))
    return (
        emb.select(
            "vec_id",
            "label",
            (F.sqrt(F.expr(_SPARK_SQ).cast("double")) / 1_000_000).alias("l2_norm"),
        )
        .orderBy(F.desc("l2_norm"), "vec_id")
        .limit(10)
    )


# --------------------------------------------------------------------------
# U21⊕/U22⊕ — INCREMENTAL embedding dedup, exact twin (round 6): a NEW
# batch of vectors (vec_id % 10 = 0) matched against the indexed corpus by
# cosine, blocked on `label` (the coarse-quantizer stand-in), ASYMMETRIC —
# no history×history pair, mirroring incremental_band_dedup.  This exact
# form is the oracle baseline; llm_ops.dedup.incremental_embedding_dedup
# is the LSH-bucketed scale path with the same output contract
# (differential-tested).  The 0.3 threshold fits the synthetic corpus's
# near-orthogonal vectors (max same-label cosine ≈ 0.41).
@query(
    "incremental_embedding_dedup",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label, {_DUCK_QUANT} AS q FROM embeddings
    ), n AS (
      SELECT vec_id, label, q, CAST({_DUCK_SQ} AS DOUBLE) AS sq FROM q),
    hits AS (
      SELECT a.vec_id AS new_id, b.vec_id AS old_id,
             CAST({_DUCK_DOT.replace('qa', 'a.q').replace('len(qa)', 'len(a.q)').replace('qb', 'b.q')} AS DOUBLE)
               / (sqrt(a.sq) * sqrt(b.sq)) AS cos_sim
      FROM n a JOIN n b
        ON a.label = b.label AND a.vec_id % 10 = 0 AND b.vec_id % 10 <> 0)
    SELECT new_id, min(old_id) AS dup_of,
           CAST(count(*) AS BIGINT) AS n_candidates, max(cos_sim) AS max_cos
    FROM hits WHERE cos_sim >= 0.3 GROUP BY new_id
    """,
)
def incremental_embedding_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-15 (guide §2.5 input skew): spread the below-parallelism scan
    # BEFORE the quantize/sq math — the single-split embeddings parquet
    # otherwise runs the whole per-vector arithmetic as one task.
    # Interleaved A/B: 0.67 → 0.45 s min (every E sample below every A).
    # No-op at production split counts (plan-side probe).
    emb = spread_small_scan(
        load_table(spark, sf_dir, "embeddings")
    ).withColumn(
        "q", F.expr(_SPARK_QUANT)
    ).withColumn("sq", F.expr(_SPARK_SQ).cast("double"))
    new = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("new_id"), "label",
        F.col("q").alias("qa"), F.col("sq").alias("sqa"),
    )
    old = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("old_id"), F.col("label").alias("label_b"),
        F.col("q").alias("qb"), F.col("sq").alias("sqb"),
    )
    sim = F.expr(_SPARK_DOT).cast("double") / (F.sqrt("sqa") * F.sqrt("sqb"))
    return (
        new.join(old, F.col("label") == F.col("label_b"))
        .withColumn("cos_sim", sim)
        .filter(F.col("cos_sim") >= 0.3)
        .groupBy("new_id")
        .agg(
            F.min("old_id").alias("dup_of"),
            F.count(F.lit(1)).alias("n_candidates"),
            F.max("cos_sim").alias("max_cos"),
        )
    )


# --------------------------------------------------------------------------
# U14⊕/U22⊕ — KMEANS LLOYD ITERATIONS AS A RELATIONAL PLAN (round 6): the
# embedding-clustering step of a curation pipeline (topic bucketing,
# SemDeDup-style cluster-then-dedup, IVF coarse quantizer training —
# llm_ops.similarity.ivf_topk consumes exactly such centroids) run as two
# exact Lloyd iterations: assign to nearest of K=8 seed centers (the first
# 8 vectors — deterministic farthest-thing from RNG), recompute integer
# centroids, repeat, emit per-(center, dim) centroid + member count.
#
# Exactness across engines: embeddings quantize to 1e6-unit BIGINTs with a
# +4e6 OFFSET so every value is positive — integer floor division then
# agrees between Spark's `div` (truncate toward zero) and DuckDB's `//`
# (floor), which differ on negatives.  Distances are offset-invariant;
# the offset is subtracted back in the output.  Empty clusters drop out
# (inner-join semantics; standard Lloyd behavior without reseeding).
#
# Plan shape (per iteration): assignment = broadcast-K nested-loop fan-out
# (centers are ALWAYS tiny) + one groupBy(vec_id) min-struct argmin;
# update = posexplode to (center, dim) grain + one groupBy — partial
# aggregation collapses each map partition to ≤ K×dims rows before the
# shuffle, so shuffle volume is partitions × 512 rows regardless of corpus
# size.  At 100 TB: identical plan, K rows broadcast, centroids reduce
# tree-style; driver never sees per-vector data.
_KM_K = 8
_KM_OFF = 4_000_000

_DUCK_QOFF = (
    f"[CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) + {_KM_OFF} "
    "FOR x IN embedding]"
)


def _duck_lloyd_round(qcte: str, centers: str, out: str) -> str:
    """One DuckDB Lloyd iteration: distances → argmin → integer centroids."""
    return f"""
    d{out} AS (
      SELECT a.vec_id, c.center_id,
             list_sum([(a.q[i] - c.c[i]) * (a.q[i] - c.c[i])
                       FOR i IN generate_series(1, len(a.q))]) AS dist
      FROM {qcte} a CROSS JOIN {centers} c),
    a{out} AS (
      SELECT vec_id, center_id FROM (
        SELECT vec_id, center_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, center_id) AS rn
        FROM d{out}) WHERE rn = 1),
    m{out} AS (
      SELECT a.center_id, g.i AS dim,
             CAST(sum(q.q[g.i]) // count(*) AS BIGINT) AS c,
             count(*) AS n_members
      FROM a{out} a JOIN q ON a.vec_id = q.vec_id,
           generate_series(1, 64) AS g(i)
      GROUP BY a.center_id, g.i)"""


@query(
    "kmeans_lloyd_embeddings",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, {_DUCK_QOFF} AS q FROM embeddings),
    c0 AS (
      SELECT vec_id AS center_id, q AS c FROM q WHERE vec_id < {_KM_K}),
    {_duck_lloyd_round('q', 'c0', '1')},
    c1 AS (
      SELECT center_id, list(c ORDER BY dim) AS c FROM m1 GROUP BY center_id),
    {_duck_lloyd_round('q', 'c1', '2')}
    SELECT CAST(center_id AS BIGINT) AS center_id,
           CAST(dim AS BIGINT) AS dim,
           CAST(c - {_KM_OFF} AS BIGINT) AS centroid_q,
           CAST(n_members AS BIGINT) AS n_members
    FROM m2
    """,
)
def kmeans_lloyd_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    quant = F.expr(
        "transform(embedding, x -> "
        f"cast(round(cast(x as double) * 1000000) as bigint) + {_KM_OFF})"
    )
    # Round-15 (guide §2.5): spread ONLY the probe side — the Lloyd
    # assign/update math over the single-split embeddings parquet ran as
    # three ~0.3 s single tasks.  The tiny seed-center fork stays on the
    # raw scan so its broadcast build never stalls behind the exchange
    # (the benchmark_decontamination lesson; a blanket spread of both
    # forks measured SLOWER, 1.43 vs 1.64 min).  Probe-side-only:
    # 1.435 → 1.287 s min, results hash-identical.
    q = spread_small_scan(emb).select("vec_id", quant.alias("q"))
    centers = emb.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("center_id"), quant.alias("c")
    )

    dist = F.expr(
        "aggregate(zip_with(q, c, (x, y) -> (x - y) * (x - y)), "
        "0L, (acc, v) -> acc + v)"
    )

    def assign(centers_df: DataFrame) -> DataFrame:
        return (
            q.crossJoin(F.broadcast(centers_df))
            .select("vec_id", "center_id", dist.alias("dist"))
            .groupBy("vec_id")
            .agg(F.min(F.struct("dist", "center_id")).alias("m"))
            .select("vec_id", F.col("m.center_id").alias("center_id"))
        )

    def update(assigned: DataFrame) -> DataFrame:
        return (
            assigned.join(q, "vec_id")
            .select("center_id", F.posexplode("q").alias("dim0", "val"))
            .groupBy("center_id", "dim0")
            .agg(
                F.sum("val").alias("s"),
                F.count(F.lit(1)).alias("n_members"),
            )
            .select(
                "center_id",
                (F.col("dim0") + 1).cast("long").alias("dim"),
                F.expr("s div n_members").cast("long").alias("c"),
                F.col("n_members").cast("long"),
            )
        )

    m1 = update(assign(centers))
    c1 = (
        m1.groupBy("center_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("sc")
        )
        .select("center_id", F.expr("transform(sc, x -> x.c)").alias("c"))
    )
    m2 = update(assign(c1))
    return m2.select(
        F.col("center_id").cast("long").alias("center_id"),
        "dim",
        (F.col("c") - _KM_OFF).cast("long").alias("centroid_q"),
        "n_members",
    )


# --------------------------------------------------------------------------
# U21⊕/U22⊕ — SEMANTIC DEDUP PAIRS (round 6): the SemDeDup-shaped scale
# path for embedding near-dup mining — block candidate pairs by LEARNED
# cluster (one KMeans assignment against the same K=8 seed centers
# kmeans_lloyd_embeddings trains) instead of by label
# (embedding_near_dup_pairs) or LSH bucket (llm_ops.similarity).  Within a
# cluster, exact quantized cosine ≥ 0.4 decides the pair.  Assignment is
# MULTI-PROBE (each vector joins its top-2 nearest centers): single-probe
# recall on this corpus is 0.29 (boundary pairs split across clusters);
# two probes lift it to ~0.8 at 2× fan-out — the measured-recall test pins
# this, and the pair DISTINCT removes both-probes-shared duplicates.
# Plan shape: broadcast-K assignment fan-out (never corpus²), then a
# self-equi-join on center_id — pair work is Σ n_c², bounded by keeping
# per-cluster occupancy fixed as K grows with the corpus (the SemDeDup
# recipe: K ∝ N keeps n_c constant, so the join stays linear-ish at
# 100 TB while vectors shuffle once on a well-spread key).
@query(
    "semantic_dedup_pairs",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, {_DUCK_QUANT} AS q FROM embeddings),
    n AS (
      SELECT vec_id, q, CAST({_DUCK_SQ.replace('q', 'q')} AS DOUBLE) AS sq
      FROM q),
    c0 AS (SELECT vec_id AS center_id, q AS c FROM q WHERE vec_id < 8),
    d AS (
      SELECT a.vec_id, c.center_id,
             list_sum([(a.q[i] - c.c[i]) * (a.q[i] - c.c[i])
                       FOR i IN generate_series(1, len(a.q))]) AS dist
      FROM q a CROSS JOIN c0 c),
    asg AS (
      SELECT vec_id, center_id FROM (
        SELECT vec_id, center_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, center_id) AS rn
        FROM d) WHERE rn <= 2)
    SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b,
           CAST(list_sum([x.q[i] * y.q[i]
                          FOR i IN generate_series(1, len(x.q))]) AS DOUBLE)
             / (sqrt(x.sq) * sqrt(y.sq)) AS cos_sim
    FROM asg ax JOIN n x ON ax.vec_id = x.vec_id
    JOIN asg ay ON ax.center_id = ay.center_id AND ax.vec_id < ay.vec_id
    JOIN n y ON ay.vec_id = y.vec_id
    WHERE CAST(list_sum([x.q[i] * y.q[i]
                         FOR i IN generate_series(1, len(x.q))]) AS DOUBLE)
            / (sqrt(x.sq) * sqrt(y.sq)) >= 0.4
    """,
)
def semantic_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # thin oracle-checked K=8 / 2-probe instance of the parameterized
    # library op (the scale rehearsal drives n_centers=64 at ~sf1)
    from video_etl_spark.llm_ops.similarity import cluster_blocked_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return cluster_blocked_pairs(emb, n_centers=8, n_probes=2, threshold=0.4)


# --------------------------------------------------------------------------
# U22⊕/U14⊕ — KNN LABEL CLASSIFICATION (round 6): the annotation/QA use of
# similarity search — score a small eval set against the labeled corpus by
# k=5 nearest-cosine majority vote (ties → larger vote count first, then
# smaller label id) and report per-class accuracy.  This is the relational
# form of "propagate labels to new data / audit embedding quality";
# the curation use is scoring crawl batches against a labeled seed set.
# Plan shape: the eval set (fixed 20 vectors — a BOUNDED query set, like
# knn_cosine_bruteforce's) broadcasts against the corpus scan; vote
# counting and the argmax are two narrow window passes over k×|eval| rows.
# At 100 TB the corpus side still scans once and shuffles only (query,
# neighbor) id pairs.
@query(
    "knn_label_accuracy",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label, {_DUCK_QUANT} AS q FROM embeddings),
    n AS (
      SELECT vec_id, label, q, CAST({_DUCK_SQ} AS DOUBLE) AS sq FROM q),
    pairs AS (
      SELECT a.vec_id AS query_id, a.label AS true_label,
             b.label AS neighbor_label,
             CAST({_DUCK_DOT.replace('qa', 'a.q').replace('len(qa)', 'len(a.q)').replace('qb', 'b.q')} AS DOUBLE)
               / (sqrt(a.sq) * sqrt(b.sq)) AS cos_sim,
             b.vec_id AS neighbor_id
      FROM n a JOIN n b ON a.vec_id < 20 AND b.vec_id >= 20),
    topk AS (
      SELECT query_id, true_label, neighbor_label FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM pairs) WHERE rn <= 5),
    votes AS (
      SELECT query_id, true_label, neighbor_label, count(*) AS votes
      FROM topk GROUP BY query_id, true_label, neighbor_label),
    pred AS (
      SELECT query_id, true_label, neighbor_label AS predicted FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY votes DESC, neighbor_label) AS rn
        FROM votes) WHERE rn = 1)
    SELECT true_label AS label,
           count(*) AS n_eval,
           CAST(sum(CASE WHEN predicted = true_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct
    FROM pred GROUP BY true_label
    """,
)
def knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-15 scan spread (see incremental_embedding_dedup_exact):
    # 0.79 → 0.62 s min, every E sample below every A sample.
    emb = spread_small_scan(
        load_table(spark, sf_dir, "embeddings")
    ).withColumn(
        "q", F.expr(_SPARK_QUANT)
    ).withColumn("sq", F.expr(_SPARK_SQ).cast("double"))
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("q").alias("qa"),
        F.col("sq").alias("sqa"),
    )
    corpus = emb.filter(F.col("vec_id") >= 20).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("q").alias("qb"),
        F.col("sq").alias("sqb"),
    )
    cos = F.expr(_SPARK_DOT).cast("double") / (F.sqrt("sqa") * F.sqrt("sqb"))
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), "neighbor_id"
    )
    topk = (
        corpus.join(F.broadcast(queries))
        .withColumn("cos_sim", cos)
        .withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= 5)
        .select("query_id", "true_label", "neighbor_label")
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.desc("votes"), "neighbor_label"
    )
    pred = (
        topk.groupBy("query_id", "true_label", "neighbor_label")
        .agg(F.count(F.lit(1)).alias("votes"))
        .withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("query_id", "true_label", F.col("neighbor_label").alias("predicted"))
    )
    return pred.groupBy(F.col("true_label").alias("label")).agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum(
            F.when(F.col("predicted") == F.col("true_label"), 1).otherwise(0)
        ).cast("long").alias("n_correct"),
    )


# --------------------------------------------------------------------------
# U22⊕ — HARD-NEGATIVE MINING (round 6): contrastive-training data prep —
# for each eval vector, the top-3 most-similar corpus vectors with a
# DIFFERENT label (the "looks alike, isn't" pairs a contrastive or
# reranker training run needs).  Same bounded-broadcast shape as
# knn_label_accuracy: eval side fixed and tiny, corpus side scans once,
# one window pass ranks per query.
@query(
    "hard_negative_mining",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label, {_DUCK_QUANT} AS q FROM embeddings),
    n AS (
      SELECT vec_id, label, q, CAST({_DUCK_SQ} AS DOUBLE) AS sq FROM q),
    pairs AS (
      SELECT a.vec_id AS query_id, a.label AS query_label,
             b.vec_id AS neighbor_id, b.label AS neighbor_label,
             CAST({_DUCK_DOT.replace('qa', 'a.q').replace('len(qa)', 'len(a.q)').replace('qb', 'b.q')} AS DOUBLE)
               / (sqrt(a.sq) * sqrt(b.sq)) AS cos_sim
      FROM n a JOIN n b
        ON a.vec_id < 20 AND b.vec_id >= 20 AND a.label <> b.label)
    SELECT query_id, neighbor_id, neighbor_label, cos_sim,
           CAST(rn AS BIGINT) AS rn
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, neighbor_id)
                    AS rn
          FROM pairs)
    WHERE rn <= 3
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-15 scan spread (see incremental_embedding_dedup_exact):
    # 0.58 → 0.42 s min, every E sample below every A sample.
    emb = spread_small_scan(
        load_table(spark, sf_dir, "embeddings")
    ).withColumn(
        "q", F.expr(_SPARK_QUANT)
    ).withColumn("sq", F.expr(_SPARK_SQ).cast("double"))
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("q").alias("qa"),
        F.col("sq").alias("sqa"),
    )
    corpus = emb.filter(F.col("vec_id") >= 20).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("q").alias("qb"),
        F.col("sq").alias("sqb"),
    )
    cos = F.expr(_SPARK_DOT).cast("double") / (F.sqrt("sqa") * F.sqrt("sqb"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        corpus.join(
            F.broadcast(queries),
            F.col("query_label") != F.col("neighbor_label"),
        )
        .withColumn("cos_sim", cos)
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", "neighbor_label", "cos_sim", "rn")
    )


# --------------------------------------------------------------------------
# U21⊕/U22⊕ — SEMANTIC CANONICAL VECTORS (round 6): the composed
# semantic-dedup PIPELINE as one oracle-pinned query — cluster-blocked
# candidate pairs (semantic_dedup_pairs) → connected components → min-id
# canonical per cluster.  The text side pins shingle→minhash→band→CC→pick
# (canonical_cluster_docs); this pins the embedding side end to end:
# quantize→assign→block→cosine→CC→pick.  The oracle reuses the pair CTEs
# plus the recursive reachability pattern.
# Plan shape: the pair generation is the semantic_dedup plan; CC rounds
# shuffle ids only; the pick is one aggregate — vectors never move after
# the pair join.
@query(
    "semantic_canonical_vecs",
    oracle=f"""
    WITH RECURSIVE q AS (
      SELECT vec_id, {_DUCK_QUANT} AS q FROM embeddings),
    n AS (
      SELECT vec_id, q, CAST({_DUCK_SQ} AS DOUBLE) AS sq FROM q),
    c0 AS (SELECT vec_id AS center_id, q AS c FROM q WHERE vec_id < 8),
    d AS (
      SELECT a.vec_id, c.center_id,
             list_sum([(a.q[i] - c.c[i]) * (a.q[i] - c.c[i])
                       FOR i IN generate_series(1, len(a.q))]) AS dist
      FROM q a CROSS JOIN c0 c),
    asg AS (
      SELECT vec_id, center_id FROM (
        SELECT vec_id, center_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, center_id) AS rn
        FROM d) WHERE rn <= 2),
    prs AS (
      SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
      FROM asg ax JOIN n x ON ax.vec_id = x.vec_id
      JOIN asg ay ON ax.center_id = ay.center_id AND ax.vec_id < ay.vec_id
      JOIN n y ON ay.vec_id = y.vec_id
      WHERE CAST(list_sum([x.q[i] * y.q[i]
                           FOR i IN generate_series(1, len(x.q))]) AS DOUBLE)
              / (sqrt(x.sq) * sqrt(y.sq)) >= 0.4),
    bidir AS (
      SELECT vec_a AS u, vec_b AS v FROM prs
      UNION SELECT vec_b AS u, vec_a AS v FROM prs),
    reach AS (
      SELECT u, v FROM bidir
      UNION
      SELECT r.u, b.v FROM reach r JOIN bidir b ON r.v = b.u),
    comp AS (
      SELECT e.vec_id,
             least(e.vec_id, coalesce(m.mv, e.vec_id)) AS component
      FROM embeddings e
      LEFT JOIN (SELECT u, min(v) AS mv FROM reach GROUP BY u) m
        ON m.u = e.vec_id)
    SELECT component,
           min(vec_id) AS canonical_vec_id,
           count(*) AS n_members
    FROM comp GROUP BY component
    """,
)
def semantic_canonical_vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from video_etl_spark.llm_ops.dedup import connected_components
    from video_etl_spark.llm_ops.similarity import cluster_blocked_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    edges = cluster_blocked_pairs(emb, n_centers=8, n_probes=2).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    comp = connected_components(
        edges,
        emb.select(F.col("vec_id").alias("doc_id")),
        edges_distinct=True,
    )
    return comp.groupBy("component").agg(
        F.min("node").alias("canonical_vec_id"),
        F.count(F.lit(1)).alias("n_members"),
    )


# --------------------------------------------------------------------------
# U22⊕/U23⊕ — CLUSTER QUALITY PROFILE (round 6): the cross-MODAL audit —
# join the embedding-space clustering (documents' semantic neighborhoods)
# against the text-side quality signal (type-token ratio) at doc_id ==
# vec_id grain and ask whether clusters are quality-homogeneous.  A
# cluster whose members' TTR collapses is a boilerplate/spam neighborhood
# a semantic curation pass should down-weight wholesale — per-cluster
# pruning decisions need exactly this readout.
# Plan shape: the assignment fan-out (broadcast-K) ⋈ a scan-fused TTR
# projection on doc_id — one equi-join, one groupBy(center); exact ppm
# integers end to end.
@query(
    "cluster_quality_profile",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, {_DUCK_QUANT} AS q FROM embeddings),
    c0 AS (SELECT vec_id AS center_id, q AS c FROM q WHERE vec_id < 8),
    d AS (
      SELECT a.vec_id, c.center_id,
             list_sum([(a.q[i] - c.c[i]) * (a.q[i] - c.c[i])
                       FOR i IN generate_series(1, len(a.q))]) AS dist
      FROM q a CROSS JOIN c0 c),
    asg AS (
      SELECT vec_id, center_id FROM (
        SELECT vec_id, center_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, center_id) AS rn
        FROM d) WHERE rn = 1),
    ttr AS (
      SELECT doc_id,
             CASE WHEN len(string_split_regex(trim(lower(text)), '\\s+')) = 0
                  THEN 0
                  ELSE CAST(len(list_distinct(
                         string_split_regex(trim(lower(text)), '\\s+')))
                       * 1000000
                       // len(string_split_regex(trim(lower(text)), '\\s+'))
                       AS BIGINT)
             END AS ttr_ppm
      FROM documents)
    SELECT a.center_id,
           count(*) AS n_docs,
           CAST(sum(t.ttr_ppm) // count(*) AS BIGINT) AS mean_ttr_ppm,
           CAST(min(t.ttr_ppm) AS BIGINT) AS min_ttr_ppm,
           CAST(max(t.ttr_ppm) AS BIGINT) AS max_ttr_ppm
    FROM asg a JOIN ttr t ON a.vec_id = t.doc_id
    GROUP BY a.center_id
    """,
)
def cluster_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", F.expr(_SPARK_QUANT).alias("q"))
    centers = q.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("center_id"), F.col("q").alias("c")
    )
    dist = F.expr(
        "aggregate(zip_with(q, c, (x, y) -> (x - y) * (x - y)), "
        "0L, (acc, v) -> acc + v)"
    )
    assigned = (
        q.crossJoin(F.broadcast(centers))
        .select("vec_id", "center_id", dist.alias("dist"))
        .groupBy("vec_id")
        .agg(F.min(F.struct("dist", "center_id")).alias("m"))
        .select("vec_id", F.col("m.center_id").alias("center_id"))
    )
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    ttr = docs.select(
        "doc_id",
        F.when(F.size(toks) == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr(
                "(size(array_distinct(split(trim(lower(text)), '\\\\s+'))) "
                "* 1000000) div size(split(trim(lower(text)), '\\\\s+'))"
            ).cast("long")
        )
        .alias("ttr_ppm"),
    )
    return (
        assigned.join(ttr, assigned["vec_id"] == ttr["doc_id"])
        .groupBy("center_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("sum(ttr_ppm) div count(1)")
            .cast("long")
            .alias("mean_ttr_ppm"),
            F.min("ttr_ppm").cast("long").alias("min_ttr_ppm"),
            F.max("ttr_ppm").cast("long").alias("max_ttr_ppm"),
        )
    )


# --------------------------------------------------------------------------
# ⊕ governance readout (round 7): EMBEDDING-DISTRIBUTION DRIFT — compare
# per-dimension embedding means between two corpus revisions (here the
# deterministic vec_id-parity split stands in for rev N vs rev N+1, the
# same convention incremental_band_dedup uses for new-vs-history).  A
# training pipeline watches this to catch encoder or corpus shifts before
# they poison ANN indexes / semantic dedup thresholds.
# Exact arithmetic at ANY corpus size: per-dim quantized sums are BIGINT;
# the per-rev mean is a POSITIVE-OFFSET floor division ((s + OFF·n) div n
# − OFF, identical in Spark's truncating div and DuckDB's floor // since
# the offset numerator is always positive), so drift_ppm is a bounded
# integer (≤ 2·OFF) no matter how many vectors a revision holds — no
# overflow path, unlike a cross-multiplied exact-rational compare.
_DRIFT_OFF = 10_000_000  # > any |quantized element| (|x| < 10.0)


@query(
    "embedding_drift_by_dim",
    oracle=f"""
    WITH q AS (
      SELECT vec_id % 2 AS rev,
             unnest({_DUCK_QUANT}) AS qv,
             unnest(generate_series(1, len(embedding))) AS dim
      FROM embeddings),
    agg AS (
      SELECT rev, dim, CAST(sum(qv) AS BIGINT) AS s, count(*) AS n
      FROM q GROUP BY rev, dim),
    m AS (
      SELECT rev, dim, n,
             ((s + {_DRIFT_OFF} * n) // n) - {_DRIFT_OFF} AS mean_ppm
      FROM agg)
    SELECT CAST(a.dim AS BIGINT) AS dim,
           a.n AS n_rev_a, b.n AS n_rev_b,
           CAST(a.mean_ppm AS BIGINT) AS mean_a_ppm,
           CAST(b.mean_ppm AS BIGINT) AS mean_b_ppm,
           CAST(abs(a.mean_ppm - b.mean_ppm) AS BIGINT) AS drift_ppm
    FROM m a JOIN m b ON a.dim = b.dim AND a.rev = 0 AND b.rev = 1
    """,
)
def embedding_drift_by_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        (F.col("vec_id") % 2).alias("rev"),
        F.posexplode(F.expr(_SPARK_QUANT)).alias("dim0", "qv"),
    ).withColumn("dim", (F.col("dim0") + 1).cast("long"))
    agg = q.groupBy("rev", "dim").agg(
        F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n")
    )
    m = agg.select(
        "rev",
        "dim",
        "n",
        F.expr(
            f"((s + {_DRIFT_OFF}L * n) div n) - {_DRIFT_OFF}"
        ).alias("mean_ppm"),
    )
    a = m.filter(F.col("rev") == 0).select(
        "dim", F.col("n").alias("n_rev_a"), F.col("mean_ppm").alias("ma")
    )
    b = m.filter(F.col("rev") == 1).select(
        "dim", F.col("n").alias("n_rev_b"), F.col("mean_ppm").alias("mb")
    )
    return a.join(b, "dim").select(
        "dim",
        "n_rev_a",
        "n_rev_b",
        F.col("ma").cast("long").alias("mean_a_ppm"),
        F.col("mb").cast("long").alias("mean_b_ppm"),
        F.abs(F.col("ma") - F.col("mb")).cast("long").alias("drift_ppm"),
    )


# --------------------------------------------------------------------------
# U22⊕ — ORACLE-BACKED PERSISTED-IVF PROBE (round-8 verdict #3): the one
# ANN instance whose correctness the DRIVER can attest, not just local
# pytest.  The Spark side runs the REAL artifact path — write_ivf_index
# to a scratch dir (explicit seed centers = the quantized first-8
# vectors: a deterministic externally-supplied coarse quantizer), then
# ivf_topk_against_index with its partition-pruned probe — over
# integer-quantized vectors, so every distance and dot product is exact
# integer arithmetic carried in doubles (all intermediates < 2^53 at
# |x| < 0.53 × 1e6, dim 64) and both engines agree bit-for-bit; division
# by the norm product comes last (the semantic_dedup_pairs recipe).  The
# DuckDB twin replays assignment (nearest center, ties → lowest
# centroid), per-query top-3 cell ranking, and cosine top-5 over the
# probed cells' members — so a green row re-proves the whole IVF
# pipeline: assignment, cell pruning, candidate generation, ranking.
_IVF_Q_K = 8        # centroids (vec_id < 8 seed centers)
_IVF_Q_INDEX_CACHE: dict[str, str] = {}  # sf_dir -> scratch index path
_IVF_Q_PROBE = 3    # cells probed per query
_IVF_Q_TOPK = 5
_IVF_Q_MOD = 25     # query set: vec_id % 25 == 0 (bounded: corpus/25)


@query(
    "knn_ivf_indexed",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, {_DUCK_QUANT} AS q FROM embeddings),
    n AS (
      SELECT vec_id, q, CAST({_DUCK_SQ} AS DOUBLE) AS sq FROM q),
    c0 AS (
      SELECT vec_id AS centroid, q AS c FROM q WHERE vec_id < {_IVF_Q_K}),
    dc AS (
      SELECT a.vec_id, c.centroid,
             list_sum([(a.q[i] - c.c[i]) * (a.q[i] - c.c[i])
                       FOR i IN generate_series(1, len(a.q))]) AS dist
      FROM q a CROSS JOIN c0 c),
    asg AS (
      SELECT vec_id, centroid FROM (
        SELECT vec_id, centroid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, centroid) AS rn
        FROM dc) WHERE rn = 1),
    probe AS (
      SELECT vec_id AS query_id, centroid FROM (
        SELECT vec_id, centroid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, centroid) AS rn
        FROM dc WHERE vec_id % {_IVF_Q_MOD} = 0)
      WHERE rn <= {_IVF_Q_PROBE}),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             CAST(list_sum([x.q[i] * y.q[i]
                            FOR i IN generate_series(1, len(x.q))]) AS DOUBLE)
               / (sqrt(x.sq) * sqrt(y.sq)) AS cos_sim
      FROM probe p
      JOIN asg a ON p.centroid = a.centroid
      JOIN n x ON p.query_id = x.vec_id
      JOIN n y ON a.vec_id = y.vec_id)
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS BIGINT) AS rn FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM cand) WHERE rn <= {_IVF_Q_TOPK}
    """,
)
def knn_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe a persisted IVF index written once per (process, sf_dir)
    (U22⊕ driver-attestable instance).  The index content is a pure
    function of the table and the pinned parameters, so re-entrant calls
    (warm-up + reps, repeated attestations) reuse the scratch dir
    instead of writing a fresh full-corpus copy each time; atexit
    removes it, and returned lazy plans stay readable for the process
    lifetime."""
    import atexit
    import shutil
    import tempfile

    from video_etl_spark.llm_ops.similarity import (
        ivf_topk_against_index,
        write_ivf_index,
    )

    qemb = _scratch_qemb(spark, sf_dir)
    path = _IVF_Q_INDEX_CACHE.get(sf_dir)
    if path is None or not os.path.isdir(path):
        centers = [
            list(r["embedding"])
            for r in qemb.filter(F.col("vec_id") < _IVF_Q_K)
            .orderBy("vec_id")
            .collect()
        ]
        path = tempfile.mkdtemp(prefix="knn_ivf_indexed_")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        write_ivf_index(qemb, path, n_centroids=_IVF_Q_K, centers=centers)
        _IVF_Q_INDEX_CACHE[sf_dir] = path
    queries = qemb.filter(F.col("vec_id") % _IVF_Q_MOD == 0)
    return ivf_topk_against_index(
        spark, queries, path, k=_IVF_Q_TOPK, n_probe=_IVF_Q_PROBE
    )


def _scratch_index_whole(spark, cached, suffixes, subdirs) -> bool:
    """Whole-index freshness check for the per-(process, sf_dir) scratch
    ANN indexes (ONE definition for the LSH/PQ twins — round-10 review:
    the copy-pasted closures would silently diverge on the next fix).
    tableExists alone can't vouch for the files (the scratch dir may
    have been reaped under a live catalog entry), so ALL catalog tables
    AND all data dirs must exist, or a partially-reaped index fails at
    probe time instead of triggering the rebuild this check exists
    for."""
    if cached is None:
        return False
    t, p = cached
    return all(
        spark.catalog.tableExists(t + sfx) for sfx in suffixes
    ) and all(os.path.isdir(os.path.join(p, sub)) for sub in subdirs)


# U22⊕ — ORACLE-BACKED PERSISTED-LSH PROBE (round 9): the second
# driver-attestable ANN modality, same recipe as knn_ivf_indexed but
# exercising the LSH artifact path end-to-end — write_lsh_index with
# EXPLICIT hyperplanes (the quantized first-8 vectors reshaped to 2
# tables × 4 planes: a deterministic externally-trained projection,
# persisted in the index's {table}_planes sidecar), then
# lsh_topk_against_index reading planes + params from the index.  All
# sign tests are exact integer arithmetic carried in doubles (dot of
# two quantized vectors < 2^53), so both engines compute identical
# bucket codes; candidates are same-(table, bucket) pairs, re-ranked by
# exact cosine with the (cos desc, neighbor_id) tie-break.  A green row
# re-proves hashing, the persisted-plane contract, bucket-join candidate
# generation, and ranking.
_LSH_Q_TABLES = 2
_LSH_Q_PLANES = 4
_LSH_Q_MOD = 25     # query set: vec_id % 25 == 0 (bounded: corpus/25)
_LSH_Q_TOPK = 5
_LSH_Q_INDEX_CACHE: dict[str, tuple[str, str]] = {}  # sf_dir -> (table, path)


@query(
    "knn_lsh_indexed",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, {_DUCK_QUANT} AS q FROM embeddings),
    n AS (
      SELECT vec_id, q, CAST({_DUCK_SQ} AS DOUBLE) AS sq FROM q),
    pl AS (
      SELECT vec_id AS pid, q AS p FROM q
      WHERE vec_id < {_LSH_Q_TABLES * _LSH_Q_PLANES}),
    codes AS (
      SELECT a.vec_id, pl.pid // {_LSH_Q_PLANES} AS table_id,
             SUM(CASE WHEN list_sum([a.q[i] * pl.p[i]
                            FOR i IN generate_series(1, len(a.q))]) > 0
                      THEN 1 << (pl.pid % {_LSH_Q_PLANES}) ELSE 0
                 END) AS bucket
      FROM q a CROSS JOIN pl
      GROUP BY a.vec_id, pl.pid // {_LSH_Q_PLANES}),
    pairs AS (
      SELECT DISTINCT qc.vec_id AS query_id, cc.vec_id AS neighbor_id
      FROM codes qc
      JOIN codes cc ON qc.table_id = cc.table_id
                   AND qc.bucket = cc.bucket
      WHERE qc.vec_id % {_LSH_Q_MOD} = 0),
    cand AS (
      SELECT p.query_id, p.neighbor_id,
             CAST(list_sum([x.q[i] * y.q[i]
                            FOR i IN generate_series(1, len(x.q))]) AS DOUBLE)
               / (sqrt(x.sq) * sqrt(y.sq)) AS cos_sim
      FROM pairs p
      JOIN n x ON p.query_id = x.vec_id
      JOIN n y ON p.neighbor_id = y.vec_id)
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS BIGINT) AS rn FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM cand) WHERE rn <= {_LSH_Q_TOPK}
    """,
)
def knn_lsh_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe a persisted LSH index written once per (process, sf_dir)
    with explicit data-derived hyperplanes (U22⊕ second driver-attestable
    ANN instance).  Same scratch-reuse contract as
    :func:`knn_ivf_indexed`: re-entrant calls reuse the index, atexit
    removes the files."""
    import atexit
    import hashlib
    import shutil
    import tempfile

    from video_etl_spark.llm_ops.similarity import (
        lsh_topk_against_index,
        write_lsh_index,
    )

    qemb = _scratch_qemb(spark, sf_dir)
    cached = _LSH_Q_INDEX_CACHE.get(sf_dir)
    tbl = cached[0] if cached else None
    if not _scratch_index_whole(
        spark,
        cached,
        ("", "_vecs", "_params", "_planes"),
        ("buckets", "vectors", "params", "planes"),
    ):
        n_seed = _LSH_Q_TABLES * _LSH_Q_PLANES
        seed = (
            qemb.filter(F.col("vec_id") < n_seed).orderBy("vec_id").collect()
        )
        planes = [
            [
                list(seed[t * _LSH_Q_PLANES + p]["embedding"])
                for p in range(_LSH_Q_PLANES)
            ]
            for t in range(_LSH_Q_TABLES)
        ]
        path = tempfile.mkdtemp(prefix="knn_lsh_indexed_")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        tbl = "knn_lsh_idx_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        write_lsh_index(
            qemb,
            tbl,
            path,
            n_buckets=8,
            n_tables=_LSH_Q_TABLES,
            n_planes=_LSH_Q_PLANES,
            dim=64,
            planes=planes,
        )
        _LSH_Q_INDEX_CACHE[sf_dir] = (tbl, path)
    queries = qemb.filter(F.col("vec_id") % _LSH_Q_MOD == 0)
    return lsh_topk_against_index(
        queries,
        spark.table(tbl),
        spark.table(f"{tbl}_vecs"),
        spark.table(f"{tbl}_params"),
        k=_LSH_Q_TOPK,
        planes_df=spark.table(f"{tbl}_planes"),
    )


# U22⊕ — ORACLE-BACKED PERSISTED-PQ PROBE (round 10): the third and last
# driver-attestable ANN modality, completing the trio (IVF r8, LSH r9).
# Same recipe: integer-quantized vectors + DATA-derived quantizer params
# — here EXPLICIT codebooks (write_pq_index(books=): books[j][c] = the
# j-th dsub-slice of quantized vector c, an externally-trained product
# quantizer symmetric with write_ivf_index(centers=) and
# write_lsh_index(planes=)) and normalize=False persisted in the index's
# {table}_params, so encode distances, LUT inner products, and ADC sums
# are ALL exact integers carried in doubles (per-subspace dist ≤ 8·(1.06
# e6)² ≈ 9e12 < 2⁵³; ADC ≤ 8·2.3e12 ≈ 1.8e13) — order-independent, so
# numpy and DuckDB agree bit-for-bit with no float-summation hazard.
# The DuckDB twin replays the FULL pipeline: per-subspace nearest-center
# encoding (ties → lowest code), ADC scoring via the encoded codes,
# global top-(k·refine) shortlist (approx desc, id asc), then the exact
# integer-cosine re-rank with division LAST.  A green row re-proves
# encoding, the persisted-books/params contract, ADC shortlisting, and
# ranking.  Reference parity: src/offline/ann/* (the reference ships
# brute-force + IVF only; PQ is a ⊕ scale-path addition).
_PQ_Q_M = 8         # subspaces (dim 64 -> dsub 8)
_PQ_Q_DSUB = 8      # dim / m — the oracle's slice arithmetic derives
#                     from THIS constant (round-10 ADVICE: it was
#                     hardcoded as literal 8s, so a dataset with a
#                     different dim would fail the attestation with a
#                     confusing hash mismatch instead of the loud
#                     seed-shape assert in knn_pq_indexed below)
_PQ_Q_KSUB = 8      # codes/book, derived from vec_id < 8
_PQ_Q_MOD = 25      # query set: vec_id % 25 == 0 (bounded: corpus/25)
_PQ_Q_TOPK = 5
_PQ_Q_REFINE = 4    # shortlist = 20 per query
_PQ_Q_INDEX_CACHE: dict[str, tuple[str, str]] = {}  # sf_dir -> (table, path)


@query(
    "knn_pq_indexed",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, {_DUCK_QUANT} AS q FROM embeddings),
    n AS (
      SELECT vec_id, q, CAST({_DUCK_SQ} AS DOUBLE) AS sq FROM q),
    js AS (SELECT unnest(generate_series(0, {_PQ_Q_M - 1})) AS j),
    bk AS (
      SELECT js.j, vec_id AS code,
             q[js.j * {_PQ_Q_DSUB} + 1 : js.j * {_PQ_Q_DSUB} + {_PQ_Q_DSUB}]
               AS center
      FROM q CROSS JOIN js WHERE vec_id < {_PQ_Q_KSUB}),
    enc AS (
      SELECT vec_id, j, code FROM (
        SELECT a.vec_id, b.j, b.code,
               row_number() OVER (
                 PARTITION BY a.vec_id, b.j
                 ORDER BY list_sum(
                   [(a.q[b.j * {_PQ_Q_DSUB} + i] - b.center[i])
                    * (a.q[b.j * {_PQ_Q_DSUB} + i] - b.center[i])
                    FOR i IN generate_series(1, {_PQ_Q_DSUB})]), b.code) AS rn
        FROM q a CROSS JOIN bk b) WHERE rn = 1),
    adc AS (
      SELECT x.vec_id AS query_id, e.vec_id AS neighbor_id,
             SUM(list_sum([x.q[e.j * {_PQ_Q_DSUB} + i] * b.center[i]
                           FOR i IN generate_series(1, {_PQ_Q_DSUB})]))
               AS approx
      FROM q x
      CROSS JOIN enc e
      JOIN bk b ON b.j = e.j AND b.code = e.code
      WHERE x.vec_id % {_PQ_Q_MOD} = 0
      GROUP BY x.vec_id, e.vec_id),
    short AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY approx DESC, neighbor_id) AS arn
        FROM adc) WHERE arn <= {_PQ_Q_TOPK * _PQ_Q_REFINE}),
    cand AS (
      SELECT s.query_id, s.neighbor_id,
             CAST(list_sum([x.q[i] * y.q[i]
                            FOR i IN generate_series(1, len(x.q))]) AS DOUBLE)
               / (sqrt(x.sq) * sqrt(y.sq)) AS cos_sim
      FROM short s
      JOIN n x ON s.query_id = x.vec_id
      JOIN n y ON s.neighbor_id = y.vec_id)
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS BIGINT) AS rn FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM cand) WHERE rn <= {_PQ_Q_TOPK}
    """,
)
def knn_pq_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe a persisted PQ index written once per (process, sf_dir)
    with explicit data-derived codebooks and normalize=False recorded in
    its params table (U22⊕ third driver-attestable ANN instance).  Same
    scratch-reuse contract as :func:`knn_ivf_indexed` /
    :func:`knn_lsh_indexed`: re-entrant calls reuse the index after the
    whole-index freshness check, atexit removes the files."""
    import atexit
    import hashlib
    import shutil
    import tempfile

    from video_etl_spark.llm_ops.similarity import (
        pq_topk_against_index,
        write_pq_index,
    )

    qemb = _scratch_qemb(spark, sf_dir)
    cached = _PQ_Q_INDEX_CACHE.get(sf_dir)
    tbl = cached[0] if cached else None
    if not _scratch_index_whole(
        spark,
        cached,
        ("", "_vecs", "_books", "_params"),
        ("codes", "vectors", "books", "params"),
    ):
        seed = (
            qemb.filter(F.col("vec_id") < _PQ_Q_KSUB).orderBy("vec_id").collect()
        )
        # the oracle assumes codebook code c IS the vector with vec_id c
        # (positional index == id) and slices with _PQ_Q_DSUB-wide
        # windows — assert both here so a dataset with a gap in the low
        # ids or a different dim fails with THIS message, not a
        # confusing downstream hash mismatch (round-10 ADVICE)
        if [r["vec_id"] for r in seed] != list(range(_PQ_Q_KSUB)):
            raise ValueError(
                "knn_pq_indexed: seed vec_ids "
                f"{[r['vec_id'] for r in seed]} != 0..{_PQ_Q_KSUB - 1} — "
                "the DuckDB oracle's code=vec_id mapping needs the low "
                "ids contiguous"
            )
        dsub = len(seed[0]["embedding"]) // _PQ_Q_M
        if dsub != _PQ_Q_DSUB or len(seed[0]["embedding"]) % _PQ_Q_M:
            raise ValueError(
                f"knn_pq_indexed: embedding dim {len(seed[0]['embedding'])} "
                f"gives dsub {dsub}, but the oracle slices with "
                f"_PQ_Q_DSUB={_PQ_Q_DSUB} — update the constant"
            )
        books = [
            [
                list(seed[c]["embedding"][j * dsub : (j + 1) * dsub])
                for c in range(_PQ_Q_KSUB)
            ]
            for j in range(_PQ_Q_M)
        ]
        path = tempfile.mkdtemp(prefix="knn_pq_indexed_")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        tbl = "knn_pq_idx_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        write_pq_index(
            qemb,
            tbl,
            path,
            m=_PQ_Q_M,
            ksub=_PQ_Q_KSUB,
            n_buckets=8,
            books=books,
            normalize=False,
        )
        _PQ_Q_INDEX_CACHE[sf_dir] = (tbl, path)
    queries = qemb.filter(F.col("vec_id") % _PQ_Q_MOD == 0)
    return pq_topk_against_index(
        queries,
        spark.table(tbl),
        spark.table(f"{tbl}_vecs"),
        spark.table(f"{tbl}_books"),
        k=_PQ_Q_TOPK,
        refine=_PQ_Q_REFINE,
        params_df=spark.table(f"{tbl}_params"),
    )


# U22⊕ — ORACLE-BACKED LAYERED PROBE (round-12 verdict #2): the COMPOSED
# 100 TB serving shape — IVF coarse prune → broadcast-codes ADC over the
# probed cells → exact re-rank — driver-attested end to end, not just
# each leg separately.  Same recipe as the trio above: integer-quantized
# vectors, EXPLICIT data-derived quantizers (coarse centers = the
# quantized first-8 vectors whole, the knn_ivf_indexed convention; PQ
# codebooks = their dsub-wide slices, the knn_pq_indexed convention) and
# normalize=False, so cell assignment distances, probe rankings, encode
# distances, LUT inner products, and ADC sums are ALL exact integers
# carried in doubles (assignment (a−c)² ≤ 64·(2.12e6)² ≈ 2.9e14 < 2⁵³;
# ADC ≤ 8·9e12 ≈ 7e13) — order-independent, both engines bit-identical,
# division last.  The DuckDB twin replays the FULL composition: corpus
# cell assignment (ties → lowest centroid), per-query n_probe cell
# ranking, per-subspace nearest-center encoding (ties → lowest code),
# ADC restricted to neighbors whose ASSIGNED cell is probed by the
# query, the (approx desc, id asc) shortlist cut, then the exact
# integer-cosine re-rank.  A green row re-proves the one thing the
# round-11 verdict called unproven: that the three legs COMPOSE.
_LAY_Q_CELLS = 8    # coarse centers (vec_id < 8 seed vectors, whole)
_LAY_Q_M = 8        # PQ subspaces (dim 64 -> dsub 8)
_LAY_Q_DSUB = 8     # dim / m (seed-shape-asserted like knn_pq_indexed)
_LAY_Q_KSUB = 8     # codes/book, the dsub-slices of vec_id < 8
_LAY_Q_PROBE = 2    # cells probed per query
_LAY_Q_MOD = 25     # query set: vec_id % 25 == 0 (bounded: corpus/25)
_LAY_Q_TOPK = 5
_LAY_Q_SHORT = 20   # ADC shortlist depth (k × 4, the pq refine dial)
_LAY_Q_INDEX_CACHE: dict = {}  # sf_dir -> (path, PqIvfIndex)


def _scratch_qemb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-quantized embeddings (×1e6, stored as doubles) — the
    cross-engine-exact value domain EVERY ANN scratch builder (IVF /
    LSH / PQ / layered / folded) and their DuckDB oracles share; one
    definition so a precision or cast change cannot reach some
    builders and silently break the others' oracle parity."""
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> "
            "cast(cast(round(cast(x as double) * 1000000) as bigint) "
            "as double))"
        ).alias("embedding"),
    )


def _lay_seed_quantizers(qemb: DataFrame, caller: str):
    """(centers, books) derived from the seed rows ``vec_id <
    _LAY_Q_KSUB`` with the loud mapping asserts (the knn_pq_indexed
    discipline, round-10 ADVICE): the oracle maps centroid/code c to
    the vector with vec_id c and slices ``_LAY_Q_DSUB``-wide windows.
    ONE shared derivation for the build-time and folded scratch
    builders, so a future change to the seed contract cannot reach one
    twin and silently break the other's oracle parity."""
    seed = (
        qemb.filter(F.col("vec_id") < _LAY_Q_KSUB)
        .orderBy("vec_id")
        .collect()
    )
    if [r["vec_id"] for r in seed] != list(range(_LAY_Q_KSUB)):
        raise ValueError(
            f"{caller}: seed vec_ids "
            f"{[r['vec_id'] for r in seed]} != 0..{_LAY_Q_KSUB - 1} — "
            "the DuckDB oracle's centroid/code = vec_id mapping needs "
            "the low ids contiguous"
        )
    dim = len(seed[0]["embedding"])
    if dim // _LAY_Q_M != _LAY_Q_DSUB or dim % _LAY_Q_M:
        raise ValueError(
            f"{caller}: embedding dim {dim} gives dsub "
            f"{dim // _LAY_Q_M}, but the oracle slices with "
            f"_LAY_Q_DSUB={_LAY_Q_DSUB} — update the constant"
        )
    centers = [list(r["embedding"]) for r in seed]
    books = [
        [
            list(seed[c]["embedding"][j * _LAY_Q_DSUB:(j + 1) * _LAY_Q_DSUB])
            for c in range(_LAY_Q_KSUB)
        ]
        for j in range(_LAY_Q_M)
    ]
    return centers, books


# ONE oracle for BOTH layered probe forms: the broadcast-arrays form and
# the scanned-codes form are different physical plans over identical
# semantics (equivalence-tested in tests/test_layered_ann.py), so they
# share this DuckDB replay verbatim — a hash mismatch on either is a
# real defect in that form, not an oracle drift.
_LAY_Q_ORACLE = f"""
    WITH q AS (
      SELECT vec_id, {_DUCK_QUANT} AS q FROM embeddings),
    n AS (
      SELECT vec_id, q, CAST({_DUCK_SQ} AS DOUBLE) AS sq FROM q),
    c0 AS (
      SELECT vec_id AS centroid, q AS c FROM q WHERE vec_id < {_LAY_Q_CELLS}),
    dc AS (
      SELECT a.vec_id, c.centroid,
             list_sum([(a.q[i] - c.c[i]) * (a.q[i] - c.c[i])
                       FOR i IN generate_series(1, len(a.q))]) AS dist
      FROM q a CROSS JOIN c0 c),
    asg AS (
      SELECT vec_id, centroid FROM (
        SELECT vec_id, centroid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, centroid) AS rn
        FROM dc) WHERE rn = 1),
    probe AS (
      SELECT vec_id AS query_id, centroid FROM (
        SELECT vec_id, centroid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, centroid) AS rn
        FROM dc WHERE vec_id % {_LAY_Q_MOD} = 0)
      WHERE rn <= {_LAY_Q_PROBE}),
    js AS (SELECT unnest(generate_series(0, {_LAY_Q_M - 1})) AS j),
    bk AS (
      SELECT js.j, vec_id AS code,
             q[js.j * {_LAY_Q_DSUB} + 1 : js.j * {_LAY_Q_DSUB} + {_LAY_Q_DSUB}]
               AS center
      FROM q CROSS JOIN js WHERE vec_id < {_LAY_Q_KSUB}),
    enc AS (
      SELECT vec_id, j, code FROM (
        SELECT a.vec_id, b.j, b.code,
               row_number() OVER (
                 PARTITION BY a.vec_id, b.j
                 ORDER BY list_sum(
                   [(a.q[b.j * {_LAY_Q_DSUB} + i] - b.center[i])
                    * (a.q[b.j * {_LAY_Q_DSUB} + i] - b.center[i])
                    FOR i IN generate_series(1, {_LAY_Q_DSUB})]), b.code) AS rn
        FROM q a CROSS JOIN bk b) WHERE rn = 1),
    adc AS (
      SELECT p.query_id, e.vec_id AS neighbor_id,
             SUM(list_sum([x.q[e.j * {_LAY_Q_DSUB} + i] * b.center[i]
                           FOR i IN generate_series(1, {_LAY_Q_DSUB})]))
               AS approx
      FROM probe p
      JOIN asg a ON p.centroid = a.centroid
      JOIN enc e ON e.vec_id = a.vec_id
      JOIN bk b ON b.j = e.j AND b.code = e.code
      JOIN q x ON x.vec_id = p.query_id
      GROUP BY p.query_id, e.vec_id),
    short AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY approx DESC, neighbor_id) AS arn
        FROM adc) WHERE arn <= {_LAY_Q_SHORT}),
    cand AS (
      SELECT s.query_id, s.neighbor_id,
             CAST(list_sum([x.q[i] * y.q[i]
                            FOR i IN generate_series(1, len(x.q))]) AS DOUBLE)
               / (sqrt(x.sq) * sqrt(y.sq)) AS cos_sim
      FROM short s
      JOIN n x ON s.query_id = x.vec_id
      JOIN n y ON s.neighbor_id = y.vec_id)
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS BIGINT) AS rn FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM cand) WHERE rn <= {_LAY_Q_TOPK}
    """


def _layered_scratch(spark, sf_dir: str):
    """(path, index, quantized embeddings) for the layered oracle pair —
    built once per (process, sf_dir) with explicit data-derived coarse
    centers and codebooks (the knn_{ivf,pq}_indexed recipe), reused by
    both probe forms so they attest against the SAME index files."""
    import atexit
    import shutil
    import tempfile

    from video_etl_spark.llm_ops.similarity import write_pq_ivf_index

    qemb = _scratch_qemb(spark, sf_dir)
    cached = _LAY_Q_INDEX_CACHE.get(sf_dir)
    if cached is None or not all(
        os.path.isdir(os.path.join(cached[0], sub))
        for sub in ("vectors", "centers", "books", "params")
    ):
        centers, books = _lay_seed_quantizers(qemb, "knn_layered_indexed")
        path = tempfile.mkdtemp(prefix="knn_layered_indexed_")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        index = write_pq_ivf_index(
            qemb,
            path,
            m=_LAY_Q_M,
            ksub=_LAY_Q_KSUB,
            n_centroids=_LAY_Q_CELLS,
            centers=centers,
            books=books,
            normalize=False,
        )
        cached = (path, index)
        _LAY_Q_INDEX_CACHE[sf_dir] = cached
    return cached[0], cached[1], qemb


@query("knn_layered_indexed", oracle=_LAY_Q_ORACLE)
def knn_layered_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe a persisted LAYERED index (write_pq_ivf_index: one pass
    assigns cells and PQ-encodes) with explicit data-derived coarse
    centers and codebooks (U22⊕ composed driver-attestable instance) —
    the BROADCAST-arrays serve form.  Same scratch-reuse contract as
    the trio: re-entrant calls reuse the index after the files check,
    atexit removes the dir."""
    from video_etl_spark.llm_ops.similarity import (
        layered_topk_against_index,
    )

    path, index, qemb = _layered_scratch(spark, sf_dir)
    queries = qemb.filter(F.col("vec_id") % _LAY_Q_MOD == 0)
    return layered_topk_against_index(
        spark,
        queries,
        path,
        index=index,
        k=_LAY_Q_TOPK,
        n_probe=_LAY_Q_PROBE,
        shortlist=_LAY_Q_SHORT,
    )


@query("knn_layered_scanned", oracle=_LAY_Q_ORACLE)
def knn_layered_scanned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCANNED-codes layered serve form over the SAME scratch index
    and the SAME oracle as :func:`knn_layered_indexed` — the two forms
    are different physical plans over identical semantics, so a green
    row here driver-attests the >broadcast-cap composition (partial
    per-chunk top-r + window merge + partition-pruned re-rank) against
    the full DuckDB replay, not just against the twin."""
    from video_etl_spark.llm_ops.similarity import layered_topk_scanned

    path, _, qemb = _layered_scratch(spark, sf_dir)
    queries = qemb.filter(F.col("vec_id") % _LAY_Q_MOD == 0)
    return layered_topk_scanned(
        spark,
        queries,
        path,
        k=_LAY_Q_TOPK,
        n_probe=_LAY_Q_PROBE,
        shortlist=_LAY_Q_SHORT,
    )


_LAY_F_CACHE: dict = {}  # sf_dir -> folded-successor path
_LAY_F_SLICE = 7  # appended slice: vec_id % 10 == 7 (~10% of the corpus)


def _layered_folded_scratch(spark, sf_dir: str):
    """(successor path, quantized embeddings) for the FOLD-lifecycle
    driver attestation: base index over ``vec_id % 10 != 7``, one
    disjoint scanned-regime append of the remaining slice (each
    touched cell gains a second file), then the auto-compaction policy
    fires a PER-CELL fold (``maybe_compact_pq_ivf(scope="cells")``)
    into the successor generation.  The frozen data-derived quantizers
    (the :func:`_layered_scratch` recipe) make assignment and encoding
    per-row deterministic and independent of which rows are present at
    build time, so probing the folded successor replays the SAME full-
    corpus DuckDB oracle as the build-time twins — a green row makes
    the driver re-prove append → fold → serve every rotation, the way
    ``knn_{ivf,lsh,pq}_indexed`` prove the write paths (round-14
    verdict Next #3)."""
    import atexit
    import shutil
    import tempfile

    from video_etl_spark.llm_ops.similarity import (
        append_to_pq_ivf_index,
        maybe_compact_pq_ivf,
        write_pq_ivf_index,
    )

    qemb = _scratch_qemb(spark, sf_dir)
    cached = _LAY_F_CACHE.get(sf_dir)
    if cached is not None and all(
        os.path.isdir(os.path.join(cached, sub))
        for sub in ("vectors", "centers", "books", "params")
    ):
        return cached, qemb

    centers, books = _lay_seed_quantizers(qemb, "knn_layered_folded")
    root = tempfile.mkdtemp(prefix="knn_layered_folded_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    base_path = os.path.join(root, "gen")
    slice_pred = F.col("vec_id") % 10 == _LAY_F_SLICE
    write_pq_ivf_index(
        qemb.filter(~slice_pred),
        base_path,
        m=_LAY_Q_M,
        ksub=_LAY_Q_KSUB,
        n_centroids=_LAY_Q_CELLS,
        centers=centers,
        books=books,
        normalize=False,
        return_artifacts=False,
    )
    # scanned-regime disjoint append: quantizers come from the index's
    # own sidecars, no driver materialization of codes, and the dedup
    # read is skipped (the ids are disjoint by construction)
    append_to_pq_ivf_index(
        qemb.filter(slice_pred), base_path, assume_disjoint=True
    )
    # the repartitioned build wrote exactly 1 file per cell and the
    # append added 1 per touched cell, so threshold 2 fires the
    # per-cell fold; a None here would mean the lifecycle under test
    # did not run — fail loudly rather than silently probing the base
    succ = maybe_compact_pq_ivf(
        spark, base_path, max_files_per_cell=2, scope="cells"
    )
    if succ is None:
        raise RuntimeError(
            "knn_layered_folded: compaction policy did not fire — the "
            "append touched no cell?"
        )
    _LAY_F_CACHE[sf_dir] = succ
    return succ, qemb


@query("knn_layered_folded", oracle=_LAY_Q_ORACLE)
def knn_layered_folded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe the FOLDED successor generation (build-minus-slice →
    disjoint append → ``maybe_compact_pq_ivf(scope='cells')``) with the
    scanned serve form — same DuckDB oracle as the build-time layered
    twins, replaying corpus+appended rows, so the whole maintenance
    lifecycle (append_to_pq_ivf_index, the O(n_files) poll, the
    per-cell fold's hot rewrite + cold carry) is re-proven by the
    driver every time this rotates in (round-14 verdict Next #3)."""
    from video_etl_spark.llm_ops.similarity import layered_topk_scanned

    succ, qemb = _layered_folded_scratch(spark, sf_dir)
    queries = qemb.filter(F.col("vec_id") % _LAY_Q_MOD == 0)
    return layered_topk_scanned(
        spark,
        queries,
        succ,
        k=_LAY_Q_TOPK,
        n_probe=_LAY_Q_PROBE,
        shortlist=_LAY_Q_SHORT,
    )
