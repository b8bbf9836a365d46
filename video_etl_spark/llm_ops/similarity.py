"""Approximate nearest-neighbor search over embedding columns
(SURVEY.md U22 — the scale path; the exact brute-force baseline is the
oracle-verified `knn_cosine_bruteforce` in queries/vectors.py).

Strategy: random-hyperplane LSH.  ``n_tables`` independent hash tables, each
hashing a vector to the sign-bit string of ``n_planes`` hyperplane dot
products.  Candidates are corpus vectors sharing a bucket with the query in
*any* table (union of equi-joins on (table, bucket) — shuffle on bucket key,
never a cross join); exact cosine re-ranking runs only on candidates.

Hyperplanes are derived deterministically from md5, so results are
reproducible across runs and engines.  The bucketing dot products run in a
vectorized Arrow pandas UDF (numpy matmul over the whole batch).

At 100 TB: the corpus-side bucket table is computed once and can be written
bucketed-by(bucket) to parquet; query batches then join without reshuffling
the corpus.  Recall tuning = more tables (recall ↑, cost ~linear) or fewer
planes (bucket size ↑).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _planes(n_tables: int, n_planes: int, dim: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes in [-1, 1]."""
    out = np.empty((n_tables, n_planes, dim))
    for t in range(n_tables):
        for p in range(n_planes):
            for d in range(dim):
                h = hashlib.md5(f"plane|{t}|{p}|{d}".encode()).digest()
                out[t, p, d] = (int.from_bytes(h[:4], "big") % 2001 - 1000) / 1000.0
    return out


def _bucket_udf(planes: np.ndarray):
    n_tables, n_planes, _ = planes.shape

    @pandas_udf(T.ArrayType(T.LongType()))
    def buckets(embs: pd.Series) -> pd.Series:
        mat = np.stack(embs.to_numpy())  # (batch, dim)
        out = []
        dots = np.einsum("bd,tpd->btp", mat, planes)  # (batch, tables, planes)
        bits = (dots > 0).astype(np.int64)
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        codes = (bits * weights).sum(axis=2)  # (batch, tables)
        for row in codes:
            out.append(row.tolist())
        return pd.Series(out)

    return buckets


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_tables: int = 8,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors per query among LSH bucket candidates.

    Returns (query_id, neighbor_id, cos_sim, rn) — same shape as the
    brute-force oracle query, so recall is directly measurable.
    """
    from video_etl_spark.session import ensure_executor_package

    ensure_executor_package(corpus.sparkSession)
    planes = _planes(n_tables, n_planes, dim)
    bucketize = _bucket_udf(planes)

    def with_buckets(df: DataFrame, prefix: str) -> DataFrame:
        b = df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col(vec_col).alias(f"{prefix}_vec"),
            F.posexplode(bucketize(F.col(vec_col))).alias("table_id", "bucket"),
        )
        return b

    cand = (
        with_buckets(queries, "query")
        .join(with_buckets(corpus, "neighbor"), ["table_id", "bucket"])
        .select("query_id", "neighbor_id", "query_vec", "neighbor_vec")
        .distinct()
    )

    # Exact cosine re-rank on candidates only (JVM-side higher-order fns).
    qd = "transform(query_vec, x -> cast(x as double))"
    nd = "transform(neighbor_vec, x -> cast(x as double))"
    dot = f"aggregate(zip_with({qd}, {nd}, (a, b) -> a * b), 0D, (s, v) -> s + v)"
    nq = f"sqrt(aggregate(transform({qd}, x -> x * x), 0D, (s, v) -> s + v))"
    nn = f"sqrt(aggregate(transform({nd}, x -> x * x), 0D, (s, v) -> s + v))"
    scored = cand.withColumn("cos_sim", F.expr(f"{dot} / ({nq} * {nn})"))

    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN: KMeans-partition the corpus, probe the
    ``n_probe`` nearest centroids per query, exact-rerank candidates.

    The second scale path next to LSH (build brief: "an IVF or LSH-bucketed
    variant").  At 100 TB the centroid assignment is computed once and the
    corpus written partitioned-by(centroid); query batches then read only
    the probed partitions (partition pruning does the candidate selection).

    Fit runs on Spark ML KMeans over the corpus; assignment and probing are
    JVM-side expressions (control/categories.assign_categories).
    """
    from pyspark.sql import functions as F

    from video_etl_spark.control.categories import assign_categories, fit_categories
    from video_etl_spark.session import ensure_executor_package

    ensure_executor_package(corpus.sparkSession)

    as_double = F.expr(
        f"transform({vec_col}, x -> cast(x as double))"
    )
    corpus_d = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double.alias("scores")
    )
    queries_d = queries.select(
        F.col(id_col).alias("query_id"), as_double.alias("scores")
    )
    centers = fit_categories(corpus_d, k=n_centroids, seed=seed)

    corpus_b = assign_categories(corpus_d, centers).withColumnRenamed(
        "category", "centroid"
    )
    # per query: distances to every centroid, take the n_probe nearest
    q_with_d = assign_categories(queries_d, centers)  # adds nearest 'category'
    # recompute distances explicitly to rank all centroids
    dist_cols = []
    for i, center in enumerate(centers):
        lit_center = F.array(*[F.lit(float(x)) for x in center])
        dist_cols.append(
            F.struct(
                F.aggregate(
                    F.zip_with(F.col("scores"), lit_center, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("d"),
                F.lit(i).alias("c"),
            )
        )
    probed = (
        q_with_d.withColumn("dists", F.array_sort(F.array(*dist_cols)))
        .withColumn("probe", F.slice("dists", 1, n_probe))
        .select(
            "query_id",
            F.col("scores").alias("query_vec"),
            F.explode(F.col("probe.c")).alias("centroid"),
        )
    )
    cand = probed.join(
        corpus_b.select("neighbor_id", F.col("scores").alias("neighbor_vec"), "centroid"),
        "centroid",
    )
    dot = (
        "aggregate(zip_with(query_vec, neighbor_vec, (a, b) -> a * b), 0D, (s, v) -> s + v)"
    )
    nq = "sqrt(aggregate(transform(query_vec, x -> x * x), 0D, (s, v) -> s + v))"
    nn = "sqrt(aggregate(transform(neighbor_vec, x -> x * x), 0D, (s, v) -> s + v))"
    scored = cand.withColumn("cos_sim", F.expr(f"{dot} / ({nq} * {nn})"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )
