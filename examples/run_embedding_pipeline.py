#!/usr/bin/env python
"""End-to-end embedding-corpus pipeline demo — the similarity-search /
semantic-curation family composed:

1. TRAIN   — kmeans_lloyd_embeddings: exact relational Lloyd iterations
2. SERVE   — streaming/classify: stateless nearest-centroid assignment
             (here driven on the batch frame; the expression is
             mode-agnostic and the streaming twin is test-proven)
3. DEDUP   — llm_ops.similarity.cluster_blocked_pairs: SemDeDup-shaped
             near-dup mining blocked by the same learned clusters
4. QA      — knn_label_accuracy: label-propagation sanity readout

Usage: python examples/run_embedding_pipeline.py [sf_dir] (default sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from video_etl_spark.session import get_spark, load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("video-etl-spark-embeddings")
    spark.sparkContext.setLogLevel("ERROR")

    from video_etl_spark.llm_ops.similarity import cluster_blocked_pairs
    from video_etl_spark.queries.vectors import (
        kmeans_lloyd_embeddings,
        knn_label_accuracy,
    )
    from video_etl_spark.streaming.classify import classify_stream

    emb = load_table(spark, sf_dir, "embeddings")
    n_vecs = emb.count()

    # 1. train: two exact Lloyd rounds -> (center, dim) centroids
    centroids = kmeans_lloyd_embeddings(spark, sf_dir).persist()
    sizes = {
        r["center_id"]: r["n_members"]
        for r in centroids.select("center_id", "n_members").distinct().collect()
    }
    print(f"[train] {n_vecs} vectors -> {len(sizes)} clusters "
          f"(sizes {sorted(sizes.values(), reverse=True)})")

    # 2. serve: fold trained centroids back into arrays and classify the
    #    corpus with the stateless serving expression
    centers = (
        centroids.withColumn("q_off", F.col("centroid_q"))
        .groupBy("center_id")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "q_off"))).alias("sc"))
        .select("center_id", F.expr("transform(sc, x -> x.q_off)").alias("c"))
    )
    assigned = classify_stream(emb.select("vec_id", "embedding"), centers)
    hist = (
        assigned.groupBy("center_id").count().orderBy("center_id").collect()
    )
    print("[serve] assignment histogram:",
          {r["center_id"]: r["count"] for r in hist})

    # 3. dedup: cluster-blocked near-dup pairs over the same seed family
    pairs = cluster_blocked_pairs(emb, n_centers=8, n_probes=2)
    n_pairs = pairs.count()
    top = pairs.orderBy(F.desc("cos_sim")).limit(3).collect()
    print(f"[dedup] {n_pairs} near-dup candidate pairs; top: "
          f"{[(r['vec_a'], r['vec_b'], round(r['cos_sim'], 3)) for r in top]}")

    # 4. QA: per-class kNN label propagation accuracy
    acc = knn_label_accuracy(spark, sf_dir).collect()
    n_eval = sum(r["n_eval"] for r in acc)
    n_correct = sum(r["n_correct"] for r in acc)
    print(f"[qa] knn label accuracy {n_correct}/{n_eval} over "
          f"{len(acc)} classes")

    # 5. index: persist the write-once LSH index and answer a query
    #    batch from it (the production serving pattern — the corpus is
    #    never re-bucketized per batch; streaming twin in
    #    streaming/ann_serve.py)
    from video_etl_spark.llm_ops.similarity import (
        lsh_topk_against_index,
        write_lsh_index,
    )

    idx_path = "/tmp/spark_graft_demo_lsh"
    try:
        write_lsh_index(
            emb.select("vec_id", "embedding"), "demo_lsh", idx_path
        )
        hits = lsh_topk_against_index(
            emb.filter(F.col("vec_id") % 97 == 0).select("vec_id", "embedding"),
            spark.table("demo_lsh"),
            spark.table("demo_lsh_vecs"),
            spark.table("demo_lsh_params"),
            k=5,
        )
        n_hits = hits.count()
        n_q = hits.select("query_id").distinct().count()
        print(f"[index] persisted LSH index answered {n_q} queries "
              f"({n_hits} result rows) without re-bucketizing the corpus")
    finally:
        for t in ("demo_lsh", "demo_lsh_vecs", "demo_lsh_params"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


if __name__ == "__main__":
    main()
