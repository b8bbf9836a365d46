#!/usr/bin/env python
"""ANN index economics at ~sf1 (round-8): for each ANN leg (LSH / IVF /
PQ) measure the DIRECT per-call cost (which refits/re-encodes/re-buckets
the corpus every time) against the persisted-index pattern (one
write_*_index + N cheap probes), and print the per-probe speedup and the
break-even probe count PERF.md records.

Uses the seeded ~sf1 slice's embeddings table (20 k × 64 — generate it
first with `python examples/scale_rehearsal.py` or pass --generate).
Honest materialization: cold cache before every timed run, count + an
all-column xxhash forced in one job, only that single row collected.

Usage:  python examples/ann_index_economics.py [--generate] [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF1_DIR = "/tmp/spark_graft_sf1"
IDX_DIR = "/tmp/spark_graft_ann_idx"


def force(df) -> int:
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.max(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
    ).collect()[0]
    return row["n"]


def timed(spark, thunk, reps: int) -> tuple[float, int]:
    """Median wall-time of reps cold runs of thunk() -> DataFrame."""
    times, n = [], 0
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = force(thunk())
        times.append(time.perf_counter() - t0)
    return statistics.median(times), n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--generate", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from video_etl_spark.llm_ops.similarity import (
        ivf_topk,
        ivf_topk_against_index,
        lsh_topk,
        lsh_topk_against_index,
        pq_topk,
        pq_topk_against_index,
        write_ivf_index,
        write_lsh_index,
        write_pq_index,
    )
    from video_etl_spark.session import get_spark

    spark = get_spark("ann-index-economics")
    spark.sparkContext.setLogLevel("ERROR")

    if args.generate or not os.path.isdir(f"{SF1_DIR}/embeddings.parquet"):
        from scale_rehearsal import generate

        generate(spark)

    emb = spark.read.parquet(f"{SF1_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") % 97 == 0)
    n_corpus, n_queries = emb.count(), queries.count()
    print(f"corpus={n_corpus} vectors, query batch={n_queries}")

    results = {}
    try:
        # --- LSH ----------------------------------------------------------
        t_direct, n = timed(spark, lambda: lsh_topk(emb, queries, k=10), args.reps)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        write_lsh_index(emb, "econ_lsh", f"{IDX_DIR}/lsh")
        t_build = time.perf_counter() - t0
        t_probe, n_p = timed(
            spark,
            lambda: lsh_topk_against_index(
                queries,
                spark.table("econ_lsh"),
                spark.table("econ_lsh_vecs"),
                spark.table("econ_lsh_params"),
                k=10,
            ),
            args.reps,
        )
        assert n == n_p, (n, n_p)
        results["lsh"] = (t_direct, t_build, t_probe, n)

        # --- IVF ----------------------------------------------------------
        t_direct, n = timed(
            spark,
            lambda: ivf_topk(emb, queries, k=10, n_centroids=8, n_probe=3),
            args.reps,
        )
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        write_ivf_index(emb, f"{IDX_DIR}/ivf", n_centroids=8)
        t_build = time.perf_counter() - t0
        t_probe, n_p = timed(
            spark,
            lambda: ivf_topk_against_index(
                spark, queries, f"{IDX_DIR}/ivf", k=10, n_probe=3
            ),
            args.reps,
        )
        assert n == n_p, (n, n_p)
        results["ivf"] = (t_direct, t_build, t_probe, n)

        # --- PQ -----------------------------------------------------------
        t_direct, n = timed(spark, lambda: pq_topk(emb, queries, k=10), args.reps)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        write_pq_index(emb, "econ_pq", f"{IDX_DIR}/pq")
        t_build = time.perf_counter() - t0
        t_probe, n_p = timed(
            spark,
            lambda: pq_topk_against_index(
                queries,
                spark.table("econ_pq"),
                spark.table("econ_pq_vecs"),
                spark.table("econ_pq_books"),
                k=10,
            ),
            args.reps,
        )
        assert n == n_p, (n, n_p)
        results["pq"] = (t_direct, t_build, t_probe, n)

        # --- append maintenance vs generation rebuild ----------------------
        # the crawl-follow pattern: an index over 90 % of the corpus
        # absorbs the other 10 % via append_to_*_index; the alternative
        # is rebuilding the full index.  Visibility is asserted for
        # real: appended ids (vec_id % 10 == 0) must actually APPEAR in
        # probe results — a bare row-count check would pass vacuously,
        # since top-k probes always return n_queries * k rows.
        from video_etl_spark.llm_ops.similarity import (
            append_to_ivf_index,
            append_to_lsh_index,
            append_to_pq_index,
        )

        old_vecs = emb.filter(F.col("vec_id") % 10 != 0)
        batch = emb.filter(F.col("vec_id") % 10 == 0)
        print(f"\nappend economics: base={old_vecs.count()} vectors, "
              f"batch={batch.count()}")
        appends = {}

        write_lsh_index(old_vecs, "econ_lsh_a", f"{IDX_DIR}/lsh_a")
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        append_to_lsh_index(batch, "econ_lsh_a")
        t_app = time.perf_counter() - t0
        n_hit = lsh_topk_against_index(
            queries, spark.table("econ_lsh_a"),
            spark.table("econ_lsh_a_vecs"),
            spark.table("econ_lsh_a_params"), k=10,
        ).where(F.col("neighbor_id") % 10 == 0).count()
        assert n_hit > 0, "appended vectors invisible to LSH probes"
        appends["lsh"] = (t_app, results["lsh"][1])

        write_ivf_index(old_vecs, f"{IDX_DIR}/ivf_a", n_centroids=8)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        append_to_ivf_index(batch, f"{IDX_DIR}/ivf_a")
        t_app = time.perf_counter() - t0
        n_hit = ivf_topk_against_index(
            spark, queries, f"{IDX_DIR}/ivf_a", k=10, n_probe=3
        ).where(F.col("neighbor_id") % 10 == 0).count()
        assert n_hit > 0, "appended vectors invisible to IVF probes"
        appends["ivf"] = (t_app, results["ivf"][1])

        write_pq_index(old_vecs, "econ_pq_a", f"{IDX_DIR}/pq_a")
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        append_to_pq_index(batch, "econ_pq_a")
        t_app = time.perf_counter() - t0
        n_hit = pq_topk_against_index(
            queries, spark.table("econ_pq_a"),
            spark.table("econ_pq_a_vecs"),
            spark.table("econ_pq_a_books"), k=10,
        ).where(F.col("neighbor_id") % 10 == 0).count()
        assert n_hit > 0, "appended vectors invisible to PQ probes"
        appends["pq"] = (t_app, results["pq"][1])

        print(f"{'leg':<5} {'append':>8} {'rebuild':>8} {'ratio':>7}")
        for leg, (a, b) in appends.items():
            print(f"{leg:<5} {a:>7.2f}s {b:>7.2f}s {b / a:>6.1f}x")
    finally:
        for t in (
            "econ_lsh",
            "econ_lsh_vecs",
            "econ_lsh_params",
            "econ_lsh_a",
            "econ_lsh_a_vecs",
            "econ_lsh_a_params",
            "econ_pq",
            "econ_pq_vecs",
            "econ_pq_books",
            "econ_pq_params",
            "econ_pq_a",
            "econ_pq_a_vecs",
            "econ_pq_a_books",
            "econ_pq_a_params",
        ):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    print(f"\n{'leg':<5} {'direct':>8} {'build':>8} {'probe':>8} "
          f"{'speedup':>8} {'break-even':>11} {'rows':>7}")
    for leg, (d, b, p, n) in results.items():
        # break-even: after how many probe batches does build + N*probe
        # undercut N*direct?  N >= build / (direct - probe)
        be = b / (d - p) if d > p else float("inf")
        print(f"{leg:<5} {d:>7.2f}s {b:>7.2f}s {p:>7.2f}s "
              f"{d / p:>7.1f}x {be:>10.1f} {n:>7}")


if __name__ == "__main__":
    main()
