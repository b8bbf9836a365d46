#!/usr/bin/env python
"""sf0.1 → sf1 scaling exponents for the most expensive headline queries
(round-11 verdict #5): the lifecycle rehearsals scale the CORPUS
pipelines, but the headline bench had only ever run at sf0.1 — this is
the one untimed-gate run that measures how each heavy query's cost
grows with 10× data, so anything superlinear gets a plan read before it
matters at 100 TB.

Method: BOTH scales come from the SAME seeded generator
(``examples.scale_rehearsal.generate`` — content is a pure hash of the
row id, so the big slice is a superset of the small one): a 1×
sf0.1-equivalent slice (5k docs / 100k events / 2k vecs) and the
existing ~sf1 slice (50k / 1M / 20k).  Comparing driver sf0.1 parquet
against the seeded slice would confound scale with DISTRIBUTION (the
seeded vocabulary is deliberately small and dup-dense); same-generator
slices isolate the exponent.  Each query runs bench.py's honest
materialization (count + all-column xxhash in one job), warm-up + 3
timed reps, median reported.

Query set: the 10 most expensive headline queries from the round-10
full artifact that read documents/embeddings/events.  The TPC-H-table
headliners (``pagerank_trade_flow`` 3.4s, ``sole_returning_suppliers``,
``min_cost_supplier_per_part``) are EXCLUDED: the seeded generator
produces no TPC-H tables, and the driver regenerates /root/testdata
per-round at fixed scale factors — their scaling story is the TPC-H
shape itself (hash agg / SMJ over uniformly-distributed keys), already
linear by construction.

Usage: python examples/headline_scaling.py [--reps 3]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SMALL_DIR = "/tmp/spark_graft_sf0p1"

# the top of the round-10 sf0.1 cost ranking (5.3 s down to 2.0 s),
# documents/embeddings/events tables only (see module docstring)
TOP_QUERIES = [
    "cluster_aware_split",
    "dup_cluster_size_histogram",
    "dedup_connected_clusters",
    "dup_graph_triangles",
    "simhash_overlap_stats",
    "remove_repeated_spans",
    "simhash_near_dup_pairs",
    "cross_source_contamination",
    "incremental_band_dedup",
    "phash_overlap_stats",
]


def main() -> None:
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])

    from examples.scale_rehearsal import ensure_seeded_slice, generate
    from video_etl_spark import registry
    from video_etl_spark.session import get_spark

    registry.load_all()
    spark = get_spark("headline-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    big_dir = ensure_seeded_slice(spark, 1)
    if not all(
        os.path.exists(os.path.join(SMALL_DIR, f"{t}.parquet"))
        for t in ("documents", "embeddings", "events")
    ):
        print(f"generating seeded sf0.1-equivalent slice under {SMALL_DIR} ...")
        generate(
            spark, out_dir=SMALL_DIR,
            n_docs=5_000, n_events=100_000, n_vecs=2_000,
        )

    def force(df) -> None:
        df.select(
            F.count(F.lit(1)).alias("n"),
            F.max(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
        ).collect()

    def timed(name: str, sf_dir: str) -> float:
        fn = registry.QUERIES[name]
        force(fn(spark, sf_dir))  # warm-up, untimed
        spark.catalog.clearCache()
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            samples.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        return sorted(samples)[len(samples) // 2]

    print(f"{'query':34s} {'1x (s)':>8s} {'10x (s)':>8s} {'ratio':>6s}")
    rows = []
    for name in TOP_QUERIES:
        t_small = timed(name, SMALL_DIR)
        t_big = timed(name, big_dir)
        ratio = t_big / t_small if t_small > 0 else float("inf")
        flag = "  <-- SUPERLINEAR (>15x)" if ratio > 15 else ""
        rows.append((name, t_small, t_big, ratio))
        print(f"{name:34s} {t_small:8.2f} {t_big:8.2f} {ratio:6.1f}{flag}")
    worst = max(rows, key=lambda r: r[3])
    print(f"\nworst exponent: {worst[0]} at {worst[3]:.1f}x "
          f"(log10 ratio {math.log10(max(worst[3], 1e-9)):.2f} "
          "per decade of data)")
    spark.stop()


if __name__ == "__main__":
    main()
