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
full artifact that read documents/embeddings/events.

``--tpch`` (round-11 verdict #3) measures the TPC-H-table headliners
the round-11 run excluded on a "linear by construction" argument —
iterative-join × shuffle interactions (``pagerank_trade_flow``'s 20
localCheckpointed iterations, the nested join trees) are exactly where
that argument breaks in practice, so they get empirical exponents too.
Method: BOTH scales are REPLICAS of the driver's sf0.1 tables written
by the same routine (K=1 and K=10), with every ``*key`` column
re-salted ``key·K + replica`` so each replica is a disjoint copy of
the database — joins stay within-replica (cardinality ×K, never ×K²)
and group keys multiply (250 nations at 10×: output-bound group counts
scale with the data, stated where it matters).  Writing the 1× copy
through the same writer keeps file layout/codec out of the exponent.

Usage: python examples/headline_scaling.py [--reps 3] [--tpch]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SMALL_DIR = "/tmp/spark_graft_sf0p1"
TPCH_1X_DIR = "/tmp/spark_graft_tpch_1x"
TPCH_10X_DIR = "/tmp/spark_graft_tpch_10x"
TPCH_SRC = "/root/testdata/sf0.1"
TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
)

# the TPC-H-side headliners round-11 excluded: the iterative-join
# PageRank, the two heaviest nested join trees, and two
# group-key-multiplying aggregation shapes
TPCH_QUERIES = [
    "pagerank_trade_flow",
    "sole_returning_suppliers",
    "min_cost_supplier_per_part",
    "nation_market_share",
    "customer_distribution",
]

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


def replicate_tpch(spark, out_dir: str, k: int) -> None:
    """Write K disjoint replicas of the sf0.1 TPC-H tables: every
    ``*key`` column re-salted ``key·K + replica`` (consistently across
    tables, so joins stay within-replica), everything else verbatim.
    K=1 is the identity remap — the 1× point goes through the same
    writer so file layout/codec can't confound the exponent."""
    from pyspark.sql import functions as F

    for t in TPCH_TABLES:
        df = spark.read.parquet(f"{TPCH_SRC}/{t}.parquet")
        rep = df.crossJoin(
            spark.range(k).select(F.col("id").alias("_replica"))
        )
        cols = [
            (F.col(c) * k + F.col("_replica")).cast("long").alias(c)
            if c.endswith("key")
            else F.col(c)
            for c in df.columns
        ]
        rep.select(*cols).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )


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

    if "--tpch" in sys.argv:
        names, small_dir, big_dir = TPCH_QUERIES, TPCH_1X_DIR, TPCH_10X_DIR
        for out, k in ((TPCH_1X_DIR, 1), (TPCH_10X_DIR, 10)):
            if not all(
                os.path.exists(os.path.join(out, f"{t}.parquet"))
                for t in TPCH_TABLES
            ):
                print(f"replicating {TPCH_SRC} x{k} under {out} ...")
                replicate_tpch(spark, out, k)
    else:
        names, small_dir = TOP_QUERIES, SMALL_DIR
        big_dir = ensure_seeded_slice(spark, 1)
        if not all(
            os.path.exists(os.path.join(SMALL_DIR, f"{t}.parquet"))
            for t in ("documents", "embeddings", "events")
        ):
            print(
                f"generating seeded sf0.1-equivalent slice under {SMALL_DIR} ..."
            )
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
    for name in names:
        t_small = timed(name, small_dir)
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
