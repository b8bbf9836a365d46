#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query runs one warm-up pass (JIT, code cache, file listing — NOT
counted) and then $SPARK_GRAFT_BENCH_REPS timed passes (default 3); the
reported number is the per-query MEDIAN, which kills the ±40 % single-shot
noise observed in rounds 2-3.  Timed passes force count + an all-column
xxhash reduce in ONE job (the scale_rehearsal harness's honest
materialization): a bare count() lets Catalyst prune expensive output
columns (it understated remove_repeated_spans 50× once), while collect()
adds driver-transfer time for wide outputs that no production sink pays —
the hash reduce computes every output column cluster-side and ships one
row.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from video_etl_spark import registry
from video_etl_spark.session import get_spark

# Headline set: one per operator family (scan/agg, join, window, temporal,
# dedup, similarity, text, geometry).
HEADLINE = [
    "pricing_summary",
    "top_revenue_orders",
    "regional_revenue",
    "top_orders_per_customer",
    "event_chunk_agg_2s",
    "sessionize_events",
    "asof_purchase_click",
    "range_join_clicks_before_purchase",
    "minhash_band_pairs",
    "jaccard_pair_stats",
    "simhash_near_dup_pairs",
    "knn_cosine_bruteforce",
    "multimodal_features",
    "token_stats",
    "iou_edge_stats",
    "small_quantity_revenue",
    "chunk_scores_pipeline",
    "repetition_scores",
    "sole_returning_suppliers",
    "min_cost_supplier_per_part",
    "mlp_embedding",
    "dedup_connected_clusters",
    "trailing_hour_user_sum",
    "nation_market_share",
    # round-6 additions: the round-5 operator surface + the Q12 shape,
    # perf-tracked and plan-goldened like the rest.
    "pagerank_trade_flow",
    "incremental_band_dedup",
    "benchmark_decontamination",
    "value_percentiles_by_type",
    "value_percentiles_approx",
    "shipmode_priority_counts",
    # round-6 late additions: cross-document span dedup measure, per-source
    # quality gating, and the domain-contamination matrix.
    "repeated_span_fraction",
    "quality_percentile_gate",
    "cross_source_contamination",
    # round-6 export/novelty additions: terminal shard export planning,
    # marginal-novelty data mixing, and the dedup corpus-health readout.
    "training_shard_manifest",
    "ngram_novelty_by_source",
    "dup_cluster_size_histogram",
    # round-6 corpus-rewrite additions: the exact substring-dedup
    # transform and the Heaps-law vocabulary curve.
    "remove_repeated_spans",
    "vocab_growth_curve",
    # round-6 continuation: mixture application, leakage-free split, and
    # the embedding clustering/classification family.
    "mixture_resample",
    "cluster_aware_split",
    "kmeans_lloyd_embeddings",
    "semantic_dedup_pairs",
    "knn_label_accuracy",
    # round-7 additions: the multimodal member of the dedup family,
    # packing export, the LM/fingerprint/chunk text ops, and the
    # revision-governance readouts.
    "phash_near_dup_pairs",
    # round-8 additions: the corpus-scale overlap readout and the
    # pair-family skew guard histogram.
    "winnowing_overlap_stats",
    "band_occupancy_histogram",
    "sequence_packing_manifest",
    "bigram_lm_topk",
    "winnowing_overlap_pairs",
    "chunk_documents",
    "embedding_drift_by_dim",
    "doc_length_percentiles_by_source",
    "dup_graph_triangles",
    "epoch_sampling_plan",
]

# Indexed twins (round-7 verdict #4): the same CC-chain queries consuming
# the PERSISTED component index `write_component_index` builds — the
# production call pattern the index exists for.  The index build runs once
# per bench session, UNTIMED (it is the per-corpus-revision cost the
# inline forms re-pay on every query); each twin's timed passes measure
# only the consumer read.  Keys are reported in the same `queries` map as
# `<base>@index`; the inline forms stay in HEADLINE so the cold-query cost
# remains visible.
INDEXED_TWINS = [
    "dedup_connected_clusters",
    "cluster_aware_split",
]
_INDEX_TABLE = "bench_component_index"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    registry.load_all()
    spark = get_spark("video-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    def force(df) -> None:
        # every output column feeds the hash, so nothing prunes; only one
        # row crosses to the driver
        df.select(
            F.count(F.lit(1)).alias("n"),
            F.max(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
        ).collect()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}

    def time_query(name, build):
        force(build())  # warm-up (not timed)
        spark.catalog.clearCache()  # persists inside queries start cold
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            force(build())
            samples.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        timings[name] = round(sorted(samples)[len(samples) // 2], 4)

    for name in HEADLINE:
        fn = registry.QUERIES[name]
        time_query(name, lambda fn=fn: fn(spark, sf_dir))

    # indexed twins: build the component index ONCE (untimed — the
    # per-corpus-revision cost), then time the consumer reads against it
    import shutil
    import tempfile

    from video_etl_spark.llm_ops.dedup import write_component_index
    from video_etl_spark.session import load_table

    idx_path = tempfile.mkdtemp(prefix="bench_component_index_")
    try:
        write_component_index(
            load_table(spark, sf_dir, "documents"),
            _INDEX_TABLE,
            os.path.join(idx_path, "tbl"),
        )
        spark.catalog.clearCache()
        for base in INDEXED_TWINS:
            fn = registry.QUERIES[base]
            time_query(
                f"{base}@index",
                lambda fn=fn: fn(
                    spark, sf_dir, components=spark.table(_INDEX_TABLE)
                ),
            )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {_INDEX_TABLE}")
        shutil.rmtree(idx_path, ignore_errors=True)

    # headline total covers HEADLINE only — the @index twins report in
    # the queries map but must not inflate the round-over-round trend
    # metric (they re-measure two queries already counted inline)
    total = round(sum(timings[n] for n in HEADLINE), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
