#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed twice: a warm-up pass (JIT, code cache, file listing)
is NOT counted; the timed pass collects the full result to the driver, so
the number includes scan + shuffle + result materialization.
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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    registry.load_all()
    spark = get_spark("video-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        fn(spark, sf_dir).count()  # warm-up (not timed)
        spark.catalog.clearCache()  # persists inside queries start cold
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 4)
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
