#!/usr/bin/env python
"""Capture the PRE-localCheckpoint plan of pagerank_trade_flow.

The query's final ``localCheckpoint`` (a round-5 cache-discipline
measure) makes ``explain`` on the returned frame show only a
``Scan ExistingRDD`` — both before and after the round-15 bounded
iteration change.  This script rebuilds the query body up to (but not
including) that checkpoint so the committed plan file actually shows
the iteration shape the round changed: 5 rounds x (join + groupBy +
join) before vs one ``MapInPandas`` after.

Usage: python examples/capture_pagerank_precheckpoint.py <suffix>
Writes plans/r15/pagerank_trade_flow_precheckpoint_<suffix>.txt
(relative to $SPARK_GRAFT_PLANS_DIR or this repo's plans/r15).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) != 2:
        raise SystemExit("usage: capture_pagerank_precheckpoint.py <suffix>")
    suffix = sys.argv[1]

    from pyspark.sql import functions as F

    from video_etl_spark.queries import advanced
    from video_etl_spark.session import get_spark, load_table

    spark = get_spark("capture-pagerank-precheckpoint")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

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
    )
    outw = edges.groupBy("src").agg(F.sum("w").cast("long").alias("ow"))
    edges_n = edges.join(outw, "src")
    nodes = nation.select(F.col("n_nationkey").alias("node"))

    iterate = getattr(advanced, "pagerank_iterate_bounded", None) or (
        advanced.pagerank_iterate
    )
    ranks = iterate(nodes, edges_n, advanced._PR_ITERS)
    df = ranks.select(
        F.col("node").alias("n_nationkey"),
        F.col("rank").alias("pagerank_micros"),
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    out_dir = os.environ.get(
        "SPARK_GRAFT_PLANS_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            "r15",
        ),
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(
        out_dir, f"pagerank_trade_flow_precheckpoint_{suffix}.txt"
    )
    with open(path, "w") as fh:
        fh.write(plan)
    print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
