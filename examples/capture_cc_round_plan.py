#!/usr/bin/env python
"""Capture the PRE-localCheckpoint plan of ONE connected_components round.

The CC loop checkpoints eagerly every round, so ``explain`` on a
CC-chain query's returned frame only shows ``Scan ExistingRDD`` roots —
the per-round join structure the round-15 optimization changed (3 joins
+ groupBy → 1 join + 1 groupBy via the self-row/message union) never
appears in the normal plan captures.  This script rebuilds exactly one
round's ``new_labels`` plan lazily (checkpoint NOT executed) over the
bench corpus's edges/nodes and writes its formatted explain.

Usage: python examples/capture_cc_round_plan.py <suffix>
Writes plans/r15/cc_round_<suffix>.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) != 2:
        raise SystemExit("usage: capture_cc_round_plan.py <suffix>")
    suffix = sys.argv[1]

    from pyspark.sql import functions as F

    from video_etl_spark.llm_ops.dedup import (
        band_pairs_from_sigs,
        collapse_exact_sigs,
        minhash_band_signatures,
    )
    from video_etl_spark.session import get_spark, load_table

    spark = get_spark("capture-cc-round")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_band_signatures(docs, 2, 2).persist()
    rep_sigs, members = collapse_exact_sigs(sigs, 2, id_col="doc_id")
    rep_sigs = rep_sigs.persist()
    edges = band_pairs_from_sigs(rep_sigs, 2, id_col="doc_id")
    nodes = docs.select("doc_id").join(
        members.select("doc_id"), "doc_id", "left_anti"
    )

    bidir = edges.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(
        edges.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    ).persist()
    labels = nodes.select(
        F.col("doc_id").alias("node"), F.col("doc_id").alias("label")
    ).localCheckpoint()

    # ONE round, built exactly like connected_components but WITHOUT the
    # final .localCheckpoint() so the round's physical plan is visible.
    # suffix 'before' rebuilds the pre-round-15 3-join round; any other
    # suffix builds the fused (1 join + 1 groupBy) round now in
    # llm_ops.dedup.connected_components.
    if suffix == "before":
        neighbor_min = (
            bidir.join(labels, bidir["u"] == labels["node"])
            .groupBy("v")
            .agg(F.min("label").alias("nmin"))
        )
        stepped = labels.join(
            neighbor_min, labels["node"] == neighbor_min["v"], "left"
        ).select(
            "node",
            F.col("label").alias("prev"),
            F.least(
                F.col("label"), F.coalesce("nmin", F.col("label"))
            ).alias("label"),
        )
    else:
        label_t = dict(labels.dtypes)["label"]
        messages = bidir.join(labels, bidir["u"] == labels["node"]).select(
            F.col("v").alias("node"),
            F.col("label").alias("l"),
            F.lit(None).cast(label_t).alias("sl"),
        )
        self_rows = labels.select(
            "node", F.col("label").alias("l"), F.col("label").alias("sl")
        )
        stepped = (
            self_rows.unionByName(messages)
            .groupBy("node")
            .agg(F.min("l").alias("label"), F.min("sl").alias("prev"))
            .filter(F.col("prev").isNotNull())
            .select("node", "prev", "label")
        )
    parents = stepped.select(
        F.col("node").alias("p_node"), F.col("label").alias("p_label")
    )
    new_labels = stepped.join(
        parents, stepped["label"] == parents["p_node"], "left"
    ).select(
        "node",
        "prev",
        F.least(F.col("label"), F.coalesce("p_label", F.col("label"))).alias(
            "label"
        ),
    )

    plan = new_labels._sc._jvm.PythonSQLUtils.explainString(
        new_labels._jdf.queryExecution(), "formatted"
    )
    out_dir = os.environ.get(
        "SPARK_GRAFT_PLANS_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"cc_round_{suffix}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
