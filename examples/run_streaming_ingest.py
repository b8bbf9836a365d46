#!/usr/bin/env python
"""Streaming ingest curation demo: the continuous-crawl flagship end to
end on the driver's `documents` table (SURVEY.md §2.13).

1. split the sf documents into 5 "crawl day" micro-batches (json files,
   mtime-ordered so maxFilesPerTrigger replays them in order);
2. build a benchmark shingle set from a small held-out slice;
3. run `streaming.curation.streaming_ingest_curation`: PII scrub →
   quality gate → decontamination → incremental near-dup dedup against
   the growing signature index → shard-assigned clean sink;
4. print the per-batch clean/rejected ledger and the final shard manifest
   a training job would read.

Usage: python examples/run_streaming_ingest.py [sf_dir] (default sf0.001)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

from pyspark.sql import functions as F

from video_etl_spark.session import get_spark, load_table
from video_etl_spark.streaming.curation import streaming_ingest_curation
from video_etl_spark.streaming.decontaminate import doc_shingles

N_BATCHES = 5


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("ingest-demo")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ingest_demo_")

    docs = load_table(spark, sf_dir, "documents")

    # benchmark set: every 97th doc stands in for the eval suites (the
    # same held-out convention as the benchmark_decontamination oracle)
    bench_src = docs.filter(F.col("doc_id") % 97 == 0)
    doc_shingles(bench_src).select("s").distinct().write.parquet(
        f"{work}/bench"
    )
    corpus = docs.filter(F.col("doc_id") % 97 != 0)

    # replay the corpus as 5 mtime-ordered "crawl day" batches
    in_dir = f"{work}/crawl"
    os.makedirs(in_dir)
    rows = corpus.select("doc_id", "text", "source").collect()
    per = (len(rows) + N_BATCHES - 1) // N_BATCHES
    for b in range(N_BATCHES):
        path = f"{in_dir}/day{b}.json"
        with open(path, "w") as f:
            for r in rows[b * per : (b + 1) * per]:
                f.write(
                    json.dumps(
                        {
                            "doc_id": r["doc_id"],
                            "text": r["text"],
                            "source": r["source"],
                        }
                    )
                    + "\n"
                )
        os.utime(path, (1_700_000_000 + 60 * b,) * 2)

    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    q = (
        streaming_ingest_curation(
            stream,
            index_dir=f"{work}/sig_index",
            bench_dir=f"{work}/bench",
            clean_dir=f"{work}/clean",
            rejected_dir=f"{work}/rejected",
            stats_dir=f"{work}/stats",
        )
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)

    clean = spark.read.parquet(f"{work}/clean")
    # explicit schema: a run where nothing is rejected leaves the sink
    # without data files, and parquet schema inference would fail (see
    # streaming/decontaminate.streaming_decontamination's docstring)
    rejected = spark.read.schema(
        "doc_id long, reason string, detail long, batch_id integer"
    ).parquet(f"{work}/rejected")

    from video_etl_spark.streaming.stats import current_totals

    stats = current_totals(spark, f"{work}/stats").orderBy("source").collect()
    print("\nincremental mixture stats (survivors, folded from partials):")
    for r in stats[:6]:
        print(f"  {r['source']}: {r['n_docs']} docs, {r['n_tokens']} tokens")

    print(f"\ncorpus {corpus.count()} docs in {N_BATCHES} crawl batches")
    print("\nper-batch ledger:")
    ledger = (
        clean.groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("clean"))
        .join(
            rejected.groupBy("batch_id")
            .pivot("reason", ["quality", "contaminated", "near_dup"])
            .count(),
            "batch_id",
            "outer",
        )
        .na.fill(0)
        .orderBy("batch_id")
    )
    for r in ledger.collect():
        print(
            f"  batch {r['batch_id']}: clean={r['clean']:5d} "
            f"quality={r['quality']:4d} contaminated={r['contaminated']:4d} "
            f"near_dup={r['near_dup']:4d}"
        )

    print("\nfinal shard manifest (what a training job reads):")
    manifest = (
        clean.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .orderBy("shard")
    )
    for r in manifest.collect():
        print(
            f"  shard {r['shard']}: {r['n_docs']:5d} docs "
            f"{r['n_chars']:9d} chars"
        )
    n_clean, n_rejected = clean.count(), rejected.count()
    total = n_clean + n_rejected
    print(
        f"\n{n_clean} clean / {n_rejected} rejected "
        f"({total} total, {n_rejected * 100.0 / total:.1f}% rejected)"
    )


if __name__ == "__main__":
    main()
