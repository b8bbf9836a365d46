#!/usr/bin/env python
"""Stream-index compaction economics at ~sf1: what does folding the
batch_id-partitioned raw signature directory into the bucketed band
index actually save the LIVE stream?

Setup: the seeded ~sf1 corpus's history split (49 k docs) is signed once
and laid out as a 98-partition raw signature directory — exactly what 98
micro-batches of ``streaming_incremental_dedup`` leave behind (one file
per partition: the BEST case for the raw layout; a real stream leaves
more).  Then one identical held-out batch is pushed through the handler
twice:

  raw mode        — the handler reads the whole partition-dir history
                    and runs the per-band signature join (history side
                    shuffles every batch);
  compacted mode  — after ``compact_stream_index`` + switchover, the
                    handler probes the bucketed generation (index side
                    exchange-free) plus the empty tail.

Reported: per-batch handler wall time in each mode, the one-off
compaction cost (and its break-even batch count), and the raw-dir vs
generation file counts (the small-file listing load every batch pays).

Usage: python examples/stream_compaction_economics.py [--batches 98]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF1_DIR = "/tmp/spark_graft_sf1"


def n_files(root: str) -> int:
    return sum(
        1
        for _, _, fs in os.walk(root)
        for f in fs
        if f.endswith(".parquet")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=98)
    args = ap.parse_args()

    from video_etl_spark.llm_ops.dedup import minhash_band_signatures
    from video_etl_spark.session import get_spark
    from video_etl_spark.streaming.dedup import (
        compact_stream_index,
        make_batch_handler,
    )

    spark = get_spark("stream-compaction-economics")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(f"{SF1_DIR}/documents.parquet"):
        from scale_rehearsal import generate

        generate(spark)

    docs = spark.read.parquet(f"{SF1_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    history = docs.filter(F.col("doc_id") % 50 != 0)
    batch = docs.filter(F.col("doc_id") % 50 == 0)
    n_hist, n_batch = history.count(), batch.count()
    work = tempfile.mkdtemp(prefix="stream_compaction_")
    idx_dir = f"{work}/idx"
    try:
        # lay down the raw signature directory the stream would have
        # accumulated: one partition per micro-batch, ONE file each
        # (write_partitioned's repartition-by-partition-col discipline —
        # the best case; real foreachBatch appends leave more files)
        sigs = minhash_band_signatures(history)
        (
            sigs.withColumn(
                "batch_id", F.pmod(F.col("doc_id"), F.lit(args.batches))
            )
            .repartition(F.col("batch_id"))
            .write.partitionBy("batch_id")
            .parquet(idx_dir)
        )
        raw_files = n_files(idx_dir)
        print(f"history={n_hist} docs as {args.batches} raw partitions "
              f"({raw_files} files); probe batch={n_batch} docs")

        def run(handler, bid):
            from pyspark.errors import AnalysisException

            spark.catalog.clearCache()
            t0 = time.perf_counter()
            handler(batch, bid)
            dt = time.perf_counter() - t0
            try:
                n = (
                    spark.read.parquet(f"{work}/dups")
                    .where(f"batch_id = {bid}")
                    .count()
                )
            except AnalysisException:
                # an EMPTY dup result writes no files (dynamic
                # overwrite), and with the stale partition deleted the
                # dir has nothing to infer a schema from — that IS the
                # broken-switchover signal, reported as 0 below
                n = 0
            return dt, n

        raw_handler = make_batch_handler(idx_dir, f"{work}/dups")
        t_raw, n_raw = run(raw_handler, args.batches)
        print(f"raw-mode handler:       {t_raw:6.1f}s "
              f"({n_raw} dup candidates)")

        t0 = time.perf_counter()
        compact_stream_index(
            spark, idx_dir, "sce_band_gen",
            f"{work}/gen0", upto_batch_id=args.batches - 1,
        )
        t_compact = time.perf_counter() - t0
        gen_files = n_files(f"{work}/gen0")
        shutil.rmtree(f"{idx_dir}/batch_id={args.batches}",
                      ignore_errors=True)  # raw-mode probe's own append
        # the raw run's dup partition must go BEFORE the compacted run:
        # dynamic overwrite of an EMPTY result writes no files, so a
        # broken switchover producing 0 candidates would re-read the raw
        # run's stale 570 rows and the consistency check below would
        # pass vacuously
        shutil.rmtree(f"{work}/dups/batch_id={args.batches}",
                      ignore_errors=True)
        sw_handler = make_batch_handler(
            idx_dir, f"{work}/dups", compacted_table="sce_band_gen",
        )
        # prune AFTER the handler switchover (the reference recipe —
        # pruning first leaves a raw-mode handler a history hole);
        # watermark-driven, never a hand-typed boundary
        from video_etl_spark.streaming.dedup import prune_folded_partitions

        pruned = prune_folded_partitions(spark, idx_dir, "sce_band_gen")
        assert len(pruned) == args.batches, pruned
        t_sw, n_sw = run(sw_handler, args.batches)
        print(f"compacted-mode handler: {t_sw:6.1f}s "
              f"({n_sw} dup candidates)")
        if n_sw != n_raw or n_sw == 0:
            raise RuntimeError(
                "broken switchover: compacted-mode handler flagged "
                f"{n_sw} candidates where raw mode flagged {n_raw}"
            )
        be = t_compact / max(t_raw - t_sw, 1e-9)
        print(f"compaction: {t_compact:.1f}s once, {raw_files} raw files "
              f"-> {gen_files} bucketed; per-batch saving "
              f"{t_raw - t_sw:.1f}s, break-even after {be:.1f} batches")
    finally:
        spark.sql("DROP TABLE IF EXISTS sce_band_gen")
        spark.sql("DROP TABLE IF EXISTS sce_band_gen_watermark")
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
