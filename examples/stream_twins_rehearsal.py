#!/usr/bin/env python
"""The last two streaming twins at scale (round 10): FRAME DEDUP and
SEQUENCE PACKING, each driven per micro-batch over the seeded corpus —
closing the "streaming twins proven only at test scale" list (curation,
stats, ANN serve covered by run_streaming_ingest.py --scale and
ann_serve_rehearsal.py).

Frame dedup: 10 batches of fake-payload frames through
``make_frame_batch_handler`` with the fold → switchover → prune
lifecycle executed MID-stream; batch 7 plants exact copies of BATCH-1
frames (whose raw partition has been folded AND pruned by then) under
fresh ids — every plant must be flagged with evidence, proving the
generation answers for deleted raw history at scale.

Packing: 10 contiguous doc_id-range batches through
``make_packing_handler``; the union of streamed assignments must equal
the one-shot batch ``pack_sequences`` over the full corpus (the
nondecreasing-cursor equivalence), verified distributed via an
order-insensitive per-row-hash checksum — no 500k-row driver collect.

Usage: python examples/stream_twins_rehearsal.py [--scale N]  (default 1)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_BATCHES = 10
FOLD_AFTER = 4
PLANT_BATCH = 7
_GEN = "twins_frame_gen"


def _checksum(df):
    """Order-insensitive multiset checksum: sum of per-row xxhashes +
    row count — the distributed equivalence compare (collecting 500k
    assignment rows driver-side would be the anti-pattern)."""
    return tuple(
        df.select(
            # decimal(38,0): summing 64-bit hashes overflows BIGINT
            # under ANSI long before 500k rows
            F.sum(
                F.xxhash64(*[F.col(c) for c in sorted(df.columns)]).cast(
                    "decimal(38,0)"
                )
            ).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
    )


def main() -> None:
    scale = 1
    if "--scale" in sys.argv:
        try:
            scale = int(sys.argv[sys.argv.index("--scale") + 1])
        except (IndexError, ValueError):
            raise SystemExit(
                "usage: stream_twins_rehearsal.py [--scale N]"
            ) from None

    from examples.scale_rehearsal import ensure_seeded_slice
    from video_etl_spark.llm_ops.export import pack_sequences
    from video_etl_spark.llm_ops.multimodal import attach_fake_payload
    from video_etl_spark.session import get_spark, load_table
    from video_etl_spark.streaming.dedup import prune_folded_partitions
    from video_etl_spark.streaming.frame_dedup import (
        compact_stream_frame_index,
        make_frame_batch_handler,
    )
    from video_etl_spark.streaming.packing import make_packing_handler

    spark = get_spark("stream-twins-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = ensure_seeded_slice(spark, scale)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="stream_twins_")
    try:
        # ------------------------------------------------ frame dedup
        print("frame-dedup stream:")
        idx, dups = f"{work}/frame_idx", f"{work}/frame_dups"
        handler = make_frame_batch_handler(idx, dups)

        def frame_batch(b: int):
            # payload is text-derived, so copies of a text are exact
            # frame dups — the same convention the unit tests use
            return attach_fake_payload(
                docs.filter(F.col("doc_id") % N_BATCHES == b)
            )

        for b in range(N_BATCHES):
            if b == FOLD_AFTER + 1:
                t0 = time.perf_counter()
                compact_stream_frame_index(
                    spark, idx, _GEN, f"{work}/frame_gen0",
                    upto_batch_id=FOLD_AFTER, n_buckets=32,
                )
                handler = make_frame_batch_handler(
                    idx, dups, compacted_table=_GEN
                )
                pruned = prune_folded_partitions(spark, idx, _GEN)
                assert pruned == list(range(FOLD_AFTER + 1)), pruned
                print(f"  fold + switchover + prune({len(pruned)}): "
                      f"{time.perf_counter() - t0:.1f}s")
            frames = frame_batch(b)
            if b == PLANT_BATCH:
                # copies of BATCH-1 frames (folded AND pruned raw
                # partition): the generation must answer for them
                plants = (
                    docs.filter(F.col("doc_id") % N_BATCHES == 1)
                    .orderBy("doc_id")
                    .limit(40)
                    .select(
                        (F.col("doc_id") + 30_000_000).alias("doc_id"),
                        "text",
                    )
                )
                frames = frames.unionByName(attach_fake_payload(plants))
            t0 = time.perf_counter()
            handler(frames, b)
            print(f"  batch {b} "
                  f"[{'compacted' if b > FOLD_AFTER else 'raw':9s}] "
                  f"{time.perf_counter() - t0:5.1f}s")
        flagged = {
            r["new_doc"]
            for r in spark.read.parquet(dups)
            .where(f"batch_id = {PLANT_BATCH} and new_doc >= 30000000")
            .collect()
        }
        assert len(flagged) == 40, (
            f"{len(flagged)}/40 planted frame dups flagged through the "
            "generation"
        )
        print(f"  planted frame dups flagged via pruned history: "
              f"{len(flagged)}/40")

        # ---------------------------------------------------- packing
        print("packing stream:")
        assign_dir, totals_dir = f"{work}/assign", f"{work}/totals"
        ph = make_packing_handler(assign_dir, totals_dir,
                                  seq_len=256, n_shards=8)
        lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
        width = (hi - lo + N_BATCHES) // N_BATCHES
        for b in range(N_BATCHES):
            t0 = time.perf_counter()
            ph(
                docs.filter(
                    (F.col("doc_id") >= lo + b * width)
                    & (F.col("doc_id") < lo + (b + 1) * width)
                ),
                b,
            )
            print(f"  batch {b} {time.perf_counter() - t0:5.1f}s")
        cols = ["doc_id", "shard", "n_tok", "cum_before",
                "start_seq", "end_seq", "straddles"]
        t0 = time.perf_counter()
        got = _checksum(spark.read.parquet(assign_dir).select(*cols))
        want = _checksum(
            pack_sequences(docs, seq_len=256, n_shards=8).select(*cols)
        )
        assert got == want and got[1] > 0, (got, want)
        print(f"  streamed assignments == batch pack_sequences "
              f"({got[1]} rows; checksum compare {time.perf_counter() - t0:.1f}s)")
    finally:
        for t in (_GEN, f"{_GEN}_watermark"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
