#!/usr/bin/env python
"""Streaming ANN serving at scale (round-10: the last streaming twin
proven only at test scale).  The seeded corpus's vectors are indexed
ONCE with ``write_lsh_index``; a feed of query batches is then answered
per micro-batch by ``make_ann_serve_handler`` — the same handler the
readStream path wraps — with per-batch latency recorded, a mid-serve
``append_to_lsh_index`` whose vectors must be visible to the very next
batch, and a self-recall assertion every batch (a query drawn from the
corpus hashes into its own buckets in every table, so it must return
ITSELF at rank 1 with cos 1.0 — a per-batch end-to-end probe, not a
sampled spot check).

What the 1× vs 10× comparison shows — and the trap it measures: per
query the candidate set is ~n_tables × (corpus / 2^n_planes), so at
FIXED planes the serve cost is CORPUS-sized, not query-sized (first
10× attempt: 171 s/batch at n_planes=4 — every bucket held ~12k
vectors).  The planes count is the scale dial: this rehearsal sizes
``n_planes = log2(corpus / target_occupancy)`` so per-bucket occupancy
(hence per-batch latency) stays ~flat as the corpus grows.  Self-recall
is unaffected by more planes (an identical vector lands in identical
buckets in every table), which is why the per-batch assertion stays
exact while near-neighbor recall/latency trades off via planes —
exactly the dial a production deployment tunes.

Usage: python examples/ann_serve_rehearsal.py [--scale N]   (default 1)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_SERVE_BATCHES = 8
TOPK = 5
_TBL = "ann_serve_rehearsal_idx"


def main() -> None:
    scale = 1
    if "--scale" in sys.argv:
        try:
            scale = int(sys.argv[sys.argv.index("--scale") + 1])
        except (IndexError, ValueError):
            raise SystemExit(
                "usage: ann_serve_rehearsal.py [--scale N]"
            ) from None

    from examples.scale_rehearsal import ensure_seeded_slice
    from video_etl_spark.llm_ops.similarity import (
        append_to_lsh_index,
        write_lsh_index,
    )
    from video_etl_spark.session import get_spark, load_table
    from video_etl_spark.streaming.ann_serve import make_ann_serve_handler

    spark = get_spark("ann-serve-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = ensure_seeded_slice(spark, scale)

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # roles: the indexed corpus, the streamed query feed (drawn FROM the
    # corpus so per-batch self-recall is assertable), and a held-out
    # slice appended MID-serve (excluded from the initial index so its
    # later visibility proves the append, not the build)
    corpus = emb.filter("vec_id % 50 != 25")
    queries = emb.filter("vec_id % 50 = 0")
    held_out = emb.filter("vec_id % 50 = 25")

    work = tempfile.mkdtemp(prefix="ann_serve_rehearsal_")
    try:
        import math

        # size the hash width to the corpus: ~500 vectors/bucket keeps
        # the per-query candidate set (n_tables × occupancy) flat as the
        # corpus grows — the scale dial the module docstring explains
        n_corpus = corpus.count()
        n_planes = max(4, math.ceil(math.log2(max(2, n_corpus // 500))))
        t0 = time.perf_counter()
        write_lsh_index(
            corpus, _TBL, f"{work}/idx", n_buckets=32, n_planes=n_planes
        )
        print(f"index build over {n_corpus} vectors (n_planes={n_planes}, "
              f"~{n_corpus >> n_planes} per bucket): "
              f"{time.perf_counter() - t0:.1f}s")

        handler = make_ann_serve_handler(
            spark.table(_TBL),
            spark.table(f"{_TBL}_vecs"),
            spark.table(f"{_TBL}_params"),
            f"{work}/answers",
            k=TOPK,
        )

        def serve(batch_df, b: int, label: str) -> None:
            t = time.perf_counter()
            handler(batch_df, b)
            dt = time.perf_counter() - t
            ans = spark.read.parquet(f"{work}/answers").where(
                f"batch_id = {b}"
            )
            # self-recall: every query is an indexed vector, so rank 1
            # must be the query itself at cos 1.0 (identical buckets in
            # every table -> always a candidate; random floats make an
            # accidental duplicate vector ~impossible)
            n_q = batch_df.count()
            self_hits = ans.where(
                "rn = 1 and neighbor_id = query_id and cos_sim > 0.999999"
            ).count()
            assert self_hits == n_q, (b, self_hits, n_q)
            print(f"  batch {b} [{label:9s}] {n_q:5d} queries {dt:5.1f}s "
                  f"(self-recall {self_hits}/{n_q})")

        for b in range(N_SERVE_BATCHES):
            if b == N_SERVE_BATCHES // 2:
                # mid-serve maintenance: append the held-out slice; the
                # very next batch queries THOSE vectors and must get
                # them back at rank 1 — append visibility end-to-end.
                # The count runs BEFORE the timer (round-10 review: an
                # f-string count job inside the timed window inflated
                # the recorded append cost)
                n_held = held_out.count()
                t = time.perf_counter()
                append_to_lsh_index(held_out, _TBL)
                dt = time.perf_counter() - t
                print(f"  append_to_lsh_index({n_held} vecs): {dt:.1f}s")
                serve(held_out, b, "appended")
                continue
            serve(
                queries.filter(
                    F.col("vec_id") % (50 * N_SERVE_BATCHES) == 50 * b
                ),
                b,
                "steady",
            )
        n_ans = spark.read.parquet(f"{work}/answers").count()
        print(f"answer log: {n_ans} rows across {N_SERVE_BATCHES} batches")
    finally:
        for sfx in ("", "_vecs", "_params", "_planes"):
            spark.sql(f"DROP TABLE IF EXISTS {_TBL}{sfx}")
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
