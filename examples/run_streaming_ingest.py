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

SCALE MODE (round-9 verdict #6 — the streaming lifecycle at 10×):
``--scale N`` replays the seeded ~sfN corpus (N=10 → 500k docs) through
the SAME per-micro-batch handler in ~20 batches, with the compaction
fold + handler switchover + prune MID-STREAM after batch 9, recording
per-batch latency before/after the fold and asserting at scale that a
later batch's near-dup of PRE-FOLD (pruned) history is still rejected —
the handler-driven twin of the readStream demo above, because the fold
point and timings must be deterministic to be comparable.

Usage: python examples/run_streaming_ingest.py --scale 10

``--auto-refold`` (round-11): instead of the hardcoded rotation batch,
the :func:`maybe_refold` policy is consulted between batches and fires
when the regrown tail crosses its threshold — the unattended-operation
proof that the policy rotates at the same batch, folds the same
partitions, and keeps the same ledger as the manual sequence.
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
    if "--scale" in sys.argv:
        try:
            scale = int(sys.argv[sys.argv.index("--scale") + 1])
        except (IndexError, ValueError):
            raise SystemExit(
                "usage: run_streaming_ingest.py --scale N [--no-fold] "
                "[--no-refold | --auto-refold]  (N an integer corpus "
                "multiplier, e.g. 10 for the 500k-doc rehearsal; "
                "--no-fold stays raw-mode throughout; --no-refold folds "
                "once but skips the generation rotation — the two "
                "control arms the PERF.md round-10 tables compare "
                "against; --auto-refold replaces the hardcoded rotation "
                "batch with the maybe_refold policy deciding per batch)"
            ) from None
        if "--no-refold" in sys.argv and "--auto-refold" in sys.argv:
            # documented as mutually exclusive; silently running the
            # auto arm under a --no-refold request would invert intent
            raise SystemExit(
                "run_streaming_ingest.py: --no-refold and --auto-refold "
                "are mutually exclusive (skip the rotation vs let the "
                "policy drive it) — pass at most one"
            )
        scale_lifecycle(
            scale,
            fold="--no-fold" not in sys.argv,
            refold="--no-refold" not in sys.argv,
            auto_refold="--auto-refold" in sys.argv,
        )
        return
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


N_SCALE_BATCHES = 20
FOLD_AFTER = 9  # inclusive fold watermark: batches 0..9 fold, 10.. are tail
REFOLD_AFTER = 14  # generation rotation: gen1 = gen0 + tail(10..14)
_GEN_TABLE = "sl_cur_gen"
_GEN1_TABLE = "sl_cur_gen1"


def scale_lifecycle(
    scale: int,
    fold: bool = True,
    refold: bool = True,
    auto_refold: bool = False,
) -> None:
    """The curation lifecycle at ~sf{scale} driven per-batch: raw handler
    for batches 0..FOLD_AFTER, then fold → switchover → prune, then the
    compacted-mode handler for the rest.  Prints the per-batch latency
    table PERF.md records and asserts switchover correctness at scale.
    ``fold=False`` is the control: the raw handler runs all batches, so
    the per-batch delta between the two runs isolates what the fold
    buys from the semantic growth (later batches find more dups against
    more history on a dup-dense corpus — work no layout can remove).

    ``auto_refold=True`` (round-11) replaces the HARDCODED rotation at
    ``REFOLD_AFTER`` with the :func:`maybe_refold` policy consulted
    between batches — the unattended-operation shape a 100 TB stream
    runs, where no human picks the rotation batch.  With the tail
    threshold set to the same 5 partitions the manual run regrows, the
    policy must fire exactly once at the same batch the manual sequence
    rotated (asserted), so the two modes' per-batch tables stay
    directly comparable and the planted pre-fold dups still reject
    THROUGH the policy-created generation."""
    import shutil
    import time

    from examples.scale_rehearsal import ensure_seeded_slice
    from video_etl_spark.streaming.curation import make_ingest_handler
    from video_etl_spark.streaming.dedup import (
        compact_stream_index,
        next_generation_name,
        prune_folded_partitions,
        refold_stream_index,
    )
    from video_etl_spark.streaming.stats import current_totals

    spark = get_spark("ingest-lifecycle-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = ensure_seeded_slice(spark, scale)

    work = tempfile.mkdtemp(prefix="ingest_lifecycle_")
    docs = load_table(spark, sf_dir, "documents")
    # the seeded generator's vocabulary is deliberately small (that is
    # what makes its dup structure dense), so a corpus-derived bench set
    # shares >=1 shingle with EVERY doc and decontamination rejects the
    # whole corpus — use a token-disjoint synthetic eval suite instead,
    # and exercise the gate with PLANTED contaminated docs (batch 17)
    bench_texts = [
        " ".join(f"benchtok{i}_{j}" for j in range(40)) for i in range(100)
    ]
    bench_src = spark.createDataFrame(
        list(enumerate(bench_texts)), "doc_id long, text string"
    )
    doc_shingles(bench_src).select("s").distinct().write.parquet(
        f"{work}/bench"
    )
    corpus = docs.select("doc_id", "text", "source")

    sig_dir = f"{work}/sig_index"
    args = (sig_dir, f"{work}/bench", f"{work}/clean", f"{work}/rejected")
    kw = dict(stats_dir=f"{work}/stats")
    timings: list[tuple[int, str, float]] = []
    # declared OUTSIDE the try so the finally can drop every generation
    # the policy actually created (not just one hardcoded successor —
    # a multi-rotation run used to leak _g2+ tables into later runs)
    rotations: list = []

    def run(handler, batch_df, b: int, mode: str) -> None:
        t0 = time.perf_counter()
        handler(batch_df, b)
        dt = time.perf_counter() - t0
        timings.append((b, mode, dt))
        print(f"  batch {b:2d} [{mode:9s}] {dt:6.1f}s")

    try:
        raw = make_ingest_handler(*args, **kw)
        for b in range(FOLD_AFTER + 1):
            run(raw, corpus.filter(F.col("doc_id") % N_SCALE_BATCHES == b), b, "raw")

        if fold:
            t0 = time.perf_counter()
            compact_stream_index(
                spark, sig_dir, _GEN_TABLE, f"{work}/gen0",
                upto_batch_id=FOLD_AFTER, n_buckets=32,
            )
            sw = make_ingest_handler(*args, **kw, compacted_table=_GEN_TABLE)
            pruned = prune_folded_partitions(spark, sig_dir, _GEN_TABLE)
            fold_s = time.perf_counter() - t0
            assert pruned == list(range(FOLD_AFTER + 1)), pruned
            print(f"  fold + switchover + prune({len(pruned)} partitions): "
                  f"{fold_s:.1f}s")
        else:
            sw, fold_s = raw, 0.0
            print("  (--no-fold control: raw mode throughout)")

        if fold and auto_refold:
            # UNATTENDED rotation via the LIBRARY wrapper (round-12
            # verdict #4 promoted this loop's carry discipline into
            # streaming.curation.make_auto_refold_ingest_handler): the
            # wrapper consults the policy between batches and rotates
            # its inner handler itself — threshold 5 is exactly the
            # tail the manual run regrows by REFOLD_AFTER, so it must
            # fire once, at the same batch, with the same folded
            # partitions (asserted below via .rotations)
            from video_etl_spark.streaming.curation import (
                make_auto_refold_ingest_handler,
            )

            auto = make_auto_refold_ingest_handler(
                *args, **kw, compacted_table=_GEN_TABLE, tail_threshold=5
            )
            sw = auto
            rotations = auto.rotations  # the wrapper's log IS the record
        for b in range(FOLD_AFTER + 1, N_SCALE_BATCHES):
            if fold and auto_refold:
                # poll() separately so the rotation cost stays broken
                # out of the per-batch latency table (the wrapper's
                # __call__ would fold it into batch b's timing); the
                # __call__-time re-poll is then a cheap no-op
                t0 = time.perf_counter()
                cfg = auto.poll(spark, b - 1)
                if cfg is not None:
                    print(f"  maybe_refold fired -> "
                          f"{cfg['compacted_table']} "
                          f"(tail {cfg['tail_partitions']}, pruned "
                          f"{len(cfg['pruned'])} partitions): "
                          f"{time.perf_counter() - t0:.1f}s")
            elif fold and refold and b == REFOLD_AFTER + 1:
                # generation rotation mid-stream: gen1 = gen0 + the
                # regrown tail, handler switches, folded raw partitions
                # prune — the periodic re-fold the 10x measurement says
                # a long-running stream needs to keep the tail short
                t0 = time.perf_counter()
                refold_stream_index(
                    spark, sig_dir, _GEN_TABLE, _GEN1_TABLE,
                    f"{work}/gen1", upto_batch_id=REFOLD_AFTER,
                )
                sw = make_ingest_handler(
                    *args, **kw, compacted_table=_GEN1_TABLE
                )
                pruned2 = prune_folded_partitions(
                    spark, sig_dir, _GEN1_TABLE
                )
                print(f"  refold -> gen1 + switchover + "
                      f"prune({len(pruned2)} partitions): "
                      f"{time.perf_counter() - t0:.1f}s")
            batch = corpus.filter(F.col("doc_id") % N_SCALE_BATCHES == b)
            if b == 15:
                # plant exact copies of PRE-FOLD (pruned, visible only
                # through the generation) and TAIL survivors under fresh
                # ids: both must be rejected as near_dup at scale
                plants = (
                    spark.read.parquet(f"{work}/clean")
                    .where(f"batch_id in (2, {FOLD_AFTER + 2})")
                    .orderBy("doc_id")
                    .limit(50)
                    .select(
                        (F.col("doc_id") + 10_000_000).alias("doc_id"),
                        "text",
                        "source",
                    )
                    .localCheckpoint()  # freeze before the dynamic
                    # overwrite of this batch's own sinks
                )
                batch = batch.unionByName(plants)
            if b == 17:
                # plant eval-suite copies: must be rejected CONTAMINATED
                batch = batch.unionByName(
                    spark.createDataFrame(
                        [
                            (20_000_000 + i, t, "planted")
                            for i, t in enumerate(bench_texts[:20])
                        ],
                        "doc_id long, text string, source string",
                    )
                )
            if not fold:
                mode = "raw-ctl"
            elif auto_refold:
                mode = f"auto-g{len(rotations)}" if rotations else "compacted"
            else:
                mode = "gen1" if refold and b > REFOLD_AFTER else "compacted"
            run(sw, batch, b, mode)

        if fold and auto_refold:
            # the policy must have rotated exactly once, at the batch
            # where the tail first reached the threshold — the same
            # batch the manual sequence hardcodes — folding exactly the
            # regrown tail partitions into the successor generation
            assert [rb for rb, _ in rotations] == [REFOLD_AFTER + 1], (
                rotations
            )
            auto_cfg = rotations[0][1]
            assert auto_cfg["compacted_table"] == next_generation_name(
                _GEN_TABLE
            ), auto_cfg
            assert auto_cfg["pruned"] == list(
                range(FOLD_AFTER + 1, REFOLD_AFTER + 1)
            ), auto_cfg

        clean = spark.read.parquet(f"{work}/clean")
        rejected = spark.read.schema(
            "doc_id long, reason string, detail long, batch_id integer"
        ).parquet(f"{work}/rejected")
        # switchover correctness at scale: every planted near-dup copy
        # rejected with its (pre-fold-pruned or tail) original as
        # evidence, every planted eval copy rejected as contaminated
        planted_rej = {
            r["doc_id"]: r["reason"]
            for r in rejected.where(
                "doc_id >= 10000000 and doc_id < 20000000"
            ).collect()
        }
        assert len(planted_rej) == 50 and set(planted_rej.values()) == {
            "near_dup"
        }, (
            f"{len(planted_rej)} of 50 planted dups rejected: "
            f"{dict(list(planted_rej.items())[:4])}"
        )
        contam_rej = {
            r["doc_id"]: r["reason"]
            for r in rejected.where("doc_id >= 20000000").collect()
        }
        assert len(contam_rej) == 20 and set(contam_rej.values()) == {
            "contaminated"
        }, contam_rej
        # ledger conservation: every input row lands in exactly one sink
        # (the sinks hold 500k rows at --scale 10 — count each ONCE)
        n_clean, n_rej = clean.count(), rejected.count()
        n_in = corpus.count() + 50 + 20
        assert n_in == n_clean + n_rej, (n_in, n_clean + n_rej)
        stats = current_totals(spark, f"{work}/stats")
        assert stats.agg(F.sum("n_docs")).collect()[0][0] == n_clean

        med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
        groups = [("raw 0-9", [t for b, _, t in timings if b <= FOLD_AFTER])]
        if fold and (refold or auto_refold):
            groups += [
                ("compacted 10-14",
                 [t for b, _, t in timings if FOLD_AFTER < b <= REFOLD_AFTER]),
                ("gen1 15-19",
                 [t for b, _, t in timings if b > REFOLD_AFTER]),
            ]
        else:
            tag = "compacted 10-19" if fold else "raw-ctl 10-19"
            groups += [
                (tag, [t for b, _, t in timings if b > FOLD_AFTER])
            ]
        summary = "; ".join(f"{n} median {med(ts):.1f}s" for n, ts in groups)
        print(f"\nper-batch: {summary}; fold cost {fold_s:.1f}s; "
              f"clean {n_clean} / rejected {n_rej}")
    finally:
        # every generation this run could have created: the fixed names,
        # each policy-created generation recorded in `rotations`, and the
        # first auto successor as a belt-and-braces for a crash between
        # refold_fn and the rotations.append
        gens = {_GEN_TABLE, _GEN1_TABLE, next_generation_name(_GEN_TABLE)}
        gens.update(cfg["compacted_table"] for _, cfg in rotations)
        for g in sorted(gens):
            for t in (g, f"{g}_watermark"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
