#!/usr/bin/env python
"""ONE composed corpus-revision build at ~sf1 (round-7 verdict #6): the
full artifact lifecycle in a single measured run —

  ingest -> band index -> component index -> CC-chain consumers reading
  the index -> incremental batch labels + merge ledger -> COMPACTED
  index generation (checked against the one-shot build) -> phash index
  + incremental frame probe -> curate (reusing the component index) ->
  BPE train + tokenizer export -> tokenize -> pack -> training shards
  -> manifests -> pruned shard read

Every ``write_*`` artifact built by an earlier stage is CONSUMED by a
later one (the component index feeds the CC-chain queries AND curation;
the band index feeds the incremental probe; the tokenizer feeds
tokenize_corpus; the shards feed the pruned loader read), and each
stage's wall time prints separately so PERF.md can record where a
corpus revision actually spends its time.

Data is the scale_rehearsal generator's seeded ~sf1 slice (50k docs,
deterministic, ~1 % exact dups) — nothing checked in, /tmp throwaway.

Usage: python examples/run_corpus_build.py [--sf-dir DIR]
       (default: generate /tmp/spark_graft_sf1 if absent)
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument(
        "--scale", type=int, default=1,
        help="corpus multiplier over the ~sf1 slice (10 -> 500k docs "
        "under /tmp/spark_graft_sf10); the per-stage ratio evidence "
        "PERF.md records",
    )
    ap.add_argument(
        "--keep", action="store_true",
        help="leave the artifact directory on disk after the run",
    )
    args = ap.parse_args()

    from examples.scale_rehearsal import (
        N_DOCS,
        N_EVENTS,
        N_VECS,
        SF1_DIR,
        generate,
    )
    from video_etl_spark.session import get_spark, load_table

    spark = get_spark("video-etl-spark-corpus-build")
    spark.sparkContext.setLogLevel("ERROR")

    gen_dir = (
        SF1_DIR if args.scale == 1 else f"/tmp/spark_graft_sf{args.scale}"
    )
    sf_dir = args.sf_dir or gen_dir
    if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        # the generator writes ONLY to its own dirs — an absent custom
        # dir is a user error, not something to silently "fix" elsewhere
        if sf_dir != gen_dir:
            raise SystemExit(
                f"--sf-dir {sf_dir} has no documents.parquet (the "
                f"generator only produces {gen_dir})"
            )
        print(f"generating seeded ~sf{args.scale} slice under {sf_dir} ...")
        generate(
            spark,
            out_dir=gen_dir,
            n_docs=N_DOCS * args.scale,
            n_events=N_EVENTS * args.scale,
            n_vecs=N_VECS * args.scale,
        )

    work = tempfile.mkdtemp(prefix="corpus_build_")
    timings: list[tuple[str, float]] = []
    try:
        _run(spark, sf_dir, work, timings)
    finally:
        # a failed stage must not leak the catalog tables or the
        # multi-GB /tmp work dir
        for t in (
            "cb_band_index", "cb_comp_index", "cb_comp_hist", "cb_comp_gen1", "cb_phash_index",
            "cb_fp_index",
        ):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def _run(spark, sf_dir: str, work: str, timings) -> None:
    from video_etl_spark.session import load_table

    def stage(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *exc):
                dt = time.perf_counter() - self.t0
                timings.append((name, dt))
                print(f"  [{name:<34}] {dt:6.1f}s")
                return False

        return _T()

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    print(f"corpus revision: {n_docs} documents at {sf_dir}\n")

    # ---- signature + labeling artifacts (built once per revision) ----
    from video_etl_spark.llm_ops.dedup import (
        incremental_dedup_against_index,
        write_band_index,
        write_component_index,
    )

    # the incremental probe below replays doc_id % 97 == 3 as a "new
    # crawl batch", so the persisted indexes cover the REST of the
    # corpus — probing a batch against an index that already contains it
    # would only find self-matches
    history = docs.filter(F.col("doc_id") % 97 != 3)
    with stage("write_band_index"):
        write_band_index(
            history, "cb_band_index", os.path.join(work, "band_idx")
        )
    with stage("write_component_index"):
        write_component_index(
            docs, "cb_comp_index", os.path.join(work, "comp_idx")
        )
    comp_index = spark.table("cb_comp_index")

    # ---- consumers READ the labeling instead of re-deriving it ----
    from video_etl_spark.queries.text import (
        cluster_aware_split,
        dedup_connected_clusters,
        dup_cluster_size_histogram,
    )

    with stage("cc consumers @ component index"):
        n_canon = (
            dedup_connected_clusters(spark, sf_dir, components=comp_index)
            .filter("is_canonical").count()
        )
        hist = dup_cluster_size_histogram(
            spark, sf_dir, components=comp_index
        ).collect()
        splits = {
            r["split"]: r["n_docs"]
            for r in cluster_aware_split(
                spark, sf_dir, components=comp_index
            ).collect()
        }
    print(f"      canonical docs: {n_canon}; cluster-size histogram "
          f"{sorted((r['cluster_size'], r['n_clusters']) for r in hist)[:4]}...; "
          f"split sizes {splits}")

    # ---- incremental crawl batch probes the PERSISTED band index ----
    with stage("incremental probe @ band index"):
        batch = docs.filter(F.col("doc_id") % 97 == 3)
        n_dup_hits = incremental_dedup_against_index(
            batch, spark.table("cb_band_index")
        ).count()
    print(f"      batch docs with history candidates: {n_dup_hits}")

    # ---- full labeling lifecycle: incremental labels + ledger, then a
    # COMPACTED generation that must equal the one-shot full-corpus
    # index (write -> append + ledger -> compact, no corpus CC) ----
    from video_etl_spark.llm_ops.dedup import (
        compact_component_index,
        incremental_components,
    )

    with stage("write_component_index @ history"):
        write_component_index(
            history, "cb_comp_hist", os.path.join(work, "comp_hist")
        )
    with stage("incremental_components @ batch"):
        labels, merges = incremental_components(
            batch,
            spark.table("cb_band_index"),
            spark.table("cb_comp_hist").select("doc_id", "component"),
        )
        # two consumers below (counts + compaction) — eager once so the
        # batch-sized CC graph is not re-derived per action
        labels = labels.localCheckpoint()
        merges = merges.localCheckpoint()
        n_new, n_merges = labels.count(), merges.count()
    print(f"      appended {n_new} label rows; {n_merges} ledger rows")
    with stage("compact_component_index -> gen1"):
        compact_component_index(
            spark.table("cb_comp_hist")
            .select("doc_id", "component")
            .unionByName(labels.select("doc_id", "component")),
            merges,
            "cb_comp_gen1",
            os.path.join(work, "comp_gen1"),
        )
        gen1 = spark.table("cb_comp_gen1")
        mismatch = (
            gen1.exceptAll(comp_index).count()
            + comp_index.exceptAll(gen1).count()
        )
    print(f"      compacted generation vs one-shot index: "
          f"{mismatch} mismatching rows")
    if mismatch:
        raise RuntimeError(
            "compacted component index diverged from the one-shot build"
        )

    # ---- winnowing fingerprint index + overlap probe of the batch ----
    from video_etl_spark.llm_ops.dedup import (
        winnowing_candidates_against_index,
        write_fingerprint_index,
    )
    from video_etl_spark.queries.text import _winnowing_fps

    with stage("write_fingerprint_index"):
        write_fingerprint_index(
            _winnowing_fps(history),
            "cb_fp_index",
            os.path.join(work, "fp_idx"),
        )
    with stage("winnowing probe @ fp index"):
        n_overlaps = winnowing_candidates_against_index(
            _winnowing_fps(batch), spark.table("cb_fp_index")
        ).count()
    print(f"      batch docs with fingerprint overlaps: {n_overlaps}")

    # ---- frame-side artifact: phash index + incremental probe ----
    from video_etl_spark.llm_ops.multimodal import (
        attach_fake_payload,
        incremental_phash_against_index,
        phash_signatures,
        write_phash_index,
    )

    with stage("write_phash_index"):
        sigs = phash_signatures(
            attach_fake_payload(docs, collide_near_dups=True)
        )
        write_phash_index(
            sigs.filter(F.col("doc_id") % 10 != 0),
            "cb_phash_index",
            os.path.join(work, "phash_idx"),
        )
    with stage("incremental phash probe"):
        n_frame_dups = incremental_phash_against_index(
            sigs.filter(F.col("doc_id") % 10 == 0),
            spark.table("cb_phash_index"),
        ).count()
    print(f"      new frames matching indexed near-dups: {n_frame_dups}")

    # ---- curation REUSES the component index ----
    from video_etl_spark.pipelines.curation import (
        curate_documents,
        write_curated,
    )

    with stage("curate (components= index)"):
        curated = curate_documents(
            spark, sf_dir, components=comp_index
        ).persist()
        n_curated = curated.count()
        write_curated(curated, os.path.join(work, "curated"))
    print(f"      curated docs: {n_curated} "
          f"({100.0 * n_curated / n_docs:.1f}% kept)")

    # ---- tokenizer artifacts over the CURATED corpus ----
    from video_etl_spark.llm_ops.bpe import (
        bpe_train,
        tokenize_corpus,
        write_tokenizer,
    )

    curated_docs = spark.read.parquet(os.path.join(work, "curated"))
    with stage("bpe_train (8 merges)"):
        merges, words = bpe_train(curated_docs, 8)
        write_tokenizer(merges, words, os.path.join(work, "tokenizer"))
    print(f"      merges: {[m['merged'] for m in merges]}")

    with stage("tokenize_corpus"):
        toks = tokenize_corpus(curated_docs, words)
        n_subwords = toks.select(
            F.sum(F.size("subwords")).alias("n")
        ).collect()[0]["n"]
    print(f"      subword tokens: {n_subwords}")

    # ---- packing + shard export + manifests ----
    from video_etl_spark.llm_ops.export import (
        pack_sequences,
        packing_manifest,
        read_shard,
        shard_manifest,
        write_training_shards,
    )

    with stage("pack_sequences + manifest"):
        packed = pack_sequences(curated_docs, seq_len=256, n_shards=4)
        pm = packing_manifest(packed, seq_len=256).collect()
    print("      packing manifest (shard, n_seqs, tail_padding): "
          f"{sorted((r['shard'], r['n_seqs'], r['tail_padding']) for r in pm)}")

    with stage("write_training_shards + manifest"):
        sharded = write_training_shards(
            curated_docs, os.path.join(work, "shards"), n_shards=4
        )
        sm = shard_manifest(sharded).collect()
    print("      shard manifest (shard, n_docs, n_tokens): "
          f"{sorted((r['shard'], r['n_docs'], r['n_tokens']) for r in sm)}")

    with stage("pruned read of shard 2"):
        n_shard2 = read_shard(
            spark, os.path.join(work, "shards"), 2
        ).count()
    print(f"      shard 2 docs: {n_shard2}")

    # ---- bucketed-index file counts: the round-8 small-file fix means
    # these track n_buckets (x files_per_bucket for generations), NOT
    # writer parallelism — the property that keeps a 1000-executor
    # index listable; printed so the scale rehearsal log carries the
    # evidence at every corpus size ----
    print("\n      bucketed index file counts (parquet parts):")
    for idx in ("band_idx", "comp_idx", "comp_hist", "comp_gen1",
                "fp_idx", "phash_idx"):
        path = os.path.join(work, idx)
        if not os.path.isdir(path):
            continue
        n_parts = sum(
            1
            for root, _dirs, files in os.walk(path)
            for f in files
            if f.endswith(".parquet") and not f.startswith("_")
        )
        print(f"        {idx:<10} {n_parts} files")

    total = sum(dt for _, dt in timings)
    print(f"\nend-to-end corpus revision: {total:.1f}s over "
          f"{len(timings)} stages ({n_docs} docs)")
    print("artifacts under", work)


if __name__ == "__main__":
    main()
