"""Streaming perceptual-hash frame dedup (round 7 — the multimodal twin
of ``streaming.dedup``).

A continuous media crawl arrives as micro-batches of frame records
(doc_id, payload).  Each batch's aHash signatures are computed ONCE
(scan-fused projection — ``llm_ops.multimodal.phash_signatures``), flagged
against a persistent parquet signature index by the asymmetric chunk join
(never old×old, never batch×corpus-payloads — only 4 small ints per frame
cross the wire), then appended to the index so later batches dedup against
the earliest sighting.  Batch granularity is the dedup unit, exactly as in
the text pipeline; at 100 TB the index is the bucketed table
``multimodal.write_phash_index`` maintains.

Restart safety is the repo's standard foreachBatch discipline: both sinks
are ``batch_id``-partitioned and written with dynamic partition overwrite,
so an at-least-once retry rewrites its own partition instead of
double-flagging (idempotence-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: explicit index schema: avoids per-batch footer inference over the
#: growing index AND keeps the AnalysisException branch meaning exactly
#: "path not found", not "schema inference failed on a file-less dir"
INDEX_SCHEMA = (
    "doc_id bigint, chunk0 bigint, chunk1 bigint, chunk2 bigint, "
    "chunk3 bigint, batch_id bigint"
)


def make_frame_batch_handler(
    index_dir: str, dup_dir: str, max_hamming: int = 3
):
    """Per-micro-batch step of :func:`streaming_frame_dedup`, exposed for
    direct testing (retry idempotence) and custom pipelines."""
    from video_etl_spark.llm_ops.multimodal import (
        incremental_phash_dedup,
        phash_signatures,
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sigs = phash_signatures(batch_df).persist()
        from pyspark.errors import AnalysisException

        try:
            try:
                # batch_id < current: a RETRIED batch must not match its
                # own partially-written signatures from the failed attempt
                hist = (
                    spark.read.schema(INDEX_SCHEMA)
                    .parquet(index_dir)
                    .where(F.col("batch_id") < F.lit(batch_id))
                )
            except AnalysisException:  # first batch: no index yet
                hist = None
            dups = (
                incremental_phash_dedup(sigs, hist, max_hamming)
                if hist is not None
                else incremental_phash_dedup(
                    sigs, sigs.limit(0), max_hamming
                )
            )
            (
                dups.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(dup_dir)
            )
            (
                sigs.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(index_dir)
            )
        finally:
            # a failed sink write must not leak the cached signatures
            # across engine-driven retries of the batch
            sigs.unpersist()

    return handle


def streaming_frame_dedup(
    frames: DataFrame,
    index_dir: str,
    dup_dir: str,
    max_hamming: int = 3,
):
    """Build the streaming frame-dedup writer over a (doc_id, payload,
    ...) stream.  Returns a ``DataStreamWriter`` — caller sets
    checkpointLocation/trigger and calls ``start()``.  Flagged near-dup
    frames land in ``dup_dir`` as (new_doc, dup_of, n_candidates,
    min_hamming, batch_id); signatures accumulate in ``index_dir``.
    """
    return frames.writeStream.foreachBatch(
        make_frame_batch_handler(index_dir, dup_dir, max_hamming)
    )
