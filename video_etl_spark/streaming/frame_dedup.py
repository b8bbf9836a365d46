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
    index_dir: str,
    dup_dir: str,
    max_hamming: int = 3,
    compacted_table: str | None = None,
    compacted_upto: int | None = None,
):
    """Per-micro-batch step of :func:`streaming_frame_dedup`, exposed for
    direct testing (retry idempotence) and custom pipelines.

    After :func:`compact_stream_frame_index` has folded raw partitions
    into a bucketed generation, pass ``compacted_table``: the handler
    then probes [compacted generation, raw tail] instead of the raw
    directory, so folded partitions can be DELETED without the live
    stream losing its history.  The fold's INCLUSIVE watermark is read
    from the generation's ``{table}_watermark`` sidecar (see
    ``streaming.dedup.compaction_watermark`` — never trusted from the
    caller; ``compacted_upto`` is an explicit override for
    replay/testing only).  Raw partitions at or below the watermark are
    excluded from the tail even before deletion, so a not-yet-deleted
    folded partition cannot double-count; the tail keeps the
    ``batch_id < current`` retry guard."""
    from video_etl_spark.llm_ops.multimodal import (
        incremental_phash_against_index,
        incremental_phash_dedup,
        phash_signatures,
    )
    from video_etl_spark.streaming.dedup import (
        _resolve_upto,
        is_missing_source,
    )

    # fixed for the handler's lifetime — resolution + memoization
    # semantics in streaming.dedup._resolve_upto
    # ([value_or_None, consecutive_misses])
    _upto: list = [compacted_upto, 0]

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sigs = phash_signatures(batch_df).persist()
        from pyspark.errors import AnalysisException

        try:
            if compacted_table is not None:
                upto = _resolve_upto(_upto, spark, compacted_table)
                frames = [spark.table(compacted_table)]
                try:
                    frames.append(_stored_index_rows(
                        spark,
                        index_dir,
                        (F.col("batch_id") > F.lit(upto))
                        & (F.col("batch_id") < F.lit(batch_id)),
                    ))
                except AnalysisException as e:
                    # raw dir gone: fully folded; any other analysis
                    # failure raises (see streaming.dedup.is_missing_source)
                    if not is_missing_source(e):
                        raise
                dups = incremental_phash_against_index(
                    sigs, frames, max_hamming
                )
            else:
                try:
                    # batch_id < current: a RETRIED batch must not match
                    # its own partially-written signatures from the
                    # failed attempt
                    hist = (
                        spark.read.schema(INDEX_SCHEMA)
                        .parquet(index_dir)
                        .where(F.col("batch_id") < F.lit(batch_id))
                    )
                except AnalysisException as e:
                    if not is_missing_source(e):
                        raise
                    hist = None  # first batch: no index yet
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
    compacted_table: str | None = None,
    compacted_upto: int | None = None,
):
    """Build the streaming frame-dedup writer over a (doc_id, payload,
    ...) stream.  Returns a ``DataStreamWriter`` — caller sets
    checkpointLocation/trigger and calls ``start()``.  Flagged near-dup
    frames land in ``dup_dir`` as (new_doc, dup_of, n_candidates,
    min_hamming, batch_id); signatures accumulate in ``index_dir``.
    """
    return frames.writeStream.foreachBatch(
        make_frame_batch_handler(
            index_dir, dup_dir, max_hamming, compacted_table, compacted_upto
        )
    )


def _stored_index_rows(spark, index_dir: str, predicate) -> DataFrame:
    """Read the stream's batch_id-partitioned signature directory,
    filtered by ``predicate``, as long-format chunk index rows — the ONE
    reader both sides of the compaction boundary share (the chunk count
    is the module constant ``_PHASH_CHUNKS``, fixed by
    ``INDEX_SCHEMA``, so unlike the band stream there is no stored-width
    inference to do)."""
    from video_etl_spark.llm_ops.multimodal import phash_index_rows

    sigs = (
        spark.read.schema(INDEX_SCHEMA)
        .parquet(index_dir)
        .where(predicate)
        .drop("batch_id")
    )
    return phash_index_rows(sigs)


def compact_stream_frame_index(
    spark,
    index_dir: str,
    table: str,
    path: str,
    upto_batch_id: int,
    n_buckets: int = 32,
    files_per_bucket: int = 1,
) -> None:
    """Fold the frame stream's batch_id-partitioned signature directory
    into the bucketed chunk-index table (`write_phash_index` layout) —
    the multimodal twin of ``streaming.dedup.compact_stream_index``,
    with the same contracts: ``upto_batch_id`` is INCLUSIVE and must be
    a COMPLETED batch (foreachBatch is at-least-once — folding an
    in-flight batch freezes a half-written partition into the
    generation); the generation lands at a NEW path (writing into
    ``index_dir`` is refused — the overwrite would delete raw
    partitions mid-read); the LIVE stream switches over by re-creating
    its handler with ``compacted_table``/``compacted_upto``, and only
    then deletes folded raw partitions — via
    ``streaming.dedup.prune_folded_partitions`` (the layout is shared,
    so the same watermark-driven pruner serves both streams).  External
    probers bridge
    the boundary with ``[spark.table(table),
    frame_tail_rows(...)]`` via
    ``multimodal.incremental_phash_against_index``.
    """
    from video_etl_spark.operators.io import (
        assert_new_generation,
        write_bucketed,
    )

    assert_new_generation(
        path, [index_dir], "the raw signature directory being folded"
    )
    write_bucketed(
        _stored_index_rows(
            spark, index_dir, F.col("batch_id") <= F.lit(upto_batch_id)
        ),
        table,
        path,
        ["ckey"],
        n_buckets,
        files_per_bucket,
    )
    from video_etl_spark.streaming.dedup import _write_watermark

    _write_watermark(spark, table, path, upto_batch_id, index_dir)


def refold_stream_frame_index(
    spark,
    index_dir: str,
    src_table: str,
    dst_table: str,
    dst_path: str,
    upto_batch_id: int,
    files_per_bucket: int = 1,
) -> None:
    """Frame-index generation rotation — the multimodal twin of
    ``streaming.dedup.refold_stream_index`` (shared core:
    ``refold_stream_generation``): gen_{n+1} = gen_n ∪ raw chunk-row
    tail up to ``upto_batch_id``, bit-identical to a one-shot
    :func:`compact_stream_frame_index` over the same unpruned history
    (tested).  Same caller sequence: refold → handler switchover →
    ``prune_folded_partitions`` → drop the old generation."""
    from video_etl_spark.streaming.dedup import refold_stream_generation

    refold_stream_generation(
        spark,
        index_dir,
        src_table,
        dst_table,
        dst_path,
        upto_batch_id,
        lambda pred: _stored_index_rows(spark, index_dir, pred),
        files_per_bucket,
    )


def frame_tail_rows(
    spark, index_dir: str, after_batch_id: int
) -> DataFrame:
    """Chunk index rows of the raw partitions STRICTLY ABOVE the
    compaction watermark — the small not-yet-folded tail.  Pass
    ``[spark.table(table), frame_tail_rows(...)]`` as the ``index`` of
    ``incremental_phash_against_index`` to probe across the boundary.
    ``after_batch_id`` must equal the fold's ``upto_batch_id`` — a lower
    value re-includes folded partitions (correct but no longer small,
    thanks to the probe's cross-frame dedup)."""
    return _stored_index_rows(
        spark, index_dir, F.col("batch_id") > F.lit(after_batch_id)
    )
