"""Streaming benchmark decontamination (SURVEY §2.8 ⊕ U23 — the streaming
twin of ``queries.text.benchmark_decontamination``).

A continuous crawl must be checked against held-out evaluation sets AT
INGEST — once a contaminated document lands in the training corpus, every
downstream shuffle has already paid for it.  The benchmark shingle set is
small and static (eval suites are millions of shingles at most, versus a
100 TB corpus), which makes this the ideal stream-static broadcast join:

* The STATELESS path (:func:`contamination_hits_stream`) joins the
  per-document distinct-shingle explode against the static benchmark set —
  a stream-static inner join Structured Streaming runs with no state store
  at all; every hit (doc_id, shingle) appends as it arrives.
* The DOCUMENT-grain path (:func:`streaming_decontamination`) runs in
  ``foreachBatch`` so each micro-batch can aggregate hits per document and
  split into a CLEAN sink (anti-join — documents with zero benchmark
  overlap, safe to train on) and a FLAGGED sink (with overlap counts for
  audit).  Both sinks are ``batch_id``-partitioned and written with
  dynamic partition overwrite, so at-least-once foreachBatch retries
  rewrite their own partition instead of duplicating rows — the same
  effectively-exactly-once discipline as ``streaming/dedup.py``.

Because the benchmark side is static, a document's verdict is independent
of micro-batch boundaries — the equivalence test asserts a k-batch
streaming run splits documents exactly as the batch operator does.

Scale posture: the benchmark set is loaded ONCE per query (closure cache,
persisted) and broadcast; the stream side is a narrow shingle explode —
no shuffle, no state, nothing grows with corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_shingles(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, s) — each document's DISTINCT 3-word shingles; stateless and
    narrow, usable on batch and streaming frames alike.

    ``array_distinct`` inside the explode doubles as the
    InferFiltersFromGenerate defense from ``benchmark_decontamination``:
    a bare ``explode(attr)`` lets Catalyst inline the O(words²) shingle
    transform into a per-row inferred Filter.
    """
    from video_etl_spark.queries.text import _spark_shingles

    return _spark_shingles(docs).select(
        F.col(id_col), F.explode(F.array_distinct("shingles")).alias("s")
    )


def contamination_hits_stream(
    stream_docs: DataFrame, bench_shingles: DataFrame
) -> DataFrame:
    """Stateless per-shingle hit stream: (doc_id, s) rows of the incoming
    stream that collide with the benchmark set.

    Stream-static inner join with the static side broadcast — append mode,
    no watermark, no state store.  Use this when downstream wants raw
    evidence rows; use :func:`streaming_decontamination` for the
    document-grain clean/flagged split.
    """
    return doc_shingles(stream_docs).join(
        F.broadcast(bench_shingles.select("s").distinct()), "s"
    )


def make_decontam_handler(bench_dir: str, clean_dir: str, flagged_dir: str):
    """The per-micro-batch step of :func:`streaming_decontamination`,
    exposed for direct testing (retry idempotence) and embedding in a
    custom foreachBatch pipeline.

    The benchmark shingle set is read and persisted on first use and
    reused across batches (it is static for the lifetime of the query).
    """
    cache: dict[str, DataFrame] = {}

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if "bench" not in cache:
            cache["bench"] = (
                spark.read.parquet(bench_dir).select("s").distinct().persist()
            )
        bench = cache["bench"]
        hits = (
            doc_shingles(batch_df.select("doc_id", "text"))
            .join(F.broadcast(bench), "s")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_overlapping_shingles"))
        )
        flagged = batch_df.join(hits, "doc_id")
        clean = batch_df.join(hits, "doc_id", "left_anti")
        for df, out in ((flagged, flagged_dir), (clean, clean_dir)):
            (
                df.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(out)
            )

    return handle


def streaming_decontamination(
    docs: DataFrame, bench_dir: str, clean_dir: str, flagged_dir: str
):
    """Build the streaming decontamination writer over a (doc_id, text, ...)
    stream.  Returns a ``DataStreamWriter`` — the caller sets
    checkpointLocation and trigger and calls ``start()``.

    Clean documents (zero benchmark overlap) land in ``clean_dir``; flagged
    documents land in ``flagged_dir`` with their overlap counts.  Like the
    dedup sinks, a batch with no flagged rows leaves ``flagged_dir``
    without data files — consumers read it with an explicit schema.
    """
    return docs.writeStream.foreachBatch(
        make_decontam_handler(bench_dir, clean_dir, flagged_dir)
    )
