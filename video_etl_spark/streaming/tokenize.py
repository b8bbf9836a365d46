"""Streaming tokenizer serving (round 7 — the serving side of
``llm_ops.bpe``).

A trained segmentation is a tiny vocab-grain table; tokenizing a document
stream is a STATELESS stream-static join against it (broadcast — the same
serving shape as ``streaming.classify``'s centroid fold): explode the
stream batch's tokens positionally, join the segmentation, re-assemble
per doc.  No state store, no watermark — every micro-batch is independent,
so the streaming output equals the batch ``tokenize_corpus`` on the same
rows (equivalence-tested).

At 100 TB-scale serving the segmentation table is
``spark.read.parquet(f"{path}/words.parquet")`` — the (word, n, syms)
frame ``write_tokenizer`` persists alongside merges/vocab — loaded once
and broadcast; unseen words fall back to character segmentation inside
the join's coalesce, exactly as in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_tokenize(
    docs: DataFrame, words: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Transform a streaming (doc_id, text, ...) frame into
    (doc_id, subwords) using a STATIC trained segmentation ``words``
    (``bpe_train`` output or the re-read ``write_tokenizer`` artifact).

    Returns a streaming DataFrame — attach any sink.  The plan is a
    stream-static broadcast join + per-doc re-assembly; Spark permits
    the stream-side groupBy here because re-assembly is keyed on the
    batch's own doc_id (append semantics per micro-batch via
    foreachBatch sinks; use ``tokenize_corpus`` directly inside
    foreachBatch when a complete-mode aggregate is unwanted).
    """
    from video_etl_spark.llm_ops.bpe import tokenize_corpus

    return tokenize_corpus(docs, words, text_col=text_col)


def make_tokenize_handler(words: DataFrame, out_dir: str):
    """foreachBatch form: tokenize each micro-batch against the static
    segmentation and write batch_id-partitioned results (idempotent
    retries via dynamic overwrite — the repo's standard sink
    discipline)."""
    from pyspark.sql import functions as F

    from video_etl_spark.llm_ops.bpe import tokenize_corpus

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        (
            tokenize_corpus(batch_df, words)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return handle
