"""Streaming incremental sequence packing (round 7 — the streaming twin
of ``llm_ops.export.pack_sequences``).

A crawl stream appends documents; the trainer-facing packing (which
token offsets of which shard's concatenated stream each document
occupies) must extend per batch WITHOUT repacking the corpus.  The state
is tiny: per-shard running token totals, maintained as batch_id-
partitioned partials exactly like ``streaming.stats`` — a new batch's
offsets are (prior shard total) + (within-batch prefix sums in doc_id
order), one window over the batch, never a corpus scan.

Append-only contract: offsets already handed to a trainer are immutable
— this is why packing streams instead of re-running batch
``pack_sequences`` (whose global doc_id order would retroactively shift
offsets when a late doc_id arrives).  When batches arrive in
nondecreasing doc_id ranges (the usual crawl-cursor case) the streaming
assignment equals the batch operator bit for bit (equivalence-tested).

Retry safety: the prior-total read filters ``batch_id < current`` (a
retried batch must not see its own failed attempt's partial), and both
sinks are batch_id-partitioned with dynamic overwrite — the repo's
standard idempotent foreachBatch discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOTALS_SCHEMA = "shard bigint, n_tokens bigint, batch_id bigint"


def make_packing_handler(
    assign_dir: str,
    totals_dir: str,
    seq_len: int = 256,
    n_shards: int = 4,
):
    """Per-micro-batch step of :func:`streaming_sequence_packing`,
    exposed for direct testing and custom pipelines."""
    from pyspark.sql import Window

    from video_etl_spark.llm_ops.export import shard_assignments
    from video_etl_spark.queries.text import _nonempty_tokens_col

    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        t = shard_assignments(
            batch_df.select(
                "doc_id",
                # token-COUNT semantics, matching export.pack_sequences
                # bit for bit (the batch twin this module must equal)
                F.size(_nonempty_tokens_col()).cast("long").alias("n_tok"),
            ),
            n_shards,
            salt="pack|",
        )
        from pyspark.errors import AnalysisException

        try:
            base = (
                spark.read.schema(TOTALS_SCHEMA)
                .parquet(totals_dir)
                .where(F.col("batch_id") < F.lit(batch_id))
                .groupBy("shard")
                .agg(F.sum("n_tokens").alias("base"))
            )
        except AnalysisException:  # first batch: no totals yet
            base = None
        w = Window.partitionBy("shard").orderBy("doc_id")
        assigned = t.withColumn("batch_after", F.sum("n_tok").over(w))
        if base is not None:
            assigned = assigned.join(F.broadcast(base), "shard", "left")
        else:
            assigned = assigned.withColumn("base", F.lit(None))
        assigned = (
            assigned.withColumn(
                "cum_before",
                F.coalesce("base", F.lit(0))
                + F.col("batch_after")
                - F.col("n_tok"),
            )
            .withColumn(
                "start_seq",
                F.expr(f"cum_before div {seq_len}").cast("long"),
            )
            .withColumn(
                # same 0-token clamp as export.pack_sequences
                "end_seq",
                F.expr(
                    f"greatest(cum_before div {seq_len}, "
                    f"(cum_before + n_tok - 1) div {seq_len})"
                )
                .cast("long"),
            )
            .withColumn(
                "straddles", F.col("start_seq") != F.col("end_seq")
            )
            .select(
                "doc_id", "shard", "n_tok", "cum_before",
                "start_seq", "end_seq", "straddles",
            )
            .persist()  # feeds the assignment sink AND the totals write
        )
        try:
            (
                assigned.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(assign_dir)
            )
            (
                assigned.groupBy("shard")
                .agg(F.sum("n_tok").alias("n_tokens"))
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(totals_dir)
            )
        finally:
            # a failed sink write must not leak the cached assignments
            # across engine-driven retries of the batch
            assigned.unpersist()

    return handle


def streaming_sequence_packing(
    docs: DataFrame,
    assign_dir: str,
    totals_dir: str,
    seq_len: int = 256,
    n_shards: int = 4,
):
    """Build the streaming packing writer over a (doc_id, text, ...)
    stream.  Returns a ``DataStreamWriter`` — caller sets
    checkpointLocation/trigger and calls ``start()``.  Doc-grain offset
    assignments land in ``assign_dir`` (same schema as
    ``pack_sequences`` + batch_id); per-shard token totals accumulate in
    ``totals_dir``."""
    return docs.writeStream.foreachBatch(
        make_packing_handler(assign_dir, totals_dir, seq_len, n_shards)
    )
