"""Incremental corpus-statistics maintenance (SURVEY §2.8 ⊕ — the streaming
side of ``queries.text.source_mixture_weights`` / ``mixture_resample``).

A continuous crawl needs per-source token/doc counts to steer data mixing,
but re-aggregating a 100 TB corpus per crawl batch is absurd.  The classic
fix is PARTIAL-AGGREGATE MAINTENANCE: each micro-batch writes its own tiny
(source, n_docs, n_tokens) partial into a ``batch_id``-partitioned stats
table; the current totals are one cheap re-aggregation over partials
(thousands of rows, not the corpus).  Counts are exact BIGINTs, so partial
sums compose associatively — the k-batch streaming totals equal the batch
aggregate bit for bit (equivalence-tested).

Retry safety is the repo's standard foreachBatch discipline: dynamic
partition overwrite keyed on batch_id means an at-least-once retry
REWRITES its own partition instead of double-counting (idempotence-tested
by invoking the handler twice).

At 100 TB: per-batch partials are a few rows per source; compaction (fold
old partials into one) is a trivial maintenance job over the stats dir —
the corpus itself is never rescanned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: whitespace tokens, same convention as queries/text.py
_TOKENS = "split(trim(lower(text)), '\\\\s+')"

STATS_SCHEMA = (
    "source string, n_docs bigint, n_tokens bigint, batch_id bigint"
)


def batch_partial(docs: DataFrame) -> DataFrame:
    """(source, n_docs, n_tokens) partial aggregate of one batch — a
    narrow scan-fused projection plus one small groupBy."""
    return (
        docs.select("source", F.size(F.expr(_TOKENS)).cast("long").alias("t"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("t").alias("n_tokens"),
        )
    )


def make_stats_handler(stats_dir: str):
    """foreachBatch step: write this batch's partial into its own
    batch_id partition (dynamic overwrite → retried batches replace
    rather than double-count)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_partial(batch_df)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(stats_dir)
        )

    return handle


def streaming_source_stats(docs: DataFrame, stats_dir: str):
    """Build the stats-maintenance writer over a (source, text, ...)
    stream.  Returns a ``DataStreamWriter`` — caller sets
    checkpointLocation/trigger and calls ``start()``."""
    return docs.writeStream.foreachBatch(make_stats_handler(stats_dir))


def compact_stats(spark: SparkSession, stats_dir: str) -> None:
    """Fold old partials into a single batch_id=-1 partition — the
    periodic maintenance job that keeps the partials table O(sources)
    instead of O(batches × sources).  Totals are unchanged (exact BIGINT
    sums).

    Replay safety: foreachBatch is at-least-once, and ONLY the newest
    batch can replay after a restart (earlier ids are checkpoint-
    committed), so the HIGHEST batch_id partition is deliberately left
    unfolded — if that batch replays, its dynamic-overwrite rewrite still
    targets its own partition, never the folded one.  NOT safe to run
    concurrently with an actively writing stream (the fold is a read-
    then-rewrite of the directory); run it between triggers or while the
    stream is stopped.
    """
    df = spark.read.schema(STATS_SCHEMA).parquet(stats_dir)
    newest = df.agg(F.max("batch_id")).collect()[0][0]
    if newest is None:
        return
    folded = (
        df.filter(F.col("batch_id") < newest)
        .groupBy("source")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .withColumn("batch_id", F.lit(-1).cast("long"))
    )
    keep = df.filter(F.col("batch_id") == newest)
    # materialize BEFORE overwriting the directory being read; explicit
    # STATIC overwrite so a session-level dynamic default cannot leave
    # the already-folded per-batch partitions behind (double-counting)
    rows = folded.unionByName(keep.select(*folded.columns)).collect()
    (
        spark.createDataFrame(rows, schema=STATS_SCHEMA)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("batch_id")
        .parquet(stats_dir)
    )


def current_totals(spark: SparkSession, stats_dir: str) -> DataFrame:
    """Fold all partials into current (source, n_docs, n_tokens) totals —
    the frame ``mixture_resample``-style rate derivation consumes.
    Reads partials only (rows ≈ batches × sources), never the corpus."""
    return (
        spark.read.schema(STATS_SCHEMA)
        .parquet(stats_dir)
        .groupBy("source")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


def current_mixture_weights(spark: SparkSession, stats_dir: str) -> DataFrame:
    """Uniform-target mixing weights refreshed from the PARTIALS table
    (round-7 ask #6): folds ``current_totals`` through the exact same ppm
    derivation the oracle-checked ``source_mixture_weights`` uses, so a
    crawl pipeline re-steers its mixture per batch without ever rescanning
    the corpus.  k-batch streaming output == the batch query bit for bit
    (equivalence-tested)."""
    from video_etl_spark.queries.text import mixture_weights_from_totals

    totals = current_totals(spark, stats_dir).select(
        "source", "n_docs", "n_tokens"
    )
    return mixture_weights_from_totals(totals)


def current_temperature_weights(
    spark: SparkSession, stats_dir: str
) -> DataFrame:
    """Temperature (sqrt) mixing weights from the partials table — the
    streaming twin of ``mixture_temperature_weights``, same contract as
    :func:`current_mixture_weights`."""
    from video_etl_spark.queries.text import temperature_weights_from_totals

    return temperature_weights_from_totals(
        current_totals(spark, stats_dir)
    )
