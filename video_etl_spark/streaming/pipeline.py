"""Structured Streaming assembly (SURVEY.md §2.8, §7.1 `engine/streaming`).

Re-architects the reference's online loop (E1/E2: `simulate.py:9-46` driving
`knob_switcher.switch` per 2 s chunk) as:

    readStream (chunk source) → event-time watermark → 2 s tumbling windows
    → foreachBatch: driver-side switcher (C1) over the batch's chunk rows
    → append switch-log sink (D15)

The reference has no late-data story (video frames arrive in order); a
production stream needs one, so the windowed aggregate carries a watermark
(SURVEY §2.8 "late data").  The plan can change between micro-batches
without restarting the stream because the switcher holds plan state on the
driver and `foreachBatch` consults it per batch (SURVEY §4.3 item 1).

Scale posture: the 2 s window aggregation is a streaming partial/final hash
agg keyed (window, event_type) — Spark's state store shards it by key, so
1000 executors scale linearly; only the tiny per-chunk aggregate rows reach
the driver-side switcher, never raw events (the reference's <1 ms/decision
budget, paper §5.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from video_etl_spark.control.switcher import KnobSwitcher
from video_etl_spark.session import table_path

# The driver's events.parquet format has varied across testdata refreshes:
# TIMESTAMP(NANOS) in early rounds (must be read as LONG nanos under
# nanosAsLong and truncated), plain timestamp[us] with no tz since round 5
# (reads as TIMESTAMP once inferTimestampNTZ=false).  Streaming reads need an
# explicit schema, so probe the parquet footer and build the right one.


def _events_raw_schema(sf_dir: str) -> tuple[T.StructType, bool]:
    """Return (schema, ts_is_nanos_long) matching the on-disk events file."""
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    arrow_ts = pq.read_schema(table_path(sf_dir, "events")).field("ts").type
    # int64 and ANY nanosecond timestamp (tz-aware or not) arrive as LONG
    # under nanosAsLong; exact string matching would miss timestamp[ns, tz=...]
    ts_is_nanos = str(arrow_ts) == "int64" or (
        pat.is_timestamp(arrow_ts) and arrow_ts.unit == "ns"
    )
    ts_field = T.LongType() if ts_is_nanos else T.TimestampType()
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_field),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    return schema, ts_is_nanos

SWITCH_LOG_SCHEMA = (
    "chunk_id long, window_start timestamp, config int, placement int, "
    "cloud_cost double, runtime double, score double"
)


def events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """S1-analog: replay the events table as a file stream (the reference
    replays video from disk at 30 fps, paper §5.1; rate limiting here is
    `maxFilesPerTrigger`)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema, ts_is_nanos = _events_raw_schema(sf_dir)
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        # the events table is a single parquet file; FileStreamSource needs a
        # directory or glob, so match the file with a glob pattern
        .parquet(f"{sf_dir.rstrip('/')}/events.*")
    )
    if ts_is_nanos:
        raw = raw.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
        )
    return raw


def chunk_aggregates(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """D3: tumbling 2 s chunk aggregates with a late-data watermark."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "2 seconds").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100)
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"), "n_events", "value_sum"
        )
    )


def run_switch_loop(
    spark: SparkSession,
    sf_dir: str,
    switcher: KnobSwitcher,
    score_scale: float = 1.0,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """E1 re-architected: stream chunks through the switcher, return the
    D15 switch log as a DataFrame.

    Each micro-batch aggregates its events into 2 s chunks (per-batch agg —
    the C1 pattern from SURVEY §2.10: plan/switch logic in ``foreachBatch``),
    orders them by window start, and feeds the per-chunk quality score to
    the driver-side switcher.  Decisions accumulate into the returned log.
    """
    decisions: list[tuple] = []

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        chunks = (
            batch_df.groupBy(F.window("ts", "2 seconds").alias("w"))
            .agg(
                (F.sum(F.round(F.col("value") * 100).cast("long")) / 100)
                .cast("double")
                .alias("value_sum"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .select(F.col("w.start").alias("window_start"), "value_sum", "n_events")
            .orderBy("window_start")
            .collect()  # tiny: one row per 2 s chunk in the batch
        )
        for row in chunks:
            score = row["value_sum"] / max(row["n_events"], 1) * score_scale
            d = switcher.switch(score)
            decisions.append(
                (
                    d.chunk_id,
                    row["window_start"],
                    d.config,
                    d.placement,
                    d.cloud_cost,
                    d.runtime,
                    score,
                )
            )

    stream = events_stream(spark, sf_dir)
    writer = stream.writeStream.foreachBatch(handle_batch).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    query = writer.start()
    query.awaitTermination()
    return spark.createDataFrame(decisions, SWITCH_LOG_SCHEMA)


def windowed_aggregate_query(
    spark: SparkSession, sf_dir: str, query_name: str = "chunk_aggs"
):
    """W5/A4 streaming surface: watermark + tumbling window into a memory
    sink (complete mode), for tests and interactive inspection."""
    aggs = chunk_aggregates(events_stream(spark, sf_dir))
    return (
        aggs.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
