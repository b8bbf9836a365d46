"""Segment / history-window / normalization queries (SURVEY.md W1, A2/A3,
A7, J3, U14-classify, U15-forecast, P11).

These re-express the remaining reference operator families on the driver's
tables:

* sliding_history_features — W1 (`data_prepare.py:52-77`): encoder input =
  the T=5 preceding rows per key, as a rows-between window.
* resegment_fixed_windows — A3 (`social_workload.py:105-123`): reshape an
  ordered stream into fixed 30-row segments (ragged tail kept).
* segment_stitch_stats — A2 (`social_workload.py:56-85`): stitch per-key
  segments back together and validate contiguity.
* zscore_normalize — A7 (`placement_optimizer.py:226-231`): standardize
  within group; mean/std from exact integer sums so both engines agree.
* appearance_transitions — J3 (`data_prepare.py:100-117`): per (user, day)
  presence joined to the previous day → source/continuing labels.
* classify_nearest_center — U14's classify step (Eq. 5,
  `knob_switcher.py:88`): nearest center along a quality dimension as a
  pure expression over fixed centers.
* histogram_forecast_ma — U15's shape (forecast the next interval's
  category mixture from history) as a moving-average forecaster; the NN
  forecaster is pluggable driver-side (control/planner.py), this is the
  engine-side data prep + baseline.
* encoding_functions — P11 (`covid_measures.py:178`): base64 payload
  encode/decode round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from video_etl_spark.registry import query
from video_etl_spark.session import load_table


# --------------------------------------------------------------------------
# W1 — sliding history window: stats over the 5 preceding rows per key.
@query(
    "sliding_history_features",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS hist_n,
           CAST(CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE)
                / 100 AS DOUBLE) AS hist_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
    """,
)
def sliding_history_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-5, -1)
    cents = F.round(F.col("value") * 100).cast("long")
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("long").alias("hist_n"),
        (F.sum(cents).over(w) / 100).cast("double").alias("hist_sum"),
    )


# --------------------------------------------------------------------------
# A3 — re-segment an ordered stream into fixed 30-row windows per key.
@query(
    "resegment_fixed_windows",
    oracle="""
    WITH numbered AS (
      SELECT user_id, ts, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
      FROM events)
    SELECT user_id,
           CAST(rn // 30 AS BIGINT) AS seg_no,
           count(*) AS seg_len,
           min(ts) AS seg_start,
           CAST(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100
                AS DOUBLE) AS seg_value_sum
    FROM numbered
    GROUP BY user_id, CAST(rn // 30 AS BIGINT)
    """,
)
def resegment_fixed_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    numbered = ev.withColumn("rn", F.row_number().over(w) - 1)
    return (
        numbered.withColumn("seg_no", (F.col("rn") / 30).cast("long"))
        .groupBy("user_id", "seg_no")
        .agg(
            F.count(F.lit(1)).alias("seg_len"),
            F.min("ts").alias("seg_start"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100)
            .cast("double")
            .alias("seg_value_sum"),
        )
    )


# --------------------------------------------------------------------------
# A2 — stitch per-key segments: reassemble and check contiguity/ordering.
@query(
    "segment_stitch_stats",
    oracle="""
    WITH numbered AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
      FROM events),
    segs AS (
      SELECT user_id, CAST(rn // 30 AS BIGINT) AS seg_no, count(*) AS seg_len
      FROM numbered GROUP BY 1, 2)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(seg_len) AS BIGINT) AS stitched_len,
           CAST(max(seg_no) + 1 AS BIGINT) AS expected_segments,
           CAST(sum(CASE WHEN seg_len < 30 THEN 1 ELSE 0 END) AS BIGINT) AS ragged_tails
    FROM segs GROUP BY user_id
    """,
)
def segment_stitch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    segs = resegment_fixed_windows(spark, sf_dir)
    return segs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("seg_len").alias("stitched_len"),
        (F.max("seg_no") + 1).alias("expected_segments"),
        F.sum(F.when(F.col("seg_len") < 30, 1).otherwise(0)).alias("ragged_tails"),
    )


# --------------------------------------------------------------------------
# A7 — z-score normalization within group, from exact integer sums.
@query(
    "zscore_normalize",
    oracle="""
    WITH stats AS (
      SELECT c_mktsegment,
             count(*) AS n,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) AS s1,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)
                      * CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) AS s2
      FROM customer GROUP BY c_mktsegment)
    SELECT c.c_custkey, c.c_mktsegment,
           CAST((CAST(round(c.c_acctbal * 100) AS BIGINT) - s.s1 / s.n)
                / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)) AS DOUBLE) AS acctbal_z
    FROM customer c JOIN stats s ON s.c_mktsegment = c.c_mktsegment
    """,
)
def zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    stats = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).cast("double").alias("s1"),
        F.sum(cents * cents).cast("double").alias("s2"),
    )
    joined = cust.join(F.broadcast(stats), "c_mktsegment")
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    return joined.select(
        "c_custkey",
        "c_mktsegment",
        ((cents - mean) / F.sqrt(var)).cast("double").alias("acctbal_z"),
    )


# --------------------------------------------------------------------------
# J3 — appearance transitions: (user, day) presence vs the previous day
# (track/source/sink labeling semantics).
@query(
    "appearance_transitions",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
    lagged AS (
      SELECT user_id, day,
             lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day
      FROM days)
    SELECT user_id, day,
           CASE WHEN prev_day IS NULL THEN 'source'
                WHEN prev_day = day - INTERVAL 1 DAY THEN 'continuing'
                ELSE 'reappeared' END AS transition
    FROM lagged
    """,
)
def appearance_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.date_trunc("day", "ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    lagged = days.withColumn("prev_day", F.lag("day").over(w))
    return lagged.select(
        "user_id",
        "day",
        F.when(F.col("prev_day").isNull(), "source")
        .when(F.col("prev_day") == F.col("day") - F.expr("INTERVAL 1 DAY"), "continuing")
        .otherwise("reappeared")
        .alias("transition"),
    )


# --------------------------------------------------------------------------
# U14 (classify step) — Eq. 5: nearest category center along the current
# quality dimension, as a pure expression over fixed centers.
_CENTERS = (0.2, 0.5, 0.8)


@query(
    "classify_nearest_center",
    oracle=f"""
    WITH scored AS (
      SELECT event_id, value / 500.0 AS score FROM events)
    SELECT event_id,
           CAST(CASE
             WHEN abs(score - {_CENTERS[0]}) <= abs(score - {_CENTERS[1]})
              AND abs(score - {_CENTERS[0]}) <= abs(score - {_CENTERS[2]}) THEN 0
             WHEN abs(score - {_CENTERS[1]}) <= abs(score - {_CENTERS[2]}) THEN 1
             ELSE 2 END AS BIGINT) AS category
    FROM scored
    """,
)
def classify_nearest_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    score = F.col("value") / 500.0
    d = [F.abs(score - F.lit(c)) for c in _CENTERS]
    return ev.select(
        "event_id",
        F.when((d[0] <= d[1]) & (d[0] <= d[2]), 0)
        .when(d[1] <= d[2], 1)
        .otherwise(2)
        .cast("long")
        .alias("category"),
    )


# --------------------------------------------------------------------------
# U15 (data shape) — moving-average histogram forecast: next day's
# event-type mixture predicted as the mean of the prior 3 days' shares.
@query(
    "histogram_forecast_ma",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n
      FROM events GROUP BY 1, 2),
    totals AS (
      SELECT day, CAST(sum(n) AS BIGINT) AS day_total FROM daily GROUP BY day),
    shares AS (
      SELECT d.day, d.event_type, CAST(d.n AS DOUBLE) / t.day_total AS share
      FROM daily d JOIN totals t ON t.day = d.day)
    SELECT day, event_type, share,
           avg(share) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS forecast_share
    FROM shares
    """,
)
def histogram_forecast_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    totals = daily.groupBy("day").agg(F.sum("n").cast("long").alias("day_total"))
    shares = daily.join(totals, "day").select(
        "day",
        "event_type",
        (F.col("n").cast("double") / F.col("day_total")).alias("share"),
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, -1)
    return shares.withColumn("forecast_share", F.avg("share").over(w))


# --------------------------------------------------------------------------
# P11 — base64 encode/decode round-trip on binary payloads.
@query(
    "encoding_functions",
    oracle="""
    SELECT doc_id,
           base64(CAST(md5(text) AS BLOB)) AS payload_b64,
           CAST(octet_length(CAST(md5(text) AS BLOB)) AS BIGINT) AS payload_bytes,
           CAST(length(base64(CAST(md5(text) AS BLOB))) AS BIGINT) AS b64_len
    FROM documents
    """,
)
def encoding_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payload = F.md5(F.col("text")).cast("binary")
    return docs.select(
        "doc_id",
        F.base64(payload).alias("payload_b64"),
        F.length(payload).cast("long").alias("payload_bytes"),
        F.length(F.base64(payload)).cast("long").alias("b64_len"),
    )
