"""Temporal / windowed / streaming-shaped queries over the `events` table.

Covers: tumbling 2 s chunk windows (D3 `simulate.py:27-35`, A4, W5), category
histograms (A5 `knob_switcher.py:75-76` + D8 pivot), fill-forward (W3/P2
`social_workload.py:147-159`), as-of join (J8, aligning the D12 score
time-series), range join (J8), sessionization (W7 session windows), and
lifecycle first/last labeling (J3-analog, `data_prepare.py:100-117` source/
sink semantics on appearance streams).

All comparisons run on integer microseconds (`unix_micros` / `epoch_us`) so
Spark and the DuckDB oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from video_etl_spark.functions.parity import money_sum, money_sum_sql
from video_etl_spark.operators.temporal import fill_forward, merge_asof, sessionize
from video_etl_spark.registry import query
from video_etl_spark.session import load_table

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


# --------------------------------------------------------------------------
# D3/A4/W5 — tumbling 2 s chunk aggregation (the switcher's unit of work).
@query(
    "event_chunk_agg_2s",
    oracle=f"""
    SELECT time_bucket(INTERVAL '2 seconds', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           {money_sum_sql('value')} AS value_sum
    FROM events
    GROUP BY time_bucket(INTERVAL '2 seconds', ts), event_type
    """,
)
def event_chunk_agg_2s(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 seconds").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("value_sum"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "value_sum")
    )


# --------------------------------------------------------------------------
# A5/D8 — content-category histogram, normalized (knob_switcher.py:75-82).
@query(
    "event_type_histogram",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM events) AS ratio
    FROM events
    GROUP BY event_type
    """,
)
def event_type_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # total as a broadcast 1-row aggregate: one scan in the executed plan,
    # not a separate driver-side .count() pass over the table
    total = ev.agg(F.count(F.lit(1)).cast("double").alias("total"))
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .select(
            "event_type",
            "n",
            (F.col("n").cast("double") / F.col("total")).alias("ratio"),
        )
    )


# --------------------------------------------------------------------------
# D8 — histogram pivoted to vector form (per-user event-type counts).
@query(
    "event_pivot_per_user",
    oracle="""
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
    FROM events
    GROUP BY user_id
    """,
)
def event_pivot_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    df = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    for t in EVENT_TYPES:
        df = df.withColumn(t, F.coalesce(F.col(t), F.lit(0)).cast("long"))
    return df


# --------------------------------------------------------------------------
# W3/P2 — fill-forward: error events carry the last good value per user.
@query(
    "fill_forward_values",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value_raw,
           last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
    FROM events
    """,
)
def fill_forward_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_raw",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value")),
    )
    return fill_forward(
        ev, key="user_id", ts="ts", col="value_raw", out="value_filled",
        order_tiebreak="event_id",
    ).select("event_id", "user_id", "value_raw", "value_filled")


# --------------------------------------------------------------------------
# J8 — as-of join: each purchase joins its newest preceding click (per user).
# Spark side uses the scalable union-merge strategy (operators.temporal).
@query(
    "asof_purchase_click",
    oracle="""
    SELECT event_id, user_id, click_event_id, click_value, gap_sec
    FROM (
      SELECT p.event_id, p.user_id,
             c.event_id AS click_event_id,
             c.value AS click_value,
             CAST(epoch_us(p.ts) - epoch_us(c.ts) AS DOUBLE) / 1000000 AS gap_sec,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts DESC NULLS LAST,
                                         c.event_id DESC NULLS LAST) AS rn
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON c.user_id = p.user_id AND c.ts <= p.ts)
    WHERE rn = 1
    """,
)
def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = merge_asof(
        purchases,
        clicks.withColumnRenamed("ts", "click_ts"),
        keys=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        pickup={
            "event_id": "click_event_id",
            "value": "click_value",
            "click_ts": "click_ts_out",
        },
        right_tiebreak=["event_id"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "click_event_id",
        "click_value",
        (
            (F.unix_micros("ts") - F.unix_micros("click_ts_out")).cast("double")
            / 1_000_000
        ).alias("gap_sec"),
    )


# --------------------------------------------------------------------------
# J8 — event-time range join: clicks in the hour before each purchase.
@query(
    "range_join_clicks_before_purchase",
    oracle=f"""
    SELECT p.event_id, p.user_id,
           count(c.event_id) AS n_clicks,
           COALESCE({money_sum_sql('c.value')}, CAST(0 AS DOUBLE)) AS click_value_sum
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR
     AND c.ts < p.ts
    GROUP BY p.event_id, p.user_id
    """,
)
def range_join_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id"), F.col("user_id"), F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_event_id"),
        F.col("value").alias("c_value"),
    )
    cond = (
        (p.user_id == c.c_user)
        & (c.c_ts >= p.p_ts - F.expr("INTERVAL 1 HOUR"))
        & (c.c_ts < p.p_ts)
    )
    return (
        p.join(c, cond, "left")
        .groupBy("event_id", "user_id")
        .agg(
            F.count("c_event_id").alias("n_clicks"),
            F.coalesce(money_sum("c_value"), F.lit(0.0)).alias("click_value_sum"),
        )
    )


# --------------------------------------------------------------------------
# W7 — sessionization (gaps-and-islands; batch analog of session_window).
@query(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, event_id,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT)
               AS session_id
      FROM flagged)
    SELECT user_id, session_id,
           min(ts) AS session_start,
           max(ts) AS session_end,
           count(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    with_sessions = sessionize(
        ev, key="user_id", ts="ts", gap_seconds=1800, order_tiebreak="event_id"
    )
    return with_sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# J3-analog — appearance lifecycle: first/last/active-days per identity
# (source/sink labeling semantics of data_prepare.py:100-117).
@query(
    "user_lifecycle",
    oracle="""
    SELECT user_id,
           min(ts) AS first_seen,
           max(ts) AS last_seen,
           count(*) AS n_events,
           CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS active_days,
           CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS DOUBLE) / 1000000 AS tenure_sec
    FROM events
    GROUP BY user_id
    """,
)
def user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(F.date_trunc("day", "ts")).cast("long").alias("active_days"),
        (
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).cast("double")
            / 1_000_000
        ).alias("tenure_sec"),
    )


# --------------------------------------------------------------------------
# Flagship slice-0 pipeline (SURVEY.md §7.2): stream-shaped scan → 2 s
# tumbling window agg (A4/A5) → broadcast dim join (J5) → top-k (O9) → sink.
@query(
    "chunk_scores_pipeline",
    oracle=f"""
    WITH chunks AS (
      SELECT time_bucket(INTERVAL '2 seconds', ts) AS window_start,
             event_type,
             count(*) AS n_events,
             {money_sum_sql('value')} AS value_sum
      FROM events
      GROUP BY 1, 2)
    SELECT c.window_start, c.event_type, c.n_events,
           c.value_sum * CAST(length(c.event_type) AS DOUBLE) AS score
    FROM chunks c
    ORDER BY score DESC, c.window_start, c.event_type
    LIMIT 20
    """,
)
def chunk_scores_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    chunks = (
        ev.groupBy(F.window("ts", "2 seconds").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("value_sum"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "value_sum")
    )
    # Tiny config dim (knob profile analog, J5) — always broadcast.
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn("weight", F.length("event_type").cast("double"))
    )
    return (
        chunks.join(F.broadcast(dim), "event_type")
        .withColumn("score", F.col("value_sum") * F.col("weight"))
        .select("window_start", "event_type", "n_events", "score")
        .orderBy(F.desc("score"), "window_start", "event_type")
        .limit(20)
    )


# --------------------------------------------------------------------------
# W1/W3⊕ — time-series gap fill with LINEAR INTERPOLATION: resample each
# user's event series onto a fixed 6-hour grid, lerping between the
# surrounding observations (hold at the edges).  The Spark shape is the
# union+two-windows pattern (grid rows carry NULL values; last/first with
# ignorenulls attach the bracketing observations in one ordered pass per
# side) — no range join, no per-grid-point probes; scales as one shuffle
# on user_id.  Arithmetic runs on exact epoch microseconds; the single
# lerp expression is evaluated identically by both engines and rounded to
# 1e-6 to absorb fused-op differences.
@query(
    "interpolate_user_series",
    oracle="""
    WITH bounds AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS t0, max(ts) AS t1
      FROM events GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 6 HOUR)) AS ts
      FROM bounds),
    unioned AS (
      SELECT user_id, ts, value, 0 AS is_grid FROM events
      UNION ALL
      SELECT user_id, ts, NULL AS value, 1 AS is_grid FROM grid),
    attached AS (
      SELECT user_id, ts, is_grid,
             last_value(value IGNORE NULLS) OVER w_prev AS prev_val,
             last_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS)
               OVER w_prev AS prev_ts,
             first_value(value IGNORE NULLS) OVER w_next AS next_val,
             first_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS)
               OVER w_next AS next_ts
      FROM unioned
      WINDOW
        w_prev AS (PARTITION BY user_id ORDER BY ts, is_grid, value NULLS LAST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY user_id ORDER BY ts, is_grid, value NULLS LAST
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id, ts AS grid_ts,
           round(CASE
             WHEN prev_val IS NOT NULL AND next_val IS NOT NULL
                  AND epoch_us(next_ts) > epoch_us(prev_ts) THEN
               prev_val + (next_val - prev_val)
                 * (CAST(epoch_us(ts) - epoch_us(prev_ts) AS DOUBLE)
                    / CAST(epoch_us(next_ts) - epoch_us(prev_ts) AS DOUBLE))
             WHEN prev_val IS NOT NULL AND next_val IS NOT NULL THEN prev_val
             WHEN prev_val IS NOT NULL THEN prev_val
             ELSE next_val END, 6) AS interp_value
    FROM attached WHERE is_grid = 1
    """,
)
def interpolate_user_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"), F.max("ts").alias("t1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(t0, t1, interval 6 hours)")).alias("ts"),
    )
    unioned = ev.withColumn("is_grid", F.lit(0)).unionByName(
        grid.select("user_id", "ts", F.lit(None).cast("double").alias("value"),
                    F.lit(1).alias("is_grid"))
    )
    # Tiebreak on value (NULLS LAST on both engines) so duplicate
    # (user_id, ts) observations bracket deterministically cross-engine.
    order = [F.col("ts"), F.col("is_grid"), F.asc_nulls_last("value")]
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ts_if_obs = F.when(F.col("value").isNotNull(), F.col("ts"))
    attached = unioned.select(
        "user_id", "ts", "is_grid",
        F.last("value", ignorenulls=True).over(w_prev).alias("prev_val"),
        F.last(ts_if_obs, ignorenulls=True).over(w_prev).alias("prev_ts"),
        F.first("value", ignorenulls=True).over(w_next).alias("next_val"),
        F.first(ts_if_obs, ignorenulls=True).over(w_next).alias("next_ts"),
    )
    span = (F.unix_micros("next_ts") - F.unix_micros("prev_ts")).cast("double")
    frac = (F.unix_micros("ts") - F.unix_micros("prev_ts")).cast("double") / span
    both = F.col("prev_val").isNotNull() & F.col("next_val").isNotNull()
    interp = (
        F.when(both & (span > 0),
               F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * frac)
        .when(both, F.col("prev_val"))
        .when(F.col("prev_val").isNotNull(), F.col("prev_val"))
        .otherwise(F.col("next_val"))
    )
    return (
        attached.filter(F.col("is_grid") == 1)
        .select(
            "user_id",
            F.col("ts").alias("grid_ts"),
            F.round(interp, 6).alias("interp_value"),
        )
    )


# --------------------------------------------------------------------------
# W7⊕ — event-time RANGE frame: trailing-1-hour running sum/count per user
# (rangeBetween on a numeric event-time key, not row counts — the frame
# every rate-limit / rolling-metric query needs).  One shuffle on user_id;
# the frame scan is a single ordered pass per partition.
@query(
    "trailing_hour_user_sum",
    oracle="""
    SELECT user_id, ts,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
             AS trail_cents,
           CAST(count(*) OVER w AS BIGINT) AS trail_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def trailing_hour_user_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return ev.select(
        "user_id",
        "ts",
        F.sum(cents).over(w).cast("long").alias("trail_cents"),
        F.count(F.lit(1)).over(w).cast("long").alias("trail_n"),
    )


# --------------------------------------------------------------------------
# W7⊕ — ordered-funnel analysis (view → click → purchase): per user, the
# earliest event of each stage must occur strictly after the previous
# stage's earliest event.  One shuffle on user_id; stage timestamps come
# from a single conditional aggregation (no self-joins, no window
# storms) — the MATCH_RECOGNIZE-lite shape every product-analytics
# pipeline runs.
@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click_any,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy_any
      FROM events GROUP BY user_id),
    seq AS (
      SELECT user_id, t_view,
             (SELECT min(e.ts) FROM events e
              WHERE e.user_id = stages.user_id AND e.event_type = 'click'
                AND e.ts > t_view) AS t_click
      FROM stages WHERE t_view IS NOT NULL),
    seq2 AS (
      SELECT user_id, t_view, t_click,
             (SELECT min(e.ts) FROM events e
              WHERE e.user_id = seq.user_id AND e.event_type = 'purchase'
                AND e.ts > t_click) AS t_buy
      FROM seq)
    SELECT count(*) AS n_viewed,
           CAST(sum(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clicked,
           CAST(sum(CASE WHEN t_buy IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchased
    FROM seq2
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts")))
    stages = ev.groupBy("user_id").agg(t_view.alias("t_view"))
    # stage-2/3 "first event after X" via conditional min over a re-join
    # of the per-user events (one shuffle, both sides keyed on user_id)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    seq = (
        stages.filter(F.col("t_view").isNotNull())
        .join(clicks, "user_id", "left")
        .groupBy("user_id", "t_view")
        .agg(
            F.min(F.when(F.col("c_ts") > F.col("t_view"), F.col("c_ts")))
            .alias("t_click")
        )
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("b_ts")
    )
    seq2 = (
        seq.join(buys, "user_id", "left")
        .groupBy("user_id", "t_view", "t_click")
        .agg(
            F.min(F.when(F.col("b_ts") > F.col("t_click"), F.col("b_ts")))
            .alias("t_buy")
        )
    )
    return seq2.agg(
        F.count(F.lit(1)).alias("n_viewed"),
        F.sum(F.when(F.col("t_click").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_clicked"),
        F.sum(F.when(F.col("t_buy").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_purchased"),
    )


# --------------------------------------------------------------------------
# W7⊕ — cohort retention: users grouped by signup week, retention = share
# of the cohort active in each subsequent week.  Two aggregations over one
# join (cohort assignment is a per-user reduction reused as a join side) —
# the canonical product-analytics matrix.
@query(
    "cohort_retention_weekly",
    oracle="""
    WITH cohorts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events WHERE event_type = 'signup'
      GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, c.cohort_week,
             CAST(datediff('week', c.cohort_week,
                           date_trunc('week', e.ts)) AS BIGINT) AS week_no
      FROM events e JOIN cohorts c ON c.user_id = e.user_id
      WHERE e.ts >= c.cohort_week),
    sizes AS (
      SELECT cohort_week, count(*) AS cohort_size FROM cohorts
      GROUP BY cohort_week)
    SELECT a.cohort_week, a.week_no,
           count(*) AS n_active,
           CAST(count(*) AS DOUBLE) / s.cohort_size AS retention
    FROM activity a JOIN sizes s ON s.cohort_week = a.cohort_week
    GROUP BY a.cohort_week, a.week_no, s.cohort_size
    """,
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cohorts = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    activity = (
        ev.join(cohorts, "user_id")
        .filter(F.col("ts") >= F.col("cohort_week"))
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            ).cast("long").alias("week_no"),
        )
        .distinct()
    )
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        activity.groupBy("cohort_week", "week_no")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "week_no",
            "n_active",
            (F.col("n_active").cast("double") / F.col("cohort_size"))
            .alias("retention"),
        )
    )


# --------------------------------------------------------------------------
# W7⊕ — SCD Type-2 history build: turn a change stream into versioned
# dimension rows (valid_from / valid_to / is_current) with one lead()
# window per key — the warehouse pattern for slowly-changing dimensions.
# Change events = each user's event_type transitions (dedup of consecutive
# repeats via lag()).
@query(
    "scd2_user_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_type,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    changes AS (
      SELECT user_id, ts, event_type FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type),
    versioned AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
      FROM changes)
    SELECT user_id, state, valid_from, valid_to,
           valid_to IS NULL AS is_current
    FROM versioned
    """,
)
def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", "ts", "event_type")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts")
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


# --------------------------------------------------------------------------
# W7⊕ — burst detection: users with >= 3 'error' events inside any rolling
# 6-hour window (event-time RANGE frame count + max-per-user reduction) —
# the alerting-rule shape.
@query(
    "error_burst_users",
    oracle="""
    WITH errs AS (
      SELECT user_id, ts,
             count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                            RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW)
               AS burst_n
      FROM events WHERE event_type = 'error')
    SELECT user_id,
           CAST(max(burst_n) AS BIGINT) AS max_burst,
           CAST(count(*) AS BIGINT) AS n_errors
    FROM errs GROUP BY user_id
    HAVING max(burst_n) >= 3
    """,
)
def error_burst_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "error"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-21_600_000_000, Window.currentRow)
    )
    bursts = ev.withColumn("burst_n", F.count(F.lit(1)).over(w))
    return (
        bursts.groupBy("user_id")
        .agg(
            F.max("burst_n").cast("long").alias("max_burst"),
            F.count(F.lit(1)).cast("long").alias("n_errors"),
        )
        .filter(F.col("max_burst") >= 3)
    )


# --------------------------------------------------------------------------
# A11⊕ — exact percentile surface (round 5).  Spark `percentile` and DuckDB
# `quantile_cont` share the same definition (sorted order statistics +
# linear interpolation), so the cross-engine parity is exact up to float
# ulp; round(.., 4) absorbs that, same convention as the attention
# queries.  Scale: one partial/final agg shuffle on event_type — exact
# percentiles sort within each group's state; at 100 TB swap
# `percentile_approx` (t-digest sketch, mergeable, bounded memory) into
# the same plan shape.
@query(
    "value_percentiles_by_type",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.50), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(quantile_cont(value, 0.99), 4) AS p99,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.50D)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95D)"), 4).alias("p95"),
        F.round(F.expr("percentile(value, 0.99D)"), 4).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# A5⊕ — numeric histogram binning (round 5): fixed-width buckets over the
# value domain per event type.  The bucket index is plain floor arithmetic
# (identical expression both engines — this DuckDB build has no
# width_bucket): bin = least(floor(value / 25), 15), 16 buckets over
# [0, 400).  Pure partial/final hash agg, fully code-generated; the
# natural per-metric distribution dashboard query.
@query(
    "value_histogram_bins",
    oracle="""
    SELECT event_type,
           CAST(least(floor(value / 25.0), 15) AS BIGINT) AS bin,
           count(*) AS n,
           round(min(value), 2) AS bin_min,
           round(max(value), 2) AS bin_max
    FROM events
    GROUP BY event_type, bin
    """,
)
def value_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.least(F.floor(F.col("value") / 25.0), F.lit(15))
        .cast("long")
        .alias("bin"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 2).alias("bin_min"),
        F.round(F.max("value"), 2).alias("bin_max"),
    )


# --------------------------------------------------------------------------
# A11⊕ — distributed Pearson correlation with EXACT cross-engine parity
# (round 5).  Naive corr() diverges between engines (float accumulation
# order), so the five moment sums are accumulated as exact BIGINTs
# (x = cents of value, y = whole seconds into the event's UTC day — both
# integers) and the Pearson formula is evaluated ONCE in float from those
# identical integers: both engines round identically, bit for bit.  Same
# partial/final hash-agg shuffle as any sum; the pattern generalizes to
# covariance / regression slopes at 100 TB (sketch-free, one pass).
@query(
    "value_time_correlation",
    oracle="""
    WITH m AS (
      SELECT event_type,
             count(*) AS n,
             sum(CAST(round(value * 100) AS BIGINT)) AS sx,
             sum(CAST(floor(epoch(ts) % 86400) AS BIGINT)) AS sy,
             sum(CAST(round(value * 100) AS BIGINT)
                 * CAST(floor(epoch(ts) % 86400) AS BIGINT)) AS sxy,
             sum(CAST(round(value * 100) AS BIGINT)
                 * CAST(round(value * 100) AS BIGINT)) AS sxx,
             sum(CAST(floor(epoch(ts) % 86400) AS BIGINT)
                 * CAST(floor(epoch(ts) % 86400) AS BIGINT)) AS syy
      FROM events GROUP BY event_type)
    SELECT event_type, n,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                 6) AS pearson_r
    FROM m
    """,
)
def value_time_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    x = F.round(F.col("value") * 100).cast("long")
    y = F.floor(F.unix_micros("ts") / 1_000_000 % 86_400).cast("long")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    nd = F.col("n").cast("double")
    return m.select(
        "event_type",
        "n",
        F.round(
            (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
            / F.sqrt(
                (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
                * (nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
            ),
            6,
        ).alias("pearson_r"),
    )


# --------------------------------------------------------------------------
# A11⊕ — t-digest approximate percentiles (round 5): the sketch that
# replaces exact `percentile` at 100 TB (mergeable, bounded memory per
# group).  Rows-only by design — Spark's t-digest and any other engine's
# sketch differ by construction; the exact twin `value_percentiles_by_type`
# is the oracle-verified baseline and pytest bounds the sketch's relative
# error against it (same twin pattern as HLL `approx_count_distinct`).
@query("value_percentiles_approx")
def value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.50, 10_000).alias("p50"),
        F.percentile_approx("value", 0.95, 10_000).alias("p95"),
        F.percentile_approx("value", 0.99, 10_000).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )
