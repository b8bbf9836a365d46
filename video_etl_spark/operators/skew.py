"""Skew-aware aggregation via salting (build brief: "skewed keys → salting
or AQE skew-join"; SURVEY §7.2 step 7 partitioning discipline).

Hot grouping keys (a handful of event types over billions of events; one
busy video stream among thousands) put one reducer on the critical path.
``salted_sum`` runs the classic two-phase plan explicitly: phase 1 groups on
(key, salt) so the hot key's rows spread over ``n_salts`` reducers; phase 2
combines the tiny per-salt partials.  Results are identical to the direct
aggregation (integer-exact sums commute), which is how the oracle verifies
it.

AQE's skew-join splitting covers *joins* automatically; explicit salting is
still the tool for skewed *aggregations* with very hot keys, because the
partial-agg row that reaches the shuffle is one-per-partition-per-key —
already small — but a single final reducer per key still owns the merge;
salting bounds that fan-in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread_small_scan(
    df: DataFrame, key: str | None = None, target: int | None = None
) -> DataFrame:
    """Repartition a frame whose physical plan yields FEWER partitions
    than the session parallelism, ahead of a compute-heavy narrow
    transform (shingle/span/token hashing).

    Guide §2.5 "input skew": one unsplittable input (locally, a parquet
    file with a single row group; in the wild, one gzip part) serializes
    every downstream narrow map on one core — round-15 profiling
    measured the minhash-signature stage as a single 1.35 s task on 32
    idle cores.  The probe is plan-side only; when the scan already has
    >= parallelism natural splits (any production-scale table) this is a
    no-op, so no extra exchange is ever paid at scale.  With ``key`` the
    exchange is a deterministic hash partitioning (no round-robin
    sort-before-repartition pass); without it, round-robin (Spark's
    sort-before-repartition keeps retries deterministic).

    Streaming frames and probe failures pass through untouched.
    """
    if df.isStreaming:
        return df
    spark = df.sparkSession
    t = int(target or spark.sparkContext.defaultParallelism)
    if t <= 1:
        return df
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — diagnostics-only probe
        return df
    if n >= t:
        return df
    return df.repartition(t, F.col(key)) if key else df.repartition(t)


def salted_sum(
    df: DataFrame,
    key: str,
    cents_col: Column,
    n_salts: int = 16,
    out: str = "total",
) -> DataFrame:
    """Two-phase exact sum of an integer (cents) column, salted on the key."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(cents_col).alias("_partial"), F.count(F.lit(1)).alias("_n")
    )
    return partial.groupBy(key).agg(
        F.sum("_partial").alias(out), F.sum("_n").alias(f"{out}_n")
    )
