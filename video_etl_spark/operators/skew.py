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

#: Probe memo for :func:`spread_small_scan`, keyed by the ANALYZED
#: logical plan's semantic hash.  The probe (``df.rdd.getNumPartitions``)
#: forces physical planning of the whole subtree — measured 40–56 ms per
#: fresh DataFrame at sf0.1, paid once per query BUILD (warm-up + every
#: timed rep) at every spread root (~15 headline queries × 4 builds ≈
#: 2 s of driver latency per bench run).  Frames with the same analyzed
#: plan under the same session confs plan to the same split count, so
#: the count is process-immutable metadata, like ``session._SCHEMA_MEMO``.
#: A (theoretical) hash collision could only reuse the WRONG partition
#: count — a perf-only mis-decision about adding the exchange; results
#: are never affected.
#:
#: Round-16 (ADVICE): the key now includes the application id and the
#: split-relevant read confs, so a second session in the same process or
#: a mid-session conf change (files.maxPartitionBytes etc.) stops
#: silently reusing a stale count; the memo is also size-bounded (reset
#: past _PROBE_MEMO_MAX — it is a latency cache, never correctness).
_PROBE_MEMO: dict[tuple, int] = {}
_PROBE_MEMO_MAX = 4096

#: confs that change how many splits the SAME analyzed plan yields
_PROBE_CONFS = (
    "spark.sql.files.maxPartitionBytes",
    "spark.sql.files.openCostInBytes",
    "spark.sql.files.minPartitionNum",
)


def _probe_memo_key(spark, plan_hash: int) -> tuple:
    return (
        spark.sparkContext.applicationId,
        tuple(spark.conf.get(c, None) for c in _PROBE_CONFS),
        plan_hash,
    )


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
        memo_key = _probe_memo_key(
            spark, df._jdf.queryExecution().analyzed().semanticHash()
        )
    except Exception:  # noqa: BLE001 — diagnostics-only probe
        memo_key = None
    n = _PROBE_MEMO.get(memo_key) if memo_key is not None else None
    if n is None:
        try:
            n = df.rdd.getNumPartitions()
        except Exception:  # noqa: BLE001 — diagnostics-only probe
            return df
        if memo_key is not None:
            if len(_PROBE_MEMO) >= _PROBE_MEMO_MAX:
                _PROBE_MEMO.clear()
            _PROBE_MEMO[memo_key] = n
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
