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
