"""Column helpers that are bit-for-bit reproducible across Spark and DuckDB.

Why these exist: the correctness gate hashes query results from Spark and from
a DuckDB oracle and compares them.  Two classes of expression are NOT
deterministic across engines:

1. Floating-point aggregation (sum/avg of doubles) — result depends on
   summation order, which differs per engine/partitioning.  Fix: scale to
   integers, sum exactly as BIGINT, divide once at the end
   (``money_sum``).  TPC-H-ish money columns are 2-decimal, discount/tax are
   2-decimal, so scale 100/10^4/10^6 make the products exact.
2. Hash functions — Spark xxhash64 and DuckDB hash() are different algorithms.
   Fix: both engines ship md5; a 15-hex-digit (60-bit) prefix fits a BIGINT
   in both (``hash60``).

Each helper has a Spark-Column form and a SQL-text form; query and oracle use
the same scale constants so the arithmetic is identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_sum(col: Column | str, scale: int = 100) -> Column:
    """Exact, order-independent SUM of a fixed-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(F.round(c * scale).cast("long")) / F.lit(scale)).cast("double")


def money_sum_sql(expr: str, scale: int = 100) -> str:
    return (
        f"CAST(CAST(sum(CAST(round(({expr}) * {scale}) AS BIGINT)) AS DOUBLE)"
        f" / {scale} AS DOUBLE)"
    )


def money_avg(col: Column | str, scale: int = 100) -> Column:
    """Exact AVG: integer sum divided by count (both order-independent)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(F.round(c * scale).cast("long")) / (F.count(c) * F.lit(scale))
    ).cast("double")


def money_avg_sql(expr: str, scale: int = 100) -> str:
    return (
        f"CAST(CAST(sum(CAST(round(({expr}) * {scale}) AS BIGINT)) AS DOUBLE)"
        f" / (count({expr}) * {scale}) AS DOUBLE)"
    )


def hash60(col: Column | str) -> Column:
    """Deterministic 60-bit non-negative BIGINT hash, identical in DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
