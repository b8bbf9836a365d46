"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in ``video_etl_spark/queries/`` — each is registered with
its oracle SQL at the definition site so the two dialects stay in sync.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from video_etl_spark import registry

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship slice-0 pipeline (SURVEY.md §7.2) on /root/testdata/sf0.001:
    events scan → 2 s tumbling window agg → broadcast dim join → top-k."""
    from video_etl_spark.queries.temporal import chunk_scores_pipeline

    return chunk_scores_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each SQL-expressible query."""
    return dict(registry.ORACLES)
