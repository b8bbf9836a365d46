"""Query/oracle registry.

Every operator claimed done in SURVEY.md §2 is exposed as a named query here:
a callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) an
equivalent ANSI-SQL oracle string that DuckDB runs on the same parquet tables.
``__spark_entry__.py`` simply re-exports these dicts to the driver.

Cross-engine parity rules used throughout (so the driver's order-insensitive
value-hash matches bit-for-bit):

* Aggregated money/score sums go through ``functions.parity.money_sum`` —
  values are scaled to integers and summed as BIGINT, which is exact and
  order-independent, then divided back once.  Float summation order differs
  between engines; integer summation does not.
* Deterministic 60-bit hashing uses md5 prefixes: Spark
  ``conv(substr(md5(x),1,15),16,10)`` == DuckDB
  ``('0x' || substr(md5(x),1,15))::BIGINT``.
* Computed integer columns are cast to BIGINT on both sides (Spark ints vs
  DuckDB BIGINT would otherwise mismatch on schema).
* Every computed column is aliased identically in both dialects.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query and (optionally) its DuckDB oracle SQL.

    Queries without an oracle get the driver's weaker rows-only check; only
    genuinely non-SQL-expressible ops (stateful streaming, iterative algos,
    pandas-UDF ML stages) should omit it.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so the registry is fully populated."""
    from video_etl_spark.queries import (  # noqa: F401
        advanced,
        boxes,
        relational,
        scalars,
        segments,
        temporal,
        text,
        vectors,
    )
