"""SparkSession factory and test-table loaders.

Tuned for the deployment target described in SURVEY.md §7: a large cluster
reading ~100 TB, but runnable on local[N] for correctness work.  All knobs are
declarative so Catalyst/AQE pick physical strategies at runtime:

* AQE on (runtime re-planning, skew-join splitting, partition coalescing).
* Arrow on (pandas-UDF ops in llm_ops/ and streaming/ are vectorized).
* Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle used by the correctness gate.
* ``spark.sql.shuffle.partitions`` defaults to the local core count; on a real
  cluster AQE coalescing makes the initial number mostly irrelevant.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Tables the driver generates under /root/testdata/sf*/ (TESTDATA.md).
TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Inferred-schema memo for :func:`load_table`, keyed by resolved parquet
#: path.  `spark.read.parquet(path)` runs a driver JOB per call just to
#: merge footers into a schema; the bench pays it once per table per
#: query BUILD (warm-up + every timed rep), ~30 ms each × hundreds of
#: builds (round-15 profile: 5 such jobs before pagerank's first real
#: stage).  The schema of a fixed parquet path under fixed session confs
#: is immutable metadata, so memoize it and hand it to the reader —
#: schema inference is skipped, the DATA is still read from parquet by
#: every query (this is not a result cache).  Keyed by path only: the
#: testdata tables never change within a process; a path rewritten with
#: a new schema mid-process would need an entry eviction (not a case any
#: caller has).
_SCHEMA_MEMO: dict[str, "object"] = {}


def _default_conf(cpus: str) -> dict[str, str]:
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Round-15 NOTE (measured, rejected — see OPTIMIZATION_r15.md):
        # both `coalescePartitions.parallelismFirst=false` (guide §2.2
        # size-targeted AQE coalescing) and
        # `optimizer.canChangeCachedPlanOutputPartitioning=true` were
        # benched; each coalesces KB-sized shuffles/caches to 1
        # partition, which SERIALIZES compute-heavy small-byte stages
        # (semantic_dedup_pairs 1.2 s → 5.8–6.2 s: per-pair cosine work
        # behind a KB-scale cached frame) for a net loss despite real
        # wins on the iterative/broadcast-rebuild family.  AQE coalescing
        # is byte-based and cannot see per-row CPU cost; the hot spots
        # are fixed surgically instead (spread_small_scan, bounded
        # pagerank iteration).
        "spark.sql.shuffle.partitions": cpus,
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # events.parquet stores TIMESTAMP(NANOS), which vanilla Spark rejects
        # ([PARQUET_TYPE_ILLEGAL]).  Read nanos as LONG upfront — no
        # try/except probe, no fake ERROR lines in the logs — and
        # load_table() truncates the events.ts column to microseconds
        # (matching DuckDB's TIMESTAMP_NS -> TIMESTAMP cast).
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # Driver-generated events.parquet has changed format across rounds
        # (TIMESTAMP(NANOS) -> timestamp[us] with no tz).  Plain timestamp[us]
        # would otherwise surface as TIMESTAMP_NTZ, which `unix_micros` et al.
        # reject; with the session tz pinned to UTC, reading it as a regular
        # TIMESTAMP is value-exact and keeps DuckDB-oracle parity.
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
        "spark.sql.parquet.filterPushdown": "true",
        # Small dims (region/nation/supplier/profile tables) must broadcast.
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "8g"),
        "spark.ui.enabled": "false",
        "spark.sql.execution.pyspark.udf.faulthandler.enabled": "true",
    }


def get_spark(app_name: str = "video-etl-spark", conf: dict | None = None) -> SparkSession:
    """Return the active session or build one on local[$SPARK_GRAFT_CPUS]."""
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    )
    merged = _default_conf(cpus)
    merged.update(conf or {})
    for key, value in merged.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def local_frame(spark: SparkSession, rows, schema) -> DataFrame:
    """Driver-local rows → a ONE-partition DataFrame.

    ``spark.createDataFrame(list, schema)`` defaults to one partition per
    core, so every downstream action pays parallelism-many Python-worker
    round-trips to ship a bounded result that fits in one task (measured
    0.50 → 0.33 s per action on a 746-row frame at local[32]).  Bounded
    driver-side results (eager stats, census rows, trained merges) have
    no parallelism to lose — rows stay in collect order, values
    identical.  Corpus-scale data must never come through here."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table.

    With ``nanosAsLong=true`` (set in :func:`_default_conf`, and defensively
    re-set here for externally built sessions) the events table's
    TIMESTAMP(NANOS) ``ts`` column arrives as a BIGINT of nanoseconds; we
    truncate it to microseconds — exactly what DuckDB does when it casts
    TIMESTAMP_NS to its microsecond TIMESTAMP, so oracle comparisons agree.
    The rewrite is restricted to the events table so an unrelated bigint
    column that happens to be named ``ts`` is never silently mangled.

    The driver has also shipped events.parquet as plain ``timestamp[us]``
    with no timezone (round-5 testdata refresh), which Spark reads as
    TIMESTAMP_NTZ; normalize that to TIMESTAMP too (session tz is UTC, so
    the cast is value-exact and DuckDB ``epoch_us`` parity holds).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # The no-tz timestamp[us] read is only value-exact (and DuckDB-parity)
    # under a UTC session tz; externally built sessions (the driver's) may
    # carry the host tz, so pin it at runtime like the parquet confs above.
    # NOTE: this override is SESSION-WIDE and outlives this call — it
    # changes timestamp parsing/rendering for every subsequent query on
    # the session, not just this read.  Warn once when we actually change
    # a non-UTC session so callers embedding load_table in a larger app
    # aren't surprised.
    prev_tz = spark.conf.get("spark.sql.session.timeZone", None)
    if prev_tz not in (None, "UTC", "Etc/UTC", "GMT"):
        import warnings

        warnings.warn(
            f"load_table: overriding spark.sql.session.timeZone "
            f"{prev_tz!r} -> 'UTC' for oracle-parity timestamp reads; "
            "the override persists for the whole session",
            stacklevel=2,
        )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = table_path(sf_dir, name)
    schema = _SCHEMA_MEMO.get(path)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_MEMO[path] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn(
                "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
            )
        elif ts_type == "timestamp_ntz":
            # Belt-and-suspenders: fires only if the session was built
            # without inferTimestampNTZ=false (externally built sessions).
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (for spark.sql queries)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def ensure_executor_package(spark: SparkSession) -> None:
    """Make `video_etl_spark` importable on executor Python workers.

    Every pandas-UDF / applyInPandas operator pickles functions that live in
    this package; executors unpickle them by re-importing the module.  When
    the driver process found the package via cwd/sys.path (e.g. the external
    verify harness), executor workers won't — so ship the package once as a
    zip via ``addPyFile``.  Idempotent per session.
    """
    if getattr(spark, "_vetl_pkg_shipped", False):
        return
    import os
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(tempfile.gettempdir(), "video_etl_spark_pkg.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    spark._vetl_pkg_shipped = True
