"""Sources/sinks with 100 TB partitioning discipline (SURVEY.md S12/S14,
§7.2 step 7: "partitioning by stream/day").

The reference's sinks are CSV appends and stdout prints
(`simulate.py:23-41`, `covid_workload.py:49`); at scale the Load target is
partitioned parquet: hive-style `stream=<id>/day=<date>` directories so
downstream readers get partition pruning for free, and per-partition file
sizes stay bounded.

``write_partitioned`` repartitions by the partition columns before writing
so each output partition is produced by one task (no small-file explosion
from every task writing every partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def norm_storage_uri(u: str) -> tuple[str, str, str]:
    """Normalize a storage path/URI to (scheme, authority-sans-port,
    path) for overlap checks.  ``os.path.abspath`` alone mangles
    ``hdfs://nn:8020/...`` and ``s3a://...`` into cwd-relative strings
    that never prefix-match — silently bypassing any guard built on it.
    The s3 scheme aliases (s3/s3a/s3n) and a present-vs-absent default
    port refer to the same storage, so both normalize together, as do a
    present-vs-absent userinfo (``s3a://key@bucket/x`` is the same bucket
    as ``s3a://bucket/x``) and IPv6 brackets; local and ``file:`` paths
    normalize through ``abspath``."""
    import os
    import posixpath
    from urllib.parse import unquote, urlparse

    p = urlparse(u)
    if p.scheme in ("", "file"):
        return ("file", "", os.path.abspath(unquote(p.path) or u))
    scheme = {"s3a": "s3", "s3n": "s3"}.get(p.scheme.lower(), p.scheme.lower())
    # .hostname strips userinfo, the port, and IPv6 brackets (and
    # lowercases) — a manual netloc.rsplit(':', 1) keeps 'key@bucket'
    # together and turns a port-less '[::1]' into '[:'
    host = p.hostname or ""
    return (scheme, host, posixpath.normpath(unquote(p.path) or "/"))


def assert_new_generation(
    target: str, inputs: list[str] | tuple[str, ...], what: str
) -> None:
    """Refuse a generation-rotation write whose ``target`` overlaps any
    of ``inputs`` (equal, contains, or is contained by) — Spark's
    ``mode('overwrite')`` deletes the target location before the insert
    job runs, so compacting onto a path still being read destroys the
    artifact mid-job.  URI-aware via :func:`norm_storage_uri`."""
    t_scheme, t_host, t_path = norm_storage_uri(target)
    for inp in inputs:
        i_scheme, i_host, i_path = norm_storage_uri(inp)
        if (i_scheme, i_host) != (t_scheme, t_host):
            continue
        if (
            i_path == t_path
            or i_path.startswith(t_path.rstrip("/") + "/")
            or t_path.startswith(i_path.rstrip("/") + "/")
        ):
            raise ValueError(
                f"compaction target {target!r} overlaps {what} "
                f"({inp!r}); write a NEW generation and swap readers "
                "over instead of overwriting in place"
            )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Parquet sink partitioned by the given columns (S12 at scale)."""
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned sink back; partition filters prune directories."""
    return spark.read.parquet(path)


def with_day_partition(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Add the canonical `day` partition column (date-typed)."""
    return df.withColumn("day", F.to_date(F.col(ts_col)))


def stream_to_parquet(
    stream: DataFrame, path: str, checkpoint: str, partition_cols: list[str]
):
    """S12: streaming append sink with checkpointing (exactly-once files)."""
    return (
        stream.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy(*partition_cols)
        .trigger(availableNow=True)
        .start()
    )


def read_binary_folder(spark: SparkSession, path: str) -> DataFrame:
    """S2: image-folder scan (`object_detection.py:75-79`) — binary payloads
    plus the O3 natural filename sort (`object_detection.py:132-141`): a
    numeric frame index parsed from the filename, so `orderBy(frame_no)`
    replaces the reference's human-order sort."""
    df = spark.read.format("binaryFile").load(path)
    frame_no = F.regexp_extract(
        F.reverse(F.split(F.col("path"), "/")).getItem(0), r"(\d+)", 1
    )
    return df.select(
        F.col("path"),
        F.when(frame_no != "", frame_no.cast("long")).alias("frame_no"),
        F.col("length").alias("n_bytes"),
        F.col("content"),
    ).orderBy("frame_no", "path")


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    files_per_bucket: int = 1,
) -> None:
    """Bucketed external table (SURVEY §7.2 step 7 / build brief
    "bucketing for co-located joins"): pre-shuffles data into
    ``n_buckets`` sorted files per bucket column so equi-joins and
    aggregations on the bucket key read co-located data and skip the
    exchange entirely — the biggest shuffle saving available for repeated
    large-fact joins at the 100 TB target.

    The explicit ``repartition`` on the bucket key is the small-file
    guard: a bare ``bucketBy`` write emits one file per TASK per bucket
    (n_tasks × n_buckets files — measured 1 600 files for a 32-bucket
    index at ~sf1), because bucket assignment and shuffle partitioning
    use the same Murmur3 hash but the input tasks each hold rows of
    every bucket.  Repartitioning to ``files_per_bucket × n_buckets``
    first puts each bucket's rows in exactly ``files_per_bucket``
    partitions (partition p holds only bucket p % n_buckets), so the
    file count is chosen, not an accident of the writing job's
    parallelism.

    ``files_per_bucket`` is ALSO the write-stage parallelism dial: the
    default 1 caps the sort-and-write at ``n_buckets`` tasks — right for
    indexes and local runs, a straggler/OOM cliff for a huge fact table
    on a 1000-executor cluster, where the move is ``files_per_bucket ≈
    executors / n_buckets`` (or simply more buckets) so every executor
    writes while file counts stay bounded at files_per_bucket per
    bucket.

    CALLER TRAP: do not feed this a bare ``spark.table()`` scan of an
    ALREADY-BUCKETED table with the same key — the scan's partitioning
    claim lets the optimizer elide the repartition, auto-bucketed-scan
    then disables the bucketed read, and the planned write re-shuffles
    to ``spark.sql.shuffle.partitions`` files.  Read the table's
    LOCATION as plain parquet instead (what
    :func:`compact_bucketed_index` does)."""
    (
        df.repartition(
            files_per_bucket * n_buckets, *[F.col(c) for c in bucket_cols]
        )
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table)
    )


def bucket_spec(spark: SparkSession, table: str) -> tuple[int, list[str], str]:
    """``(n_buckets, bucket_cols, location)`` of a bucketed catalog
    table, parsed from DESCRIBE FORMATTED — the never-resupply-params
    reader :func:`append_bucketed` and :func:`compact_bucketed_index`
    share.  Only the metadata section after the '# Detailed Table
    Information' marker is read: the rows above it are the DATA columns,
    so a column literally named 'Num Buckets' cannot shadow the spec."""
    desc = spark.sql(f"DESCRIBE FORMATTED {table}").collect()
    try:
        start = next(
            i
            for i, r in enumerate(desc)
            if r["col_name"].strip().startswith("# Detailed Table")
        )
    except StopIteration:
        raise ValueError(
            f"bucket_spec: DESCRIBE FORMATTED {table!r} has no "
            "'# Detailed Table Information' section — unsupported "
            "catalog/Spark version, refusing to guess the bucket spec"
        )
    info = {r["col_name"]: r["data_type"] for r in desc[start:]}
    if "Num Buckets" not in info:
        raise ValueError(f"bucket_spec: {table!r} is not a bucketed table")
    n_buckets = int(info["Num Buckets"])
    cols = [c.strip("[]` ") for c in info["Bucket Columns"].split(",")]
    return n_buckets, cols, info.get("Location", "")


def append_bucketed(
    df: DataFrame, table: str, files_per_bucket: int = 1
) -> None:
    """Append rows to an existing bucketed table written by
    :func:`write_bucketed`, preserving its bucket spec (each append job
    adds correctly-hashed files per bucket, so consumers keep their
    exchange-free scans — verified by plan assertions in tests).  Spark
    requires the matching spec to be RE-SUPPLIED on append (a spec-less
    or mismatched append is rejected), so it is read from the catalog
    here rather than trusted from the caller — the same
    never-resupply-params discipline as the ANN index sidecars."""
    spark = df.sparkSession
    n_buckets, cols, _ = bucket_spec(spark, table)
    # match Spark's analyzer: column resolution is case-insensitive
    # unless spark.sql.caseSensitive is set — the guard must not reject
    # an append the write itself would accept
    case_sensitive = (
        spark.conf.get("spark.sql.caseSensitive", "false").lower() == "true"
    )
    have = df.columns if case_sensitive else [c.lower() for c in df.columns]
    missing = [
        c for c in cols
        if (c if case_sensitive else c.lower()) not in have
    ]
    if missing:
        raise ValueError(
            f"append_bucketed: parsed bucket columns {cols} from "
            f"{table!r} but {missing} are absent from the appended "
            f"frame (columns: {df.columns}) — spec parse or schema "
            "mismatch"
        )
    (
        # same small-file guard + parallelism dial as write_bucketed:
        # files_per_bucket files per bucket per append, not one per task
        df.repartition(
            files_per_bucket * n_buckets, *[F.col(c) for c in cols]
        )
        .write.mode("append")
        .bucketBy(n_buckets, *cols)
        .sortBy(*cols)
        .saveAsTable(table)
    )


def compact_bucketed_index(
    spark: SparkSession,
    src_table: str,
    dst_table: str,
    dst_path: str,
    files_per_bucket: int = 1,
) -> None:
    """Fold an append-maintained bucketed table's accumulated per-append
    files into a FRESH generation with the identical bucket spec — the
    file-count compaction of the index lifecycle (write → append →
    compact → swap readers → drop old generation).

    Each :func:`append_bucketed` call adds ``files_per_bucket`` files per
    bucket, so after k appends every bucketed scan lists k× the files; at
    1000-executor scale that listing cost is the whole reason compaction
    exists.  Unlike the STREAMING fold (``streaming.dedup.
    compact_stream_index``, which converts a raw batch_id-partitioned
    layout into its first bucketed generation), this source is already
    bucketed — the spec (n_buckets, columns) is read from the catalog,
    never caller-resupplied, and rows land unchanged, so probes of the
    new generation are bit-identical (tested).  The destination must be
    a NEW path (``assert_new_generation``): overwriting the source
    location would delete files mid-read.  The caller swaps readers to
    ``dst_table`` and drops the old table/path afterwards."""
    n_buckets, cols, src_loc = bucket_spec(spark, src_table)
    if not src_loc:
        # without the location there is no plain-parquet read (the
        # bucketed-scan fallback is exactly the CALLER TRAP above: the
        # repartition gets elided and the write re-shuffles to
        # shuffle.partitions files) AND no overlap guard — refuse loudly
        # rather than emit a silently-mislaid generation
        raise ValueError(
            f"compact_bucketed_index: DESCRIBE FORMATTED {src_table!r} "
            "reports no Location — cannot read the generation as plain "
            "parquet or verify dst_path does not overlap it"
        )
    assert_new_generation(
        dst_path, [src_loc], f"the current generation of {src_table!r}"
    )
    # read the LOCATION, not the catalog table: a bucketed table scan
    # advertises hash(cols, n_buckets) partitioning, so the optimizer
    # elides write_bucketed's explicit repartition as redundant — then
    # auto-bucketed-scan disables the bucketed read (nothing left that
    # exploits it) and the planned write re-shuffles to
    # spark.sql.shuffle.partitions, emitting THAT many files instead of
    # files_per_bucket × n_buckets (observed: 8 files for a 4-bucket
    # fold).  A plain parquet scan carries no partitioning claim, so the
    # file-count guard survives planning.
    src = spark.read.parquet(src_loc)
    write_bucketed(src, dst_table, dst_path, cols, n_buckets, files_per_bucket)


def write_orc_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """ORC twin of :func:`write_partitioned` — the second columnar sink
    format (some lakes standardize on ORC; Spark's native reader gives it
    the same predicate pushdown and partition pruning as parquet, which
    the round-trip test asserts via PushedFilters on the ORC scan)."""
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .orc(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC sink back; filters push down to the ORC scan."""
    return spark.read.orc(path)


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Raw text-corpus scan: one document per line across a directory of
    .txt files — the rawest ingestion format a crawl pipeline sees.

    Documents get CONTENT-ADDRESSED ids, not positional ones: positional
    ids (monotonically_increasing_id, zipWithIndex) differ across
    partitioning/reruns, while content hashes are deterministic on any
    cluster — and identical lines collapse to ONE row corpus-wide (exact
    dedup semantics built into the scan; n_copies tracks the global
    multiplicity).  TWO identity columns come out: `content_key`, the
    full 128-bit md5 hex — the TRUE key (collision-free for any
    realistic corpus) — and `doc_id`, its 60-bit BIGINT prefix for
    schema compatibility with the `documents` table.  At ~1e10 documents
    a 2^60 space expects a handful of doc_id birthday collisions, so
    joins that must be exact at that scale should key on content_key;
    distinct documents always remain distinct ROWS here regardless
    (grouping is by text), only the convenience id can collide.
    `source` is the lexicographically-smallest originating file name —
    min() is a DETERMINISTIC stand-in for crawl-order attribution (the
    same convention as ngram_novelty_by_source), not actual arrival
    order, which a line-oriented batch scan cannot observe.
    """
    lines = spark.read.text(path).select(
        F.col("value").alias("text"),
        F.element_at(
            F.split(F.col("_metadata.file_path"), "/"), -1
        ).alias("source"),
    )
    return (
        lines.filter(F.length(F.trim("text")) > 0)
        .groupBy("text")
        .agg(
            F.min("source").alias("source"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(
            F.conv(F.substring(F.md5("text"), 1, 15), 16, 10)
            .cast("long")
            .alias("doc_id"),
            F.md5("text").alias("content_key"),
            "text",
            "source",
            "n_copies",
            F.length("text").cast("long").alias("n_chars"),
        )
    )
