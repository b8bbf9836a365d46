"""Training-data export: deterministic sharding + balanced shard sinks
(SURVEY.md §2.13 — the last step of the LLM curation pipeline: after
gates/dedup/split, write the corpus as N reproducible shards a trainer
streams).

The reference's terminal sinks are CSV appends (`simulate.py:23-41`); a
training pipeline instead needs (a) a DETERMINISTIC assignment of every
document to one of N shards — stable across reruns and engines, no RNG
state — and (b) an output layout where each shard is a bounded set of
parquet files a data-loader worker can own exclusively.

Scale posture (100 TB):

* Assignment is a pure column expression (md5-prefix hash mod N) — no
  shuffle, no RNG, no driver state; it composes with any upstream plan.
* The writer shuffles ONCE on (shard, subfile) so each output file is
  produced by exactly one task: `files_per_shard` bounds per-file size
  (100 TB / (N shards × F files) each), and hive-style `shard=` dirs give
  the loader partition pruning for free.
* The manifest is one groupBy(shard) — the same single-shuffle shape as
  `source_mixture_weights` — and is what a training job reads to plan
  worker↔shard ownership without listing files.

Hash-order sharding IS uniform sampling (md5 is the uniform order), so
shard sizes concentrate tightly around corpus/N — the property test
asserts the balance bound instead of trusting it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _hash60(expr: str) -> F.Column:
    """Deterministic nonnegative 60-bit hash (Spark == DuckDB bit-for-bit:
    DuckDB twin is ('0x' || substr(md5(x),1,15))::BIGINT).  Single source
    of truth is queries.text._SPARK_HASH — shard assignment MUST stay in
    lockstep with every other md5-prefix hash in the repo or shard
    reproducibility silently breaks."""
    from video_etl_spark.queries.text import _SPARK_HASH

    return F.expr(_SPARK_HASH.format(expr=expr))


def _hash60_col(prefix: str, col: F.Column) -> F.Column:
    """Column-API twin of :func:`_hash60` for caller-supplied string
    prefixes: a salt containing a quote must not break SQL parsing or
    silently change the hash input.  Construction is the SAME md5-prefix
    chain as _SPARK_HASH (conv(substr(md5(x),1,15),16,10)) — the two MUST
    stay in lockstep."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(prefix), col)), 1, 15), 16, 10
    ).cast("long")


def shard_assignments(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard|",
) -> DataFrame:
    """Add a deterministic `shard` column in [0, n_shards).

    shard = hash60(salt || id) % n_shards — reproducible on any engine,
    any partitioning, any rerun; independent of upstream row order.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    hv = _hash60_col(salt, F.col(id_col).cast("string"))
    return df.withColumn("shard", (hv % F.lit(n_shards)).cast("long"))


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard|",
    files_per_shard: int = 1,
    mode: str = "overwrite",
) -> DataFrame:
    """Write `shard=K/subfile=J/` parquet dirs — exactly `files_per_shard`
    data files under every shard — and return the sharded frame (for
    manifest computation).

    One shuffle total.  The exact-file-count guarantee comes from the
    DIRECTORY layout, not the task layout: `partitionBy("shard","subfile")`
    makes every (shard, subfile) combo its own hive dir, and the writer
    splits a task's rows by directory — so even when the repartition hash
    sends two combos to one task (inevitable: hash mod is not identity),
    each combo still lands in its own single file.  At 100 TB set
    files_per_shard so each file sits near the parquet sweet spot (~1 GB)
    rather than one N-TB file per shard; `shard=` partition pruning serves
    the loader regardless of the subfile nesting.

    Caveat: a (shard, subfile) bucket that receives ZERO rows produces no
    directory, so a tiny or pathologically skewed input can leave a shard
    with fewer than files_per_shard files.  With md5-uniform assignment
    this is vanishingly unlikely once |docs| ≫ n_shards × files_per_shard
    (the intended regime); loaders should plan worker ownership from the
    MANIFEST, not from file counts.
    """
    if files_per_shard <= 0:
        raise ValueError(f"files_per_shard must be positive, got {files_per_shard}")
    sharded = shard_assignments(df, n_shards, id_col=id_col, salt=salt)
    sub = (
        _hash60_col(f"{salt}file|", F.col(id_col).cast("string"))
        % F.lit(files_per_shard)
    ).cast("long")
    (
        sharded.withColumn("subfile", sub)
        .repartition(n_shards * files_per_shard, "shard", "subfile")
        .write.mode(mode)
        .partitionBy("shard", "subfile")
        .parquet(path)
    )
    return sharded


def shard_manifest(
    sharded: DataFrame,
    token_col: F.Column | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-shard manifest: doc/token/char counts + id range.

    The id range lets an incremental pipeline verify shard membership
    without re-hashing; counts drive loader-side batch planning.
    ``id_col``/``text_col`` mirror the writer's parameters so the
    write-then-manifest flow works for non-default columns too.
    """
    if token_col is None:
        # derive the default from text_col (NOT a hardcoded 'text'
        # tokenizer) so shard_manifest(sharded, text_col="body") works on
        # frames without a 'text' column, as the docstring promises.
        from video_etl_spark.queries.text import _nonempty_tokens_col

        token_col = F.size(_nonempty_tokens_col(text_col))
    n_tok = token_col
    return (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tok.cast("long")).alias("n_tokens"),
            F.sum(F.length(text_col).cast("long")).alias("n_chars"),
            F.min(id_col).alias("min_doc_id"),
            F.max(id_col).alias("max_doc_id"),
        )
        .orderBy("shard")
    )


def read_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """Loader-side read of one shard; the `shard=` filter prunes to that
    directory (partition pruning — no full-corpus listing or scan)."""
    return spark.read.parquet(path).filter(F.col("shard") == shard)


# ---------------------------------------------------------------------------
# ⊕ round 7 — SEQUENCE PACKING: the export step between curation and the
# trainer.  Documents are concatenated in a deterministic order and cut
# into fixed-length training sequences ("concat-then-chunk" packing — the
# standard GPT-style pretraining layout); the manifest reports how many
# sequences each shard yields, how many documents straddle a sequence
# boundary (the attention-masking cases), and the tail padding waste.
#
# Scale posture: packing is embarrassingly parallel ACROSS shards — the
# only ordered scan is the per-shard window (one shuffle on the shard
# key), never a global sort; each shard's token stream is independent, so
# 100 TB packs as N independent token streams, one per loader worker.
# Determinism: shard is the md5 mod-N assignment, in-shard order is
# doc_id — identical packing on any engine, partitioning, or rerun.


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 256,
    n_shards: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Doc-grain packing assignment: (id, shard, n_tok, cum_before,
    start_seq, end_seq, straddles).

    A document occupies token offsets [cum_before, cum_before + n_tok)
    of its shard's concatenated stream; it lands in sequence
    ``start_seq`` and, when ``straddles``, spills into ``end_seq``.
    Offsets are exact BIGINTs, so both engines agree bit for bit.
    """
    from pyspark.sql import Window

    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    from video_etl_spark.queries.text import _nonempty_tokens_col

    # token-COUNT semantics: empty/whitespace-only docs contribute 0
    # tokens to the packed stream, not a phantom '' (round-7 advice —
    # same convention as quality_weighted_sample)
    t = shard_assignments(
        docs.select(
            F.col(id_col),
            F.size(_nonempty_tokens_col(text_col)).cast("long").alias("n_tok"),
        ),
        n_shards,
        id_col=id_col,
        salt="pack|",
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    return (
        t.withColumn("cum_after", F.sum("n_tok").over(w))
        .withColumn("cum_before", F.col("cum_after") - F.col("n_tok"))
        .withColumn(
            "start_seq", F.expr(f"cum_before div {seq_len}").cast("long")
        )
        .withColumn(
            # greatest(): a 0-token doc sits at [start_seq, start_seq]
            # with straddles false — without the clamp, an empty doc at
            # an exact sequence boundary gets end_seq < start_seq, and
            # Spark's sequence(a, b) DESCENDS for b < a while DuckDB's
            # generate_series is empty (cross-engine divergence)
            "end_seq",
            F.expr(
                f"greatest(cum_before div {seq_len}, "
                f"(cum_after - 1) div {seq_len})"
            ).cast("long"),
        )
        .withColumn("straddles", F.col("start_seq") != F.col("end_seq"))
        .select(
            id_col, "shard", "n_tok", "cum_before",
            "start_seq", "end_seq", "straddles",
        )
    )


def packing_manifest(packed: DataFrame, seq_len: int = 256) -> DataFrame:
    """Per-shard packing manifest over :func:`pack_sequences` output:
    (shard, n_docs, n_tokens, n_seqs, n_straddle_docs, tail_padding)."""
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.expr(f"(max(cum_before + n_tok) + {seq_len - 1}) "
                   f"div {seq_len}").cast("long").alias("n_seqs"),
            F.sum(F.when(F.col("straddles"), 1).otherwise(0))
            .cast("long")
            .alias("n_straddle_docs"),
            F.expr(
                f"((max(cum_before + n_tok) + {seq_len - 1}) "
                f"div {seq_len}) * {seq_len} - max(cum_before + n_tok)"
            ).cast("long").alias("tail_padding"),
        )
    )
