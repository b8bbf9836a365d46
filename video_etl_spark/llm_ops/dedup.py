"""SimHash near-duplicate detection (SURVEY.md U21, the dedup family's
Hamming-space member; exact/MinHash/Jaccard variants are oracle-verified in
queries/text.py).

SimHash: each token hashes to 64 bits; the document signature's bit *i* is 1
iff the sum over tokens of (±1 per token-bit *i*) is positive.  Near-dups
are signature pairs within a small Hamming distance.  Candidate generation
uses the standard trick: split the 64-bit signature into 4 × 16-bit chunks —
any pair within Hamming distance 3 must agree on at least one chunk — and
equi-join on chunks (shuffle on chunk value, never all-pairs).

The per-document signature is a vectorized Arrow pandas UDF (token hashing +
bit counting is branch-heavy and sits poorly in SQL expressions; this is the
sanctioned Python path).  Hashing is md5-based and deterministic.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _simhash64(text: str) -> int:
    counts = [0] * 64
    for tok in text.lower().split():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        for i in range(64):
            counts[i] += 1 if (h >> i) & 1 else -1
    sig = 0
    for i in range(64):
        if counts[i] > 0:
            sig |= 1 << i
    return sig - (1 << 63)  # shift into signed BIGINT range


def _simhash_series(texts: pd.Series) -> pd.Series:
    return texts.map(_simhash64)


def simhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id + 64-bit signature + its 4 × 16-bit chunk keys.

    The pandas UDF is constructed here (not at module import) with an
    explicit DataType: executors import this module when unpickling, and a
    module-level ``@pandas_udf("ddl string")`` would try to parse the schema
    without an active session.
    """
    from video_etl_spark.session import ensure_executor_package

    ensure_executor_package(docs.sparkSession)
    simhash_udf = pandas_udf(_simhash_series, T.LongType())
    out = docs.select("doc_id", simhash_udf(F.col(text_col)).alias("simhash"))
    for c in range(4):
        out = out.withColumn(
            f"chunk{c}",
            F.shiftrightunsigned(F.col("simhash"), c * 16).bitwiseAND(F.lit(0xFFFF)),
        )
    return out.select("doc_id", "simhash", "chunk0", "chunk1", "chunk2", "chunk3")


def _hamming(col_a, col_b):
    return F.bit_count(col_a.bitwiseXOR(col_b))


def simhash_pairs(
    docs: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs within `max_hamming` bits, via chunk-join blocking."""
    sig = simhash_signatures(docs, text_col)
    pairs = None
    for c in range(4):
        a = sig.select(
            F.col("doc_id").alias("doc_a"),
            F.col("simhash").alias("sig_a"),
            F.col(f"chunk{c}").alias("chunk"),
        )
        b = sig.select(
            F.col("doc_id").alias("doc_b"),
            F.col("simhash").alias("sig_b"),
            F.col(f"chunk{c}").alias("chunk"),
        )
        p = a.join(b, "chunk").filter(F.col("doc_a") < F.col("doc_b"))
        pairs = p if pairs is None else pairs.unionByName(p)
    return (
        pairs.select(
            "doc_a",
            "doc_b",
            _hamming(F.col("sig_a"), F.col("sig_b")).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """⊕ training-pipeline op: per-class stratified sampling (class
    balancing for training corpora).  Seeded `sampleBy` is deterministic
    per Spark version/partitioning; for cross-engine-reproducible splits
    use the hash-based `dataset_split` query instead."""
    return docs.sampleBy(strata_col, fractions, seed=seed)
