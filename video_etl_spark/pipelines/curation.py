"""End-to-end training-data curation pipeline: the composition that turns
a raw document corpus into a deduplicated, quality-filtered, split,
PII-scrubbed training set — every stage an operator this engine already
oracle-checks individually (SURVEY.md U21/U23 ⊕ surface).

Stages (all lazy until the final action; one linear plan + the dedup
cluster propagation):

1. quality gates   — Gopher repetition/concentration signals
                     (queries.text.repetition_scores) joined with the
                     length/stopword/diversity score
                     (queries.text.text_quality_scores);
2. PII scrub       — JVM regexp redaction of email/phone shapes;
3. dedup           — MinHash band candidates → connected components →
                     keep the canonical (min doc_id) per cluster;
4. split           — deterministic hash-bucket train/valid/test (any
                     worker recomputes the same assignment, no RNG state).

At 100 TB every stage is scan-shaped except the dedup candidate join
(band-key equi-join) and the component propagation (diameter-bounded
rounds) — there is no all-pairs work anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from video_etl_spark.session import load_table

# Case-insensitive and separator-tolerant: real corpora mix case in
# addresses and write phone numbers with -, ., space, or (area) groups.
EMAIL_RE = "(?i)[a-z0-9#._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PHONE_RE = (
    r"(\+?[0-9]{1,3}[-. ])?(\([0-9]{2,4}\)[-. ]?|[0-9]{2,4}[-. ])"
    r"[0-9]{3,4}[-. ]?[0-9]{4}"
)


def curate_documents(
    spark: SparkSession,
    sf_dir: str,
    min_quality: float = 0.5,
    split_buckets: tuple[int, int] = (1, 2),  # <1 test, <2 valid, else train
    components: DataFrame | None = None,
) -> DataFrame:
    """Returns the curated corpus: (doc_id, source, split, quality, text).

    Only cluster-canonical, gate-passing documents survive; text is
    PII-scrubbed; the split hashes the near-dup CLUSTER id (component),
    not the doc id — the leakage-free convention of the
    ``cluster_aware_split`` query: the assignment is invariant to WHICH
    cluster member wins the canonical pick, so a quality-tiebreak change
    can never silently move a document across train/valid/test.
    """
    from video_etl_spark.queries.text import (
        dedup_connected_clusters,
        repetition_scores,
        text_quality_scores,
    )

    docs = load_table(spark, sf_dir, "documents")

    # persist the tiny per-doc gate columns (2 scalars × corpus): joining
    # and filtering the raw query frames lets Catalyst collapse the
    # projection into the filter, re-expanding the O(k²) higher-order
    # lambdas per conjunct with no common-subexpression elimination — a
    # measured 100× blowup (50 s vs 0.5 s at sf0.1).
    rep = (
        repetition_scores(spark, sf_dir)
        .select("doc_id", "gopher_keep")
        .persist()
    )
    qual = (
        text_quality_scores(spark, sf_dir)
        .select("doc_id", "quality")
        .persist()
    )
    gates = rep.join(qual, "doc_id").filter(
        F.col("gopher_keep") & (F.col("quality") >= min_quality)
    )

    # ``components``: optional persisted labeling (write_component_index)
    # — the artifact-lifecycle default path: a corpus revision pays the
    # minhash -> band -> CC chain once and curation reads the index
    # instead of re-deriving it (round-7 verdict #6).
    clusters = dedup_connected_clusters(
        spark, sf_dir, components=components
    ).filter(F.col("is_canonical")).select("doc_id", "component")

    scrubbed = docs.select(
        "doc_id",
        "source",
        F.regexp_replace(
            F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("text"),
    )

    from video_etl_spark.queries.text import _SPARK_HASH

    bucket = F.pmod(
        F.expr(
            _SPARK_HASH.format(
                expr="concat('csplit|', cast(component as string))"
            )
        ),
        F.lit(10),
    )
    split = (
        F.when(bucket < split_buckets[0], "test")
        .when(bucket < split_buckets[1], "valid")
        .otherwise("train")
    )

    return (
        scrubbed.join(gates, "doc_id")
        .join(clusters, "doc_id")
        .select("doc_id", "source", split.alias("split"), "quality", "text")
    )


def write_curated(df: DataFrame, path: str) -> None:
    """Partitioned-by-split sink (repartition on the partition column so
    each task writes one directory, not all of them)."""
    df.repartition("split").write.partitionBy("split").mode(
        "overwrite"
    ).parquet(path)
