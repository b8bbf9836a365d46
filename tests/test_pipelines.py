"""End-to-end curation pipeline invariants (pipelines/curation.py):
the composition of individually-oracle-checked operators must produce a
deduplicated, gate-passing, deterministically-split corpus."""

import pytest
from pyspark.sql import functions as F

from video_etl_spark.pipelines.curation import curate_documents, write_curated
from video_etl_spark.session import load_table


@pytest.fixture(scope="module")
def curated(spark, sf_dir):
    return curate_documents(spark, sf_dir).persist()


def test_curation_output_nonempty_and_bounded(spark, sf_dir, curated):
    n_in = load_table(spark, sf_dir, "documents").count()
    n_out = curated.count()
    assert 0 < n_out <= n_in


def test_curation_no_duplicate_fingerprints_among_output(curated):
    # exact-dup seeds in the corpus must have collapsed to one canonical
    normalized = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 <>]", " "), " +", " "
        )
    )
    n = curated.count()
    n_distinct = curated.select(normalized.alias("t")).distinct().count()
    assert n_distinct == n


def test_curation_split_deterministic_and_complete(curated):
    rows = curated.select("doc_id", "split").collect()
    splits = {r["split"] for r in rows}
    assert splits <= {"train", "valid", "test"}
    assert "train" in splits  # 80% bucket must be populated
    again = {
        (r["doc_id"], r["split"])
        for r in curated.select("doc_id", "split").collect()
    }
    assert again == set(rows)


def test_curation_all_rows_pass_gates(curated):
    assert curated.filter(F.col("quality") < 0.5).count() == 0


def test_curation_partitioned_write_roundtrip(spark, curated, tmp_path):
    path = str(tmp_path / "curated")
    write_curated(curated, path)
    back = spark.read.parquet(path)
    assert back.count() == curated.count()
    # partition pruning on split works
    one = back.filter(F.col("split") == "train")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
