"""The correctness gate, locally: every registered query must match its
DuckDB oracle bit-for-bit at sf0.001 (the driver runs the same comparison at
sf0.01 — see __spark_entry__.py)."""

import pytest

from video_etl_spark import registry
from video_etl_spark.oracle import check

registry.load_all()


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    problems = check(spark, name, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_every_query_has_oracle_or_is_flagged(spark):
    # Queries without oracles get only a rows-only check from the driver;
    # keep the list explicit so additions are deliberate.
    from video_etl_spark.queries.advanced import ROWS_ONLY_QUERIES

    rows_only = set(registry.QUERIES) - set(registry.ORACLES)
    assert rows_only == set(ROWS_ONLY_QUERIES)
