"""Differential fuzzing: hypothesis-generated filter predicates rendered to
both Spark SQL and DuckDB must agree on row count and (exact, quantized)
aggregate — a broad guard on expression/comparison semantics beyond the
hand-written query set."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from video_etl_spark.session import table_path

SF = "/root/testdata/sf0.001"

# predicate leaves over lineitem columns (literals chosen inside data ranges)
_NUM_COLS = {
    "l_quantity": st.integers(1, 50),
    "l_discount": st.sampled_from([0.0, 0.02, 0.05, 0.08, 0.1]),
    "l_extendedprice": st.integers(1000, 90000),
    "l_linenumber": st.integers(1, 7),
}
_OPS = st.sampled_from(["<", "<=", "=", ">", ">=", "<>"])
_FLAGS = st.sampled_from(["A", "N", "R"])
_DATES = st.sampled_from(["1996-01-01", "1998-06-15", "2000-12-31"])


@st.composite
def leaf(draw):
    kind = draw(st.sampled_from(["num", "flag", "date"]))
    op = draw(_OPS)
    if kind == "num":
        col = draw(st.sampled_from(sorted(_NUM_COLS)))
        lit = draw(_NUM_COLS[col])
        return f"({col} {op} {lit})"
    if kind == "flag":
        return f"(l_returnflag {op} '{draw(_FLAGS)}')"
    return f"(l_shipdate {op} TIMESTAMP '{draw(_DATES)} 00:00:00')"


@st.composite
def predicate(draw):
    n = draw(st.integers(1, 3))
    parts = [draw(leaf()) for _ in range(n)]
    joiners = [draw(st.sampled_from(["AND", "OR"])) for _ in range(n - 1)]
    expr = parts[0]
    for j, p in zip(joiners, parts[1:]):
        expr = f"({expr} {j} {p})"
    return expr


@pytest.fixture(scope="module")
def engines(spark):
    spark.read.parquet(table_path(SF, "lineitem")).createOrReplaceTempView(
        "diff_lineitem"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW diff_lineitem AS "
        f"SELECT * FROM read_parquet('{table_path(SF, 'lineitem')}')"
    )
    yield spark, con
    con.close()


@settings(max_examples=40, deadline=None)
@given(pred=predicate())
def test_predicate_agreement(engines, pred):
    spark, con = engines
    sql = (
        "SELECT count(*) AS n, "
        "COALESCE(sum(CAST(round(l_extendedprice * 100) AS BIGINT)), 0) AS cents "
        f"FROM diff_lineitem WHERE {pred}"
    )
    s_row = spark.sql(sql).collect()[0]
    o_row = con.execute(sql).fetchone()
    assert s_row["n"] == o_row[0], pred
    assert int(s_row["cents"]) == int(o_row[1]), pred
