"""Guard against driver-side testdata format drift.

The driver regenerates /root/testdata/ between rounds and has already changed
the events.ts physical type once (TIMESTAMP(NANOS) -> timestamp[us] no-tz,
which Spark reads as TIMESTAMP_NTZ).  That drift broke 5 queries and 10 tests
in round 4.  This test pins the *post-load_table* Spark dtypes for every
table, so the next format change fails one obvious test instead of a spray of
confusing downstream failures.
"""

import pytest

from video_etl_spark.session import TABLE_NAMES, load_table

SF_SMOKE = "/root/testdata/sf0.001"

EXPECTED_DTYPES = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {
        "n_nationkey": "int",
        "n_name": "string",
        "n_regionkey": "int",
    },
    "customer": {"c_custkey": "bigint", "c_nationkey": "int", "c_acctbal": "double"},
    "supplier": {"s_suppkey": "bigint", "s_nationkey": "int", "s_acctbal": "double"},
    "part": {"p_partkey": "bigint", "p_retailprice": "double"},
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_shipdate": "timestamp",
    },
    # ts MUST load as a session-tz TIMESTAMP (not timestamp_ntz, not bigint):
    # every unix_micros/window/sessionize call site depends on it.
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {"doc_id": "bigint", "text": "string", "lang": "string"},
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
}


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_table_loads_with_expected_dtypes(spark, name):
    df = load_table(spark, SF_SMOKE, name)
    dtypes = dict(df.dtypes)
    expected = EXPECTED_DTYPES[name]
    for col, want in expected.items():
        assert col in dtypes, f"{name}.{col} missing; has {sorted(dtypes)}"
        assert dtypes[col] == want, (
            f"{name}.{col} loads as {dtypes[col]!r}, expected {want!r} — "
            "testdata format drifted; adapt session.load_table"
        )
    assert df.limit(1).count() >= 0
