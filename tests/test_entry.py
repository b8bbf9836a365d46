"""Smoke tests for the driver contract in __spark_entry__.py."""

import importlib


def _entry_module():
    import sys

    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__spark_entry__")


def test_entry_returns_rows(spark):
    mod = _entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["window_start", "event_type", "n_events", "score"]


def test_queries_and_oracles_consistent(spark):
    mod = _entry_module()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracles) <= set(qs)


def test_all_queries_run_at_smoke_sf(spark, sf_dir):
    mod = _entry_module()
    for name, fn in mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name} returned no columns"
