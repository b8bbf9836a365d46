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


def test_attestation_rotation_ordering(tmp_path, monkeypatch):
    """Pin the driver-rotation contract (round-8): the driver attests the
    FIRST ~50 entries of queries(), so the dict order must be (1) forced
    re-attests, (2) never-attested, (3) attested oldest-SUCCESS-first —
    and a recorded FAILURE must not count as freshness (the query keeps
    sorting ahead of older-but-green names for retry)."""
    import json

    import __spark_entry__ as mod

    arts = {
        1: {
            "old_green": {"rows_match": True, "schema_match": True,
                          "hash_match": True, "err": None},
            "flaky": {"rows_match": True, "schema_match": True,
                      "hash_match": True, "err": None},
        },
        7: {
            "fresh_green": {"rows_match": True, "schema_match": True,
                            "hash_match": True, "err": None},
            # a later FAILED row must not refresh `flaky`
            "flaky": {"rows_match": False, "schema_match": True,
                      "hash_match": False, "err": None},
            # an error row is not an attestation either
            "errored": {"rows_match": None, "schema_match": None,
                        "hash_match": None, "err": "boom"},
        },
    }
    for rnd, rows in arts.items():
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
            json.dumps(rows)
        )
    monkeypatch.setattr(mod, "_REPO_DIR", str(tmp_path))

    last = mod._last_attested()
    assert last == {"old_green": 1, "flaky": 1, "fresh_green": 7}
    seen = mod._already_attested()
    # any row (even failed/errored) counts as SEEN — those names are not
    # "never attested", they need a RE-attestation
    assert seen == {"old_green", "flaky", "fresh_green", "errored"}

    # ordering over a synthetic registry, using the same sort key as
    # queries(): forced first, then never-attested, then oldest-success
    names = ["fresh_green", "brand_new", "old_green", "flaky", "errored"]
    reattest = {"fresh_green"} if True else set()
    ordered = sorted(
        names,
        key=lambda n: (n not in reattest, n in seen, last.get(n, 0)),
    )
    assert ordered[0] == "fresh_green"          # forced to the front
    assert ordered[1] == "brand_new"            # never attested
    # errored (no successful round) and flaky (last success r1) and
    # old_green (r1) all precede nothing newer; errored's last=0 puts it
    # first among the attested group
    assert ordered[2] == "errored"
    assert set(ordered[3:]) == {"old_green", "flaky"}

    # retirement: _REATTEST_FIRST entries retire only on a SUCCESSFUL
    # row at/after the target round
    assert mod._scan_artifacts(7, ok_only=True) == {"fresh_green"}
    assert "flaky" not in mod._scan_artifacts(7, ok_only=True)


def test_rotation_counts_no_oracle_rows_as_attested(tmp_path, monkeypatch):
    """Round-11 (verdict #7): the driver records rows-only queries as
    ``err: "no_oracle"`` with null match fields and a spark_rows count —
    this shape MUST count as a successful attestation, or every
    rows-only query would look never-attested and hog the head of the
    first-50 window every round.  A no_oracle row whose spark run FAILED
    (the driver would record a real err string instead) must not."""
    import json

    import __spark_entry__ as mod

    # the exact row shape CORRECTNESS_r10 records for knn_pq
    no_oracle_row = {
        "rows_match": None, "schema_match": None, "hash_match": None,
        "spark_rows": 50, "oracle_rows": None, "err": "no_oracle",
    }
    arts = {
        6: {
            "rows_only_old": dict(no_oracle_row),
            "green_old": {"rows_match": True, "schema_match": True,
                          "hash_match": True, "err": None},
        },
        9: {"rows_only_fresh": dict(no_oracle_row)},
    }
    for rnd, rows in arts.items():
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
            json.dumps(rows)
        )
    monkeypatch.setattr(mod, "_REPO_DIR", str(tmp_path))

    assert mod._row_ok(no_oracle_row)
    # a hypothetical future shape that records a comparison failure
    # alongside the marker must still read as NOT ok
    assert not mod._row_ok({**no_oracle_row, "rows_match": False})
    assert not mod._row_ok({**no_oracle_row, "err": "boom"})

    last = mod._last_attested()
    assert last == {
        "rows_only_old": 6, "green_old": 6, "rows_only_fresh": 9,
    }
    seen = mod._already_attested()
    assert seen == {"rows_only_old", "green_old", "rows_only_fresh"}

    # rotation ordering: rows-only attested queries rotate by freshness
    # exactly like oracle-green ones — they never jump the never-attested
    # group, and the oldest attestation sorts first within the group
    names = ["rows_only_fresh", "brand_new", "rows_only_old", "green_old"]
    ordered = sorted(
        names, key=lambda n: (True, n in seen, last.get(n, 0))
    )
    assert ordered[0] == "brand_new"
    assert set(ordered[1:3]) == {"rows_only_old", "green_old"}
    assert ordered[3] == "rows_only_fresh"

    # retirement scan treats a no_oracle row at/after the target round
    # as a successful attestation
    assert mod._scan_artifacts(9, ok_only=True) == {"rows_only_fresh"}
