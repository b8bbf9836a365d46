"""DuckDB-oracle comparison harness.

Mirrors the driver's correctness gate: run the Spark query and the oracle SQL
over the same parquet tables, sort columns by name and rows by value, compare.
Used by tests/test_oracle_parity.py and by `python -m video_etl_spark.oracle`
for a manual sweep at any scale factor.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from video_etl_spark.registry import ORACLES, QUERIES, load_all
from video_etl_spark.session import TABLE_NAMES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df) == 0:
        return df.reset_index(drop=True)
    key = df.apply(lambda row: tuple(repr(v) for v in row), axis=1)
    return df.iloc[key.argsort(kind="mergesort")].reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if bool(pd.isna(a)) != bool(pd.isna(b)):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def compare_frames(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(
            f"column mismatch: spark={sorted(spark_df.columns)} "
            f"oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
        return problems
    for col in sorted(spark_df.columns):
        sk = spark_df[col].dtype.kind
        ok = oracle_df[col].dtype.kind
        if sk != ok:
            problems.append(
                f"dtype kind mismatch [{col}]: spark={spark_df[col].dtype} "
                f"oracle={oracle_df[col].dtype} (cast the oracle explicitly — "
                "DuckDB sum(int) returns HUGEINT)"
            )
    if problems:
        return problems
    s = _normalize(spark_df)
    o = _normalize(oracle_df)
    n_bad = 0
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if not _values_equal(a, b):
                n_bad += 1
                if n_bad <= 5:
                    problems.append(f"cell [{i}][{col}]: spark={a!r} oracle={b!r}")
    if n_bad > 5:
        problems.append(f"... {n_bad} mismatched cells total")
    return problems


def run_query(spark, name: str, sf_dir: str) -> pd.DataFrame:
    return QUERIES[name](spark, sf_dir).toPandas()


def run_oracle(con: duckdb.DuckDBPyConnection, name: str) -> pd.DataFrame:
    return con.execute(ORACLES[name]).fetchdf()


def check(spark, name: str, sf_dir: str) -> list[str]:
    con = duckdb_connection(sf_dir)
    try:
        return compare_frames(run_query(spark, name, sf_dir), run_oracle(con, name))
    finally:
        con.close()


def main() -> None:
    import argparse
    import sys
    import time

    from video_etl_spark.session import get_spark

    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    parser.add_argument("--only", nargs="*", default=None)
    args = parser.parse_args()

    load_all()
    spark = get_spark("oracle-parity")
    names = args.only or sorted(QUERIES)
    failed = []
    for name in names:
        t0 = time.time()
        if name not in ORACLES:
            try:
                n = QUERIES[name](spark, args.sf_dir).count()
                print(f"{name:35s} ROWS-ONLY rows={n} ({time.time()-t0:.1f}s)")
            except Exception as exc:  # noqa: BLE001
                failed.append(name)
                print(f"{name:35s} ERROR {exc}")
            continue
        try:
            problems = check(spark, name, args.sf_dir)
        except Exception as exc:  # noqa: BLE001
            problems = [f"exception: {exc}"]
        status = "OK" if not problems else "FAIL"
        if problems:
            failed.append(name)
        print(f"{name:35s} {status} ({time.time()-t0:.1f}s)")
        for p in problems:
            print(f"    {p}")
    print(f"\n{len(names) - len(failed)}/{len(names)} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
