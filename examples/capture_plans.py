#!/usr/bin/env python
"""Capture `.explain('formatted')` for bench queries into plans/<round>/.

Usage: python examples/capture_plans.py <suffix> [query ...]

Writes plans/$PLANS_ROUND/<query>_<suffix>.txt (default round: r16) for
each named query (default: the full bench HEADLINE list).  The suffix is
'before' / 'after' per the optimization-round deliverable contract; the
judge checks plan claims against these files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit("usage: capture_plans.py <suffix> [query ...]")
    suffix = sys.argv[1]
    names = sys.argv[2:]

    from video_etl_spark import registry
    from video_etl_spark.session import get_spark

    registry.load_all()
    if not names:
        import bench

        names = list(bench.HEADLINE)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r16"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = registry.QUERIES[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — diagnostics only
            plan = f"ERROR building {name}: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
