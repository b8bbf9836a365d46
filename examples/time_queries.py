#!/usr/bin/env python
"""Quick per-query timer for optimization iteration (bench.py methodology:
warm-up + N timed reps, count+xxhash force, clearCache between reps) on an
arbitrary subset of registered queries.

Usage: python examples/time_queries.py q1 q2 ...   (reps via $REPS, default 2)

Diagnostics only — the committed numbers come from bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: time_queries.py <query> ...")
    reps = int(os.environ.get("REPS", "2"))
    from video_etl_spark import registry
    from video_etl_spark.session import get_spark

    registry.load_all()
    conf = {}
    for kv in os.environ.get("PROFILE_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            conf[k.strip()] = v.strip()
    spark = get_spark("time-queries", conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    def force(df) -> None:
        df.select(
            F.count(F.lit(1)).alias("n"),
            F.max(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
        ).collect()

    out = {}
    for name in names:
        fn = registry.QUERIES[name]
        force(fn(spark, sf_dir))  # warm-up
        spark.catalog.clearCache()
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 4))
            spark.catalog.clearCache()
        out[name] = {"median": sorted(samples)[len(samples) // 2],
                     "min": min(samples), "samples": samples}
        print(name, json.dumps(out[name]))
    print(json.dumps({n: v["median"] for n, v in out.items()}))


if __name__ == "__main__":
    main()
