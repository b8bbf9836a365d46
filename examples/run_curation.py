#!/usr/bin/env python
"""End-to-end training-data curation demo (pipelines/curation.py):
quality gates -> PII scrub -> MinHash dedup clusters -> canonical
selection -> deterministic split -> partitioned parquet.

Usage: python examples/run_curation.py [sf_dir] (default sf0.01)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from video_etl_spark.pipelines.curation import curate_documents, write_curated
from video_etl_spark.session import get_spark, load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("video-etl-spark-curation")
    spark.sparkContext.setLogLevel("ERROR")

    n_in = load_table(spark, sf_dir, "documents").count()
    curated = curate_documents(spark, sf_dir).persist()
    n_out = curated.count()

    print(f"\ninput docs   : {n_in}")
    print(f"curated docs : {n_out} ({100.0 * n_out / n_in:.1f}% kept)")
    print("\nper split:")
    for r in curated.groupBy("split").count().orderBy("split").collect():
        print(f"  {r['split']:<6} {r['count']}")

    out = os.path.join(tempfile.mkdtemp(prefix="curated_"), "corpus")
    write_curated(curated, out)
    print(f"\nwrote partitioned corpus to {out}")
    spark.stop()


if __name__ == "__main__":
    main()
