#!/usr/bin/env python
"""End-to-end V-ETL demo (E1/E2 re-architected, SURVEY.md §3).

Runs the full loop on the driver's test tables:

1. replay `events` as a Structured Stream;
2. aggregate 2 s chunks, drive the knob switcher (C1) with the per-chunk
   quality signal inside foreachBatch;
3. write the switch log (D15) as day-partitioned parquet (the Load step);
4. run the SORT-style tracker (W2/J2/U12) over synthetic detections;
5. print a summary of decisions, cost, and tracks.

Usage: python examples/run_pipeline.py [sf_dir] (default sf0.001)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from video_etl_spark.control.buffer import ProcessingBuffer
from video_etl_spark.control.switcher import KnobSwitcher, Profile
from video_etl_spark.operators.io import read_partitioned, with_day_partition, write_partitioned
from video_etl_spark.queries.advanced import sort_tracker_synthetic
from video_etl_spark.session import get_spark
from video_etl_spark.streaming.pipeline import run_switch_loop


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("vetl-demo")
    spark.sparkContext.setLogLevel("ERROR")

    # --- control plane setup (D7 categories, D9 profile) -------------------
    quality = [[0.9, 0.6, 0.2], [0.7, 0.5, 0.1], [0.3, 0.2, 0.05]]
    profile = Profile(
        runtime=(1.9, 1.0, 0.4, 1.2, 0.7, 0.3),
        cloud_cost=(0.0, 0.0, 0.0, 2.0, 1.5, 1.0),
        knob_config=(0, 1, 2, 0, 1, 2),
        size_bytes=(1e8,) * 6,
    )
    switcher = KnobSwitcher(
        quality,
        profile,
        ProcessingBuffer(16e9, profile.config_sizes()),
        cloud_budget=0.0,
        planning_interval=100,
        initial_histogram=[1.0, 1.0, 1.0],
    )

    # --- stream -> 2 s chunks -> switcher -> switch log ---------------------
    with tempfile.TemporaryDirectory() as tmp:
        log = run_switch_loop(
            spark, sf_dir, switcher, checkpoint_dir=os.path.join(tmp, "ckpt")
        )
        sink = os.path.join(tmp, "switch_log")
        write_partitioned(
            with_day_partition(log, "window_start"), sink, ["day"]
        )
        back = read_partitioned(spark, sink)
        n_chunks = back.count()
        by_config = {
            r["config"]: r["n"]
            for r in back.groupBy("config").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        cloud_cost = back.agg(F.sum("cloud_cost")).collect()[0][0]

    print(f"chunks processed:      {n_chunks}")
    print(f"decisions per config:  {dict(sorted(by_config.items()))}")
    print(f"total cloud cost:      {cloud_cost:.2f}")

    # --- entity pipeline: tracker over synthetic detections -----------------
    tracks = sort_tracker_synthetic(spark, sf_dir)
    n_tracks = tracks.select("stream", "track_id").distinct().count()
    n_obs = tracks.count()
    print(f"tracks:                {n_tracks} ({n_obs} observations)")


if __name__ == "__main__":
    main()
