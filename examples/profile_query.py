#!/usr/bin/env python
"""Per-job wall-time profile of one (or more) registered bench queries.

Usage: python examples/profile_query.py <query_name> [<query_name> ...]

Runs each query exactly like bench.py's timed pass (count + all-column
xxhash64 reduce in one job) after one untimed warm-up, with the Spark
event log enabled, then attributes wall time to the query's individual
jobs/stages so optimization work (guide §1) targets the real cost, not a
guess.  Prints, per query: total wall, then each job with its
description, duration, and stage breakdown (task count, shuffle
read/write bytes).

Read-only diagnostics — never used by bench.py or the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENT_DIR = "/tmp/spark-events-profile"


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: profile_query.py <query_name> ...")
    os.makedirs(EVENT_DIR, exist_ok=True)
    from video_etl_spark import registry
    from video_etl_spark.session import get_spark

    registry.load_all()
    conf = {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file://{EVENT_DIR}",
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    }
    # A/B extra confs: PROFILE_CONF="key=val;key2=val2"
    for kv in os.environ.get("PROFILE_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            conf[k.strip()] = v.strip()
    spark = get_spark("profile-query", conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    def force(df) -> None:
        df.select(
            F.count(F.lit(1)).alias("n"),
            F.max(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
        ).collect()

    marks = {}
    for name in names:
        fn = registry.QUERIES[name]
        force(fn(spark, sf_dir))  # warm-up (not profiled)
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"PROFILE:{name}")
        t0 = time.perf_counter()
        force(fn(spark, sf_dir))
        marks[name] = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()

    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log: jobs (with description) + their stages
    log_path = os.path.join(EVENT_DIR, app_id)
    if not os.path.exists(log_path):
        cands = [p for p in os.listdir(EVENT_DIR) if p.startswith(app_id)]
        if not cands:
            raise SystemExit(f"no event log for {app_id} in {EVENT_DIR}")
        log_path = os.path.join(EVENT_DIR, cands[0])

    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    with open(log_path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    ),
                    "t0": ev["Submission Time"],
                    "stages": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
            elif k == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]
            elif k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                # accumulables carry shuffle totals
                acc = {
                    a["Name"]: a.get("Value")
                    for a in si.get("Accumulables", [])
                }
                stages[sid] = {
                    "name": si.get("Stage Name", ""),
                    "tasks": si.get("Number of Tasks"),
                    "ms": (si.get("Completion Time", 0) or 0)
                    - (si.get("Submission Time", 0) or 0),
                    "shuf_r": acc.get("internal.metrics.shuffle.read.localBytesRead", 0)
                    + (acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0) or 0),
                    "shuf_w": acc.get("internal.metrics.shuffle.write.bytesWritten", 0),
                    "in_b": acc.get("internal.metrics.input.bytesRead", 0),
                }

    for name in names:
        tag = f"PROFILE:{name}"
        qjobs = [
            (jid, j) for jid, j in sorted(jobs.items()) if j["desc"] == tag
        ]
        print(f"\n=== {name}: wall {marks[name]:.3f}s, {len(qjobs)} jobs ===")
        for jid, j in qjobs:
            dur = (j.get("t1", j["t0"]) - j["t0"]) / 1000.0
            print(f"  job {jid}: {dur:7.3f}s")
            for sid in sorted(j["stages"]):
                s = stages.get(sid)
                if not s:
                    continue  # skipped stage (reused exchange)
                print(
                    f"    stage {sid}: {s['ms']/1000.0:7.3f}s"
                    f" tasks={s['tasks']:<4}"
                    f" in={int(s['in_b'] or 0)//1024:>8}K"
                    f" sr={int(s['shuf_r'] or 0)//1024:>8}K"
                    f" sw={int(s['shuf_w'] or 0)//1024:>8}K"
                    f"  {s['name'][:60]}"
                )


if __name__ == "__main__":
    main()
