#!/usr/bin/env python
"""E3 offline tuning demo (SURVEY.md §3 E3, reference `knob_tuner.py:413-416`).

Composes the full offline loop on a small knob lattice:

1. hill-climbing starts (U19) propose local optima on the
   score = accuracy - eta * cost surface;
2. the exact lattice fans out for evaluation as a Spark job
   (`evaluate_assignments`), each candidate priced by the runtime
   simulator (U20) on the detect->track DAG;
3. the A9 Pareto frontier and A10 arg-best reductions pick the
   cost/quality frontier and the optimal config.

Usage: python examples/run_tuning.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from video_etl_spark.control.simulator import detect_to_track, simulate
from video_etl_spark.control.tuner import Knob, MultiKnob, run_tuning_pipeline
from video_etl_spark.session import get_spark


def main() -> None:
    spark = get_spark("video-etl-spark-tuning")
    spark.sparkContext.setLogLevel("ERROR")

    mk = MultiKnob(
        [
            Knob("detect_every", [30, 60, 120]),
            Knob("cores", [2, 4, 8]),
        ]
    )
    acc_table = {30: 0.95, 60: 0.90, 120: 0.70}

    def eval_fn(assignment):
        knob, cores = assignment
        runtime, _cloud = simulate(detect_to_track(knob, 120), cores=cores)
        return acc_table[knob], runtime / 1e5

    result = run_tuning_pipeline(
        spark, mk, eval_fn, eta=0.5, starts=[[120, 2], [30, 8], [60, 4]]
    )

    best = result["best"]
    print(f"\nbest config : {mk.dehash(best['assign_hash'])}")
    print(f"best score  : {best['score']:.4f} "
          f"(accuracy={best['accuracy']:.2f}, cost={best['cost']:.4f})")
    print("\npareto frontier (accuracy vs cost):")
    for r in sorted(result["pareto"].collect(), key=lambda r: r["cost"]):
        print(f"  {mk.dehash(r['assign_hash'])}  "
              f"acc={r['accuracy']:.2f} cost={r['cost']:.4f}")
    print("\nhill climbs (start -> reached):")
    for cfg, score in result["climbed"]:
        print(f"  -> {cfg} score={score:.4f}")
    spark.stop()


if __name__ == "__main__":
    main()
