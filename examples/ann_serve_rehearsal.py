#!/usr/bin/env python
"""Streaming ANN serving at scale (round-10: the last streaming twin
proven only at test scale).  The seeded corpus's vectors are indexed
ONCE with ``write_lsh_index``; a feed of query batches is then answered
per micro-batch by ``make_ann_serve_handler`` — the same handler the
readStream path wraps — with per-batch latency recorded, a mid-serve
``append_to_lsh_index`` whose vectors must be visible to the very next
batch, and a self-recall assertion every batch (a query drawn from the
corpus hashes into its own buckets in every table, so it must return
ITSELF at rank 1 with cos 1.0 — a per-batch end-to-end probe, not a
sampled spot check).

What the 1× vs 10× comparison shows — and the trap it measures: per
query the candidate set is ~n_tables × (corpus / 2^n_planes), so at
FIXED planes the serve cost is CORPUS-sized, not query-sized (first
10× attempt: 171 s/batch at n_planes=4 — every bucket held ~12k
vectors).  The planes count is the scale dial: this rehearsal sizes
``n_planes = log2(corpus / target_occupancy)`` so per-bucket occupancy
(hence per-batch latency) stays ~flat as the corpus grows.  Self-recall
is unaffected by more planes (an identical vector lands in identical
buckets in every table), which is why the per-batch assertion stays
exact while near-neighbor recall/latency trades off via planes —
exactly the dial a production deployment tunes.

``--mode pq`` (round-11 verdict #6) rehearses the OTHER 100 TB serving
shape: the corpus is PQ-encoded ONCE into driver-side m-byte codes
(``pq_encode_corpus`` — 8 MB per million vectors at m=8, small enough
to broadcast to every executor), and each query batch scores against
the broadcast codes in a narrow ``pq_serve_stream`` map — no index
join, no shuffle, per-batch cost = queries × corpus-codes ADC, which is
the structural difference from LSH serving (bucket-join, cost =
queries × occupancy).  Mid-serve maintenance appends a held-out slice
by encoding it UNDER THE EXISTING CODEBOOKS (the append_to_pq_index
discipline, driver-array form) — the very next batch must get those
vectors back.  Self-recall here leans on quantization, not hashing —
and PQ is LOSSY, so the per-batch gate asserts self-in-top-k (wide
margin) while the rank-1 rate is reported: at 50k vectors a numpy sim
measured rank 1 for 500/500 queries, but the 196k run caught one query
in ~2500 slipping to rank 2 — quantization physics, not a bug; self
OUTSIDE top-k would mean broken encode/serve arithmetic and fails the
run.

``--mode ivf`` (round-11) completes the serving trio with the
COARSE-PRUNED shape: the corpus is assigned once into an inverted file
(``write_ivf_index`` — occupancy-sized quantizer, cells ≈ corpus/500,
which at 10× crosses ``_LITERAL_CELL_RANK_MAX`` and exercises BOTH
constant-plan forms: the Arrow write-side assignment and the broadcast
probe-side cell ranking), and each query batch runs
``ivf_topk_against_index`` — per-batch cost = queries × (n_probe ×
occupancy), query-sized like LSH but with EXACT cosine inside the
probed cells instead of hash-bucket candidates.  Mid-serve maintenance
appends a held-out slice under the FROZEN centroids
(``append_to_ivf_index`` — the drift-caveat workflow) whose vectors the
very next batch must return.  Self-recall: the appended/indexed
query's own cell is its query-time nearest cell, so with exact scoring
self-in-top-k must hold every batch; rank-1 is reported (an exact-dup
vector pair can tie at cos 1.0 and lose the id tie-break).

``--mode layered`` (round-12 verdict #2) composes all three legs into
the stated 100 TB production shape — IVF coarse prune → broadcast-codes
ADC over only the probed cells' code slices → exact re-rank of the
bounded shortlist against the partition-pruned vector parquet — and
measures it against the PQ mode's corpus-sized ADC cost at the same
scale.  Layering compounds two lossy stages (true neighbor outside the
probed cells, or inside them but cut from the ADC shortlist), so unlike
the single-leg modes this rehearsal REPORTS recall against exact
brute-force cosine (computed untimed, driver-side) for a steady batch
and for the appended batch, instead of asserting it; the per-batch GATE
stays self-in-top-k (own cell is the query-time nearest by
construction, so a miss means broken assignment/encode/re-rank
arithmetic, not physics).  Mid-serve maintenance appends the held-out
slice under the FROZEN coarse centers and codebooks
(``append_to_pq_ivf_index``) — the very next batch must return those
vectors.

``--clustered [K]`` (round-12 verdict #2 / round-13) swaps the seeded
slice's near-uniform embeddings — IVF's WORST case, where the measured
10× recall ceiling was ~0.32 because true neighbors scatter over cells
— for a seeded mixture of K Gaussians (default 128; centers spread 10,
within-cluster sigma 1 at dim 64), generated DISTRIBUTED with per-id
deterministic noise.  This is the regime the layered shape is actually
deployed for (real embedding corpora cluster; that is IVF's premise),
so the layered mode's achieved-vs-ceiling recall decomposition gets a
measured point where the premise holds.  ``--n-probe N`` sets the
layered probe width (default 3) so the ceiling can be read at several
points; on clustered runs the build also prints
``n_probe_for_target``'s measured sizing recommendation for a 0.9
ceiling target.

``--scanned`` (layered mode, round-12 verdict #4) rehearses the
past-broadcast-cap lifecycle END TO END: build with
``return_artifacts=False`` (no driver arrays), serve through
``layered_topk_scanned`` (codes scanned from the cell-partitioned
parquet), and append through the DISTRIBUTED ``append_to_pq_ivf_index``
path (``index=None`` — quantizers read from the sidecars, encoded rows
written straight to the partitioned parquet, with an in-run probe
asserting no collected frame carries codes).  Nothing corpus-sized
touches the driver at any lifecycle step.

Usage: python examples/ann_serve_rehearsal.py [--scale N]
                                              [--mode lsh|pq|ivf|layered]
                                              [--clustered [K]]
                                              [--n-probe N] [--scanned]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_SERVE_BATCHES = 8
TOPK = 5
_TBL = "ann_serve_rehearsal_idx"


def serve_pq(spark, corpus, queries, held_out, work: str) -> None:
    """The PQ-mode serve loop: broadcast-codes ADC scoring per batch,
    with a mid-serve codebook-preserving append and a strict rank-1
    self-recall assertion every batch."""
    import numpy as np

    from video_etl_spark.llm_ops.similarity import (
        _pq_encode_frame,
        pq_encode_corpus,
        pq_serve_stream,
    )

    n_corpus = corpus.count()
    t0 = time.perf_counter()
    books, ids, codes = pq_encode_corpus(corpus, m=8, ksub=16)
    print(f"pq encode over {n_corpus} vectors (codes "
          f"{codes.nbytes / 1e6:.1f} MB driver-side, broadcast per batch): "
          f"{time.perf_counter() - t0:.1f}s")
    assert len(ids) == n_corpus

    state = {"ids": ids, "codes": codes}

    def serve(batch_df, b: int, label: str) -> None:
        n_q = batch_df.count()  # before the timer (round-10 review)
        t = time.perf_counter()
        out = pq_serve_stream(
            batch_df.withColumnRenamed("vec_id", "query_id"),
            books, state["ids"], state["codes"], k=TOPK,
        ).withColumn("batch_id", F.lit(b))
        out.write.mode("append").parquet(f"{work}/answers")
        dt = time.perf_counter() - t
        ans = spark.read.parquet(f"{work}/answers").where(f"batch_id = {b}")
        # self-recall through the QUANTIZER: PQ is lossy, so unlike the
        # LSH twin there is NO structural rank-1 guarantee — at 196k
        # corpus the first 10× run measured exactly one query in ~2500
        # whose quantized self-score lost rank 1 to another vector's
        # code.  The GATE is therefore top-k containment (a 1-in-few-
        # thousand rank-2 slip is quantization physics; self outside
        # top-k would mean broken encode/serve arithmetic), and the
        # rank-1 rate is REPORTED so a real recall regression still
        # shows in the log.
        in_topk = ans.where(
            f"rn <= {TOPK} and neighbor_id = query_id"
        ).count()
        rank1 = ans.where("rn = 1 and neighbor_id = query_id").count()
        assert in_topk == n_q, (b, in_topk, n_q)
        print(f"  batch {b} [{label:9s}] {n_q:5d} queries {dt:5.1f}s "
              f"(self in top-{TOPK} {in_topk}/{n_q}, rank-1 {rank1})")

    for b in range(N_SERVE_BATCHES):
        if b == N_SERVE_BATCHES // 2:
            # mid-serve maintenance: encode the held-out slice UNDER THE
            # EXISTING CODEBOOKS (never refit — the append_to_pq_index
            # discipline in driver-array form) and extend the broadcast
            # arrays; the very next batch queries those vectors
            n_held = held_out.count()
            t = time.perf_counter()
            new_rows = _pq_encode_frame(
                held_out, books, "vec_id", "embedding", normalize=True
            ).collect()
            state["ids"] = np.concatenate(
                [state["ids"],
                 np.array([r["neighbor_id"] for r in new_rows], np.int64)]
            )
            state["codes"] = np.concatenate(
                [state["codes"],
                 np.stack([
                     np.frombuffer(r["code"], dtype=np.uint8)
                     for r in new_rows
                 ])]
            )
            dt = time.perf_counter() - t
            print(f"  pq append ({n_held} vecs, existing codebooks): "
                  f"{dt:.1f}s")
            serve(held_out, b, "appended")
            continue
        serve(
            queries.filter(
                F.col("vec_id") % (50 * N_SERVE_BATCHES) == 50 * b
            ),
            b,
            "steady",
        )
    n_ans = spark.read.parquet(f"{work}/answers").count()
    print(f"answer log: {n_ans} rows across {N_SERVE_BATCHES} batches")


def clustered_embeddings(spark, n: int, dim: int = 64, k: int = 128,
                         seed: int = 17):
    """Seeded mixture-of-Gaussians embedding table, generated in one
    distributed pass: component centers ~N(0, 10) driver-side (k × dim —
    tiny, closed over), each row's component and unit-sigma noise drawn
    from a generator seeded by (seed, vec_id) so any executor produces
    bit-identical rows for the same ids — reproducible without driver
    materialization, re-runnable per batch."""
    import numpy as np
    import pandas as pd

    centers = np.random.default_rng(seed).normal(0.0, 10.0, size=(k, dim))

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = []
            for i in ids:
                rng = np.random.default_rng([seed, int(i)])
                c = int(rng.integers(0, k))
                vecs.append((centers[c] + rng.normal(size=dim)).tolist())
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    return (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, "vec_id long, embedding array<double>")
    )


def serve_layered(spark, corpus, queries, held_out, work: str,
                  n_probe: int = 3, mix_k: "int | None" = None,
                  scanned: bool = False) -> None:
    """The composed serve loop: one build pass assigns cells + encodes,
    each batch runs coarse prune → ADC over probed cells → exact
    re-rank; mid-serve frozen-quantizer append; self-in-top-k gate with
    rank-1 reported; recall vs exact brute force REPORTED (untimed) for
    one steady batch and the appended batch."""
    import numpy as np

    from video_etl_spark.llm_ops.similarity import (
        append_to_pq_ivf_index,
        layered_topk_against_index,
        write_pq_ivf_index,
    )

    n_corpus = corpus.count()
    # same occupancy dial as the IVF mode (~500 vectors/cell); PQ at
    # PRODUCTION resolution (ksub=256 — still 1 byte/code, the whole
    # point of uint8 codes).  Measured ladder at 1× (recall@5 vs the
    # 0.444 coarse-prune ceiling): ksub=16/shortlist=20 → 0.292;
    # ksub=16/shortlist=50 → 0.336; ksub=256/shortlist=50 → 0.432 ≈
    # ceiling — i.e. at production resolution the ADC+shortlist stage
    # loses almost nothing and the remaining loss is coarse pruning on
    # a near-uniform corpus (IVF's worst case), which n_probe controls.
    n_cells = max(8, n_corpus // 500)
    # shortlist depth is THE dial on dup-dense/clustered data (the r12
    # test measured this on the lobe corpus): within a tight cluster the
    # PQ codes cannot separate members at the noise scale, so the ADC
    # cut must be at least cluster-occupancy deep or self (and true
    # neighbors) fall to the (approx desc, id asc) tie-break.  Clustered
    # runs size it at 2× the mean component occupancy — still a tiny
    # fraction of the corpus (the whole point vs corpus-sized ADC).
    shortlist = (
        10 * TOPK if mix_k is None
        else max(10 * TOPK, 2 * n_corpus // mix_k)
    )
    clustered = mix_k is not None
    path = f"{work}/layered"
    t0 = time.perf_counter()
    # --scanned rehearses the past-broadcast-cap regime END TO END: the
    # build returns no driver arrays, the serve scans the codes, and the
    # append writes encoded rows straight to the cell-partitioned
    # parquet (index=None) — nothing corpus-sized ever materializes on
    # the driver at ANY lifecycle step (round-12 verdict #4)
    state = {"idx": write_pq_ivf_index(
        corpus, path, m=8, ksub=256, n_centroids=n_cells,
        return_artifacts=not scanned,
    )}
    codes_note = (
        "codes stay on disk (scanned form, no driver arrays)"
        if scanned
        else f"codes {state['idx'].codes.nbytes / 1e6:.1f} MB broadcast "
             "per batch"
    )
    print(f"layered build over {n_corpus} vectors (n_centroids={n_cells}, "
          f"~{n_corpus // n_cells}/cell, {codes_note}, "
          f"n_probe={n_probe} -> ~{n_probe / n_cells:.1%} of codes "
          f"ADC-scored per query, shortlist={shortlist}): "
          f"{time.perf_counter() - t0:.1f}s")
    if clustered:
        # the sizing helper's measured recommendation (round-12 #2):
        # what n_probe a 0.9 coarse-prune ceiling actually needs here
        from video_etl_spark.llm_ops.similarity import n_probe_for_target

        t0 = time.perf_counter()
        # sample modulus scales with the corpus so the ~500-query sample
        # stays under max_queries at ANY --scale (a fixed % 400 would
        # overflow past ~40×)
        mod = max(1, n_corpus // 500)
        try:
            rec, curve = n_probe_for_target(
                spark, corpus.filter(f"vec_id % {mod} = 0"), path,
                target_recall=0.9, k=TOPK, max_queries=2048,
            )
            pts = {p: round(curve[p], 3)
                   for p in (1, 2, 3, 4, 6, 8) if p in curve}
            print(f"  n_probe_for_target(0.9): n_probe={rec} "
                  f"(measured ceiling curve {pts}, "
                  f"{time.perf_counter() - t0:.1f}s untimed)")
        except ValueError as exc:
            # only the helper's unreachable-target signal is a measured
            # result; validation errors (sample bound, bad args) are
            # setup bugs and must crash the rehearsal, not masquerade
            # as "the corpus does not cluster"
            if "does not cluster" not in str(exc):
                raise
            print(f"  n_probe_for_target(0.9): UNREACHABLE — {exc}")

    # exact-recall reference: the normalized corpus, driver-side, used
    # UNTIMED — at 10x this is ~100 MB; the reference exists for honest
    # recall reporting, production never materializes it
    ref = {"ids": None, "mat": None}

    def recall_vs_exact(batch_df, ans) -> tuple[float, float]:
        """(achieved recall@TOPK, coarse-prune CEILING recall@TOPK) vs
        exact brute force.  The ceiling is exact cosine restricted to
        the probed cells' members — what a lossless second stage would
        score — so the gap achieved→ceiling isolates the ADC/shortlist
        loss from the coarse-prune loss the n_probe dial controls."""
        if ref["ids"] is None:
            rows = (
                corpus.unionByName(held_out)
                .select("vec_id", "embedding")
                .collect()
            )
            ref["ids"] = np.array([r["vec_id"] for r in rows], np.int64)
            mat = np.stack(
                [np.array(r["embedding"]) for r in rows]
            ).astype(np.float64)
            ref["mat"] = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        all_pos = {int(v): i for i, v in enumerate(ref["ids"])}
        idx = state["idx"]
        # the reference is the CURRENTLY-INDEXED set in index order (the
        # only vectors any serve could return; cell alignment is free),
        # so pre-append recall is not charged for vectors not yet indexed
        ids = idx.ids
        mat = ref["mat"][[all_pos[int(i)] for i in ids]]
        pos = {int(v): i for i, v in enumerate(ids)}
        cell_by_pos = idx.cells
        cmat = idx.centers
        cn2 = (cmat**2).sum(axis=1)
        got: dict[int, set] = {}
        for r in ans.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        q_ids = [int(r["vec_id"]) for r in batch_df.select("vec_id").collect()]
        hits = ceil_hits = total = 0
        for s in range(0, len(q_ids), 256):
            chunk = q_ids[s : s + 256]
            qpos = [pos[q] for q in chunk]
            sims = mat @ mat[qpos].T  # (n, chunk)
            probed = np.argsort(
                cn2[None, :] - 2.0 * (mat[qpos] @ cmat.T),
                axis=1, kind="stable",
            )[:, :n_probe]
            for j, q in enumerate(chunk):
                cos = sims[:, j]
                top = np.argpartition(-cos, TOPK)[:TOPK]
                exact_ids = {int(ids[i]) for i in top}
                hits += len(got.get(q, set()) & exact_ids)
                cand = np.flatnonzero(np.isin(cell_by_pos, probed[j]))
                keep = min(TOPK, len(cand))
                ctop = cand[np.argpartition(-cos[cand], keep - 1)[:keep]]
                ceil_hits += len({int(ids[i]) for i in ctop} & exact_ids)
                total += TOPK
        return hits / total, ceil_hits / total

    def serve(batch_df, b: int, label: str, measure_recall: bool) -> None:
        n_q = batch_df.count()  # before the timer (round-10 review)
        t = time.perf_counter()
        if scanned:
            from video_etl_spark.llm_ops.similarity import (
                layered_topk_scanned,
            )

            out = layered_topk_scanned(
                spark, batch_df, path, k=TOPK,
                n_probe=n_probe, shortlist=shortlist,
            ).withColumn("batch_id", F.lit(b))
        else:
            out = layered_topk_against_index(
                spark, batch_df, path, index=state["idx"], k=TOPK,
                n_probe=n_probe, shortlist=shortlist,
            ).withColumn("batch_id", F.lit(b))
        out.write.mode("append").parquet(f"{work}/answers")
        dt = time.perf_counter() - t
        # the re-rank localCheckpoints its bounded shortlist (released
        # via GC) — nothing accumulates in the session cache per batch
        ans = spark.read.parquet(f"{work}/answers").where(f"batch_id = {b}")
        in_topk = ans.where(
            f"rn <= {TOPK} and neighbor_id = query_id"
        ).count()
        rank1 = ans.where("rn = 1 and neighbor_id = query_id").count()
        # own cell is the query-time nearest cell by construction and the
        # exact pass restores cos 1.0, so self OUTSIDE top-k means broken
        # assignment/encode/re-rank arithmetic — the one non-physics
        # failure mode; shortlist-cut physics would show here first
        assert in_topk == n_q, (b, in_topk, n_q)
        rec = ""
        if measure_recall:
            r, ceil = recall_vs_exact(batch_df, ans)
            rec = (f", recall@{TOPK} vs exact {r:.3f} / coarse-prune "
                   f"ceiling {ceil:.3f} (untimed)")
        print(f"  batch {b} [{label:9s}] {n_q:5d} queries {dt:5.1f}s "
              f"(self in top-{TOPK} {in_topk}/{n_q}, rank-1 {rank1}{rec})")

    for b in range(N_SERVE_BATCHES):
        if b == N_SERVE_BATCHES // 2:
            # mid-serve maintenance: append under the FROZEN coarse
            # centers and codebooks — the very next batch queries those
            # vectors, and this is the batch the PQ mode measured at
            # ~50 s corpus-sized ADC (the number the composition exists
            # to beat)
            n_held = held_out.count()
            t = time.perf_counter()
            if scanned:
                # distributed append: quantizers read from the sidecars,
                # encoded rows written straight to the cell-partitioned
                # parquet — confirm NO collected frame carries codes
                # (the rehearsal-grade twin of the pytest probe)
                from pyspark.sql import DataFrame as _SDF

                real_collect, seen = _SDF.collect, []

                def probe(self):
                    seen.append([f.name for f in self.schema.fields])
                    return real_collect(self)

                _SDF.collect = probe
                try:
                    assert append_to_pq_ivf_index(held_out, path) is None
                finally:
                    _SDF.collect = real_collect
                assert not any("code" in c for c in seen), seen
                note = "distributed, no driver codes"
            else:
                state["idx"] = append_to_pq_ivf_index(
                    held_out, path, state["idx"]
                )
                note = "frozen quantizers"
            print(f"  layered append ({n_held} vecs, {note}): "
                  f"{time.perf_counter() - t:.1f}s")
            serve(held_out, b, "appended", measure_recall=not scanned)
            continue
        serve(
            queries.filter(
                F.col("vec_id") % (50 * N_SERVE_BATCHES) == 50 * b
            ),
            b,
            "steady",
            # recall needs the driver arrays; the scanned form is
            # bit-identical to broadcast (test-pinned), so its recall
            # IS the broadcast runs' number
            measure_recall=(b == 1 and not scanned),
        )
    n_ans = spark.read.parquet(f"{work}/answers").count()
    print(f"answer log: {n_ans} rows across {N_SERVE_BATCHES} batches")


def serve_ivf(spark, corpus, queries, held_out, work: str) -> None:
    """The IVF-mode serve loop: occupancy-sized coarse quantizer built
    once, per-batch cell-ranked probe against the persisted inverted
    file, mid-serve frozen-centroid append, self-in-top-k gate every
    batch with the rank-1 rate reported."""
    from video_etl_spark.llm_ops.similarity import (
        append_to_ivf_index,
        ivf_topk_against_index,
        write_ivf_index,
    )

    n_corpus = corpus.count()
    # occupancy-sized quantizer: ~500 vectors/cell keeps the probed scan
    # (n_probe × occupancy rows per query) flat as the corpus grows —
    # the same dial as LSH planes; at 10× this crosses the literal
    # threshold and the build runs the constant-plan Arrow assignment
    n_cells = max(8, n_corpus // 500)
    path = f"{work}/ivf"
    t0 = time.perf_counter()
    write_ivf_index(corpus, path, n_centroids=n_cells)
    print(f"ivf build over {n_corpus} vectors (n_centroids={n_cells}, "
          f"~{n_corpus // n_cells}/cell, "
          f"{'arrow' if n_cells > 64 else 'literal'} assignment): "
          f"{time.perf_counter() - t0:.1f}s")

    def serve(batch_df, b: int, label: str) -> None:
        n_q = batch_df.count()  # before the timer (round-10 review)
        t = time.perf_counter()
        out = ivf_topk_against_index(
            spark, batch_df.withColumnRenamed("vec_id", "query_id"),
            path, k=TOPK, n_probe=3, id_col="query_id",
        ).withColumn("batch_id", F.lit(b))
        out.write.mode("append").parquet(f"{work}/answers")
        dt = time.perf_counter() - t
        # the probe pins its probed-cells frame by design; release
        # between batches so serve storage stays flat over a long run
        spark.catalog.clearCache()
        ans = spark.read.parquet(f"{work}/answers").where(f"batch_id = {b}")
        in_topk = ans.where(
            f"rn <= {TOPK} and neighbor_id = query_id"
        ).count()
        rank1 = ans.where("rn = 1 and neighbor_id = query_id").count()
        # exact scoring within probed cells + own cell always probed:
        # self OUTSIDE top-k means broken assignment/probe arithmetic
        assert in_topk == n_q, (b, in_topk, n_q)
        print(f"  batch {b} [{label:9s}] {n_q:5d} queries {dt:5.1f}s "
              f"(self in top-{TOPK} {in_topk}/{n_q}, rank-1 {rank1})")

    for b in range(N_SERVE_BATCHES):
        if b == N_SERVE_BATCHES // 2:
            # mid-serve maintenance: assign the held-out slice under the
            # FROZEN centroids (append_to_ivf_index's drift-caveat
            # workflow) — the very next batch queries those vectors
            n_held = held_out.count()
            t = time.perf_counter()
            append_to_ivf_index(held_out, path)
            print(f"  ivf append ({n_held} vecs, frozen centroids): "
                  f"{time.perf_counter() - t:.1f}s")
            serve(held_out, b, "appended")
            continue
        serve(
            queries.filter(
                F.col("vec_id") % (50 * N_SERVE_BATCHES) == 50 * b
            ),
            b,
            "steady",
        )
    n_ans = spark.read.parquet(f"{work}/answers").count()
    print(f"answer log: {n_ans} rows across {N_SERVE_BATCHES} batches")


def main() -> None:
    scale, mode = 1, "lsh"
    if "--scale" in sys.argv:
        try:
            scale = int(sys.argv[sys.argv.index("--scale") + 1])
        except (IndexError, ValueError):
            raise SystemExit(
                "usage: ann_serve_rehearsal.py [--scale N] [--mode lsh|pq|ivf]"
            ) from None
    if "--mode" in sys.argv:
        mode = sys.argv[sys.argv.index("--mode") + 1]
        if mode not in ("lsh", "pq", "ivf", "layered"):
            raise SystemExit(
                "usage: ann_serve_rehearsal.py [--scale N] "
                "[--mode lsh|pq|ivf|layered] [--clustered [K]] "
                "[--n-probe N]"
            )
    clustered, mix_k = False, 128
    if "--clustered" in sys.argv:
        clustered = True
        nxt = sys.argv[sys.argv.index("--clustered") + 1:][:1]
        # bare flag (end of argv or another --flag) keeps the default;
        # a present-but-malformed value is a loud usage error, not a
        # silent 128 (the user would benchmark the wrong mixture)
        if nxt and not nxt[0].startswith("-"):
            try:
                mix_k = int(nxt[0])
            except ValueError:
                raise SystemExit(
                    f"--clustered takes an integer component count, "
                    f"got {nxt[0]!r}"
                ) from None
    n_probe = 3
    if "--n-probe" in sys.argv:
        try:
            n_probe = int(sys.argv[sys.argv.index("--n-probe") + 1])
        except (IndexError, ValueError):
            raise SystemExit("--n-probe takes an integer") from None
    scanned = "--scanned" in sys.argv
    if clustered and mode != "layered":
        # only the layered serve sizes its shortlist for cluster
        # occupancy; the single-leg modes' self-recall asserts would
        # trip on within-cluster PQ/hash ties (physics, not a bug) and
        # report it as a failure
        raise SystemExit("--clustered is a layered-mode rehearsal "
                         "(use --mode layered)")

    from examples.scale_rehearsal import ensure_seeded_slice
    from video_etl_spark.llm_ops.similarity import (
        append_to_lsh_index,
        write_lsh_index,
    )
    from video_etl_spark.session import get_spark, load_table
    from video_etl_spark.streaming.ann_serve import make_ann_serve_handler

    spark = get_spark("ann-serve-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = ensure_seeded_slice(spark, scale)

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    if clustered:
        # same ids/count as the seeded slice, clustered geometry: the
        # regime the layered shape deploys into (see module docstring);
        # localCheckpoint pins the generated rows so every consumer
        # (build, queries, recall reference) sees ONE corpus
        n_emb = emb.count()
        emb = clustered_embeddings(spark, n_emb, k=mix_k).localCheckpoint()
        print(f"clustered corpus: {n_emb} vectors, mixture of {mix_k} "
              "Gaussians (spread 10, sigma 1, dim 64, seeded)")
    # roles: the indexed corpus, the streamed query feed (drawn FROM the
    # corpus so per-batch self-recall is assertable), and a held-out
    # slice appended MID-serve (excluded from the initial index so its
    # later visibility proves the append, not the build)
    corpus = emb.filter("vec_id % 50 != 25")
    queries = emb.filter("vec_id % 50 = 0")
    held_out = emb.filter("vec_id % 50 = 25")

    if mode in ("pq", "ivf", "layered"):
        work = tempfile.mkdtemp(prefix=f"ann_serve_rehearsal_{mode}_")
        try:
            if mode == "layered":
                serve_layered(spark, corpus, queries, held_out, work,
                              n_probe=n_probe,
                              mix_k=mix_k if clustered else None,
                              scanned=scanned)
            else:
                {"pq": serve_pq, "ivf": serve_ivf}[mode](
                    spark, corpus, queries, held_out, work
                )
        finally:
            shutil.rmtree(work, ignore_errors=True)
            spark.stop()
        return

    work = tempfile.mkdtemp(prefix="ann_serve_rehearsal_")
    try:
        import math

        # size the hash width to the corpus: ~500 vectors/bucket keeps
        # the per-query candidate set (n_tables × occupancy) flat as the
        # corpus grows — the scale dial the module docstring explains
        n_corpus = corpus.count()
        n_planes = max(4, math.ceil(math.log2(max(2, n_corpus // 500))))
        t0 = time.perf_counter()
        write_lsh_index(
            corpus, _TBL, f"{work}/idx", n_buckets=32, n_planes=n_planes
        )
        print(f"index build over {n_corpus} vectors (n_planes={n_planes}, "
              f"~{n_corpus >> n_planes} per bucket): "
              f"{time.perf_counter() - t0:.1f}s")

        handler = make_ann_serve_handler(
            spark.table(_TBL),
            spark.table(f"{_TBL}_vecs"),
            spark.table(f"{_TBL}_params"),
            f"{work}/answers",
            k=TOPK,
        )

        def serve(batch_df, b: int, label: str) -> None:
            t = time.perf_counter()
            handler(batch_df, b)
            dt = time.perf_counter() - t
            ans = spark.read.parquet(f"{work}/answers").where(
                f"batch_id = {b}"
            )
            # self-recall: every query is an indexed vector, so rank 1
            # must be the query itself at cos 1.0 (identical buckets in
            # every table -> always a candidate; random floats make an
            # accidental duplicate vector ~impossible)
            n_q = batch_df.count()
            self_hits = ans.where(
                "rn = 1 and neighbor_id = query_id and cos_sim > 0.999999"
            ).count()
            assert self_hits == n_q, (b, self_hits, n_q)
            print(f"  batch {b} [{label:9s}] {n_q:5d} queries {dt:5.1f}s "
                  f"(self-recall {self_hits}/{n_q})")

        for b in range(N_SERVE_BATCHES):
            if b == N_SERVE_BATCHES // 2:
                # mid-serve maintenance: append the held-out slice; the
                # very next batch queries THOSE vectors and must get
                # them back at rank 1 — append visibility end-to-end.
                # The count runs BEFORE the timer (round-10 review: an
                # f-string count job inside the timed window inflated
                # the recorded append cost)
                n_held = held_out.count()
                t = time.perf_counter()
                append_to_lsh_index(held_out, _TBL)
                dt = time.perf_counter() - t
                print(f"  append_to_lsh_index({n_held} vecs): {dt:.1f}s")
                serve(held_out, b, "appended")
                continue
            serve(
                queries.filter(
                    F.col("vec_id") % (50 * N_SERVE_BATCHES) == 50 * b
                ),
                b,
                "steady",
            )
        n_ans = spark.read.parquet(f"{work}/answers").count()
        print(f"answer log: {n_ans} rows across {N_SERVE_BATCHES} batches")
    finally:
        for sfx in ("", "_vecs", "_params", "_planes"):
            spark.sql(f"DROP TABLE IF EXISTS {_TBL}{sfx}")
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
