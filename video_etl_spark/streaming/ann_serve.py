"""Streaming ANN serving against the persisted LSH index (SURVEY §2.8 ⊕
U22 — the online twin of ``llm_ops.similarity.lsh_topk_against_index``,
completing the pattern the other index modalities already have: batch
probe + streaming probe over the same write-once artifact).

A continuous feed of query vectors (user queries, fresh crawl embeddings
looking for their nearest training examples) is answered per micro-batch
by the SAME probe the batch path uses: hash the batch's queries with the
params the index persists, equi-join the bucketed bucket table, exact
cosine re-rank against the bucketed vector sidecar.  The index side never
reshuffles (bucketed reads, plan-asserted in the batch tests) and is
never re-derived per batch — the handler captures the three static index
frames once at build time.

Semantics contract: top-k is PER QUERY, so as long as each query_id
arrives in exactly one micro-batch the per-batch results equal the
one-shot batch probe over the union of all queries (tested).  A retried
batch rewrites its own ``batch_id`` partition (dynamic overwrite — the
repo's standard idempotent-retry discipline); a query_id re-sent in a
LATER batch re-emits its rows under the new batch_id, which is the
at-least-once answer-log semantics an ANN serving sink wants.

At 100 TB the per-batch cost is query-sized (batch buckets + candidate
join + bounded re-rank); the corpus appears only through the bucketed
index reads.  The ``max_queries`` broadcast bound of the batch probe
applies per micro-batch, which is exactly the granularity it protects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from video_etl_spark.llm_ops.similarity import lsh_topk_against_index


def _write_answer_log(hits: DataFrame, batch_id: int, out_dir: str) -> None:
    """THE answer-log sink every serve handler shares: batch_id-
    partitioned dynamic overwrite, so a foreachBatch retry replaces
    exactly its own partition (idempotent) and a query re-sent in a
    later batch re-emits under the new batch_id (at-least-once answer
    log).  One definition so a contract change cannot silently diverge
    between the LSH, layered-broadcast, and layered-scanned handlers."""
    (
        hits.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out_dir)
    )


def make_ann_serve_handler(
    buckets: DataFrame,
    vectors: DataFrame,
    params: DataFrame,
    out_dir: str,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes_df: DataFrame | None = None,
):
    """Per-micro-batch step, exposed for direct testing (retry
    idempotence) and custom pipelines.  ``buckets``/``vectors``/
    ``params`` are the three ``write_lsh_index`` tables (static frames,
    captured once); for an external-planes index pass its
    ``{table}_planes`` sidecar as ``planes_df`` — the probe refuses the
    md5 fallback for such an index (params records ``has_planes``), so
    forgetting it raises at BUILD time instead of silently serving
    garbage neighbors: the sidecar/params pairing is validated once
    here, before the stream starts (the per-batch probe re-reads these
    1-row/8-row control-plane frames, which is negligible next to the
    candidate join)."""
    from video_etl_spark.llm_ops.similarity import _planes_from_rows

    p = params.collect()[0]
    has_planes = bool(p.asDict().get("has_planes", False))
    if has_planes != (planes_df is not None):
        raise ValueError(
            "make_ann_serve_handler: this index "
            + ("was built with explicit planes — pass its {table}_planes "
               "sidecar as planes_df" if has_planes
               else "records md5-derived planes — planes_df does not "
               "belong to it")
        )
    if planes_df is not None:
        # completeness + shape fail here, not at first-batch time
        planes_arr = _planes_from_rows(planes_df.collect())
        if planes_arr.shape != (p["n_tables"], p["n_planes"], p["dim"]):
            raise ValueError(
                f"make_ann_serve_handler: planes sidecar shape "
                f"{planes_arr.shape} contradicts the params sidecar "
                f"({p['n_tables']}, {p['n_planes']}, {p['dim']})"
            )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        hits = lsh_topk_against_index(
            batch_df,
            buckets,
            vectors,
            params,
            k=k,
            id_col=id_col,
            vec_col=vec_col,
            planes_df=planes_df,
        )
        _write_answer_log(hits, batch_id, out_dir)

    return handle


def streaming_ann_serve(
    queries: DataFrame,
    buckets: DataFrame,
    vectors: DataFrame,
    params: DataFrame,
    out_dir: str,
    **kwargs,
):
    """Build the streaming ANN-serve writer over an (id, vector) stream.
    Returns a ``DataStreamWriter`` — caller sets checkpointLocation /
    trigger and calls ``start()``."""
    return queries.writeStream.foreachBatch(
        make_ann_serve_handler(buckets, vectors, params, out_dir, **kwargs)
    )


def make_layered_serve_handler(
    spark,
    path: str,
    out_dir: str,
    k: int = 10,
    n_probe: int = 8,
    shortlist: "int | None" = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index=None,
):
    """The LAYERED twin of :func:`make_ann_serve_handler` (round 12):
    per micro-batch, coarse prune → broadcast-codes ADC → exact
    re-rank against the persisted :func:`~video_etl_spark.llm_ops.
    similarity.write_pq_ivf_index` artifact, answers landed
    batch_id-partitioned with the same dynamic-overwrite retry
    idempotence and one-batch-per-query answer-log semantics.

    The driver artifacts load ONCE at build time (``index=`` accepts
    the build's return value to skip the re-read; after an
    ``append_to_pq_ivf_index`` between batches, build a NEW handler
    with the returned artifacts — the same carry discipline as the
    dedup generation rotation).  Nothing is left in the session cache
    per batch: the re-rank localCheckpoints its bounded shortlist
    (blocks release via GC/ContextCleaner), so this handler never runs
    a catalog-wide clearCache that would evict a co-tenant
    application's cached frames."""
    from video_etl_spark.llm_ops.similarity import (
        layered_topk_against_index,
        read_pq_ivf_index,
    )

    if index is None:
        index = read_pq_ivf_index(spark, path)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        hits = layered_topk_against_index(
            spark,
            batch_df,
            path,
            index=index,
            k=k,
            n_probe=n_probe,
            shortlist=shortlist,
            id_col=id_col,
            vec_col=vec_col,
        )
        _write_answer_log(hits, batch_id, out_dir)

    return handle


def make_layered_scanned_serve_handler(
    spark,
    path: str,
    out_dir: str,
    k: int = 10,
    n_probe: int = 8,
    shortlist: "int | None" = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 65_536,
):
    """The PAST-BROADCAST-CAP twin of :func:`make_layered_serve_handler`
    (round 13): per micro-batch, the same coarse prune → ADC → exact
    re-rank composition, but with the codes SCANNED from the
    cell-partitioned index parquet (``layered_topk_scanned``) instead of
    broadcast driver arrays — the serving form for corpora past
    ``read_pq_ivf_index``'s ``max_rows`` cap, where no driver artifacts
    can exist.  Completes the lifecycle symmetry of the scanned regime:
    build ``return_artifacts=False`` → serve through this handler →
    maintain with the distributed ``append_to_pq_ivf_index(new, path)``
    (appended vectors are visible to the very next batch with NO handler
    rebuild, because nothing index-sized is captured at build time —
    each batch scans the current generation) → fold with
    ``maybe_compact_pq_ivf`` in a quiesced window, then re-create the
    handler on the returned successor path.

    Same answer-log contract as every serve handler: batch_id-
    partitioned dynamic overwrite, so a foreachBatch retry replaces its
    own partition (idempotent), and one batch answers one query set."""
    from video_etl_spark.llm_ops.similarity import (
        _read_pq_ivf_sidecars,
        layered_topk_scanned,
    )

    # Fail at BUILD time on a typo'd/missing/incoherent index path (the
    # module's make_ann_serve_handler contract: validate before the
    # stream starts, not inside the first micro-batch).  The sidecars
    # are read and DISCARDED — bounded (1 params row, m×ksub books,
    # n_cells centers), and deliberately not captured: each batch
    # re-reads the current generation, which is what makes distributed
    # appends visible with no handler rebuild.
    _read_pq_ivf_sidecars(spark, path)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        hits = layered_topk_scanned(
            spark,
            batch_df,
            path,
            k=k,
            n_probe=n_probe,
            shortlist=shortlist,
            id_col=id_col,
            vec_col=vec_col,
            max_queries=max_queries,
        )
        _write_answer_log(hits, batch_id, out_dir)

    return handle
