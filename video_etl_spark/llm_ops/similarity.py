"""Approximate nearest-neighbor search over embedding columns
(SURVEY.md U22 — the scale path; the exact brute-force baseline is the
oracle-verified `knn_cosine_bruteforce` in queries/vectors.py).

Strategy: random-hyperplane LSH.  ``n_tables`` independent hash tables, each
hashing a vector to the sign-bit string of ``n_planes`` hyperplane dot
products.  Candidates are corpus vectors sharing a bucket with the query in
*any* table (union of equi-joins on (table, bucket) — shuffle on bucket key,
never a cross join); exact cosine re-ranking runs only on candidates.

Hyperplanes are derived deterministically from md5, so results are
reproducible across runs and engines.  The bucketing dot products run in a
vectorized Arrow pandas UDF (numpy matmul over the whole batch).

At 100 TB: the corpus-side bucket table is computed once and can be written
bucketed-by(bucket) to parquet; query batches then join without reshuffling
the corpus.  Recall tuning = more tables (recall ↑, cost ~linear) or fewer
planes (bucket size ↑).
"""

from __future__ import annotations

import hashlib
from typing import NamedTuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _planes(n_tables: int, n_planes: int, dim: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes in [-1, 1]."""
    out = np.empty((n_tables, n_planes, dim))
    for t in range(n_tables):
        for p in range(n_planes):
            for d in range(dim):
                h = hashlib.md5(f"plane|{t}|{p}|{d}".encode()).digest()
                out[t, p, d] = (int.from_bytes(h[:4], "big") % 2001 - 1000) / 1000.0
    return out


def _planes_from_rows(rows) -> np.ndarray:
    """Reassemble the (n_tables, n_planes, dim) hyperplane array from
    persisted ``{table}_planes`` rows — shared by the LSH probe and
    append so external-plane indexes hash queries with the planes they
    were built with.  Completeness is VALIDATED: the target array starts
    uninitialized, so a partially-committed or hand-repaired sidecar
    with a missing (table, plane) row would otherwise hash with
    whatever bytes np.empty left there — nondeterministic garbage with
    no exception."""
    if not rows:
        raise ValueError("planes sidecar is empty")
    n_tables = 1 + max(r["table_id"] for r in rows)
    n_planes = 1 + max(r["plane_id"] for r in rows)
    # bound the ids BEFORE building the expected grid: a single corrupt
    # row with table_id=2**31 would otherwise make the validator itself
    # allocate a 2**31-element set — OOM/hang instead of the loud raise
    # this function exists for.  Only raise here when an id is actually
    # IMPLAUSIBLE (negative, or >= the row count — a real grid's max id
    # is always < n_tables*n_planes <= len(rows) when complete); a
    # merely-incomplete grid (missing rows, ids all sane) must fall
    # through to the completeness check below, whose message lists the
    # missing cells (round-10 ADVICE: the old size-based bound hijacked
    # the common corrupt-sidecar case with a misleading out-of-range
    # error).  With max ids < len(rows) the expected grid below is
    # <= len(rows)^2 — bounded by what the caller already collected.
    if n_tables > len(rows) or n_planes > len(rows) or min(
        min(r["table_id"], r["plane_id"]) for r in rows
    ) < 0:
        raise ValueError(
            f"planes sidecar ids out of range: max table_id {n_tables - 1},"
            f" max plane_id {n_planes - 1} for {len(rows)} rows"
        )
    seen = {(r["table_id"], r["plane_id"]) for r in rows}
    expected = {(t, p) for t in range(n_tables) for p in range(n_planes)}
    if seen != expected or len(rows) != len(expected):
        raise ValueError(
            f"planes sidecar is incomplete or duplicated: {len(rows)} "
            f"rows for a ({n_tables}, {n_planes}) grid, missing "
            f"{sorted(expected - seen)[:4]}"
        )
    out = np.empty((n_tables, n_planes, len(rows[0]["plane"])))
    for r in rows:
        out[r["table_id"], r["plane_id"]] = r["plane"]
    return out


def _cos_expr(dot: str, denom: str) -> str:
    """THE zero-norm-safe cosine SQL expression every re-rank/score site
    binds (one definition, so a future change to the sentinel cannot
    leave some sites drifting): a zero-norm side makes ``denom`` 0 —
    under ANSI (Spark 4's default) a plain ``/`` raises DIVIDE_BY_ZERO
    mid-job, under non-ANSI it yields NaN, which Spark orders ABOVE
    every double in both sorts and comparison predicates (phantom
    rank-1 / phantom threshold pass).  ``try_divide`` → NULL →
    ``coalesce`` pins -Infinity in BOTH modes; ``nanvl`` covers any
    residual NaN.  Build-side guards refuse all-zero CORPUS vectors
    outright (:func:`_vector_guard`); this covers zero-norm QUERY
    vectors, which no build guard can see."""
    return (
        f"coalesce(nanvl(try_divide({dot}, {denom}), "
        "cast('-Infinity' as double)), cast('-Infinity' as double))"
    )


def _dedup_queries_validated(
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    caller: str,
    max_queries: int | None = None,
) -> DataFrame:
    """Probe-family query dedup with a conflict guard: EXACT duplicate
    (id, vector) rows collapse silently (the documented convention), but
    rows sharing an id with DIFFERENT vectors (or NULL ids) raise — the
    previous ``dropDuplicates([id_col])`` kept an arbitrary survivor,
    turning invalid input into plausible-but-wrong neighbors for the
    dropped vector with no signal (round-9 ADVICE).  One aggregate job
    over the (bounded, when ``max_queries`` is set) deduped id column
    does both the conflict and the size check, so bounded callers pay
    the same single job the old count guard cost; for the unbounded IVF
    probe this is a NET-NEW eager job over the query batch — see
    ``ivf_topk_against_index(validate_queries=)`` for the opt-out."""
    q = queries.dropDuplicates([id_col, vec_col])
    ids = q.select(id_col)
    if max_queries is not None:
        ids = ids.limit(max_queries + 1)
    s = ids.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(id_col)).alias("d"),
        F.count(F.col(id_col)).alias("nn"),  # non-null ids
    ).collect()[0]
    if s["nn"] < s["n"]:
        raise ValueError(
            f"{caller}: NULL {id_col} in the query set — every query "
            "row needs an id to key its top-k"
        )
    if s["d"] < s["n"]:
        raise ValueError(
            f"{caller}: conflicting vectors under a single {id_col} in "
            "the query set — a duplicated query id must carry an "
            "identical vector (an arbitrary-survivor collapse would "
            "return wrong neighbors for the dropped vector)"
        )
    if max_queries is not None and s["n"] > max_queries:
        raise ValueError(
            f"{caller} query set exceeds max_queries={max_queries} "
            "distinct ids; batch the queries (or raise max_queries "
            "deliberately) — the query vectors are broadcast to every "
            "executor for the re-rank"
        )
    return q


def _bucket_udf(planes: np.ndarray):
    n_tables, n_planes, _ = planes.shape

    @pandas_udf(T.ArrayType(T.LongType()))
    def buckets(embs: pd.Series) -> pd.Series:
        mat = np.stack(embs.to_numpy())  # (batch, dim)
        out = []
        dots = np.einsum("bd,tpd->btp", mat, planes)  # (batch, tables, planes)
        bits = (dots > 0).astype(np.int64)
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        codes = (bits * weights).sum(axis=2)  # (batch, tables)
        for row in codes:
            out.append(row.tolist())
        return pd.Series(out)

    return buckets


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_tables: int = 8,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 1_000_000,
) -> DataFrame:
    """Top-k cosine neighbors per query among LSH bucket candidates.

    Returns (query_id, neighbor_id, cos_sim, rn) — same shape as the
    brute-force oracle query, so recall is directly measurable.

    The query side (ids + vectors) is broadcast into the candidate
    re-rank, so it must be bounded: more than ``max_queries`` rows raises
    instead of silently OOMing executors (same contract as ``pq_topk``).
    The corpus side is never broadcast or collected.
    """
    from video_etl_spark.session import ensure_executor_package

    ensure_executor_package(corpus.sparkSession)
    # duplicate query ids collapse — probe-family convention (see
    # ivf_topk_against_index): top-k is keyed by query_id, duplicated
    # rows could only corrupt ranks.  Dedup BEFORE the guard so
    # max_queries uniformly bounds DISTINCT ids across the probe family;
    # conflicting vectors under one id raise (see the helper).
    queries = _dedup_queries_validated(
        queries, id_col, vec_col, "lsh_topk", max_queries
    )
    planes = _planes(n_tables, n_planes, dim)
    bucketize = _bucket_udf(planes)

    def with_buckets(df: DataFrame, prefix: str) -> DataFrame:
        # ids + bucket keys only: the vectors must NOT ride through the
        # candidate join/distinct (a pair appearing in several tables would
        # shuffle 2×dim doubles per duplicate); they are joined back once
        # per UNIQUE pair for the re-rank.
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.posexplode(bucketize(F.col(vec_col))).alias("table_id", "bucket"),
        )

    pair_ids = (
        with_buckets(queries, "query")
        .join(with_buckets(corpus, "neighbor"), ["table_id", "bucket"])
        .select("query_id", "neighbor_id")
        .distinct()
    )
    cand = pair_ids.join(
        F.broadcast(
            queries.select(
                F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
            )
        ),
        "query_id",
    ).join(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("neighbor_vec")
        ),
        "neighbor_id",
    )

    # Exact cosine re-rank on candidates only (JVM-side higher-order fns).
    qd = "transform(query_vec, x -> cast(x as double))"
    nd = "transform(neighbor_vec, x -> cast(x as double))"
    dot = f"aggregate(zip_with({qd}, {nd}, (a, b) -> a * b), 0D, (s, v) -> s + v)"
    nq = f"sqrt(aggregate(transform({qd}, x -> x * x), 0D, (s, v) -> s + v))"
    nn = f"sqrt(aggregate(transform({nd}, x -> x * x), 0D, (s, v) -> s + v))"
    scored = cand.withColumn("cos_sim", F.expr(_cos_expr(dot, f"{nq} * {nn}")))

    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


# ---------------------------------------------------------------------------
# U22⊕ (round 8) — PERSISTED LSH INDEX: the module docstring's "corpus-side
# bucket table is computed once and can be written bucketed-by(bucket);
# query batches then join without reshuffling the corpus", now real.  Three
# tables per index:
#   {table}         (neighbor_id, tkey="<table_id>|<bucket>")  bucketed(tkey)
#   {table}_vecs    (neighbor_id, neighbor_vec, nrm)    bucketed(neighbor_id)
#   {table}_params  (n_tables, n_planes, dim)           1 row
# so BOTH index-side joins of a probe (candidate equi-join on the bucket
# key, vector fetch for the re-rank) read co-located buckets with no
# Exchange; the hyperplane UDF runs over the corpus exactly once, at
# write time.  Same key convention as band/simhash/phash indexes: one
# string column is both join key and bucket key.


def _lsh_bucket_rows(
    df: DataFrame, planes: np.ndarray, id_col: str, vec_col: str
) -> DataFrame:
    """(id, tkey) long-format bucket membership — one row per vector per
    hash table, tkey = "<table_id>|<bucket>"."""
    bucketize = _bucket_udf(planes)
    return df.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode(bucketize(F.col(vec_col))).alias("table_id", "bucket"),
    ).select(
        "neighbor_id",
        F.concat_ws("|", F.col("table_id"), F.col("bucket")).alias("tkey"),
    )


def write_lsh_index(
    corpus: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 32,
    n_tables: int = 8,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    files_per_bucket: int = 1,
    planes=None,
) -> None:
    """Persist the corpus LSH bucket table (+ vector sidecar with
    precomputed norms) as bucketed external tables; the hyperplanes are
    deterministic (md5-derived), so probes recompute only the QUERY
    side's buckets.

    The hash parameters are persisted too (``{table}_params``, one row)
    and probes READ them instead of trusting caller-resupplied kwargs: a
    probe hashing queries with different n_planes than the index was
    built with would produce tkeys that only accidentally collide —
    recall craters with no exception.

    ``planes``, if given, SKIPS the md5 derivation and uses the supplied
    hyperplanes verbatim (shape ``(n_tables, n_planes, dim)``) — the
    same externally-trained-quantizer workflow as
    :func:`write_ivf_index`'s ``centers=`` (learned projections, or
    data-derived planes for an oracle-reproducible index).  Like every
    other hash parameter they are then persisted IN the index
    (``{table}_planes``) and RECORDED in the params row
    (``has_planes``), so readers can refuse the md5 fallback for an
    external-planes index instead of silently hashing queries into
    foreign buckets; a rebuild WITHOUT the argument drops any stale
    planes sidecar from the previous generation for the same reason.
    Write order: buckets → vectors → planes → params LAST, so the
    generation's claim about itself is the final thing committed.
    """
    from video_etl_spark.operators.io import write_bucketed
    from video_etl_spark.session import ensure_executor_package

    spark = corpus.sparkSession
    ensure_executor_package(spark)
    has_planes = planes is not None
    if has_planes:
        planes = np.asarray(planes, dtype=np.float64)
        if planes.shape != (n_tables, n_planes, dim):
            raise ValueError(
                f"write_lsh_index: planes shape {planes.shape} does not "
                f"match (n_tables={n_tables}, n_planes={n_planes}, "
                f"dim={dim})"
            )
    else:
        planes = _planes(n_tables, n_planes, dim)
    # validation above, destruction below.  Drop any previous
    # generation's sidecar BEFORE touching the data tables, in BOTH
    # branches: surviving an md5 rebuild it would make
    # append_to_lsh_index hash batches with the OLD generation's planes
    # (foreign buckets, invisible to probes, no exception); surviving a
    # crash mid-external-rebuild it would pair old planes with new
    # buckets undetectably — with the early drop, a crash before the new
    # sidecar lands leaves has_planes(old params) ≠ sidecar-exists, which
    # every reader refuses loudly
    spark.sql(f"DROP TABLE IF EXISTS {table}_planes")
    write_bucketed(
        _lsh_bucket_rows(corpus, planes, id_col, vec_col),
        table,
        f"{path}/buckets",
        ["tkey"],
        n_buckets,
        files_per_bucket,
    )
    write_bucketed(
        _vec_sidecar_rows(corpus, id_col, vec_col),
        f"{table}_vecs",
        f"{path}/vectors",
        ["neighbor_id"],
        n_buckets,
        files_per_bucket,
    )
    if has_planes:
        spark.createDataFrame(
            [
                (t, p, [float(x) for x in planes[t, p]])
                for t in range(n_tables)
                for p in range(n_planes)
            ],
            "table_id int, plane_id int, plane array<double>",
        ).coalesce(1).write.mode("overwrite").option(
            "path", f"{path}/planes"
        ).saveAsTable(f"{table}_planes")
    spark.createDataFrame(
        [(n_tables, n_planes, dim, has_planes)],
        "n_tables int, n_planes int, dim int, has_planes boolean",
    ).coalesce(1).write.mode("overwrite").option(
        "path", f"{path}/params"
    ).saveAsTable(f"{table}_params")


def lsh_topk_against_index(
    queries: DataFrame,
    buckets: DataFrame,
    vectors: DataFrame,
    params: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 1_000_000,
    planes_df: DataFrame | None = None,
) -> DataFrame:
    """:func:`lsh_topk` against a persisted index (``spark.table`` reads
    of :func:`write_lsh_index`'s tables) — identical output for the same
    corpus (tested), with the corpus never re-bucketized and both
    index-side joins exchange-free on the bucketed tables (plan-asserted
    in tests).

    The hash parameters come from the index's own ``{table}_params``
    sidecar (a 1-row control-plane read), so query tkeys are always
    computed with the planes the index was built with; for an index
    written with explicit planes, pass its ``{table}_planes`` sidecar
    as ``planes_df`` (bounded: n_tables × n_planes rows) — md5-derived
    planes would hash queries into tkeys that only accidentally collide
    with the index's.  Same bounded-broadcast contract as the direct
    form: query vectors are broadcast into the re-rank, so the query
    set is capped at ``max_queries`` with a loud raise.
    """
    from video_etl_spark.session import ensure_executor_package

    ensure_executor_package(queries.sparkSession)
    # duplicate query ids collapse BEFORE the guard — probe-family
    # convention (see lsh_topk / ivf_topk_against_index); conflicting
    # vectors under one id raise (see the helper)
    queries = _dedup_queries_validated(
        queries, id_col, vec_col, "lsh_topk_against_index", max_queries
    )
    p = params.collect()[0]
    # params rows without a has_planes column predate the marker and are
    # treated as md5-era; an external-planes index written before the
    # marker existed must be rebuilt (its params cannot vouch for the
    # sidecar)
    has_planes = bool(p.asDict().get("has_planes", False))
    if has_planes and planes_df is None:
        raise ValueError(
            "lsh_topk_against_index: the params sidecar records this "
            "index as built with EXPLICIT planes — pass its "
            "{table}_planes sidecar as planes_df; the md5 fallback "
            "would hash queries into foreign buckets (recall craters "
            "with no exception)"
        )
    if planes_df is not None:
        if not has_planes:
            raise ValueError(
                "lsh_topk_against_index: planes_df given but the params "
                "sidecar does not record explicit planes — either the "
                "sidecar belongs to another index generation, or the "
                "index predates the has_planes marker (rebuild it with "
                "write_lsh_index(planes=...) so params can vouch for "
                "the sidecar)"
            )
        planes = _planes_from_rows(planes_df.collect())
        if planes.shape != (p["n_tables"], p["n_planes"], p["dim"]):
            raise ValueError(
                f"lsh_topk_against_index: planes sidecar shape "
                f"{planes.shape} contradicts the params sidecar "
                f"({p['n_tables']}, {p['n_planes']}, {p['dim']}) — "
                "mismatched index tables"
            )
    else:
        planes = _planes(p["n_tables"], p["n_planes"], p["dim"])
    q_buckets = _lsh_bucket_rows(queries, planes, id_col, vec_col).select(
        F.col("neighbor_id").alias("query_id"), "tkey"
    )
    pair_ids = (
        q_buckets.join(buckets.select("neighbor_id", "tkey"), "tkey")
        .select("query_id", "neighbor_id")
        .distinct()
    )
    cand = pair_ids.join(
        F.broadcast(
            queries.select(
                F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("query_vec"),
            )
        ),
        "query_id",
    ).join(vectors.select("neighbor_id", "neighbor_vec", "nrm"), "neighbor_id")

    # identical re-rank arithmetic to lsh_topk (neighbor_vec is already
    # double and nrm was computed with the same expression at write time)
    qd = "transform(query_vec, x -> cast(x as double))"
    dot = (
        f"aggregate(zip_with({qd}, neighbor_vec, (a, b) -> a * b), 0D, "
        "(s, v) -> s + v)"
    )
    nq = f"sqrt(aggregate(transform({qd}, x -> x * x), 0D, (s, v) -> s + v))"
    scored = cand.withColumn("cos_sim", F.expr(_cos_expr(dot, f"{nq} * nrm")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


def _fresh_only(
    new: DataFrame, indexed_ids_thunk, id_col: str, assume_disjoint: bool
) -> DataFrame:
    """Drop batch vectors whose id is already in the index — a probe
    re-rank joining duplicate neighbor rows would emit duplicate scored
    rows and pollute the top-k ranks.  The anti-join's index side is an
    id-only column-pruned scan; at full corpus scale a caller whose ids
    are disjoint by construction (monotonic ingest cursors) skips it
    with ``assume_disjoint=True``.  The index side is a THUNK so the
    disjoint fast path never RESOLVES the relation: a bare
    ``spark.read.parquet`` on a many-partition table runs a parallel
    partition-discovery job at resolution time — measured ~3 s per
    append on a 2000-cell index, paid for a DataFrame the fast path
    then threw away.  An id re-ingested with a DIFFERENT
    vector is intentionally dropped too: the id is the identity, and
    updating a vector means writing a new index generation.

    Callers must hand this a batch WITHOUT intra-batch duplicate ids —
    the appends collapse them with ONE materialized
    ``dropDuplicates([id_col]).localCheckpoint()`` up front, so every
    sink sees the SAME survivor row (dropDuplicates is
    partition-order-dependent per execution; re-running it per sink
    could hash payload A into the buckets/codes while storing payload
    B's vector in the re-rank sidecar)."""
    if assume_disjoint:
        return new
    return new.join(
        indexed_ids_thunk().select(F.col("neighbor_id").alias(id_col)),
        id_col,
        "left_anti",
    )


def _fresh_checkpointed(
    batch: DataFrame, indexed_ids_thunk, id_col: str, assume_disjoint: bool
) -> DataFrame:
    """Per-sink fresh set for a multi-sink append: ``batch`` (already
    dedup'd + checkpointed) minus what this sink's table already holds,
    lineage-truncated because the sink INSERTS into the table the
    anti-join reads (static self-insert check).  Under
    ``assume_disjoint`` the checkpointed batch IS the fresh set — no
    anti-join ran, nothing new to materialize; the sink table is passed
    as a THUNK so the fast path never resolves it (spark.table is an
    eager catalog round-trip)."""
    if assume_disjoint:
        return batch
    return _fresh_only(
        batch, indexed_ids_thunk, id_col, False
    ).localCheckpoint()


def _vec_sidecar_rows(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(neighbor_id, neighbor_vec, nrm) exact re-rank rows — THE one
    definition of the vector-sidecar arithmetic (LSH/PQ writers and
    their appends all go through here, so probe and append cos_sim
    values cannot drift)."""
    nd = f"transform({vec_col}, x -> cast(x as double))"
    return df.select(
        F.col(id_col).alias("neighbor_id"),
        F.expr(nd).alias("neighbor_vec"),
        F.expr(
            f"sqrt(aggregate(transform({nd}, x -> x * x), 0D, "
            "(s, v) -> s + v))"
        ).alias("nrm"),
    )


def _centers_from_rows(rows) -> list[list[float]]:
    """Order collected centers rows by centroid id and strip to plain
    lists — THE one conversion every centers reader goes through (the
    literal branch's positional ``F.lit(i)`` centroid ids depend on this
    ordering)."""
    return [
        list(r["center"]) for r in sorted(rows, key=lambda r: r["centroid"])
    ]


def _read_centers(spark, path: str) -> list[list[float]]:
    """The persisted IVF centers, ordered by centroid id — the one
    reader probes and appends share."""
    return _centers_from_rows(spark.read.parquet(f"{path}/centers").collect())


def _books_from_rows(book_rows) -> np.ndarray:
    """Reassemble the (m, ksub, dsub) codebook array from the persisted
    ``{table}_books`` rows — shared by the PQ probe and append."""
    m = 1 + max(r["subspace"] for r in book_rows)
    ksub = 1 + max(r["code"] for r in book_rows)
    books = np.empty((m, ksub, len(book_rows[0]["center"])))
    for r in book_rows:
        books[r["subspace"], r["code"]] = r["center"]
    return books


def _pq_mode_from_book_rows(book_rows) -> "bool | None":
    """The encode mode carried ON the ``{table}_books`` rows (round-10
    ADVICE): ``write_pq_index`` stamps every books row with the index's
    ``normalize`` flag so a probe — which must already collect books to
    build its LUTs — reads the persisted mode without depending on the
    caller remembering ``params_df``.  Returns None for a LEGACY books
    table (pre-marker schema); raises if the marker is present but
    inconsistent or NULL — that's rows from mixed index generations, and
    scoring with either mode could be silently wrong for the other half.
    """
    fields = getattr(book_rows[0], "__fields__", None)
    if fields is None and hasattr(book_rows[0], "keys"):
        fields = list(book_rows[0].keys())
    if not fields or "normalize" not in fields:
        return None
    modes = {r["normalize"] for r in book_rows}
    if len(modes) != 1 or None in modes:
        raise ValueError(
            "PQ books table carries inconsistent normalize markers "
            f"({sorted(modes, key=str)}) — rows from mixed index "
            "generations; rebuild the index"
        )
    return bool(modes.pop())


def append_to_lsh_index(
    new: DataFrame,
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assume_disjoint: bool = False,
    files_per_bucket: int = 1,
) -> None:
    """Append a vector batch to a persisted LSH index
    (:func:`write_lsh_index`) — the maintenance operation that makes the
    ANN indexes crawl-followable like the dedup indexes (write → append
    → probe unchanged): new vectors are hashed with the PARAMS the index
    was built with (read from ``{table}_params``, never caller-
    resupplied) and appended to the bucket and vector tables WITH the
    existing bucket spec, so every append stays a correctly-hashed
    bucketed file set and probes keep their exchange-free index-side
    scans (plan-asserted in tests).  Because the hyperplanes are
    corpus-independent, probing after k appends is EXACTLY equivalent to
    probing one index built over the union (differential-tested) — there
    is no drift, and no compaction is ever semantically required (only
    file-count hygiene, at which point a fresh ``write_lsh_index`` over
    the accumulated vectors is the generation rotation).
    """
    from video_etl_spark.operators.io import append_bucketed
    from video_etl_spark.session import ensure_executor_package

    spark = new.sparkSession
    ensure_executor_package(spark)
    p = spark.table(f"{table}_params").collect()[0]
    has_planes = bool(p.asDict().get("has_planes", False))
    sidecar_exists = spark.catalog.tableExists(f"{table}_planes")
    if has_planes != sidecar_exists:
        raise ValueError(
            f"append_to_lsh_index: params sidecar of {table!r} says "
            f"has_planes={has_planes} but the {table}_planes table "
            f"{'exists' if sidecar_exists else 'is missing'} — mixed "
            "index generations; rebuild the index before appending"
        )
    if has_planes:
        # index written with explicit planes — hash the batch with THOSE
        # (md5-derived planes would scatter it into foreign buckets)
        planes = _planes_from_rows(spark.table(f"{table}_planes").collect())
        if planes.shape != (p["n_tables"], p["n_planes"], p["dim"]):
            raise ValueError(
                f"append_to_lsh_index: planes sidecar shape "
                f"{planes.shape} contradicts the params sidecar "
                f"({p['n_tables']}, {p['n_planes']}, {p['dim']})"
            )
    else:
        planes = _planes(p["n_tables"], p["n_planes"], p["dim"])
    # Intra-batch duplicate ids are collapsed ONCE into a materialized
    # batch so both sinks see the same survivor row (see _fresh_only).
    # PER-SINK idempotence: each sink then appends that batch MINUS what
    # the sink already holds, so a crash between the two appends retries
    # to a self-healing no-op on the committed sink instead of
    # duplicating it.  localCheckpoint, not persist: each anti-join
    # READS the table its sink INSERTS into, and Spark's static
    # self-insert check rejects a plan that reads its own target — the
    # lineage must be truncated.  Maintenance path, never per micro-batch.
    batch = new.dropDuplicates([id_col]).localCheckpoint()
    fresh_b = _fresh_checkpointed(
        batch, lambda: spark.table(table), id_col, assume_disjoint
    )
    append_bucketed(
        _lsh_bucket_rows(fresh_b, planes, id_col, vec_col),
        table,
        files_per_bucket,
    )
    fresh_v = _fresh_checkpointed(
        batch, lambda: spark.table(f"{table}_vecs"), id_col, assume_disjoint
    )
    append_bucketed(
        _vec_sidecar_rows(fresh_v, id_col, vec_col),
        f"{table}_vecs",
        files_per_bucket,
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN: KMeans-partition the corpus, probe the
    ``n_probe`` nearest centroids per query, exact-rerank candidates.

    The second scale path next to LSH (build brief: "an IVF or LSH-bucketed
    variant").  At 100 TB the centroid assignment is computed once and the
    corpus written partitioned-by(centroid); query batches then read only
    the probed partitions (partition pruning does the candidate selection).

    Fit runs on Spark ML KMeans over the corpus; assignment and probing are
    JVM-side expressions (control/categories.assign_categories).
    """
    from pyspark.sql import functions as F

    from video_etl_spark.control.categories import assign_categories, fit_categories
    from video_etl_spark.session import ensure_executor_package

    ensure_executor_package(corpus.sparkSession)

    as_double = F.expr(
        f"transform({vec_col}, x -> cast(x as double))"
    )
    corpus_d = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double.alias("scores")
    )
    queries_d = queries.select(
        F.col(id_col).alias("query_id"), as_double.alias("scores")
    )
    centers = fit_categories(corpus_d, k=n_centroids, seed=seed)

    corpus_b = assign_categories(corpus_d, centers).withColumnRenamed(
        "category", "centroid"
    )
    # per query: distances to every centroid, take the n_probe nearest
    q_with_d = assign_categories(queries_d, centers)  # adds nearest 'category'
    # recompute distances explicitly to rank all centroids
    dist_cols = []
    for i, center in enumerate(centers):
        lit_center = F.array(*[F.lit(float(x)) for x in center])
        dist_cols.append(
            F.struct(
                F.aggregate(
                    F.zip_with(F.col("scores"), lit_center, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("d"),
                F.lit(i).alias("c"),
            )
        )
    probed = (
        q_with_d.withColumn("dists", F.array_sort(F.array(*dist_cols)))
        .withColumn("probe", F.slice("dists", 1, n_probe))
        .select(
            "query_id",
            F.col("scores").alias("query_vec"),
            F.explode(F.col("probe.c")).alias("centroid"),
        )
    )
    cand = probed.join(
        corpus_b.select("neighbor_id", F.col("scores").alias("neighbor_vec"), "centroid"),
        "centroid",
    )
    dot = (
        "aggregate(zip_with(query_vec, neighbor_vec, (a, b) -> a * b), 0D, (s, v) -> s + v)"
    )
    nq = "sqrt(aggregate(transform(query_vec, x -> x * x), 0D, (s, v) -> s + v))"
    nn = "sqrt(aggregate(transform(neighbor_vec, x -> x * x), 0D, (s, v) -> s + v))"
    scored = cand.withColumn("cos_sim", F.expr(_cos_expr(dot, f"{nq} * {nn}")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


# ---------------------------------------------------------------------------
# U22⊕ (round 8) — PERSISTED IVF INDEX: the form ivf_topk's docstring
# promises ("the centroid assignment is computed once and the corpus
# written partitioned-by(centroid); query batches then read only the
# probed partitions"), now real — completing index symmetry for the
# similarity modality alongside band / simhash / phash / winnowing.
# Layout on disk:
#   {path}/vectors/centroid=<c>/...   assigned vectors + precomputed norms
#   {path}/centers/                   (centroid, center) sidecar, k rows
# A query batch collects the UNION of its probed cells (a bounded
# control-plane list, <= n_centroids ints) into a literal IN filter, so
# the vector scan partition-prunes to the probed cells — at 100 TB the
# inverted file is touched only where the batch actually looks.


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centers: list[list[float]] | None = None,
) -> list[list[float]]:
    """Fit + assign ONCE and persist the inverted file.

    Vectors are stored as array<double> with their L2 norm precomputed
    (`nrm`) so query-time scoring never recomputes corpus norms; returns
    the fitted centers (also persisted under ``{path}/centers``).
    Assignment switches form with the quantizer size exactly like the
    probe's cell ranking does (:func:`_assign_cells`): literal JVM
    distance columns up to ``_LITERAL_CELL_RANK_MAX`` centers, one
    constant-plan Arrow map beyond — so a production-sized coarse
    quantizer (hundreds-to-thousands of cells) builds without the
    n_centroids × dim literal-plan blowup.

    ``centers``, if given, SKIPS the KMeans fit and uses the supplied
    coarse quantizer verbatim (list of ``n_centroids`` dim-length float
    lists, centroid id = list position) — the standard
    externally-trained-quantizer workflow (fit on a sample elsewhere,
    or deterministic seed centers for an oracle-reproducible index).
    Like the fitted form, the centers are persisted in the index so
    probes never re-supply them.

    Null / null-element / dim-mismatched corpus vectors fail LOUDLY at
    build time (the guard rides :func:`_assign_cells`'s expression, so
    build and append share it): unguarded, such a row lands in the
    centroid=NULL partition and is never probed.
    """
    from video_etl_spark.control.categories import fit_categories
    from video_etl_spark.session import ensure_executor_package

    spark = corpus.sparkSession
    ensure_executor_package(spark)

    as_double = F.expr(f"transform({vec_col}, x -> cast(x as double))")
    corpus_d = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double.alias("scores")
    )
    if centers is None:
        centers = fit_categories(corpus_d, k=n_centroids, seed=seed)
    elif len(centers) != n_centroids:
        raise ValueError(
            f"write_ivf_index: {len(centers)} explicit centers but "
            f"n_centroids={n_centroids}"
        )
    nrm = (
        "sqrt(aggregate(transform(scores, x -> x * x), 0D, (s, v) -> s + v))"
    )
    (
        _assign_cells(corpus_d, centers)
        .select(
            "neighbor_id",
            F.col("scores").alias("neighbor_vec"),
            F.expr(nrm).alias("nrm"),
            F.col("category").alias("centroid"),
        )
        .write.mode("overwrite")
        .partitionBy("centroid")
        .parquet(f"{path}/vectors")
    )
    spark.createDataFrame(
        [(i, c) for i, c in enumerate(centers)],
        "centroid int, center array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centers")
    return centers


def _vector_guard(vec_col: str, dim: int, msg: str):
    """``when(ok, vec).otherwise(raise_error(msg))`` — THE inline
    bad-vector refusal every index writer/appender binds into its
    vector column (null vector, null element, wrong dimension,
    all-zero vector).  NullType coerces under the array branch, and
    binding the guard INTO the column keeps pruning from optimizing it
    away (a standalone assert_true column would be dead-code-eliminated).
    Inline means executor-side and zero extra corpus passes; a violation
    aborts the job before any sink commits.

    The all-zero refusal exists because every index persists
    ``nrm = sqrt(Σx²)`` at write time and every re-rank divides by it:
    a zero vector has nrm=0.0, cos_sim = 0/0 = NaN, and Spark orders NaN
    ABOVE every double — so one degenerate all-zero corpus vector that
    reaches a shortlist would take rank 1 for every query (under ANSI
    mode, Spark 4's default, the division raises DIVIDE_BY_ZERO and
    kills the serve job instead).  Refusing at build keeps the
    corruption out of the index; the re-rank sites are additionally
    ``try_divide``/``nanvl``-hardened (cos_sim pinned at -Infinity) for
    zero-norm QUERY vectors, which no build guard can see."""
    ok = (
        F.col(vec_col).isNotNull()
        & (F.size(vec_col) == dim)
        & ~F.exists(vec_col, lambda x: x.isNull())
        & F.exists(vec_col, lambda x: x != 0)
    )
    return F.when(ok, F.col(vec_col)).otherwise(F.raise_error(msg))


#: above this many centroids the probe's cell ranking switches from
#: per-centroid literal struct columns to a broadcast join against the
#: persisted centers table: a literal plan carries n_centroids × dim
#: float literals (a realistic 100 TB IVF wants thousands of cells —
#: ~256k literals would be a driver/codegen problem), while the
#: broadcast form is one tiny join whose plan size is constant.
_LITERAL_CELL_RANK_MAX = 64


def _assign_cells(df: DataFrame, centers, vec_col: str = "scores") -> DataFrame:
    """Nearest-center assignment for the IVF WRITE/APPEND side, with the
    same literal/constant-plan split the probe's cell ranking has: up to
    ``_LITERAL_CELL_RANK_MAX`` centers, ``control.categories.
    assign_categories`` inlines one JVM distance column per center (zero
    Python, zero shuffle — the oracle-matched tens-of-cells form);
    beyond it that plan carries n_centroids × dim float literals — the
    write-side twin of the probe problem the broadcast cell-rank form
    solved, previously unguarded, so a production-sized quantizer
    (√N ≈ hundreds-to-thousands of cells) hit plan-compile blowup at
    index build — and the assignment switches to one Arrow map with the
    centers shipped as a numpy array: constant plan size, no shuffle,
    vectorized ``argmin(‖c‖² − 2·v·c)`` (the ‖v‖² term is per-row
    constant; the matmul form keeps peak memory at one (batch, k) plane
    instead of the (batch, k, dim) explicit-difference cube — the
    ``_adc_scores`` lesson applied to assignment).

    Output contract matches ``assign_categories``: input columns plus an
    int ``category``; ties take the lowest centroid id (``np.argmin``
    first-index == ``array_position`` first-match).  Float summation
    order differs from the JVM fold (pairwise/matmul vs sequential), so
    a mathematically exact tie between two distinct centers can assign
    either way at ulp scale — the same accepted encode-path semantics as
    ``_pq_encode_frame``.

    BOTH forms refuse null vectors, null elements, and dim-mismatched
    vectors INLINE (round-11 ADVICE): without the guard, the literal
    form's zip_with null-pads and the row lands silently in the
    centroid=NULL partition — permanently invisible to the probe's
    ``centroid.isin()`` pruning.  The check rides the assignment
    expression itself (no extra corpus pass — an eager pre-scan would
    double the build's read at index scale), so write, append, and any
    future caller share it by construction."""
    dim = len(centers[0])
    df = df.withColumn(
        vec_col,
        _vector_guard(
            vec_col,
            dim,
            "_assign_cells: null vector, vector with null elements, "
            "all-zero vector, or vector whose dimension differs from the "
            f"centroids (dim={dim}) — it would be assigned centroid NULL "
            "and never probed, or persist nrm=0.0 and NaN-corrupt every "
            "re-rank",
        ),
    )
    if len(centers) <= _LITERAL_CELL_RANK_MAX:
        from video_etl_spark.control.categories import assign_categories

        return assign_categories(df, centers, vec_col=vec_col)

    cmat = np.asarray(centers, dtype=np.float64)  # (k, dim)
    cnorm2 = (cmat**2).sum(axis=1)  # (k,)
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("category", T.IntegerType())]
    )

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d = cnorm2[None, :] - 2.0 * (mat @ cmat.T)
            pdf = pdf.copy()
            pdf["category"] = d.argmin(axis=1).astype(np.int32)
            yield pdf

    return df.mapInPandas(assign, schema=out_schema)


def ivf_topk_against_index(
    spark,
    queries: DataFrame,
    path: str,
    k: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_rank: str = "auto",
    validate_queries: bool = True,
) -> DataFrame:
    """:func:`ivf_topk` against a persisted inverted file
    (:func:`write_ivf_index`) — identical output for the same corpus /
    seed / parameters (tested), without re-fitting or re-assigning the
    corpus.

    The scan of ``{path}/vectors`` carries a partition filter listing
    only the cells this query batch probes (plan-asserted in tests), so
    corpus IO is proportional to the probed cells, not the corpus.  The
    driver-side reads are bounded control-plane reads: the distinct
    probed-cell list (<= n_centroids ints) needed to build the literal
    pruning filter, plus — in the literal form only — the centers table
    (n_centroids rows); the broadcast form ships centers executor-side
    and the auto decision reads just the row count.

    ``validate_queries`` (default True) runs one eager aggregate job
    over the query batch to reject conflicting vectors under one id
    (round-9 ADVICE) — the probe's only query-side job.  A high-rate
    caller that validates its batches upstream can pass False to keep
    the probe fully lazy on the query side (one arbitrary survivor per
    duplicated id, the pre-validation semantics).

    Cell ranking has two equivalent forms (``cell_rank``: "auto" picks by
    ``_LITERAL_CELL_RANK_MAX``, "literal"/"broadcast" force one): the
    literal form inlines every centroid into the plan (zero extra
    shuffle — right for the tens-of-cells regime), the broadcast form
    joins the centers table and window-ranks per query (constant plan
    size — right for thousands of cells).  Same fold expression on the
    same parquet-read doubles and the same (distance, centroid) ascending
    tie-break, so the probed cell set is identical (equivalence-tested).

    The intermediate ``probed`` frame stays persisted after return — it
    feeds both the eager cell-list collect and the returned lazy plan, so
    an eager unpersist here would force recomputation at action time.
    Blocks are LRU-evicted / released at session end, the same convention
    as ``simhash_pairs`` / ``corpus_components``; callers probing in a
    tight loop can ``spark.catalog.clearCache()`` between rounds.
    """
    from video_etl_spark.session import ensure_executor_package

    ensure_executor_package(spark)

    centers = None
    if cell_rank == "auto":
        # ONE bounded read picks the branch: limit(MAX+1) never ships
        # more than MAX+1 rows to the driver (so a thousand-cell index
        # doesn't pay an n_centroids × dim transfer just to decide), and
        # when the index is small the collected rows ARE the full centers
        # set — reused by the literal branch instead of a second read
        head = (
            spark.read.parquet(f"{path}/centers")
            .limit(_LITERAL_CELL_RANK_MAX + 1)
            .collect()
        )
        if len(head) <= _LITERAL_CELL_RANK_MAX:
            cell_rank = "literal"
            centers = _centers_from_rows(head)
        else:
            cell_rank = "broadcast"

    as_double = F.expr(f"transform({vec_col}, x -> cast(x as double))")
    # duplicate query ids collapse to one row: the final top-k is keyed
    # by query_id, so duplicated rows could only (a) emit the same
    # neighbor at several ranks (literal form) or (b) halve the probe
    # set (broadcast form's per-id window) — collapsing first keeps the
    # two cell-ranking forms bit-identical.  Rows sharing an id but
    # carrying DIFFERENT vectors raise (one eager agg job over the query
    # batch — the probe's only query-side job; a validated-upstream
    # high-rate caller can skip it) instead of electing an arbitrary
    # survivor.
    if validate_queries:
        queries_d = _dedup_queries_validated(
            queries, id_col, vec_col, "ivf_topk_against_index"
        )
    else:
        # opt-out keeps the lazy pre-validation semantics: one survivor
        # per id (arbitrary under conflicting vectors — the caller
        # vouched for the batch), so both cell-rank modes stay keyed by
        # unique query_id
        queries_d = queries.dropDuplicates([id_col])
    queries_d = queries_d.select(
        F.col(id_col).alias("query_id"), as_double.alias("scores")
    )
    if cell_rank == "literal":
        if centers is None:  # forced literal — auto didn't collect
            centers = _read_centers(spark, path)
        # per query: distances to every centroid, take the n_probe nearest
        # (same expression shape as ivf_topk so results match exactly)
        dist_cols = []
        for i, center in enumerate(centers):
            lit_center = F.array(*[F.lit(float(x)) for x in center])
            dist_cols.append(
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            F.col("scores"),
                            lit_center,
                            lambda a, b: (a - b) * (a - b),
                        ),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    ).alias("d"),
                    F.lit(i).alias("c"),
                )
            )
        probed = (
            queries_d.withColumn("dists", F.array_sort(F.array(*dist_cols)))
            .withColumn("probe", F.slice("dists", 1, n_probe))
            .select(
                "query_id",
                F.col("scores").alias("query_vec"),
                F.explode(F.col("probe.c")).alias("centroid"),
            )
        )
    elif cell_rank == "broadcast":
        centers_df = spark.read.parquet(f"{path}/centers")
        w_c = Window.partitionBy("query_id").orderBy("d", "centroid")
        probed = (
            queries_d.crossJoin(F.broadcast(centers_df))
            .withColumn(
                "d",
                F.aggregate(
                    F.zip_with(
                        F.col("scores"),
                        F.col("center"),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
            )
            .withColumn("crn", F.row_number().over(w_c))
            .filter(F.col("crn") <= n_probe)
            .select(
                "query_id",
                F.col("scores").alias("query_vec"),
                "centroid",
            )
        )
    else:
        raise ValueError(
            f"ivf_topk_against_index: cell_rank must be 'auto', "
            f"'literal' or 'broadcast', got {cell_rank!r}"
        )
    # feeds the cell-list collect AND the candidate join; stays pinned
    # until LRU eviction by design (docstring)
    probed = probed.persist()
    cells = [
        r["centroid"] for r in probed.select("centroid").distinct().collect()
    ]
    inv = spark.read.parquet(f"{path}/vectors").filter(
        F.col("centroid").isin(cells)
    )
    cand = probed.join(
        inv.select("neighbor_id", "neighbor_vec", "nrm", "centroid"),
        "centroid",
    )
    dot = (
        "aggregate(zip_with(query_vec, neighbor_vec, (a, b) -> a * b), "
        "0D, (s, v) -> s + v)"
    )
    nq = "sqrt(aggregate(transform(query_vec, x -> x * x), 0D, (s, v) -> s + v))"
    scored = cand.withColumn("cos_sim", F.expr(_cos_expr(dot, f"{nq} * nrm")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


def append_to_ivf_index(
    new: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assume_disjoint: bool = False,
) -> None:
    """Append a vector batch to a persisted inverted file
    (:func:`write_ivf_index`): new vectors are assigned to the EXISTING
    centroids (read from ``{path}/centers`` — never refit, so every
    previously-written cell assignment stays valid and probes are
    unchanged) and appended to their cell partitions.  Equivalent to an
    index whose inverted file covers the union but whose centroids were
    fit on the original corpus (differential-tested).

    DRIFT CAVEAT — the honest difference from the LSH append: IVF
    centroids are data-dependent.  Appends keep them frozen, so if the
    embedding distribution drifts, new vectors crowd into few cells and
    probe recall decays.  Monitor with :func:`ivf_cell_occupancy`; the
    remedy is a new generation (fresh ``write_ivf_index`` over the
    accumulated vectors), which is exactly the dedup-index
    generation-rotation contract.
    """
    from video_etl_spark.session import ensure_executor_package

    spark = new.sparkSession
    ensure_executor_package(spark)
    centers = _read_centers(spark, path)
    as_double = F.expr(f"transform({vec_col}, x -> cast(x as double))")
    new_d = new.select(
        F.col(id_col).alias("neighbor_id"), as_double.alias("scores")
    )
    # single sink: the intra-batch dedup can ride the same plan (no
    # cross-sink divergence risk — see _fresh_only); the corpus reader
    # is a thunk so a disjoint append never pays partition discovery
    fresh = _fresh_only(
        new_d.dropDuplicates(["neighbor_id"]),
        lambda: spark.read.parquet(f"{path}/vectors"),
        "neighbor_id",
        assume_disjoint,
    ).localCheckpoint()  # reads {path}/vectors, sink below appends to it
    # a dim-mismatched batch must fail LOUDLY: the literal assignment's
    # zip_with null-pads mismatched arrays, every distance goes NULL,
    # and the rows would land in the NULL default partition —
    # permanently invisible to the probe's centroid.isin() pruning —
    # while the Arrow form's np.stack dies with an opaque executor error
    # (LSH and PQ fail on the same mistake with shape errors; this is
    # IVF's equivalent guard, shared by both assignment forms)
    dim = len(centers[0])
    # isNull/exists checked explicitly: under ANSI semantics size(null)
    # is null and (null != dim) filters the row OUT of the probe, and a
    # right-LENGTH vector with one null ELEMENT also nulls every
    # distance — either way the row would slip into the invisible NULL
    # partition this guard exists to refuse
    bad = fresh.where(
        F.col("scores").isNull()
        | (F.size("scores") != dim)
        | F.exists("scores", lambda x: x.isNull())
    )
    if bad.limit(1).count():
        raise ValueError(
            f"append_to_ivf_index: batch contains null vectors, vectors "
            f"with null elements, or vectors whose dimension differs "
            f"from the index's centroids (dim={dim}); they would be "
            "assigned centroid NULL and never probed"
        )
    nrm = (
        "sqrt(aggregate(transform(scores, x -> x * x), 0D, (s, v) -> s + v))"
    )
    (
        _assign_cells(fresh, centers)
        .select(
            "neighbor_id",
            F.col("scores").alias("neighbor_vec"),
            F.expr(nrm).alias("nrm"),
            F.col("category").alias("centroid"),
        )
        .write.mode("append")
        .partitionBy("centroid")
        .parquet(f"{path}/vectors")
    )


def ivf_cell_occupancy(spark, path: str) -> DataFrame:
    """(centroid, n_vectors) cell sizes of a persisted inverted file —
    the drift/skew readout for :func:`append_to_ivf_index` (the IVF twin
    of ``dedup.band_occupancy``): a cell absorbing a disproportionate
    share of appended vectors is the signal to rotate generations before
    probe cost and recall degrade.  Reads only partition-pruned
    metadata-cheap columns."""
    return (
        spark.read.parquet(f"{path}/vectors")
        .groupBy("centroid")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("centroid")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the compressed-domain ANN path (third scale
# route next to LSH and IVF).  The corpus is encoded once into m uint8
# codes per vector (m bytes vs 4·dim — a 32× memory cut at dim=64), and
# query scoring is m table lookups per candidate instead of dim multiplies.
# At 100 TB the codes table *replaces* the raw vectors for the scan; raw
# vectors are fetched only for the final exact re-rank of a bounded
# candidate set.  Codebooks are fit on a driver-side sample (standard
# practice — FAISS trains on ~100k samples regardless of corpus size),
# broadcast via UDF closure; encoding is a narrow Arrow map after the scan;
# the per-partition top-r keeps the shuffle bounded at r rows per query per
# partition (never corpus-sized).


def _fit_pq_codebooks(
    sample: np.ndarray, m: int, ksub: int, seed: int = 7, iters: int = 12
) -> np.ndarray:
    """Lloyd k-means per subspace on L2-normalized sample rows.
    Returns (m, ksub, dsub) codebooks, deterministic for a fixed seed.
    ``ksub`` is clamped to the sample size (k-means can't seed more
    centroids than points); dim must split evenly into m subspaces."""
    n, dim = sample.shape
    if dim % m:
        raise ValueError(
            f"PQ requires dim % m == 0 (got dim={dim}, m={m}); a truncated "
            "dsub would silently corrupt the subspace reshape"
        )
    ksub = min(ksub, n)
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        centers = sub[rng.choice(n, size=ksub, replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                pts = sub[assign == c]
                if len(pts):
                    centers[c] = pts.mean(axis=0)
        books[j] = centers
    return books


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _det_topk_idx(a: np.ndarray, ids: np.ndarray, keep: int) -> np.ndarray:
    """Indices of the top-``keep`` entries of ``a`` under the deterministic
    (score desc, id asc) order, at near-linear cost: ``argpartition``
    finds the keep-th value, the candidate slice expands to ALL boundary
    ties (``>= thr`` — argpartition's own tie choice is arbitrary and
    partition-layout-dependent, and duplicate vectors share PQ codes so
    ties are real), then only that slice is lexsorted.  Equals the
    full-lexsort answer because every excluded element scores strictly
    below ``thr``, but costs O(B + t log t) for t boundary candidates
    instead of O(B log B)."""
    if keep < len(a):
        thr = a[np.argpartition(-a, keep - 1)[:keep]].min()
        cand = np.flatnonzero(a >= thr)
    else:
        cand = np.arange(len(a))
    return cand[np.lexsort((ids[cand], -a[cand]))][:keep]


def _ordered_sample(
    df: DataFrame, id_col: str, vec_col: str, n: int
) -> np.ndarray:
    """Deterministic codebook-fit sample: the first ``n`` vectors by id
    (TakeOrderedAndProject — a bounded heap, not a full sort).  A bare
    limit() takes whichever rows the scan yields first, repeatable only
    while file layout and split planning stay fixed — a parquet
    compaction between index build and a later direct call would
    silently change the fitted codebooks and break the probe == direct
    equivalence the PQ index promises."""
    rows = df.select(id_col, vec_col).orderBy(id_col).limit(n).collect()
    try:
        sample = np.array([r[1] for r in rows], dtype=np.float64)
    except (TypeError, ValueError) as exc:
        raise ValueError(
            "the quantizer-fit sample contains null or ragged vectors — "
            "clean the corpus before indexing (the distributed encode "
            "refuses them too, via the inline vector guard)"
        ) from exc
    if np.isnan(sample).any():
        # numpy converts a null ELEMENT to nan silently; a nan in the
        # fit sample poisons every Lloyd mean it touches, i.e. the
        # codebooks themselves, not just one row
        raise ValueError(
            "the quantizer-fit sample contains null elements (NaN) — "
            "clean the corpus before indexing (a NaN row would poison "
            "the fitted codebooks/centers, corrupting every encode)"
        )
    return sample


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    refine: int = 4,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    max_queries: int = 65_536,
) -> DataFrame:
    """Top-k cosine neighbors per query via PQ asymmetric-distance scan +
    exact re-rank of the top ``k * refine`` candidates.

    Vectors are L2-normalized before encoding, so the additive
    inner-product lookup approximates cosine directly.  Output shape
    matches the brute-force oracle: (query_id, neighbor_id, cos_sim, rn).

    The QUERY set is collected to the driver (its LUTs broadcast to the
    corpus scan), so it must be bounded — a call with more than
    ``max_queries`` rows raises instead of silently OOMing the driver.
    The corpus side is never collected.
    """
    from video_etl_spark.session import ensure_executor_package

    spark = corpus.sparkSession
    ensure_executor_package(spark)

    # --- fit codebooks on a driver-side sample (tiny: m·ksub·dsub floats)
    sample = _normalize(_ordered_sample(corpus, id_col, vec_col, sample_size))
    books = _fit_pq_codebooks(sample, m=m, ksub=ksub, seed=seed)
    dsub = sample.shape[1] // m

    # --- query LUTs: ip(q_sub, centroid) per (query, subspace, code)
    # duplicate query ids collapse — probe-family convention (see
    # ivf_topk_against_index); the DEDUPED frame must feed both the LUT
    # collect AND the exact re-rank join below, or duplicated rows fan
    # every shortlist pair out to adjacent identical ranks.  Dedup by
    # (id, vector) so only EXACT duplicates collapse; a conflicting
    # vector under one id then survives to the collect, where the
    # repeated id is detected driver-side FOR FREE (round-9 ADVICE: the
    # arbitrary-survivor collapse silently returned wrong neighbors).
    queries = queries.dropDuplicates([id_col, vec_col])
    q_rows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len({r[0] for r in q_rows}) < len(q_rows):
        raise ValueError(
            f"pq_topk: conflicting vectors under a single {id_col} in "
            "the query set — a duplicated query id must carry an "
            "identical vector"
        )
    if len(q_rows) > max_queries:
        raise ValueError(
            f"pq_topk query set exceeds max_queries={max_queries} "
            "distinct ids; batch the queries (or raise max_queries "
            "deliberately) — the query LUTs are driver-built and broadcast"
        )
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = _normalize(np.array([r[1] for r in q_rows], dtype=np.float64))
    # luts[q, j, c] = q_sub_j · books[j, c]
    luts = np.einsum(
        "qjd,jcd->qjc", q_mat.reshape(len(q_ids), m, dsub), books
    )

    r_keep = k * refine
    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("approx_ip", T.DoubleType()),
        ]
    )

    def score_partition(batches):
        import pandas as pd  # noqa: PLC0415 — executor-side import

        for pdf in batches:
            if not len(pdf):
                continue
            mat = _normalize(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            # encode: nearest centroid per subspace (PQ compression
            # step) — THE shared encoder, so direct and index probes
            # cannot drift on an encode tie (see _encode_codes)
            codes = _encode_codes(mat, books)  # (batch, m)
            # ADC: approx ip = sum_j luts[q, j, codes[:, j]]
            approx = _adc_scores(luts, codes)
            # (nq, batch) -> per-query partition-local top-r, with the
            # deterministic (approx desc, id asc) tie-break at
            # near-linear cost (see _det_topk_idx)
            ids = pdf[id_col].to_numpy()
            rows = []
            keep = min(r_keep, approx.shape[1])
            for qi in range(len(q_ids)):
                a = approx[qi]
                for bi in _det_topk_idx(a, ids, keep):
                    rows.append((int(q_ids[qi]), int(ids[bi]), float(a[bi])))
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "approx_ip"])

    cand = (
        corpus.select(id_col, vec_col)
        .mapInPandas(score_partition, schema=out_schema)
    )
    w_a = Window.partitionBy("query_id").orderBy(F.desc("approx_ip"), "neighbor_id")
    shortlist = (
        cand.withColumn("arn", F.row_number().over(w_a))
        .filter(F.col("arn") <= r_keep)
        .select("query_id", "neighbor_id")
    )

    # --- exact cosine re-rank on the shortlist only
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    nv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("neighbor_vec")
    )
    rer = shortlist.join(F.broadcast(qv), "query_id").join(nv, "neighbor_id")
    qd = "transform(query_vec, x -> cast(x as double))"
    nd = "transform(neighbor_vec, x -> cast(x as double))"
    dot = f"aggregate(zip_with({qd}, {nd}, (a, b) -> a * b), 0D, (s, v) -> s + v)"
    nq = f"sqrt(aggregate(transform({qd}, x -> x * x), 0D, (s, v) -> s + v))"
    nn = f"sqrt(aggregate(transform({nd}, x -> x * x), 0D, (s, v) -> s + v))"
    scored = rer.withColumn("cos_sim", F.expr(_cos_expr(dot, f"{nq} * {nn}")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


# ---------------------------------------------------------------------------
# U22⊕ (round 8) — PERSISTED PQ INDEX, closing the ANN index symmetry
# (LSH: write_lsh_index, IVF: write_ivf_index, PQ: here).  pq_topk refits
# codebooks and RE-ENCODES the whole corpus on every call; at scale the
# m-byte codes are the artifact — encoded once, scanned per probe.  Three
# tables per index:
#   {table}        (neighbor_id, code array<int>)       the compressed scan
#   {table}_vecs   (neighbor_id, neighbor_vec, nrm)     bucketed(neighbor_id)
#   {table}_books  (subspace, code, center)             m·ksub rows
# A probe's ADC scan is a narrow mapInPandas over the codes table (no
# re-encode, no shuffle); only the bounded shortlist shuffles into the
# exact re-rank, whose index side arrives exchange-free from the bucketed
# sidecar (plan-asserted in tests).


def _adc_scores(luts: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """ADC scoring ``sum_j luts[q, j, codes[:, j]]`` accumulated one
    subspace at a time — the fancy-index form
    ``luts[:, arange(m), codes].sum(axis=2)`` materializes an
    (n_queries, n_codes, m) gather FIRST, which at serving scale is the
    memory hog (4k queries × 200k codes × m=8 doubles = 1.6 GB per
    Arrow chunk; the 10× PQ serve rehearsal measured 161 s on its
    appended batch).  Peak here is one (n_queries, n_codes) plane.
    Values differ from the gather form only in float summation order
    (pairwise vs sequential, ≤ a few ulp); exact ties still tie, since
    identical code tuples produce identical addends either way."""
    # advanced indexing returns a fresh array, so += never aliases luts
    out = luts[:, 0, codes[:, 0]]
    for j in range(1, luts.shape[1]):
        out += luts[:, j, codes[:, j]]
    return out


def _encode_codes(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) nearest-center codes per subspace — THE one encoder
    arithmetic every PQ writer/appender shares, in the matmul distance
    form ``argmin_c(‖c‖² − 2·v·c)`` (the per-row ‖v‖² term cannot move
    the argmin): peak is one (n, ksub) plane per subspace instead of
    the (n, m, ksub, dsub) explicit-difference cube the old form
    materialized — at ksub=256 that cube was 32× the input and made
    the encode THE build bottleneck (the ``_adc_scores`` /
    ``_assign_cells`` lesson applied to the encoder).  Ties take the
    lowest code (argmin first-index).  On integer-valued doubles (the
    oracle convention) every product and sum is exact, so codes are
    bit-identical to the explicit form; on float vectors a
    mathematically exact tie can assign either way at ulp scale — the
    same accepted encode-path semantics ``_assign_cells`` documents
    (all probe/append paths share this one encoder, so nothing can
    drift against itself)."""
    m, _, dsub = books.shape
    sub = mat.reshape(len(mat), m, dsub)
    codes = np.empty((len(mat), m), dtype=np.int64)
    for j in range(m):
        bj = books[j]  # (ksub, dsub)
        d = (bj**2).sum(axis=1)[None, :] - 2.0 * (sub[:, j] @ bj.T)
        codes[:, j] = d.argmin(axis=1)
    return codes


def _pq_encode_frame(
    df: DataFrame,
    books: np.ndarray,
    id_col: str,
    vec_col: str,
    normalize: bool = True,
) -> DataFrame:
    """(neighbor_id, code) PQ encoding of ``df``'s vectors under the
    given codebooks — the ONE encoder :func:`write_pq_index` and
    :func:`append_to_pq_index` share, so appended codes are
    byte-identical to what a write-time encode of the same vectors
    would produce.  ``normalize`` must be the INDEX's persisted mode
    (``{table}_params``): encoding raw vectors against cosine-space
    codebooks (or vice versa) silently produces garbage codes."""
    enc_schema = T.StructType(
        [
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("code", T.BinaryType()),
        ]
    )

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if normalize:
                mat = _normalize(mat)
            codes = _encode_codes(mat, books).astype(np.uint8)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf[id_col].to_numpy(),
                    "code": [row.tobytes() for row in codes],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(encode, schema=enc_schema)


def write_pq_index(
    corpus: DataFrame,
    table: str,
    path: str,
    m: int = 8,
    ksub: int = 16,
    sample_size: int = 2048,
    n_buckets: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    files_per_bucket: int = 1,
    books: "np.ndarray | list | None" = None,
    normalize: bool = True,
) -> None:
    """Fit codebooks on a bounded sample, encode the corpus ONCE in a
    distributed Arrow map, and persist codes + re-rank sidecar + codebooks.

    The codes table is written plain (probes scan it narrowly — there is
    no join to co-locate) with codes as BINARY — exactly m bytes/vector,
    the 4·dim/m compression the module header promises (hence
    ``ksub <= 256``); the vector sidecar is bucketed on neighbor_id so
    the exact re-rank's index side never shuffles.  Codebooks are
    persisted so probes reproduce pq_topk's arithmetic exactly without
    touching raw corpus vectors.

    ``books``, if given, SKIPS the fit and uses the supplied (m, ksub,
    dim/m) codebooks verbatim — the externally-trained-quantizer
    workflow, symmetric with ``write_ivf_index(centers=)`` and
    ``write_lsh_index(planes=)``.  ``normalize=False`` encodes and
    scores RAW vectors (inner-product PQ over a pre-scaled corpus, or
    exact-integer-reproducible quantized vectors) instead of
    L2-normalized ones; the mode is PERSISTED in ``{table}_params``
    (written LAST, after every data table) and read back by the probe
    and append — never caller-resupplied, since probing normalize=False
    codes with normalized LUTs silently craters the shortlist.  The
    stale params table is dropped FIRST, so a crash mid-write leaves no
    params and a params-reading probe fails loudly instead of pairing
    mixed generations.
    """
    from video_etl_spark.operators.io import write_bucketed
    from video_etl_spark.session import ensure_executor_package

    spark = corpus.sparkSession
    ensure_executor_package(spark)
    if ksub > 256:
        raise ValueError(
            f"write_pq_index requires ksub <= 256 (got {ksub}): codes are "
            "persisted as one byte per subspace"
        )

    # validation before destruction: check the explicit books — including
    # dsub against the corpus dimension, or a wrong-width codebook would
    # pass here, destroy the old params, and then die as an opaque
    # reshape error inside the Arrow encode — BEFORE dropping the old
    # generation's params
    if books is not None:
        books = np.asarray(books, dtype=np.float64)
        if books.ndim != 3 or books.shape[0] != m or books.shape[1] != ksub:
            raise ValueError(
                f"write_pq_index: explicit books shape {books.shape} "
                f"contradicts (m={m}, ksub={ksub}, dsub)"
            )
        head = corpus.select(vec_col).head()
        if head is None:
            raise ValueError("write_pq_index: empty corpus")
        dim = len(head[0])
        if m * books.shape[2] != dim:
            raise ValueError(
                f"write_pq_index: books dsub={books.shape[2]} × m={m} "
                f"= {m * books.shape[2]} does not cover the corpus "
                f"dimension {dim}"
            )
    spark.sql(f"DROP TABLE IF EXISTS {table}_params")
    if books is None:
        sample = _ordered_sample(corpus, id_col, vec_col, sample_size)
        if normalize:
            sample = _normalize(sample)
        books = _fit_pq_codebooks(sample, m=m, ksub=ksub, seed=seed)

    (
        _pq_encode_frame(corpus, books, id_col, vec_col, normalize)
        .write.mode("overwrite")
        .option("path", f"{path}/codes")
        .saveAsTable(table)
    )
    write_bucketed(
        _vec_sidecar_rows(corpus, id_col, vec_col),
        f"{table}_vecs",
        f"{path}/vectors",
        ["neighbor_id"],
        n_buckets,
        files_per_bucket,
    )
    # the encode mode rides ON the books rows too (not only in params):
    # the probe must already collect books to build LUTs, so carrying
    # `normalize` there means a probe called without params_df still
    # reads the persisted mode instead of silently assuming True against
    # a normalize=False index — the exact 'craters the shortlist' failure
    # the params table was built to prevent (round-10 ADVICE medium)
    spark.createDataFrame(
        [
            (j, c, books[j, c].tolist(), bool(normalize))
            for j in range(books.shape[0])
            for c in range(books.shape[1])
        ],
        "subspace int, code int, center array<double>, normalize boolean",
    ).coalesce(1).write.mode("overwrite").option(
        "path", f"{path}/books"
    ).saveAsTable(f"{table}_books")
    # params LAST: its presence vouches that every table above is from
    # this generation (the has_planes discipline, round-9)
    spark.createDataFrame(
        [(int(books.shape[0]), int(books.shape[1]), bool(normalize))],
        "m int, ksub int, normalize boolean",
    ).coalesce(1).write.mode("overwrite").option(
        "path", f"{path}/params"
    ).saveAsTable(f"{table}_params")


def pq_topk_against_index(
    queries: DataFrame,
    codes: DataFrame,
    vectors: DataFrame,
    books_df: DataFrame,
    k: int = 10,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 65_536,
    params_df: DataFrame | None = None,
) -> DataFrame:
    """:func:`pq_topk` against a persisted index (``spark.table`` reads of
    :func:`write_pq_index`'s tables) — identical output for the same
    corpus / seed / parameters (tested), with the corpus never re-sampled
    or re-encoded.

    The partition-local top-``k*refine`` prefilter is sound under ANY
    partitioning of the codes table (every global top-r candidate is in
    its own partition's top-r), so the persisted layout need not match the
    original corpus scan.  Query LUTs are driver-built and broadcast, so
    the query set is capped at ``max_queries`` with a loud raise; the two
    driver collects (codebooks: m·ksub rows, queries: bounded) are
    control-plane reads.

    The index's persisted encode mode is read from the ``normalize``
    marker ``write_pq_index`` stamps on every ``{table}_books`` row —
    a table this probe must already collect, so a caller who forgets
    ``params_df`` still gets raw-space LUTs against a normalize=False
    index instead of silently-cratered shortlists (round-10 ADVICE).
    ``params_df`` (the ``{table}_params`` table) remains the
    authoritative sidecar: when passed it is cross-checked against the
    books marker and the books shape — any mismatch raises, it means the
    tables are from different generations.  Only a LEGACY index (books
    predating the marker, no params passed) falls back to
    normalize=True, the only mode that existed then.
    """
    from video_etl_spark.session import ensure_executor_package

    ensure_executor_package(queries.sparkSession)

    book_rows = books_df.collect()
    books = _books_from_rows(book_rows)
    m, _, dsub = books.shape
    normalize = _pq_mode_from_book_rows(book_rows)
    if params_df is not None:
        p = params_df.collect()[0]
        if p["m"] != m or p["ksub"] != books.shape[1]:
            raise ValueError(
                f"pq_topk_against_index: books shape {books.shape[:2]} "
                f"contradicts the params sidecar ({p['m']}, {p['ksub']}) "
                "— mixed index generations"
            )
        if normalize is not None and normalize != bool(p["normalize"]):
            raise ValueError(
                "pq_topk_against_index: the books normalize marker "
                f"({normalize}) contradicts the params sidecar "
                f"({bool(p['normalize'])}) — mixed index generations"
            )
        normalize = bool(p["normalize"])
    elif normalize is None:
        normalize = True  # legacy pre-marker index, pre-params era

    # duplicate query ids collapse — probe-family convention (see
    # ivf_topk_against_index); the DEDUPED frame must feed both the LUT
    # collect AND the exact re-rank join below (see pq_topk); conflicting
    # vectors under one id are detected driver-side on the collected rows
    queries = queries.dropDuplicates([id_col, vec_col])
    q_rows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len({r[0] for r in q_rows}) < len(q_rows):
        raise ValueError(
            f"pq_topk_against_index: conflicting vectors under a single "
            f"{id_col} in the query set — a duplicated query id must "
            "carry an identical vector"
        )
    if len(q_rows) > max_queries:
        raise ValueError(
            f"pq_topk_against_index query set exceeds max_queries="
            f"{max_queries} distinct ids; batch the queries (or raise "
            "max_queries deliberately) — the query LUTs are driver-built "
            "and broadcast"
        )
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    if normalize:
        q_mat = _normalize(q_mat)
    luts = np.einsum("qjd,jcd->qjc", q_mat.reshape(len(q_ids), m, dsub), books)

    r_keep = k * refine
    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("approx_ip", T.DoubleType()),
        ]
    )

    def score_partition(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            code_mat = np.stack(
                [np.frombuffer(b, dtype=np.uint8) for b in pdf["code"]]
            ).astype(np.int64)
            approx = _adc_scores(luts, code_mat)
            ids = pdf["neighbor_id"].to_numpy()
            rows = []
            keep = min(r_keep, approx.shape[1])
            # same deterministic tie-break as pq_topk (approx desc, id
            # asc) — required for layout-independent equivalence
            for qi in range(len(q_ids)):
                a = approx[qi]
                for bi in _det_topk_idx(a, ids, keep):
                    rows.append((int(q_ids[qi]), int(ids[bi]), float(a[bi])))
            yield pd.DataFrame(
                rows, columns=["query_id", "neighbor_id", "approx_ip"]
            )

    cand = codes.select("neighbor_id", "code").mapInPandas(
        score_partition, schema=out_schema
    )
    w_a = Window.partitionBy("query_id").orderBy(
        F.desc("approx_ip"), "neighbor_id"
    )
    shortlist = (
        cand.withColumn("arn", F.row_number().over(w_a))
        .filter(F.col("arn") <= r_keep)
        .select("query_id", "neighbor_id")
    )

    rer = shortlist.join(
        F.broadcast(
            queries.select(
                F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("query_vec"),
            )
        ),
        "query_id",
    ).join(vectors.select("neighbor_id", "neighbor_vec", "nrm"), "neighbor_id")
    # identical re-rank arithmetic to pq_topk: the sidecar's neighbor_vec
    # was cast to double and nrm computed with pq_topk's expression at
    # write time, so cos_sim values are bit-identical
    qd = "transform(query_vec, x -> cast(x as double))"
    dot = (
        f"aggregate(zip_with({qd}, neighbor_vec, (a, b) -> a * b), 0D, "
        "(s, v) -> s + v)"
    )
    nq = f"sqrt(aggregate(transform({qd}, x -> x * x), 0D, (s, v) -> s + v))"
    scored = rer.withColumn("cos_sim", F.expr(_cos_expr(dot, f"{nq} * nrm")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


def append_to_pq_index(
    new: DataFrame,
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assume_disjoint: bool = False,
    files_per_bucket: int = 1,
) -> None:
    """Append a vector batch to a persisted PQ index
    (:func:`write_pq_index`): new vectors are encoded with the EXISTING
    codebooks (read from ``{table}_books`` — never refit, so previously
    written codes stay comparable) through the same encoder the writer
    used, and appended to the codes table and the bucketed re-rank
    sidecar.  Probing after k appends equals probing one index whose
    codes table covers the union under the original codebooks
    (differential-tested — and because ``write_pq_index``'s codebook
    sample is the ordered id-prefix, appending ids ABOVE the original
    corpus's range reproduces a full rebuild bit-for-bit).

    Same drift caveat as :func:`append_to_ivf_index`: codebooks are
    data-dependent, so a drifting embedding distribution quantizes new
    vectors poorly (rising reconstruction error, recall decay); the
    remedy is a new generation over the accumulated vectors.
    """
    from video_etl_spark.operators.io import append_bucketed
    from video_etl_spark.session import ensure_executor_package

    spark = new.sparkSession
    ensure_executor_package(spark)
    book_rows = spark.table(f"{table}_books").collect()
    books = _books_from_rows(book_rows)
    book_mode = _pq_mode_from_book_rows(book_rows)
    # The encode mode lives IN the index (never caller-resupplied), and
    # a MISSING params table is a hard error, not a legacy default:
    # write_pq_index drops params FIRST and writes it LAST, so its
    # absence next to live codes/books means a crashed re-write left
    # mixed generations — appending under an assumed normalize=True
    # would encode garbage codes against raw-space codebooks with no
    # signal (round-10 review).  Legacy pre-params indexes must be
    # rebuilt once with the current writer before appending.
    if not spark.catalog.tableExists(f"{table}_params"):
        raise ValueError(
            f"append_to_pq_index: {table}_params not found — either a "
            "crashed write_pq_index left mixed generations (rebuild the "
            "index) or the index predates the params sidecar (rebuild "
            "once with the current writer); appending under a guessed "
            "encode mode would silently corrupt the codes table"
        )
    normalize = bool(spark.table(f"{table}_params").collect()[0]["normalize"])
    if book_mode is not None and book_mode != normalize:
        raise ValueError(
            f"append_to_pq_index: the books normalize marker ({book_mode}) "
            f"contradicts {table}_params ({normalize}) — mixed index "
            "generations; rebuild the index before appending"
        )

    # Same discipline as append_to_lsh_index: ONE materialized
    # dedup of the batch (both sinks must see the same survivor row),
    # then PER-SINK anti-joins so a crash between the appends retries
    # to a self-healing no-op on the committed sink; localCheckpoint
    # truncates each self-inserting lineage.  Maintenance path, never
    # per micro-batch.
    batch = new.dropDuplicates([id_col]).localCheckpoint()
    fresh_c = _fresh_checkpointed(
        batch, lambda: spark.table(table), id_col, assume_disjoint
    )
    (
        _pq_encode_frame(fresh_c, books, id_col, vec_col, normalize)
        .write.mode("append")
        .saveAsTable(table)
    )
    fresh_v = _fresh_checkpointed(
        batch, lambda: spark.table(f"{table}_vecs"), id_col, assume_disjoint
    )
    append_bucketed(
        _vec_sidecar_rows(fresh_v, id_col, vec_col),
        f"{table}_vecs",
        files_per_bucket,
    )


# ---------------------------------------------------------------------------
# Streaming PQ serving: the compressed codes table is small by construction
# (m bytes/vector — 8 MB per million vectors at m=8), so it broadcasts to
# every executor and a STREAM of query vectors scores per micro-batch in a
# narrow mapInPandas — no stream-side shuffle, no state.  This is the
# online-serving twin of pq_topk's offline scan.


def pq_encode_corpus(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    max_rows: int = 4_000_000,
):
    """Driver-side PQ artifacts: (codebooks, ids, codes) numpy arrays.

    Codebooks are fit on a bounded sample; ENCODING runs distributed in a
    narrow Arrow map so only the m-byte codes (not the 4·dim-byte raw
    vectors) ever reach the driver — at m=8 that is 8 MB per million
    vectors, the size that later broadcasts to every executor for
    streaming serving.  A corpus above ``max_rows`` raises instead of
    materializing: past that size the codes belong in an encoded parquet
    table (pq_topk's scan path), not a driver array.
    """
    from video_etl_spark.session import ensure_executor_package

    ensure_executor_package(corpus.sparkSession)

    sample = _normalize(_ordered_sample(corpus, id_col, vec_col, sample_size))
    books = _fit_pq_codebooks(sample, m=m, ksub=ksub, seed=seed)
    dsub = sample.shape[1] // m

    enc_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("code", T.ArrayType(T.IntegerType())),
        ]
    )

    def encode(batches):
        import pandas as pd  # noqa: PLC0415 — executor-side import

        for pdf in batches:
            if not len(pdf):
                continue
            mat = _normalize(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            codes = _encode_codes(mat, books)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "code": [row.tolist() for row in codes],
                }
            )

    encoded = (
        corpus.select(id_col, vec_col)
        .mapInPandas(encode, schema=enc_schema)
        .limit(max_rows + 1)
        .collect()
    )
    if len(encoded) > max_rows:
        raise ValueError(
            f"pq_encode_corpus corpus exceeds max_rows={max_rows}; write the "
            "codes to a parquet table instead of collecting driver-side "
            "artifacts (raise max_rows only if the driver can broadcast them)"
        )
    ids = np.array([r["vec_id"] for r in encoded], dtype=np.int64)
    codes = np.array([r["code"] for r in encoded], dtype=np.uint8)
    return books, ids, codes


def _parse_jvm_mem(size: "str | None") -> "int | None":
    """``spark.executor.memory``-style size string → bytes (None when
    unset/unparseable — the caller falls back to the floor).  A bare
    number means MiB, matching Spark's own reading of this conf
    (``getSizeAsMb``: "4096" == 4096m) — treating it as bytes would
    silently collapse the executor-aware sizing to the floor on any
    cluster configured with plain numbers."""
    if not size:
        return None
    s = size.strip().lower()
    units = {"k": 10, "m": 20, "g": 30, "t": 40}
    mult = 20  # Spark's default unit for executor memory is MiB
    if s.endswith("b") and len(s) > 1 and s[-2] in units:
        s = s[:-1]
    if s and s[-1] in units:
        mult = units[s[-1]]
        s = s[:-1]
    try:
        return int(float(s)) << mult
    except ValueError:
        return None


def default_query_block(
    spark,
    n_codes: int,
    floor: int = 512,
    cap: int = 65_536,
    mem_fraction: float = 0.25,
) -> int:
    """Size the ADC ``query_block`` from the executor memory budget
    (round-11 verdict #6): the serving peak is one (query_block,
    n_codes) float64 plane, so ``block = mem_fraction × budget /
    (slots × 8 × n_codes)`` — computed instead of hand-tuned, so a
    right-sized cluster executor (say 4 GiB) doesn't OOM on its first
    oversized query batch.

    Two corrections over the naive docstring formula (round-12 ADVICE):
    the plane lives in PYTHON-WORKER memory, not the JVM heap, so when
    ``spark.executor.pyspark.memory`` is set (the actual Python-worker
    limit on a cluster) it IS the budget and ``spark.executor.memory``
    is only the proxy fallback; and an executor runs
    ``spark.executor.cores`` mapInPandas tasks CONCURRENTLY, each with
    its own Python worker and its own plane — without dividing by the
    task slots, 4 cores × 25 % = 100 % of the budget in aggregate,
    re-creating exactly the container OOM the sizing was meant to
    prevent.  When the cores conf is unset the slot count is deploy-
    mode-dependent (YARN/k8s default 1; STANDALONE gives the executor
    every worker core), so an unset-cores standalone master assumes a
    conservative 8 slots — see the inline comment.

    Falls back to ``floor`` (the measured-safe 512 the rehearsals used)
    when neither memory conf is set — e.g. plain local mode, where the
    driver JVM owns the memory and 512 is already the proven dial.
    Results are bit-identical at ANY block size (equivalence-tested),
    so this only moves the memory/throughput trade-off."""
    def _conf(key):
        try:
            return spark.conf.get(key, None)
        except Exception:  # noqa: BLE001 — conf access varies by deploy mode
            return None

    # spark.executor.pyspark.memory is the real Python-worker cap when
    # set; spark.executor.memory is a JVM-heap proxy otherwise.
    mem_bytes = _parse_jvm_mem(_conf("spark.executor.pyspark.memory"))
    if mem_bytes is None:
        mem_bytes = _parse_jvm_mem(_conf("spark.executor.memory"))
    if mem_bytes is None:
        return floor
    try:
        slots = int(_conf("spark.executor.cores") or 0)
    except ValueError:
        slots = 0
    if slots < 1:
        # spark.executor.cores unset: YARN/k8s default to 1 slot, but
        # STANDALONE gives the executor every worker core — unknowable
        # from the driver conf, so assume a conservative 8 slots there.
        # Undersizing only costs throughput (the floor guarantees
        # progress); oversizing re-creates the aggregate container OOM
        # this division exists to prevent.
        master = (_conf("spark.master") or "").lower()
        slots = 8 if master.startswith("spark://") else 1
    block = int(mem_bytes * mem_fraction / (slots * 8 * max(1, n_codes)))
    return max(floor, min(cap, block))


def pq_serve_stream(
    stream_queries: DataFrame,
    books: np.ndarray,
    ids: np.ndarray,
    codes: np.ndarray,
    k: int = 10,
    id_col: str = "query_id",
    vec_col: str = "embedding",
    query_block: "int | None" = None,
) -> DataFrame:
    """Score a (possibly streaming) DataFrame of query vectors against the
    broadcast PQ codes; emits (query_id, neighbor_id, approx_ip, rn).

    ``query_block`` bounds the serving memory: per-query top-k is
    independent, so the ADC scores are computed and reduced one query
    block at a time — peak is one (query_block, n_codes) float64 plane
    (~400 MB at 512 × 100k codes) instead of one plane for the WHOLE
    Arrow chunk, which at the 10× rehearsal's 4000-query maintenance
    batch × 196k codes was a 6.3 GB intermediate per chunk (fine on a
    128 GiB box, an OOM on right-sized cluster executors).  Results are
    bit-identical at any block size — _adc_scores and the top-k
    tie-break operate row-wise.  None (the default) sizes it from the
    executor memory budget via :func:`default_query_block`
    (memory_budget / (8 × n_codes), floored at the measured-safe 512);
    the einsum per block is tiny next to the ADC."""
    from pyspark.sql import types as T

    from video_etl_spark.session import ensure_executor_package

    ensure_executor_package(stream_queries.sparkSession)
    if query_block is None:
        query_block = default_query_block(
            stream_queries.sparkSession, len(codes)
        )
    if query_block < 1:
        raise ValueError(f"query_block must be >= 1, got {query_block}")
    m = books.shape[0]
    dsub = books.shape[2]
    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("approx_ip", T.DoubleType()),
            T.StructField("rn", T.LongType()),
        ]
    )

    def run(batches):
        import pandas as pd  # noqa: PLC0415 — executor-side import

        for pdf in batches:
            if not len(pdf):
                continue
            q_all = _normalize(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            )
            qids = pdf[id_col].to_numpy()
            rows = []
            for s in range(0, len(q_all), query_block):
                q = q_all[s:s + query_block]
                luts = np.einsum(
                    "qjd,jcd->qjc", q.reshape(len(q), m, dsub), books
                )
                approx = _adc_scores(luts, codes)
                for qi in range(len(q)):
                    order = _det_topk_idx(approx[qi], ids, min(k, len(ids)))
                    for rank, bi in enumerate(order, start=1):
                        rows.append(
                            (int(qids[s + qi]), int(ids[bi]),
                             float(approx[qi, bi]), rank)
                        )
            yield pd.DataFrame(
                rows, columns=["query_id", "neighbor_id", "approx_ip", "rn"]
            )

    return stream_queries.mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Layered ANN serving — IVF coarse prune → broadcast-codes ADC → exact
# re-rank: the composition of the three individually-measured shapes that a
# 100 TB deployment actually runs (round-11 verdict #2).  The corpus is
# assigned ONCE into IVF cells and PQ-encoded ONCE in the same pass; a
# query batch then (1) ranks cells against the broadcast coarse quantizer,
# (2) ADC-scores ONLY the probed cells' codes — per-batch cost = queries ×
# (n_probe × occupancy) codes instead of queries × corpus (the structural
# fix for pq_serve_stream's corpus-sized scan), and (3) exact-re-ranks the
# bounded shortlist against the partition-pruned vector parquet.  Layering
# compounds two lossy stages (a true neighbor outside the probed cells, or
# inside them but outside the ADC shortlist), so the rehearsal reports
# recall against exact brute force honestly rather than asserting it.


class PqIvfIndex(NamedTuple):
    """Driver-side serving artifacts of a layered PQ-over-IVF index,
    grouped by cell so each cell's codes are one contiguous slice:
    ``ids[cell_ptr[c]:cell_ptr[c+1]]`` are cell ``c``'s members.  At m=8
    this is ~13 bytes/vector (8 code + 4 id… codes uint8 (n, m), ids
    int64, cells int32) — 13 MB per million vectors, broadcastable like
    ``pq_encode_corpus``'s arrays; past ``max_rows`` the same composition
    runs with the codes scanned from the index parquet instead of
    broadcast (the cell-sharded form), which is why the build persists
    codes alongside the vectors."""

    books: np.ndarray     # (m, ksub, dsub) float64 PQ codebooks
    centers: np.ndarray   # (n_cells, dim) float64 coarse quantizer
    ids: np.ndarray       # (n,) int64, grouped by cell
    codes: np.ndarray     # (n, m) uint8, same order as ids
    cells: np.ndarray     # (n,) int32, ascending
    cell_ptr: np.ndarray  # (n_cells + 1,) slice offsets into ids/codes
    normalize: bool       # encode/assign space (cosine vs raw)


def _group_by_cell(
    ids: np.ndarray, cells: np.ndarray, codes: np.ndarray, n_cells: int
):
    """Stable-sort the (ids, cells, codes) triple by cell and build the
    slice-offset array — the one grouping both the build and the append
    use, so appended artifacts keep the contiguous-slice contract."""
    order = np.argsort(cells, kind="stable")
    ids, cells, codes = ids[order], cells[order], codes[order]
    cell_ptr = np.searchsorted(cells, np.arange(n_cells + 1))
    return ids, cells, codes, cell_ptr


def write_pq_ivf_index(
    corpus: DataFrame,
    path: str,
    m: int = 8,
    ksub: int = 16,
    n_centroids: int = 8,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    centers: "list | np.ndarray | None" = None,
    books: "np.ndarray | list | None" = None,
    normalize: bool = True,
    max_rows: int = 4_000_000,
    return_artifacts: bool = True,
) -> "PqIvfIndex | None":
    """Build the layered index in ONE distributed pass: normalize (per
    ``normalize``), assign each vector to its nearest coarse center, and
    PQ-encode it; persist (neighbor_id, neighbor_vec, code) partitioned
    by centroid under ``{path}/vectors`` plus the ``centers``/``books``/
    ``params`` sidecars; return the driver-side serving artifacts
    (re-read from the persisted index via :func:`read_pq_ivf_index`, so
    build-then-serve and restart-then-serve run the same code path).

    The coarse assignment and the PQ encode share the vector load and
    the same numpy space (both post-``normalize``), so the cell a
    vector's code is filed under is BY CONSTRUCTION the cell the serve
    path's query-side ranking probes — there is no dual-assignment
    drift for the re-rank's partition pruning to miss.  Ties take the
    lowest centroid / code id (argmin first-match), matching the probe
    and oracle tie-breaks.  Explicit ``centers``/``books`` skip the fits
    (the externally-trained-quantizer workflow, symmetric with
    ``write_ivf_index(centers=)`` / ``write_pq_index(books=)``).

    Null / null-element / dim-mismatched vectors fail LOUDLY via the
    same inline when/raise_error guard :func:`_assign_cells` carries
    (zero extra corpus passes).  The guard is not optional hygiene
    here: Arrow converts a null element inside array<double> to NaN —
    which np.stack happily accepts — and an all-NaN distance row
    argmin-assigns to cell 0 with a garbage code, after which the
    re-rank's NaN cosine sorts ABOVE every real score and the corrupt
    vector wins rank 1.

    ``return_artifacts=False`` skips the driver read-back and returns
    None — the build path for corpora past ``max_rows``, whose serving
    form is :func:`pq_ivf_shortlist_scanned` (codes scanned, never
    collected); without it a >cap build would raise AFTER the full
    distributed write succeeded.

    Drift monitoring: the vectors table shares the IVF layout
    (centroid-partitioned), so :func:`ivf_cell_occupancy` works on this
    index unchanged — the rotate-generations signal when appends crowd
    few cells.
    """
    from video_etl_spark.session import ensure_executor_package

    spark = corpus.sparkSession
    ensure_executor_package(spark)
    if ksub > 256:
        raise ValueError(
            f"write_pq_ivf_index requires ksub <= 256 (got {ksub}): codes "
            "are persisted as one byte per subspace"
        )
    head = corpus.select(vec_col).head()
    if head is None:
        raise ValueError("write_pq_ivf_index: empty corpus")
    dim = len(head[0])
    if dim % m:
        raise ValueError(
            f"write_pq_ivf_index: dim={dim} does not split into m={m} "
            "subspaces"
        )
    if books is not None:
        books = np.asarray(books, dtype=np.float64)
        if books.shape != (m, ksub, dim // m):
            raise ValueError(
                f"write_pq_ivf_index: explicit books shape {books.shape} "
                f"contradicts (m={m}, ksub={ksub}, dsub={dim // m})"
            )
    if centers is not None:
        centers = np.asarray(centers, dtype=np.float64)
        if centers.shape != (n_centroids, dim):
            raise ValueError(
                f"write_pq_ivf_index: explicit centers shape "
                f"{centers.shape} contradicts (n_centroids={n_centroids}, "
                f"dim={dim})"
            )
    if books is None or centers is None:
        sample = _ordered_sample(corpus, id_col, vec_col, sample_size)
        if normalize:
            sample = _normalize(sample)
        if books is None:
            books = _fit_pq_codebooks(sample, m=m, ksub=ksub, seed=seed)
        if centers is None:
            # the coarse quantizer reuses the subspace-kmeans routine on
            # the FULL vectors (m=1): same Lloyd arithmetic, same seed
            # discipline as the codebooks — no Spark ML dependency in the
            # layered path, so the build stays one distributed pass
            centers = _fit_pq_codebooks(
                sample, m=1, ksub=n_centroids, seed=seed
            )[0]
    cmat = np.asarray(centers, dtype=np.float64)
    cnorm2 = (cmat**2).sum(axis=1)
    do_norm = bool(normalize)

    out_schema = T.StructType(
        [
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("neighbor_vec", T.ArrayType(T.DoubleType())),
            T.StructField("nrm", T.DoubleType()),
            T.StructField("code", T.BinaryType()),
            T.StructField("centroid", T.IntegerType()),
        ]
    )

    def encode_assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if do_norm:
                mat = _normalize(mat)
            # assignment: argmin(‖c‖² − 2·v·c) — the ‖v‖² term is
            # per-row constant (the _assign_cells matmul form)
            cell = (cnorm2[None, :] - 2.0 * (mat @ cmat.T)).argmin(axis=1)
            code = _encode_codes(mat, books).astype(np.uint8)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf[id_col].to_numpy(),
                    "neighbor_vec": [row.tolist() for row in mat],
                    # persisted once so the re-rank never recomputes a
                    # neighbor norm per (query, neighbor) pair — the
                    # LSH/PQ vector-sidecar convention
                    "nrm": np.sqrt((mat**2).sum(axis=1)),
                    "code": [row.tobytes() for row in code],
                    "centroid": cell.astype(np.int32),
                }
            )

    guarded = corpus.select(
        F.col(id_col).alias(id_col),
        _vector_guard(
            vec_col,
            dim,
            "write_pq_ivf_index: null vector, vector with null elements, "
            f"all-zero vector, or vector whose dimension differs from "
            f"dim={dim} — Arrow turns null elements into NaN, which would "
            "argmin-assign to cell 0 with a garbage code and rank ABOVE "
            "real scores at re-rank time; an all-zero vector persists "
            "nrm=0.0 whose 0/0 cosine NaN-ranks first",
        ).alias(vec_col),
    )
    (
        guarded.mapInPandas(encode_assign, schema=out_schema)
        # repartition by the partition column before the partitioned
        # write (standard small-files discipline): without it every
        # encode task emits one file per cell it touches, so a fresh
        # build starts at n_input_partitions files per cell — the probe
        # then pays that listing/open count on every batch (the
        # round-13 compaction rehearsal measured 2.8× on a 36-file/cell
        # layout).  One extra shuffle at build buys 1 file per cell.
        .repartition(F.col("centroid"))
        .write.mode("overwrite")
        .partitionBy("centroid")
        .parquet(f"{path}/vectors")
    )
    spark.createDataFrame(
        [(i, c.tolist()) for i, c in enumerate(cmat)],
        "centroid int, center array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centers")
    spark.createDataFrame(
        [
            (j, c, books[j, c].tolist(), bool(normalize))
            for j in range(books.shape[0])
            for c in range(books.shape[1])
        ],
        "subspace int, code int, center array<double>, normalize boolean",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/books")
    # params LAST: its presence vouches every table above is from this
    # generation (the write_pq_index discipline)
    spark.createDataFrame(
        [(int(m), int(ksub), int(n_centroids), bool(normalize))],
        "m int, ksub int, n_centroids int, normalize boolean",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")
    if not return_artifacts:
        return None
    return read_pq_ivf_index(spark, path, max_rows=max_rows)


def _read_pq_ivf_sidecars(spark, path: str):
    """(books, centers, normalize) from a layered index's sidecar
    tables — THE one loader every consumer shares (restart read, scanned
    shortlist, distributed append, n_probe sizing), so a params/books/
    centers schema change has exactly one read site and the quantizers a
    probe scores with cannot drift from the ones an append encodes with.
    All three collects are bounded by construction: one params row,
    m×ksub book rows, n_cells center rows."""
    prow = spark.read.parquet(f"{path}/params").collect()[0]
    books = _books_from_rows(spark.read.parquet(f"{path}/books").collect())
    centers = np.asarray(
        _centers_from_rows(spark.read.parquet(f"{path}/centers").collect()),
        dtype=np.float64,
    )
    return books, centers, bool(prow["normalize"])


def read_pq_ivf_index(
    spark, path: str, max_rows: int = 4_000_000
) -> PqIvfIndex:
    """Load the driver-side serving artifacts from a persisted layered
    index — the restart path, and the tail of :func:`write_pq_ivf_index`.
    Reads ONLY the narrow (neighbor_id, code, centroid) columns of the
    vectors table (parquet column pruning — the raw vectors never reach
    the driver); a corpus above ``max_rows`` raises like
    ``pq_encode_corpus`` (past that size the codes belong in the scanned
    cell-sharded form, not a broadcast array)."""
    books, centers, do_norm = _read_pq_ivf_sidecars(spark, path)
    rows = (
        spark.read.parquet(f"{path}/vectors")
        .select("neighbor_id", "code", "centroid")
        .limit(max_rows + 1)
        .collect()
    )
    if len(rows) > max_rows:
        raise ValueError(
            f"read_pq_ivf_index: index exceeds max_rows={max_rows}; serve "
            "from the cell-sharded codes parquet instead of driver arrays "
            "(raise max_rows only if the driver can broadcast them)"
        )
    ids = np.array([r["neighbor_id"] for r in rows], dtype=np.int64)
    cells = np.array([r["centroid"] for r in rows], dtype=np.int32)
    codes = (
        np.stack([np.frombuffer(r["code"], dtype=np.uint8) for r in rows])
        if rows
        else np.empty((0, books.shape[0]), dtype=np.uint8)
    )
    ids, cells, codes, cell_ptr = _group_by_cell(
        ids, cells, codes, len(centers)
    )
    return PqIvfIndex(
        books, centers, ids, codes, cells, cell_ptr, do_norm
    )


def pq_ivf_shortlist(
    stream_queries: DataFrame,
    index: PqIvfIndex,
    n_probe: int = 8,
    shortlist: int = 32,
    id_col: str = "query_id",
    vec_col: str = "embedding",
    query_block: "int | None" = None,
) -> DataFrame:
    """Stage 1+2 of the layered serve — coarse prune + ADC over the
    surviving cells — in ONE narrow map (streaming-safe: no join, no
    shuffle, no window).  Emits (query_id, neighbor_id, centroid,
    approx_ip, rn) with rn the ADC shortlist rank; ``centroid`` is the
    neighbor's cell, carried so :func:`pq_ivf_rerank`'s exact pass can
    partition-prune its vector scan to the probed cells.

    Per-batch cost is queries × (n_probe × mean occupancy) code lookups
    — the pruned-fraction cost the corpus-sized ``pq_serve_stream`` scan
    was measured to need at 10× (PERF.md round-11) — plus a queries ×
    n_cells coarse matmul.  Cell ranking is a per-query stable argsort
    over exact distances (ties → lowest cell id), so the probed set is
    deterministic and matches the build-side assignment tie-break.
    ``query_block`` bounds peak memory exactly like ``pq_serve_stream``
    (None → :func:`default_query_block` sized from the executor memory
    budget); results are bit-identical at any block size.

    STREAMING-SAFE means NO validation pass: a duplicated query row
    emits its shortlist twice (the raw ``pq_serve_stream`` semantics) —
    an at-least-once feed must dedupe upstream, or use the batch
    composition :func:`layered_topk_against_index`, which validates the
    batch the way the IVF probe does before shortlisting."""
    from video_etl_spark.session import ensure_executor_package

    ensure_executor_package(stream_queries.sparkSession)
    if query_block is None:
        query_block = default_query_block(
            stream_queries.sparkSession, len(index.ids)
        )
    if query_block < 1:
        raise ValueError(f"query_block must be >= 1, got {query_block}")
    if not (1 <= n_probe):
        raise ValueError(f"n_probe must be >= 1, got {n_probe}")
    if shortlist < 1:
        # shortlist=0 would reach _det_topk_idx with keep=0 and die with
        # a cryptic numpy error inside the executor (round-12 ADVICE)
        raise ValueError(f"shortlist must be >= 1, got {shortlist}")
    books, centers = index.books, index.centers
    ids, codes, cells, cell_ptr = (
        index.ids, index.codes, index.cells, index.cell_ptr,
    )
    m, _, dsub = books.shape
    n_probe = min(n_probe, len(centers))
    cnorm2 = (centers**2).sum(axis=1)
    do_norm = index.normalize
    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("centroid", T.IntegerType()),
            T.StructField("approx_ip", T.DoubleType()),
            T.StructField("rn", T.LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            q_all = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if do_norm:
                q_all = _normalize(q_all)
            qids = pdf[id_col].to_numpy()
            rows = []
            for s in range(0, len(q_all), query_block):
                q = q_all[s : s + query_block]
                luts = np.einsum(
                    "qjd,jcd->qjc", q.reshape(len(q), m, dsub), books
                )
                # stable argsort (not argpartition): boundary ties break
                # by lowest cell id, deterministically — the same
                # (distance, centroid) ascending order the IVF probe and
                # the build-side assignment use
                d = cnorm2[None, :] - 2.0 * (q @ centers.T)
                probed = np.argsort(d, axis=1, kind="stable")[:, :n_probe]
                # per-cell batching: queries probing the same cell score
                # against its contiguous code slice together
                pair_q = np.repeat(np.arange(len(q)), n_probe)
                pair_c = probed.ravel()
                order = np.argsort(pair_c, kind="stable")
                pair_q, pair_c = pair_q[order], pair_c[order]
                cand_scores = [[] for _ in range(len(q))]
                cand_idx = [[] for _ in range(len(q))]
                for st in range(len(pair_c)):
                    if st and pair_c[st] == pair_c[st - 1]:
                        continue
                    c = pair_c[st]
                    en = st
                    while en < len(pair_c) and pair_c[en] == c:
                        en += 1
                    lo, hi = cell_ptr[c], cell_ptr[c + 1]
                    if lo == hi:
                        continue
                    qrows = pair_q[st:en]
                    sc = _adc_scores(luts[qrows], codes[lo:hi])
                    for row_i, qi in enumerate(qrows):
                        cand_scores[qi].append(sc[row_i])
                        cand_idx[qi].append(np.arange(lo, hi))
                for qi in range(len(q)):
                    if not cand_scores[qi]:
                        continue
                    scores = np.concatenate(cand_scores[qi])
                    idx = np.concatenate(cand_idx[qi])
                    keep = _det_topk_idx(
                        scores, ids[idx], min(shortlist, len(idx))
                    )
                    for rank, ki in enumerate(keep, start=1):
                        bi = idx[ki]
                        rows.append(
                            (
                                int(qids[s + qi]),
                                int(ids[bi]),
                                int(cells[bi]),
                                float(scores[ki]),
                                rank,
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "query_id", "neighbor_id", "centroid", "approx_ip", "rn",
                ],
            )

    return stream_queries.select(id_col, vec_col).mapInPandas(run, schema)


def pq_ivf_rerank(
    spark,
    shortlist_df: DataFrame,
    queries: DataFrame,
    path: str,
    k: int = 10,
    id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Stage 3 — exact cosine re-rank of a bounded ADC shortlist against
    the layered index's vector parquet.  Emits (query_id, neighbor_id,
    cos_sim, rn).

    The vector scan carries a partition filter listing only the cells
    the shortlist touches (≤ queries × n_probe distinct — the
    ``ivf_topk_against_index`` pruning discipline), the shortlist and
    query sides broadcast (both are batch-bounded), and the cosine is
    pure JVM fold arithmetic over the query plus the ``nrm`` the build
    persisted per vector (a neighbor shortlisted by many queries never
    has its norm recomputed per pair) — scale-invariant, so it is
    correct whether the index stored normalized or raw vectors.  The
    bounded shortlist is eagerly ``localCheckpoint``-ed (it feeds both
    the cell-list collect and the returned plan); blocks release via
    GC/ContextCleaner like the CC-chain convention — nothing stays in
    the session cache, so a long-running serve loop never needs a
    catalog-wide clearCache that would evict co-tenant caches."""
    sl = shortlist_df.select(
        "query_id", "neighbor_id", "centroid"
    ).localCheckpoint()
    probed = [r["centroid"] for r in sl.select("centroid").distinct().collect()]
    inv = (
        spark.read.parquet(f"{path}/vectors")
        .filter(F.col("centroid").isin(probed))
        .select("neighbor_id", "centroid", "neighbor_vec", "nrm")
    )
    as_double = F.expr(f"transform({vec_col}, x -> cast(x as double))")
    qd = queries.select(
        F.col(id_col).alias("query_id"), as_double.alias("query_vec")
    )
    dot = (
        "aggregate(zip_with(query_vec, neighbor_vec, (a, b) -> a * b), "
        "0D, (s, v) -> s + v)"
    )
    nq = "sqrt(aggregate(transform(query_vec, x -> x * x), 0D, (s, v) -> s + v))"
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        inv.join(F.broadcast(sl), ["neighbor_id", "centroid"])
        .join(F.broadcast(qd), "query_id")
        .withColumn("cos_sim", F.expr(_cos_expr(dot, f"{nq} * nrm")))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


def layered_topk_against_index(
    spark,
    queries: DataFrame,
    path: str,
    index: "PqIvfIndex | None" = None,
    k: int = 10,
    n_probe: int = 8,
    shortlist: "int | None" = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_block: "int | None" = None,
    validate_queries: bool = True,
) -> DataFrame:
    """THE layered composition: coarse prune → broadcast-codes ADC →
    exact re-rank, against a persisted :func:`write_pq_ivf_index` index.
    Batch form (the re-rank joins and window-ranks, so run it inside
    ``foreachBatch`` for streams — the ``make_ann_serve_handler``
    convention); :func:`pq_ivf_shortlist` alone is the streaming-safe
    approximate answer.  ``shortlist`` defaults to ``max(4·k, 32)`` —
    the re-rank can only repair ADC quantization error within the
    shortlist, so it scales with k.

    ``validate_queries`` mirrors ``ivf_topk_against_index``: exact
    duplicate query rows collapse (an at-least-once feed would
    otherwise get each neighbor at two consecutive ranks), conflicting
    vectors under one id raise; a caller that validates upstream can
    pass False to keep the batch fully lazy before the shortlist map."""
    if index is None:
        index = read_pq_ivf_index(spark, path)
    if shortlist is None:
        shortlist = max(4 * k, 32)
    if validate_queries:
        queries = _dedup_queries_validated(
            queries, id_col, vec_col, "layered_topk_against_index"
        )
    sl = pq_ivf_shortlist(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias(vec_col)
        ),
        index,
        n_probe=n_probe,
        shortlist=shortlist,
        id_col="query_id",
        vec_col=vec_col,
        query_block=query_block,
    )
    return pq_ivf_rerank(
        spark, sl, queries, path, k=k, id_col=id_col, vec_col=vec_col
    )


def append_to_pq_ivf_index(
    new: DataFrame,
    path: str,
    index: "PqIvfIndex | None" = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assume_disjoint: bool = False,
    return_artifacts: "bool | None" = None,
) -> "PqIvfIndex | None":
    """Append a vector batch under the FROZEN coarse centers and
    codebooks (the ``append_to_ivf_index`` / ``append_to_pq_index``
    discipline — never refit, so every persisted assignment and code
    stays valid).  Same IVF drift caveat: a drifting distribution crowds
    new vectors into few cells; the remedy is a fresh
    :func:`write_pq_ivf_index` generation.

    TWO physical forms, mirroring the serve side (round-12 verdict #4):

    * ``index`` given (broadcast regime) — returns the EXTENDED driver
      artifacts, re-grouped so the contiguous-slice contract holds.
      The encoded batch round-trips through the driver, bounded by the
      BATCH size (a 4k-vector batch is ~KBs), never the corpus.
    * ``index=None`` (scanned regime, default ``return_artifacts=False``)
      — the quantizers are read from the index's own ``params``/
      ``books``/``centers`` sidecars (bounded: m×ksub + n_cells rows),
      and the encoded rows are written STRAIGHT to the cell-partitioned
      parquet in one distributed pass with NO driver materialization of
      codes — the append shape a past-broadcast-cap corpus needs, where
      the driver arrays the broadcast form extends cannot exist at all
      (``read_pq_ivf_index`` raises past ``max_rows``).  Serve through
      the scanned twins.  Returns None.

    ``return_artifacts=False`` with an ``index`` skips the driver
    round-trip too (write-only append); ``return_artifacts=True``
    without an ``index`` raises — extended artifacts need base arrays
    to extend (load them with :func:`read_pq_ivf_index` if the corpus
    is still under the cap)."""
    from video_etl_spark.session import ensure_executor_package

    spark = new.sparkSession
    ensure_executor_package(spark)
    if return_artifacts is None:
        return_artifacts = index is not None
    if return_artifacts and index is None:
        raise ValueError(
            "append_to_pq_ivf_index: return_artifacts=True needs the base "
            "index arrays to extend — pass index= (read_pq_ivf_index) or "
            "use the scanned serving twins, which need no driver arrays"
        )
    if index is not None:
        books, centers, do_norm = index.books, index.centers, index.normalize
        # The eagerly-built corpus reader used to validate the
        # destination as a side effect; with the dedup reader now a
        # lazy thunk, this regime (quantizers from the driver object,
        # dedup possibly skipped via assume_disjoint) must check the
        # path itself — or a typo'd/stale generation path silently
        # grows an orphan vectors/ dir with no sidecars while the real
        # index misses the batch.  One metadata call.
        root = spark._jvm.org.apache.hadoop.fs.Path(f"{path}/vectors")
        if not root.getFileSystem(
            spark._jsc.hadoopConfiguration()
        ).exists(root):
            raise ValueError(
                f"append_to_pq_ivf_index: no vectors table at "
                f"{path!r}/vectors — not an existing layered-index "
                "generation (typo'd or superseded path?)"
            )
    else:
        books, centers, do_norm = _read_pq_ivf_sidecars(spark, path)
    cmat = centers
    cnorm2 = (cmat**2).sum(axis=1)
    as_double = F.expr(f"transform({vec_col}, x -> cast(x as double))")
    dim = centers.shape[1]
    new_d = new.select(
        F.col(id_col).alias("neighbor_id"), as_double.alias("scores")
    ).withColumn(
        "scores",
        _vector_guard(
            "scores",
            dim,
            "append_to_pq_ivf_index: null vector, vector with null "
            f"elements, all-zero vector, or vector whose dimension "
            f"differs from dim={dim} — it would be filed under a garbage "
            "cell and rank ABOVE real scores at re-rank time",
        ),
    )
    # the guard fires at the eager localCheckpoint below — loudly,
    # before anything is appended; the corpus reader is a thunk so a
    # disjoint append never pays the cell-partition discovery job
    fresh = _fresh_only(
        new_d.dropDuplicates(["neighbor_id"]),
        lambda: spark.read.parquet(f"{path}/vectors"),
        "neighbor_id",
        assume_disjoint,
    ).localCheckpoint()  # reads {path}/vectors, sink below appends to it

    out_schema = T.StructType(
        [
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("neighbor_vec", T.ArrayType(T.DoubleType())),
            T.StructField("nrm", T.DoubleType()),
            T.StructField("code", T.BinaryType()),
            T.StructField("centroid", T.IntegerType()),
        ]
    )

    def encode_assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["scores"].to_numpy()).astype(np.float64)
            if do_norm:
                mat = _normalize(mat)
            cell = (cnorm2[None, :] - 2.0 * (mat @ cmat.T)).argmin(axis=1)
            code = _encode_codes(mat, books).astype(np.uint8)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "neighbor_vec": [row.tolist() for row in mat],
                    "nrm": np.sqrt((mat**2).sum(axis=1)),
                    "code": [row.tobytes() for row in code],
                    "centroid": cell.astype(np.int32),
                }
            )

    if not return_artifacts:
        # scanned-regime append: encoded rows flow straight from the
        # Arrow encode stage into the cell-partitioned sink — one
        # distributed job, nothing driver-side (the write-side twin of
        # pq_ivf_shortlist_scanned's no-broadcast contract).  The
        # repartition caps fragmentation at ONE file per touched cell
        # per append (without it: one per encode task per cell), so the
        # compaction cadence is appends-counted, not task-counted
        fresh.mapInPandas(encode_assign, schema=out_schema).repartition(
            F.col("centroid")
        ).write.mode("append").partitionBy("centroid").parquet(
            f"{path}/vectors"
        )
        return None

    encoded = fresh.mapInPandas(encode_assign, schema=out_schema).persist()
    try:
        # same one-file-per-touched-cell discipline as the scanned form
        encoded.repartition(F.col("centroid")).write.mode(
            "append"
        ).partitionBy("centroid").parquet(f"{path}/vectors")
        new_rows = encoded.select("neighbor_id", "code", "centroid").collect()
    finally:
        encoded.unpersist()
    if not new_rows:
        return index
    ids = np.concatenate(
        [index.ids, np.array([r["neighbor_id"] for r in new_rows], np.int64)]
    )
    cells = np.concatenate(
        [index.cells, np.array([r["centroid"] for r in new_rows], np.int32)]
    )
    codes = np.concatenate(
        [
            index.codes,
            np.stack(
                [np.frombuffer(r["code"], dtype=np.uint8) for r in new_rows]
            ),
        ]
    )
    ids, cells, codes, cell_ptr = _group_by_cell(
        ids, cells, codes, len(centers)
    )
    return PqIvfIndex(
        books, centers, ids, codes, cells, cell_ptr, index.normalize
    )


def pq_ivf_shortlist_scanned(
    spark,
    queries: DataFrame,
    path: str,
    n_probe: int = 8,
    shortlist: int = 32,
    id_col: str = "query_id",
    vec_col: str = "embedding",
    max_queries: int = 65_536,
) -> DataFrame:
    """The layered shortlist for corpora PAST the driver-array cap —
    codes SCANNED from the cell-partitioned index parquet instead of
    broadcast (the form ``read_pq_ivf_index``'s ``max_rows`` raise
    points at; at 1B vectors the codes are 8 GB — shardable, not
    broadcastable).  Identical output to :func:`pq_ivf_shortlist` on
    the same index (equivalence-tested): same LUT arithmetic, same ADC
    addends, same (approx desc, id asc) cut.

    Shape inversion from the broadcast form: there the CODES ride to
    the queries; here the small side — the query batch — rides to the
    codes.  The query batch is validated, bounded (``max_queries``,
    the ``pq_topk_against_index`` discipline — its vectors ship to
    every executor), collected, coarse-assigned DRIVER-side against
    the centers sidecar, and closed over; the codes scan carries a
    partition filter listing only the probed cells (IO proportional to
    the pruned fraction), and each Arrow chunk ADC-scores its rows
    against exactly the queries probing that row's cell, emitting at
    most ``shortlist`` candidates per (query, chunk) — the partial
    top-r prefilter is sound under any partitioning because every
    global top-r candidate is in its own chunk's top-r (the ``pq_topk``
    argument).  One window per query merges partials to the global
    shortlist.  Batch form (window + driver collect): run inside
    ``foreachBatch`` for streams.  Feed the result to
    :func:`pq_ivf_rerank` for the exact pass — same columns as the
    broadcast shortlist."""
    from video_etl_spark.session import ensure_executor_package

    ensure_executor_package(spark)
    if not (1 <= n_probe):
        raise ValueError(f"n_probe must be >= 1, got {n_probe}")
    if shortlist < 1:
        # mirror of the broadcast form's check: shortlist=0 reaches
        # _det_topk_idx with keep=0 → cryptic executor-side numpy error
        raise ValueError(f"shortlist must be >= 1, got {shortlist}")
    books, centers, do_norm = _read_pq_ivf_sidecars(spark, path)
    m, _, dsub = books.shape
    n_probe = min(n_probe, len(centers))

    q = _dedup_queries_validated(
        queries, id_col, vec_col, "pq_ivf_shortlist_scanned", max_queries
    )
    rows = q.select(id_col, vec_col).collect()
    if not rows:
        return spark.createDataFrame(
            [],
            "query_id long, neighbor_id long, centroid int, "
            "approx_ip double, rn long",
        )
    qids = np.array([r[0] for r in rows], dtype=np.int64)
    qmat = np.stack([np.array(r[1]) for r in rows]).astype(np.float64)
    if do_norm:
        qmat = _normalize(qmat)
    # driver-side coarse assignment in query chunks (the d plane is
    # n_q × n_cells — chunking bounds it the query_block way); stable
    # argsort ties → lowest cell id, the shared tie-break
    cn2 = (centers**2).sum(axis=1)
    probe_map: dict[int, list] = {}
    for s in range(0, len(qmat), 8192):
        d = cn2[None, :] - 2.0 * (qmat[s : s + 8192] @ centers.T)
        probed = np.argsort(d, axis=1, kind="stable")[:, :n_probe]
        for qi_local, cells_row in enumerate(probed):
            for c in cells_row:
                probe_map.setdefault(int(c), []).append(s + qi_local)
    probe_arr = {c: np.asarray(v, dtype=np.int64) for c, v in probe_map.items()}
    probed_cells = sorted(probe_arr)

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("centroid", T.IntegerType()),
            T.StructField("approx_ip", T.DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            cell_vals = pdf["centroid"].to_numpy()
            for c in np.unique(cell_vals):
                qrows = probe_arr.get(int(c))
                if qrows is None:
                    continue
                sub = pdf[cell_vals == c]
                codes_c = np.stack(
                    [np.frombuffer(b, dtype=np.uint8) for b in sub["code"]]
                )
                nids = sub["neighbor_id"].to_numpy()
                # LUTs per cell group, the broadcast form's batched
                # einsum — recomputing a query's LUT once per probed
                # cell (n_probe×, ksub·dsub flops each) is far cheaper
                # than a per-task cache that could grow to one
                # (m, ksub) plane per query per executor (unbounded at
                # max_queries-scale batches)
                q_g = qmat[qrows]
                luts = np.einsum(
                    "qjd,jcd->qjc", q_g.reshape(len(q_g), m, dsub), books
                )
                sc = _adc_scores(luts, codes_c)
                keep = min(shortlist, len(nids))
                for row_i, qrow in enumerate(qrows):
                    top = _det_topk_idx(sc[row_i], nids, keep)
                    for bi in top:
                        out.append(
                            (
                                int(qids[qrow]),
                                int(nids[bi]),
                                int(c),
                                float(sc[row_i, bi]),
                            )
                        )
            yield pd.DataFrame(
                out,
                columns=["query_id", "neighbor_id", "centroid", "approx_ip"],
            )

    partials = (
        spark.read.parquet(f"{path}/vectors")
        .filter(F.col("centroid").isin(probed_cells))
        .select("neighbor_id", "code", "centroid")
        .mapInPandas(score, schema)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_ip"), "neighbor_id"
    )
    return (
        partials.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= shortlist)
        .select("query_id", "neighbor_id", "centroid", "approx_ip", "rn")
    )


def layered_topk_scanned(
    spark,
    queries: DataFrame,
    path: str,
    k: int = 10,
    n_probe: int = 8,
    shortlist: "int | None" = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 65_536,
) -> DataFrame:
    """:func:`layered_topk_against_index` in the SCANNED-codes form —
    the composition for corpora past the broadcast-array cap.  Same
    output contract (equivalence-tested against the broadcast form);
    cost per batch is one partition-pruned scan of the probed cells'
    codes plus the bounded exact re-rank."""
    if shortlist is None:
        shortlist = max(4 * k, 32)
    sl = pq_ivf_shortlist_scanned(
        spark,
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias(vec_col)
        ),
        path,
        n_probe=n_probe,
        shortlist=shortlist,
        id_col="query_id",
        vec_col=vec_col,
        max_queries=max_queries,
    )
    return pq_ivf_rerank(
        spark, sl, queries, path, k=k, id_col=id_col, vec_col=vec_col
    )


def n_probe_for_target(
    spark,
    queries: DataFrame,
    path: str,
    target_recall: float,
    k: int = 10,
    max_n_probe: "int | None" = None,
    max_queries: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> "tuple[int, dict[int, float]]":
    """Size ``n_probe`` for a layered index from a MEASURED cell-hit-rate
    readout (round-12 verdict #2): returns ``(n_probe, curve)`` where
    ``curve[p]`` is the measured coarse-prune CEILING recall@k at p
    probed cells — the fraction of the sample's TRUE top-k neighbors
    whose cell ranks within each query's first p cells — and ``n_probe``
    is the smallest p with ``curve[p] >= target_recall``.

    The readout is exact, not modeled: one distributed brute-force pass
    scores the bounded query sample against the index's own vector
    parquet (broadcast sample × corpus scan — linear, one-off; run it on
    a representative sample, it is a sizing procedure, not a serve
    path), collects only sample×k (neighbor cell, query) pairs, and
    ranks each true neighbor's cell inside its query's coarse ordering
    driver-side.  The ceiling is the right dial target because the
    composition's OTHER losses are measured ≤0.007 at production ksub
    (PERF.md round-12) — what the prune keeps, ADC+re-rank deliver.

    ``exclude_self``: corpus-drawn sample queries find themselves at
    rank 1 in their own cell (hit rank 0 by construction), inflating the
    curve — dropped by default.

    LOUD FALLBACK: when the target needs more than ``max_n_probe``
    cells (default: all of them — i.e. unreachable at any prune), raises
    ValueError carrying the measured curve, because that is the signal
    that the corpus does not cluster at this cell count (IVF's premise
    fails) and the remedy is fewer/better cells or no coarse stage, not
    a silently huge probe."""
    if not (0.0 < target_recall <= 1.0):
        raise ValueError(
            f"target_recall must be in (0, 1], got {target_recall}"
        )
    if k < 1:
        # k=0 would measure an empty top-k set and misreport the caller
        # bug as "the corpus does not cluster" (the sibling shortlist/
        # n_probe guards exist for the same cryptic-failure reason)
        raise ValueError(f"k must be >= 1, got {k}")
    from video_etl_spark.session import ensure_executor_package

    ensure_executor_package(spark)
    _, centers, do_norm = _read_pq_ivf_sidecars(spark, path)
    n_cells = len(centers)
    cap = n_cells if max_n_probe is None else min(max_n_probe, n_cells)

    q = _dedup_queries_validated(
        queries, id_col, vec_col, "n_probe_for_target", max_queries
    )
    rows = q.select(id_col, vec_col).collect()
    if not rows:
        raise ValueError("n_probe_for_target: empty query sample")
    qids = np.array([r[0] for r in rows], dtype=np.int64)
    qmat = np.stack([np.array(r[1]) for r in rows]).astype(np.float64)
    if do_norm:
        qmat = _normalize(qmat)

    # exact top-k of the sample vs the indexed corpus — the same
    # broadcast-queries / scan-vectors brute force pq_ivf_rerank runs,
    # minus the shortlist restriction; collects sample×k rows only
    qdf = spark.createDataFrame(
        [(int(i), v.tolist()) for i, v in zip(qids, qmat)],
        "query_id long, query_vec array<double>",
    )
    inv = spark.read.parquet(f"{path}/vectors").select(
        "neighbor_id", "centroid", "neighbor_vec", "nrm"
    )
    dot = (
        "aggregate(zip_with(query_vec, neighbor_vec, (a, b) -> a * b), "
        "0D, (s, v) -> s + v)"
    )
    nq = "sqrt(aggregate(transform(query_vec, x -> x * x), 0D, (s, v) -> s + v))"
    cand = inv.join(F.broadcast(qdf), how="cross")
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    top = (
        cand.withColumn("cos_sim", F.expr(_cos_expr(dot, f"{nq} * nrm")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "centroid")
        .collect()
    )

    # driver-side coarse ordering per sample query (same stable
    # tie-break as every probe/build site), then each true neighbor's
    # cell rank -> cumulative hit-rate curve over ALL p at once
    cn2 = (centers**2).sum(axis=1)
    d = cn2[None, :] - 2.0 * (qmat @ centers.T)
    order = np.argsort(d, axis=1, kind="stable")  # (n_q, n_cells)
    cell_rank = np.empty_like(order)
    np.put_along_axis(
        cell_rank, order, np.arange(n_cells)[None, :].repeat(len(qmat), 0), 1
    )
    qpos = {int(i): j for j, i in enumerate(qids)}
    ranks = np.array(
        [cell_rank[qpos[r["query_id"]], r["centroid"]] for r in top],
        dtype=np.int64,
    )
    hist = np.bincount(ranks, minlength=n_cells)
    cum = np.cumsum(hist) / max(1, len(ranks))
    curve = {p: float(cum[p - 1]) for p in range(1, n_cells + 1)}

    needed = int(np.argmax(cum >= target_recall)) + 1
    if cum[-1] < target_recall or needed > cap:
        head = {p: round(curve[p], 3) for p in sorted(curve)[:8]}
        raise ValueError(
            f"n_probe_for_target: target_recall={target_recall} needs "
            f"n_probe={needed if cum[-1] >= target_recall else '>'+str(n_cells)} "
            f"> max_n_probe={cap} at n_cells={n_cells} — the corpus does "
            "not cluster at this cell count (measured ceiling curve "
            f"head: {head}, full max {cum[-1]:.3f}); re-cell the index "
            "or drop the coarse stage"
        )
    return needed, curve


def _list_cell_files(spark, path: str) -> "dict[int, list[tuple[str, int]]]":
    """``{centroid: [(file_name, size_bytes), ...]}`` for a layered
    index's cell-partitioned vectors table via ONE Hadoop FileSystem
    listing of the partition directories — O(n_files) metadata calls,
    ZERO data or footer reads, any Spark-supported scheme (file/hdfs/
    s3a).  Hidden entries (``_SUCCESS``, ``.spark-staging-*``) are
    skipped exactly as Spark's own scans skip them.  This is the
    when-to-compact probe's cost model: a 100 TB corpus polled every
    append must never pay a row-group enumeration to answer a
    file-count question (round-13 verdict finding #1)."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(f"{path}/vectors")
    fs = root.getFileSystem(hconf)
    if not fs.exists(root):
        raise ValueError(
            f"_list_cell_files: no vectors table at {path!r}/vectors — "
            "not a layered index path (write_pq_ivf_index creates it)"
        )
    if fs.getUri().getScheme() == "file":
        # local/posix fast path: the Hadoop walk costs one py4j
        # round-trip per cell dir plus several per file — measured 4 s
        # for a 2000-cell index vs 24 ms with os.scandir (170×), and
        # the poll runs after EVERY append.  The local path comes from
        # Hadoop's OWN resolution of the root (toUri().getPath()) so
        # both branches list the identical directory — a urlparse-based
        # normalization would truncate at '#' or decode %XX sequences
        # Hadoop Path keeps literal.  Parity with the Hadoop walk is
        # test-pinned on the same index.
        import os

        out: "dict[int, list[tuple[str, int]]]" = {}
        with os.scandir(root.toUri().getPath()) as it:
            for e in it:
                if not (e.is_dir() and e.name.startswith("centroid=")):
                    continue
                cell = _centroid_dir_cell(e.name)
                if cell is None:
                    continue
                try:
                    cell_it = os.scandir(e.path)
                except FileNotFoundError:
                    # the whole cell dir vanished between the top-level
                    # listing and the walk (concurrent fold with
                    # carry="move" renames entire cell dirs) — absent
                    # from the readout, same stale-not-crash contract
                    # as the per-file stat below
                    continue
                files = []
                with cell_it:
                    for f in cell_it:
                        if not f.is_file() or f.name.startswith(("_", ".")):
                            continue
                        try:
                            files.append((f.name, f.stat().st_size))
                        except FileNotFoundError:
                            # vanished between scan and stat (concurrent
                            # retention/fold) — a stale readout, exactly
                            # what the one-shot Hadoop listStatus would
                            # have returned, not a crash
                            continue
                out[cell] = files
        return out
    return _list_cell_files_hadoop(fs, root)


def _centroid_dir_cell(name: str) -> "int | None":
    """Cell id from a ``centroid=<v>`` partition-dir name, or None when
    the value is not an integer (``centroid=__HIVE_DEFAULT_PARTITION__``,
    a foreign tool's dir) — skipped, matching how Spark's own partition
    discovery treats values it cannot cast to the partition type,
    instead of crashing the whole poll (round-14 verdict finding #4).
    Unreachable from this repo's writers (assignment always emits an
    int); purely defensive against foreign dirs.  The value must be
    ASCII digits (optional leading minus) — bare ``int()`` also accepts
    ``'+7'``, ``' 7'`` and ``'7_0'`` (== 70), any of which would ALIAS
    a foreign dir onto a real cell id and silently replace that cell's
    listing via last-wins dict assignment instead of being skipped."""
    val = name.split("=", 1)[1]
    core = val[1:] if val.startswith("-") else val
    if not core or not all("0" <= c <= "9" for c in core):
        return None
    cell = int(val)
    if str(cell) != val:
        # non-canonical digits ('07', '007', '-0', '00') parse to the
        # same int as a canonical dir that may sit beside them — the
        # alias-overwrite class again, so skip rather than collide
        return None
    return cell


def _vanished_fs_entry(exc: Exception) -> bool:
    """True when ``exc`` is a file-not-found from either filesystem
    stack: a Python :class:`FileNotFoundError` (local branch, test
    fakes) or a py4j-wrapped ``java.io.FileNotFoundException`` (Hadoop
    branch)."""
    return isinstance(exc, FileNotFoundError) or (
        "FileNotFoundException" in str(exc)
    )


def _list_cell_files_hadoop(fs, root) -> "dict[int, list[tuple[str, int]]]":
    """The remote-scheme walk behind :func:`_list_cell_files` — separate
    so the local-path parity test can run it directly (on a local
    filesystem every in-suite caller takes the scandir fast path, which
    would otherwise leave this branch test-dead)."""
    out: "dict[int, list[tuple[str, int]]]" = {}
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("centroid=")):
            continue
        cell = _centroid_dir_cell(name)
        if cell is None:
            continue
        try:
            listing = fs.listStatus(st.getPath())
        except Exception as exc:  # noqa: BLE001 — py4j wraps java IOEs
            if not _vanished_fs_entry(exc):
                raise
            # cell dir removed between the root listing and this walk
            # (concurrent move-carry fold) — stale readout, not a crash
            continue
        out[cell] = [
            (f.getPath().getName(), f.getLen())
            for f in listing
            if f.isFile()
            and not f.getPath().getName().startswith(("_", "."))
        ]
    return out


def pq_ivf_file_stats(
    spark, path: str, with_rows: bool = False
) -> DataFrame:
    """(centroid, n_files) fragmentation readout of a layered index's
    cell-partitioned vectors table — the when-to-compact signal for
    :func:`compact_pq_ivf_cells` (the layered twin of
    ``ivf_cell_occupancy``'s when-to-rotate readout).  Every
    :func:`append_to_pq_ivf_index` call adds at least one file per
    touched cell, so after k appends a probe's partition-pruned scan
    lists ~k files per probed cell; at 1000-executor scale that listing
    cost — not the data — is what compaction removes.

    The default form answers the metadata question with METADATA: a
    filesystem listing of the partition directories (O(n_files), no
    data read — round-13 verdict finding #1; the previous
    ``input_file_name`` group-by enumerated every row group of the
    corpus on every poll).  ``with_rows=True`` adds an ``n_rows``
    column via the data scan — the verification form used by the
    row-preservation tests, NOT the polling form."""
    if with_rows:
        return (
            spark.read.parquet(f"{path}/vectors")
            .select("centroid", F.input_file_name().alias("f"))
            .groupBy("centroid")
            .agg(
                F.count_distinct("f").alias("n_files"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            .orderBy("centroid")
        )
    cells = _list_cell_files(spark, path)
    return spark.createDataFrame(
        [(c, len(files)) for c, files in sorted(cells.items())],
        "centroid int, n_files bigint",
    )


def compact_pq_ivf_index(spark, src_path: str, dst_path: str) -> None:
    """Fold an append-fragmented layered index into a FRESH generation
    with exactly ONE file per cell — the file-count compaction leg of
    the index lifecycle (write → append → compact → swap readers → drop
    old generation), completing for the layered index what
    ``compact_bucketed_index`` / ``compact_component_index`` provide for
    the bucketed dedup indexes.

    Rows land unchanged: ``repartition(col)`` puts each cell's rows
    into one task, so the partitioned write emits one file per cell,
    and every consumer — scanned shortlist, partition-pruned re-rank,
    ``read_pq_ivf_index`` — is layout-independent by contract (per-chunk
    partial top-r, sorted grouping), so probes of the new generation are
    bit-identical (tested).  The quantizer sidecars are copied verbatim
    — never refit, the frozen-quantizer append discipline.  The
    destination must be a NEW path (``assert_new_generation``):
    overwriting the source would delete files mid-read.  The caller
    swaps readers to ``dst_path`` and drops the old generation after.

    Crash discipline (the ``maybe_refold`` convention): every write is
    ``overwrite`` and the ``params`` sidecar lands LAST, so it doubles
    as the generation's commit marker — a crash mid-compaction leaves a
    destination without readable params, and a retry overwrites the
    partial output with the identical fold (rows are a pure reshuffle
    of the source; nothing accumulates)."""
    from video_etl_spark.operators.io import assert_new_generation

    assert_new_generation(
        dst_path, [src_path], "the current layered-index generation"
    )
    # same committed-destination guard as the per-cell fold: a typo'd
    # dst naming an unrelated committed index would be DESTROYED by the
    # static overwrite below (round-15 review)
    _refuse_foreign_committed_dst(
        spark, src_path, dst_path, "compact_pq_ivf_index"
    )
    (
        spark.read.parquet(f"{src_path}/vectors")
        .repartition(F.col("centroid"))
        .write.mode("overwrite")
        .partitionBy("centroid")
        .parquet(f"{dst_path}/vectors")
    )
    for side in ("books", "centers", "params"):  # params last = committed
        (
            spark.read.parquet(f"{src_path}/{side}")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{dst_path}/{side}")
        )


def _pq_ivf_sidecar_fingerprint(spark, path: str):
    """Order-insensitive value readout of a generation's quantizer
    sidecars (params + centers + books) — bounded driver-side work
    (1 + n_cells + m×ksub rows, the same bound ``read_pq_ivf_index``'s
    artifact load documents).  Two generations with identical
    fingerprints assign and encode identically, so data from one can be
    committed under the other's path without creating a
    codes-vs-codebooks mismatch — the identity test behind
    :func:`compact_pq_ivf_cells`'s committed-destination guard."""
    out = []
    for side in ("params", "centers", "books"):
        rows = spark.read.parquet(f"{path}/{side}").collect()
        out.append(sorted(
            tuple(
                (k, tuple(v) if isinstance(v, list) else v)
                for k, v in sorted(r.asDict().items())
            )
            for r in rows
        ))
    return out


def _refuse_foreign_committed_dst(
    spark, src_path: str, dst_path: str, caller: str
) -> None:
    """Refuse a fold whose destination is a COMMITTED generation with a
    DIFFERENT quantizer fingerprint from the source's — i.e. an
    unrelated index a typo'd call points at, which the fold would
    destroy (full fold: static overwrite) or corrupt (per-cell fold:
    dynamic overwrite + sidecar replacement → stored codes no longer
    match codebooks).  A committed destination with an IDENTICAL
    fingerprint is the same index chain: every fold write is then an
    idempotent convergence, which keeps the retry-to-completion
    contract alive even for a retry AFTER the commit landed.
    Legitimate crash-retry destinations are uncommitted by
    construction — params lands last.  Absence-only commit test, same
    as ``maybe_compact_pq_ivf``: only ``AnalysisException`` (no
    readable params) counts as uncommitted; transient errors
    propagate."""
    from pyspark.errors import AnalysisException

    try:
        spark.read.parquet(f"{dst_path}/params").collect()
    except AnalysisException:
        return  # uncommitted destination — fresh or crash-retry
    if _pq_ivf_sidecar_fingerprint(spark, src_path) != (
        _pq_ivf_sidecar_fingerprint(spark, dst_path)
    ):
        raise ValueError(
            f"{caller}: {dst_path!r} is a COMMITTED generation whose "
            "quantizer sidecars (params/centers/books) differ from "
            f"{src_path!r}'s — writing into it would destroy or corrupt "
            "an unrelated index.  Pass a fresh or crash-retry "
            "destination (those are uncommitted: params lands last)"
        )


def _fan_copy_eligible(scheme: str, master: str) -> bool:
    """Whether the shutil-based executor fan-out of cold-cell copies is
    SAFE: it hands executors plain local paths, so it needs both a
    file-scheme filesystem AND a local master — on a multi-node cluster
    whose ``file://`` paths are not a shared mount, tasks would read/
    write their own local disks (at best a ``FileNotFoundError``, at
    worst silently carrying stale executor-local bytes while ``params``
    still commits — round-14 ADVICE).  Module-level so the truth table
    is testable and the warning path can be driven on a local suite."""
    return scheme == "file" and master.startswith("local")


def compact_pq_ivf_cells(
    spark,
    src_path: str,
    dst_path: str,
    max_files_per_cell: int = 2,
    carry: str = "copy",
    _cells: "dict[int, list[tuple[str, int]]] | None" = None,
) -> "dict[str, list[int]]":
    """Per-cell generation fold (round-13 verdict finding #2 / Next #2):
    rewrite ONLY the cells whose file count is at/above
    ``max_files_per_cell`` into the successor generation and carry the
    cold cells over WITHOUT rewriting their rows — so maintenance cost
    scales with FRAGMENTATION (appends touch few cells under the
    repartitioned writers), not with corpus size.  The full fold
    (:func:`compact_pq_ivf_index`) rewrites every cell; with a handful
    of hot cells on a 100 TB corpus that is a full-corpus shuffle every
    ~15 appends — this fold shuffles only the hot cells' rows.

    Hot cells: ONE partition-pruned read (``centroid IN hot`` reaches
    the scan as a partition filter — no cold byte is read), one
    ``repartition(centroid)`` so each lands as exactly one file, written
    with DYNAMIC partition overwrite so a retry replaces only the hot
    partitions and never deletes carried cold files.

    Cold cells: carried file-by-file through the Hadoop FileSystem API
    with names preserved, so "not rewritten" is assertable from the
    listing alone (same names, same sizes).  Two carry modes:

    * ``carry="copy"`` (default) — byte copy; no decode, no shuffle, no
      re-encode.  The source generation stays a complete readable
      snapshot until the caller drops it — the same contract as the
      full fold, and the reason it is the default: probes of the OLD
      path stay correct even after a crashed fold.  The bytes stream
      through the compaction client (fine at rehearsal scale; the
      100 TB upgrade path is a distcp-style distributed copy — or
      ``"move"``, which moves no bytes at all).
    * ``carry="move"`` — directory rename: O(1) metadata on HDFS and
      posix, a server-side COPY+DELETE on S3A — no cold byte ever
      moves through the client, so maintenance IO is O(hot rows) only.
      CONSUMES the source: once a move fold starts, ``src_path`` is no
      longer a complete generation — nothing is ever deleted (renames
      preserve every byte across the two paths), but probes of the
      source between a crash and the retry would silently miss the
      moved cells, so the fold must be RETRIED TO COMPLETION before
      serving resumes (the retry is idempotent: hot cells re-rewrite
      under dynamic overwrite; an untouched cold cell dir is renamed,
      a partially-carried one is finished per-file, and an all-cold
      fold whose crash landed after every rename finishes the sidecar
      commit instead of raising on the now-empty source).  Only choose
      move
      when the orchestrator guarantees fold-before-serve — e.g. the
      ``maybe_compact_pq_ivf`` loop's quiesced-window contract.

    Same crash discipline as the full fold: the ``params`` sidecar
    lands LAST and is the generation's commit marker — a crash anywhere
    earlier leaves a destination without readable params, and the retry
    converges on the identical fold.  Returns
    ``{"hot_cells": [...], "cold_cells": [...]}`` for the caller's log.
    """
    from video_etl_spark.operators.io import assert_new_generation

    if carry not in ("copy", "move"):
        raise ValueError(
            f"compact_pq_ivf_cells: carry must be 'copy' or 'move', "
            f"got {carry!r}"
        )
    if max_files_per_cell < 1:
        raise ValueError(
            f"max_files_per_cell must be >= 1, got {max_files_per_cell}"
        )
    assert_new_generation(
        dst_path, [src_path], "the current layered-index generation"
    )
    # _cells: maybe_compact_pq_ivf passes its own poll's listing so a
    # fired fold does not re-enumerate an unchanged (quiesced) source
    cells = _cells if _cells is not None else _list_cell_files(
        spark, src_path
    )
    finish_only: "list[int]" = []
    if not cells:
        # A crashed ALL-COLD carry="move" fold can leave every cell dir
        # already renamed into dst with the commit (params) not yet
        # written — the retry then lists an empty src/vectors.  Raising
        # here would make the promised retry-to-completion unable to
        # converge, stranding the rows in an uncommitted destination
        # (round-14 ADVICE); when dst already holds cell partitions,
        # FINISH THE COMMIT instead: the sidecars still live at src
        # (move renames only vectors/centroid=* dirs), so the copy
        # below completes the generation.  Unreachable via
        # maybe_compact_pq_ivf (a fired fold always has >=1 hot cell);
        # only direct all-cold move calls land here.
        try:
            finish_only = sorted(_list_cell_files(spark, dst_path))
        except ValueError:
            finish_only = []
        if not finish_only:
            raise ValueError(
                f"compact_pq_ivf_cells: no cell partitions under "
                f"{src_path!r}/vectors"
            )
    # COMMITTED-destination guard, BOTH paths (round-15 review): a
    # typo'd call pointing dst at an unrelated COMMITTED generation
    # would dynamic-overwrite partitions inside it and then replace its
    # quantizer sidecars with src's — an index whose stored codes no
    # longer match its codebooks, silently serving wrong neighbors.
    _refuse_foreign_committed_dst(
        spark, src_path, dst_path, "compact_pq_ivf_cells"
    )
    hot = sorted(
        c for c, files in cells.items() if len(files) >= max_files_per_cell
    )
    cold = sorted(c for c in cells if len(cells[c]) < max_files_per_cell)

    if hot:
        (
            spark.read.parquet(f"{src_path}/vectors")
            .where(F.col("centroid").isin([int(c) for c in hot]))
            .repartition(F.col("centroid"))
            .write.mode("overwrite")
            # dynamic: replace ONLY the partitions present in this
            # write — a static overwrite would wipe carried cold files
            # on retry, and with carry="move" their rows now live ONLY
            # at the destination
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("centroid")
            .parquet(f"{dst_path}/vectors")
        )

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    JPath = jvm.org.apache.hadoop.fs.Path
    FileUtil = jvm.org.apache.hadoop.fs.FileUtil
    fs = JPath(f"{src_path}/vectors").getFileSystem(hconf)
    # carry at DIRECTORY granularity — one JVM call per cold cell, not
    # three per file: a 400-cell index pays ~400 renames/recursive
    # copies instead of thousands of py4j mkdirs/exists/copy
    # round-trips (measured 2-4s of pure driver chatter at 10×).
    # Cold-cell COPIES on a local/posix store are additionally fanned
    # out over the executors (one task per slice of cells) — the
    # distcp-style distributed carry a non-posix store would need a
    # real distcp for (renames stay driver-side: they are metadata
    # calls, not byte streams)
    # gate the executor-fanned copy on the RESOLVED Hadoop filesystem's
    # scheme (a bare path on a cluster whose fs.defaultFS is hdfs://
    # lives on HDFS no matter what the string looks like), and hand the
    # executors Hadoop's OWN resolution of the local path
    # (toUri().getPath()): a raw "file:///x" string is a relative path
    # to shutil, and urlparse-style normalization would truncate '#' or
    # decode %XX sequences Hadoop keeps literal
    src_local = JPath(src_path).toUri().getPath()
    dst_local = JPath(dst_path).toUri().getPath()
    # The executor fan-out requires BOTH a file-scheme filesystem AND a
    # local master: on a multi-node cluster whose file:// paths are not
    # a shared mount, tasks would copy from/to their own local disks —
    # at best a FileNotFoundError, at worst silently carrying stale
    # executor-local bytes while params still commits (round-14
    # ADVICE).  Anywhere the fan-out cannot run, copy-carry degrades to
    # driver-side per-cell FileUtil copies — correct but the measured
    # slow class (41.8 s vs 9.4 s fanned at 2000 cells), so warn loudly
    # and point at carry="move", which moves no bytes at all (round-14
    # verdict finding #3).
    fan_copy_local = carry == "copy" and _fan_copy_eligible(
        fs.getUri().getScheme(), spark.sparkContext.master
    )
    copy_jobs: "list[int] | None" = [] if fan_copy_local else None
    if carry == "copy" and cold and not fan_copy_local:
        import warnings

        warnings.warn(
            "compact_pq_ivf_cells: carry='copy' on "
            f"scheme={fs.getUri().getScheme()!r} / master="
            f"{spark.sparkContext.master!r} streams every cold byte "
            "through the driver, one cell at a time — O(corpus) driver "
            "IO.  Prefer carry='move' (metadata renames / server-side "
            "copy; no cold byte moves through the client) under a "
            "fold-before-serve window, or run a real distcp.",
            RuntimeWarning,
            stacklevel=2,
        )
    fs.mkdirs(JPath(f"{dst_path}/vectors"))  # no hot cells -> no writer
    for c in cold:
        sdir = JPath(f"{src_path}/vectors/centroid={c}")
        ddir = JPath(f"{dst_path}/vectors/centroid={c}")
        if carry == "move":
            if not fs.exists(ddir):
                if not fs.rename(sdir, ddir):
                    raise IOError(
                        f"compact_pq_ivf_cells: rename {sdir} -> {ddir} "
                        "refused by the filesystem — rerun with "
                        "carry='copy' on non-rename-capable stores"
                    )
                continue
            # retry with a partially-carried cell: finish per-file
            # (skip files a prior attempt already moved)
            for fname, _size in cells[c]:
                sfile = JPath(f"{src_path}/vectors/centroid={c}/{fname}")
                dfile = JPath(f"{dst_path}/vectors/centroid={c}/{fname}")
                if fs.exists(dfile):
                    continue
                if not fs.rename(sfile, dfile):
                    raise IOError(
                        f"compact_pq_ivf_cells: rename {sfile} -> "
                        f"{dfile} refused by the filesystem"
                    )
        else:
            # recursive dir copy with names preserved.  An EXISTING
            # destination cell is MERGED per-file (src files copied
            # with overwrite, dst-only files kept), never deleted: a
            # dst-only file can only come from a prior partially-
            # completed carry="move" attempt whose source side is
            # already gone — deleting the dir before re-copying (the
            # obvious retry) would permanently lose those rows while
            # params still commits.  Src files overwrite same-named dst
            # files (src is authoritative in copy mode; a torn prior
            # copy is healed by the overwrite).  Local paths take the
            # DISTRIBUTED copy below instead — a driver-sequential
            # carry measured 41.8s vs the full fold's 14.6s on a
            # 2000-cell index (per-dir round-trip cost × n_cells),
            # exactly the corpus-scaling the per-cell fold exists to
            # avoid
            if copy_jobs is not None:
                copy_jobs.append(c)
                continue
            if fs.exists(ddir):
                for fname, _size in cells[c]:
                    FileUtil.copy(
                        fs,
                        JPath(f"{src_path}/vectors/centroid={c}/{fname}"),
                        fs,
                        JPath(f"{dst_path}/vectors/centroid={c}/{fname}"),
                        False,
                        True,
                        hconf,
                    )
            else:
                FileUtil.copy(fs, sdir, fs, ddir, False, True, hconf)
    if copy_jobs:
        src_v, dst_v = f"{src_local}/vectors", f"{dst_local}/vectors"
        src_files = {c: [f for f, _ in cells[c]] for c in copy_jobs}

        def _carry(cells_part):
            import os
            import shutil

            for cc in cells_part:
                s = f"{src_v}/centroid={cc}"
                d = f"{dst_v}/centroid={cc}"
                # same merge semantics as the JVM branch above: never
                # delete an existing destination (it may hold the only
                # copy of files a crashed move already carried)
                os.makedirs(d, exist_ok=True)
                for fname in src_files[cc]:
                    shutil.copy2(f"{s}/{fname}", f"{d}/{fname}")
            return iter(())

        n_slices = min(len(copy_jobs), spark.sparkContext.defaultParallelism)
        spark.sparkContext.parallelize(copy_jobs, n_slices).mapPartitions(
            _carry
        ).count()
    for side in ("books", "centers", "params"):  # params last = committed
        (
            spark.read.parquet(f"{src_path}/{side}")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{dst_path}/{side}")
        )
    # finish-only retries report the cells the crashed attempt carried
    return {"hot_cells": hot, "cold_cells": cold or finish_only}


def maybe_compact_pq_ivf(
    spark,
    path: str,
    max_files_per_cell: int = 16,
    scope: str = "cells",
    carry: str = "copy",
) -> "str | None":
    """AUTO-COMPACTION POLICY for the layered index — the
    ``maybe_refold`` discipline applied to file-count fragmentation:
    decide-and-run the generation fold so a long-running append/serve
    loop keeps its per-cell file count bounded UNATTENDED.

    Polls the cell directories via :func:`_list_cell_files` — an
    O(n_files) filesystem listing, never a data scan; below
    ``max_files_per_cell`` (worst cell) it returns None and touches
    nothing.  At/above, it compacts into the auto-named successor
    generation (``next_generation_name`` on the path: ``…/idx`` →
    ``…/idx_g1`` → ``…/idx_g2``) and returns the new path.
    ``scope="cells"`` (default) folds per-cell
    (:func:`compact_pq_ivf_cells`): only cells at/above the threshold
    are rewritten and the cold cells are carried by ``carry`` ("copy"
    keeps the source generation intact; "move" is O(1)-per-file but
    consumes it — see the fold's docstring), so maintenance cost
    scales with fragmentation, not corpus size.  ``scope="full"`` is
    the every-cell fold (:func:`compact_pq_ivf_index`) — the right
    call when MOST cells are fragmented or the layout should be fully
    re-normalized.  CONTRACT — same quiesced
    window as every generation rotation: call with no batch in flight,
    and when the result is non-None, point every reader (serve
    handlers, append jobs) at the returned path BEFORE the next batch,
    then drop the old generation.

    The default threshold is conservative against the measured 10×
    economics (PERF.md round-13): at 36 files/cell a 490-query scanned
    batch paid 14.1 s vs 5.1 s compacted, and the 8.8 s fold repaid
    itself within ONE batch.  With the repartitioned writes a fresh
    build is exactly 1 file per cell and each append adds at most 1 per
    touched cell, so 16 ≈ a fold every ~15 appends — well before the
    measured-pain regime, never on a fresh index.

    STALE-CALLER GUARD (checked FIRST, before the threshold, so a stale
    caller is caught on its first policy call instead of silently
    appending to a dead generation until it happens to re-fragment): a
    successor with readable ``params`` (the commit marker — see
    :func:`compact_pq_ivf_index`) means a previous compaction COMPLETED
    and the caller failed to carry the returned path forward;
    re-compacting the superseded generation would fork history (appends
    landed on the successor would be missing), so it raises, naming the
    NEWEST committed generation in the chain.  Only path ABSENCE counts
    as not-committed (transient read errors propagate — misreading one
    as absence would overwrite a live successor).  A crash BEFORE the
    marker self-heals: the successor name is deterministic and every
    write overwrites."""
    from pyspark.errors import AnalysisException

    if max_files_per_cell < 1:
        raise ValueError(
            f"max_files_per_cell must be >= 1, got {max_files_per_cell}"
        )

    def committed(p: str) -> bool:
        # ONLY path-absence counts as "not committed": a transient read
        # failure (throttling, expired credentials, corrupt footer)
        # misread as absence would let the overwrite below destroy a
        # committed successor — the exact fork the guard exists to
        # prevent — so anything but AnalysisException propagates
        try:
            spark.read.parquet(f"{p}/params").collect()
            return True
        except AnalysisException:
            return False

    # Stale-caller check FIRST, before the threshold early-return: a
    # freshly-superseded generation is usually BELOW threshold (it was
    # just folded), so a threshold-first order would hand the stale
    # caller None — the all-good signal — and let it append to the dead
    # generation for an arbitrarily long quiet window.
    dst = next_generation_name(path.rstrip("/"))
    if committed(dst):
        # walk to the LAST committed generation so the message names a
        # current path — directing the caller at _g1 when _g2 is live
        # would instruct the very fork the guard refuses
        live = dst
        while committed(next_generation_name(live)):
            live = next_generation_name(live)
        raise ValueError(
            f"maybe_compact_pq_ivf: successor generation {dst!r} already "
            f"has committed params — {path!r} is a superseded generation. "
            f"Point readers/appenders at {live!r} (the newest committed "
            "generation) instead of re-compacting the old one"
        )
    if scope not in ("cells", "full"):
        raise ValueError(
            f"maybe_compact_pq_ivf: scope must be 'cells' or 'full', "
            f"got {scope!r}"
        )
    if scope == "full" and carry != "copy":
        # the full fold rewrites every cell and carries nothing — a
        # caller asking for carry="move"'s O(1) metadata cost would
        # silently get a full-corpus shuffle instead
        raise ValueError(
            f"maybe_compact_pq_ivf: carry={carry!r} only applies to "
            "scope='cells' (the full fold rewrites every cell)"
        )
    # O(n_files) filesystem listing, not a data scan — the poll runs
    # after every append, and at 100 TB a row-group enumeration per
    # poll is the exact cost class compaction exists to remove
    cells = _list_cell_files(spark, path)
    worst = max((len(files) for files in cells.values()), default=None)
    if worst is None or worst < max_files_per_cell:
        return None
    if scope == "full":
        compact_pq_ivf_index(spark, path, dst)
    else:
        compact_pq_ivf_cells(
            spark, path, dst, max_files_per_cell, carry=carry,
            _cells=cells,
        )
    return dst


def next_generation_name(name: str) -> str:
    """Re-export of the generation-naming convention shared with the
    dedup index rotations (``…`` → ``…_g1`` → ``…_g2``), so layered
    compaction and stream refolds name successors identically."""
    from video_etl_spark.streaming.dedup import (
        next_generation_name as _impl,
    )

    return _impl(name)


def cluster_blocked_pairs(
    emb: DataFrame,
    n_centers: int = 8,
    n_probes: int = 2,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lloyd_rounds: int = 0,
) -> DataFrame:
    """SemDeDup-shaped near-dup pair mining: block candidates by nearest
    seed centers (multi-probe), decide by exact quantized cosine — the
    parameterized library form of the oracle-checked
    ``queries.vectors.semantic_dedup_pairs`` (its K=8/2-probe instance).

    Seed centers are the first ``n_centers`` ids (deterministic); each
    vector joins its ``n_probes`` nearest centers, pairs sharing any
    probed center are scored, DISTINCT removes both-probes duplicates.

    Scale recipe: keep per-cluster occupancy FIXED by growing
    ``n_centers`` with the corpus (pair work is Σ n_c² per cluster) —
    the scale rehearsal drives this at 10× corpus / 8× centers.  Raw seed
    centers on concentrated high-dim data can leave occupancy badly
    skewed (Σ n_c² 2.3× uniform measured at the 20k rehearsal slice), so
    ``n_lloyd_rounds`` optionally rebalances them with exact Lloyd
    updates first (the kmeans_lloyd_embeddings recipe, deterministic) —
    the join key stays well-spread without changing the pair semantics.
    All arithmetic is the 1e6-quantized BIGINT convention, fully
    relational.
    """
    q = emb.select(
        F.col(id_col).alias("vec_id"),
        F.expr(
            f"transform({vec_col}, x -> "
            "cast(round(cast(x as double) * 1000000) as bigint))"
        ).alias("q"),
    ).withColumn(
        "sq",
        F.expr(
            "cast(aggregate(transform(q, x -> x * x), 0L, "
            "(acc, v) -> acc + v) as double)"
        ),
    )
    centers = q.filter(F.col("vec_id") < n_centers).select(
        F.col("vec_id").alias("center_id"), F.col("q").alias("c")
    )
    dist = F.expr(
        "aggregate(zip_with(q, c, (x, y) -> (x - y) * (x - y)), "
        "0L, (acc, v) -> acc + v)"
    )
    for _ in range(n_lloyd_rounds):
        # one exact Lloyd update: single-probe argmin + truncating-integer
        # centroid means (deterministic; empty clusters drop)
        assigned1 = (
            q.select("vec_id", "q").crossJoin(F.broadcast(centers))
            .select("vec_id", "center_id", dist.alias("dist"))
            .groupBy("vec_id")
            .agg(F.min(F.struct("dist", "center_id")).alias("m"))
            .select("vec_id", F.col("m.center_id").alias("center_id"))
        )
        centers = (
            assigned1.join(q.select("vec_id", "q"), "vec_id")
            .select("center_id", F.posexplode("q").alias("dim", "val"))
            .groupBy("center_id", "dim")
            # FLOOR semantics on possibly-negative sums: Spark `div`
            # truncates toward zero, so shift positive by 4e6/unit (the
            # kmeans_lloyd_embeddings offset trick) before dividing —
            # floor((sum + n*OFF)/n) - OFF == floor(sum/n) exactly
            .agg(
                F.expr(
                    "(sum(val + 4000000) div count(1)) - 4000000"
                ).alias("cv")
            )
            .groupBy("center_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "cv"))
                ).alias("sc")
            )
            .select(
                "center_id", F.expr("transform(sc, x -> x.cv)").alias("c")
            )
        )
    wv = Window.partitionBy("vec_id").orderBy("dist", "center_id")
    assigned = (
        q.select("vec_id", "q").crossJoin(F.broadcast(centers))
        .select("vec_id", "center_id", dist.alias("dist"))
        .withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") <= n_probes)
        .select("vec_id", "center_id")
    )
    # the (center, vec, q, sq) frame feeds BOTH sides of the pair join;
    # unpersisted, the whole assignment subplan (fan-out + window) runs
    # twice (measured 5.8 s vs 2.2 s at sf0.1).  Blocks are ids + one
    # vector per row — LRU eviction handles lifetime, as in _banded_sigs.
    sides = assigned.join(q, "vec_id").persist()
    a = sides.select(
        "center_id",
        F.col("vec_id").alias("vec_a"),
        F.col("q").alias("qa"),
        F.col("sq").alias("sqa"),
    )
    b = sides.select(
        "center_id",
        F.col("vec_id").alias("vec_b"),
        F.col("q").alias("qb"),
        F.col("sq").alias("sqb"),
    )
    # zero-norm hardening (see _cos_expr: a NaN/raise here would pass
    # the >= threshold filter below as a phantom pair)
    cos = F.expr(_cos_expr(
        "cast(aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, "
        "(acc, v) -> acc + v) as double)",
        "sqrt(sqa) * sqrt(sqb)",
    ))
    return (
        a.join(b, "center_id")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", "cos_sim")
        .distinct()
    )
