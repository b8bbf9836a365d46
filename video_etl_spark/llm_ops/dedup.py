"""SimHash near-duplicate detection (SURVEY.md U21, the dedup family's
Hamming-space member; exact/MinHash/Jaccard variants are oracle-verified in
queries/text.py).

SimHash: each token hashes to 64 bits; the document signature's bit *i* is 1
iff the sum over tokens of (±1 per token-bit *i*) is positive.  Near-dups
are signature pairs within a small Hamming distance.  Candidate generation
uses the standard trick: split the 64-bit signature into 4 × 16-bit chunks —
any pair within Hamming distance 3 must agree on at least one chunk — and
equi-join on chunks (shuffle on chunk value, never all-pairs).

The per-document signature is a vectorized Arrow pandas UDF (token hashing +
bit counting is branch-heavy and sits poorly in SQL expressions; this is the
sanctioned Python path).  Hashing is md5-based and deterministic.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_SIGN_BIT = np.uint64(0x8000000000000000)
_BIT_IDX = np.arange(64, dtype=np.uint64)
#: below this docs×vocab product the count-matrix+matmul path wins; above it
#: (huge batch vocabularies) fall back to the streaming segment-sum.
_DENSE_LIMIT = 1 << 22


#: ASCII-whitespace tokenizer shared by all three SimHash paths.  Spark's
#: Java regex \s and DuckDB's RE2 \s are ASCII-only, while Python's
#: str.split() is Unicode-aware — a corpus with non-breaking spaces would
#: tokenize differently per path and break the bit-identical contract, so
#: the Python references split with the ASCII rule ((?a)\s+) explicitly.
_WS_RE = re.compile(r"(?a)\s+")


def _ascii_tokens(text: str) -> list[str]:
    return [t for t in _WS_RE.split(text) if t]


def _simhash64(text: str) -> int:
    """Scalar reference implementation (tests compare the vectorized batch
    path against this)."""
    counts = [0] * 64
    for tok in _ascii_tokens(text.lower()):
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        for i in range(64):
            counts[i] += 1 if (h >> i) & 1 else -1
    sig = 0
    for i in range(64):
        if counts[i] > 0:
            sig |= 1 << i
    return sig - (1 << 63)  # shift into signed BIGINT range


def _simhash_series(texts: pd.Series) -> pd.Series:
    """Vectorized per-Arrow-batch SimHash.

    md5 runs ONCE per *unique* token in the batch; the 64-iteration
    per-token bit loop of the scalar version becomes one numpy broadcast:
    unique-token hashes -> (U, 64) ±1 matrix, gathered per occurrence and
    segment-summed per document with ``np.add.reduceat``.
    """
    toks = texts.fillna("").str.lower().map(
        lambda t: _ascii_tokens(t)
    )
    n_docs = len(toks)
    lengths = np.fromiter((len(t) for t in toks), dtype=np.int64, count=n_docs)
    flat = [tok for lst in toks for tok in lst]
    if not flat:
        return pd.Series(
            np.full(len(texts), -(1 << 63), dtype=np.int64), index=texts.index
        )
    # hash-based factorize (O(N)) beats sort-based np.unique on object dtype
    inv, uniq = pd.factorize(np.asarray(flat, dtype=object), sort=False)
    buf = b"".join(hashlib.md5(t.encode()).digest()[:8] for t in uniq)
    h = np.frombuffer(buf, dtype=">u8").astype(np.uint64)
    # (U, 64) matrix of ±1: bit i of each unique-token hash
    pm = ((h[:, None] >> _BIT_IDX) & np.uint64(1)).astype(np.int64) * 2 - 1
    if n_docs * len(uniq) <= _DENSE_LIMIT:
        # small vocabulary (the common LLM-corpus batch once texts are
        # normalized): per-doc token-count matrix + one matmul — avoids
        # materializing an (occurrences × 64) intermediate entirely.
        doc_idx = np.repeat(np.arange(n_docs), lengths)
        counts = np.bincount(
            doc_idx * len(uniq) + inv, minlength=n_docs * len(uniq)
        ).reshape(n_docs, len(uniq))
        sums = counts @ pm
    else:
        contrib = pm[inv]
        offsets = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(lengths[:-1], out=offsets[1:])
        # reduceat needs indices < len and mishandles empty segments (equal
        # consecutive offsets return the single row instead of 0) — clip,
        # then overwrite empty docs with the all-zero count vector.
        sums = np.add.reduceat(
            contrib, np.minimum(offsets, len(contrib) - 1), axis=0
        )
        sums[lengths == 0] = 0
    bits = (sums > 0).astype(np.uint64)
    sig = np.zeros(n_docs, dtype=np.uint64)
    for i in range(64):  # 64 column-wise ORs, independent of row count
        sig |= bits[:, i] << _BIT_IDX[i]
    # sig - 2**63 into signed BIGINT range, as a bit-exact reinterpret
    signed = (sig ^ _SIGN_BIT).view(np.int64)
    return pd.Series(signed, index=texts.index)


def simhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id + 64-bit signature + its 4 × 16-bit chunk keys — fully
    JVM-side (round-6 continuation; formerly the Arrow pandas-UDF path,
    kept as :func:`simhash_signatures_arrow`).

    Pure relational formulation of SimHash, bit-identical to the scalar
    reference ``_simhash64`` (differential-tested) and SQL-expressible on
    DuckDB too, which is what lets the simhash queries carry real oracles.

    Round-15 (guide §2.4 "remove shuffles outright" + §2.5 "input
    skew"): ZERO-shuffle fused form.  The former pipeline exploded
    tokens, counted per-(doc, token) occurrences (shuffle 1), and summed
    ``w * (2·bit−1)`` per doc (shuffle 2) — but a weighted sum over
    DISTINCT tokens is identical to a plain sum over token OCCURRENCES
    (exact integer arithmetic commutes), so the whole signature now
    computes per ROW as one higher-order ``aggregate`` over the token
    array, fused with the scan:

    * per token, the 64-bit md5 prefix assembled from two 32-bit conv()
      halves (conv of 16 hex chars would overflow BIGINT);
    * the 64 bit-balance sums accumulate in one array fold
      (``zip_with`` over a 64-long accumulator — bit i of the signature
      is sign(sum_i); arithmetic shiftright extracts bits of the signed
      long correctly, two's-complement bit pattern);
    * the signature recomposes with the top bit folded in as −2^63 so
      every term stays in BIGINT range (the scalar reference's
      ``sig − 2^63`` unsigned→signed shift).

    Profiled before/after at sf0.1: the old form ran as three
    SINGLE-task stages (0.40 + 0.38 + 0.14 s — the 1.6 MB shuffle
    coalesces to one partition, so the per-token md5 + 64-sum work
    serialized on one core); the fused form is one narrow 32-task map
    under :func:`~video_etl_spark.operators.skew.spread_small_scan`
    (no-op at production scale where the scan has natural splits).
    Docs with no tokens (or NULL text) keep the empty signature −2^63
    via the final coalesce (the Arrow path's behavior for empty
    strings); every doc emits exactly one row with no join.
    """
    from video_etl_spark.operators.skew import spread_small_scan

    docs = spread_small_scan(docs)
    toks = rf"filter(split(trim(lower({text_col})), '\\s+'), x -> x != '')"
    h_of = (
        "shiftleft(cast(conv(substr(md5(x), 1, 8), 16, 10) as bigint), 32)"
        " | cast(conv(substr(md5(x), 9, 8), 16, 10) as bigint)"
    )
    # accumulate RAW bit counts (cnt_i = Σ bit_i(h)); sign(s_i) with
    # s_i = 2·cnt_i − n is then `2·cnt_i > n`.  `__idx` is projected once
    # per ROW (not re-built per token — the first cut's inline
    # sequence(0,63) inside the fold tripled the per-token cost).
    base = docs.select(
        "doc_id",
        F.expr(f"transform({toks}, x -> {h_of})").alias("__hs"),
        F.expr("sequence(0, 63)").alias("__idx"),
    )
    cnts = (
        "aggregate(__hs, array_repeat(cast(0 as bigint), 64), "
        "(acc, h) -> zip_with(acc, __idx, "
        "(a, i) -> a + (shiftright(h, i) & 1)))"
    )
    sig_expr = (
        "aggregate(zip_with(__cnts, __idx, (c, i) -> "
        "if(i < 63, "
        "if(2 * c > __n, shiftleft(cast(1 as bigint), i), "
        "cast(0 as bigint)), "
        "if(2 * c > __n, cast(0 as bigint), "
        "cast(-9223372036854775808 as bigint)))), "
        "cast(0 as bigint), (p, q) -> p + q)"
    )
    out = base.select(
        "doc_id",
        F.expr(cnts).alias("__cnts"),
        F.expr("size(__hs)").cast("bigint").alias("__n"),
        "__idx",
    ).select(
        "doc_id",
        F.coalesce(
            F.expr(sig_expr), F.lit(-(1 << 63)).cast("long")
        ).alias("simhash"),
    )
    for c in range(4):
        out = out.withColumn(
            f"chunk{c}",
            F.shiftrightunsigned(F.col("simhash"), c * 16).bitwiseAND(F.lit(0xFFFF)),
        )
    return out.select("doc_id", "simhash", "chunk0", "chunk1", "chunk2", "chunk3")


def simhash_signatures_arrow(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Arrow pandas-UDF twin of :func:`simhash_signatures` (the vectorized
    numpy batch path) — kept as the documented Arrow-UDF pattern and as a
    cross-implementation differential check; the relational form above is
    the default because it stays in whole-stage codegen and is
    oracle-expressible.

    The pandas UDF is constructed here (not at module import) with an
    explicit DataType: executors import this module when unpickling, and a
    module-level ``@pandas_udf("ddl string")`` would try to parse the schema
    without an active session.
    """
    from video_etl_spark.session import ensure_executor_package

    ensure_executor_package(docs.sparkSession)
    simhash_udf = pandas_udf(_simhash_series, T.LongType())
    out = docs.select("doc_id", simhash_udf(F.col(text_col)).alias("simhash"))
    for c in range(4):
        out = out.withColumn(
            f"chunk{c}",
            F.shiftrightunsigned(F.col("simhash"), c * 16).bitwiseAND(F.lit(0xFFFF)),
        )
    return out.select("doc_id", "simhash", "chunk0", "chunk1", "chunk2", "chunk3")


def _hamming(col_a, col_b):
    return F.bit_count(col_a.bitwiseXOR(col_b))


def _chunk_stacked(sig: DataFrame, id_out: str, sig_out: str) -> DataFrame:
    """(id, sig, c, chunk) long form of a signature frame — 4 rows per doc,
    one per 16-bit chunk, so all 4 blocking joins collapse into ONE
    equi-join on the composite (c, chunk) key (same shuffle volume as the
    4 separate chunk joins, a quarter of the shuffle stages, and the
    signature subplan is evaluated once per side instead of four times)."""
    return sig.select(
        F.col("doc_id").alias(id_out),
        F.col("simhash").alias(sig_out),
        F.posexplode(
            F.array("chunk0", "chunk1", "chunk2", "chunk3")
        ).alias("c", "chunk"),
    )


def simhash_pairs(
    docs: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs within `max_hamming` bits, via chunk-join blocking.

    The 4×16-bit chunk split only guarantees candidate recall for
    distances ≤ 3 (pigeonhole: ≤ 3 flipped bits cannot touch all 4
    chunks); a larger threshold would silently miss pairs, so it raises.

    EAGER AT BUILD (round 16): constructing this frame materializes the
    signature window via localCheckpoint (see
    ``_simhash_rep_structures``), so building the plan — e.g. for an
    explain/plan capture — already runs the signature jobs; blocks are
    doc_id + 5 longs, released by GC + ContextCleaner.

    Hot-key guard (round-7 verdict #1): the chunk self-join runs over
    ONE representative per distinct 64-bit signature, then expands back
    to member pairs — cross-signature pairs via the membership map,
    same-signature pairs directly (Hamming 0 by definition).  The output
    SET is identical (the oracle pins it); what changes is that n exact
    copies no longer push n(n−1)/2 rows through one chunk-join key with
    a 4× chunk fan-out, a per-pair Hamming re-check, and a distinct
    shuffle over the whole quadratic set — the unavoidable member
    expansion happens once, as a plain streaming equi-join with no
    dedup pass (every expanded row is distinct by construction).
    Pair-grain output still grows with duplicate mass by definition;
    component-grain consumers should prefer ``connected_components``
    over these pairs, and the aggregate readouts exist for monitoring.
    """
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the 4-chunk blocking "
            "guarantee (recall is only complete for distance <= 3); use "
            "more/finer chunks for larger radii"
        )
    mem, rep_pairs = _simhash_rep_structures(docs, text_col, max_hamming)
    cross = (
        rep_pairs.join(
            mem.select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("xa")),
            "doc_a",
        )
        .join(
            mem.select(F.col("rep").alias("doc_b"), F.col("doc_id").alias("xb")),
            "doc_b",
        )
        .select(
            F.least("xa", "xb").alias("doc_a"),
            F.greatest("xa", "xb").alias("doc_b"),
            "hamming",
        )
    )
    intra = (
        mem.select("rep", F.col("doc_id").alias("doc_a"))
        .join(mem.select("rep", F.col("doc_id").alias("doc_b")), "rep")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.lit(0).cast("long").alias("hamming"))
    )
    return cross.unionByName(intra)


def _simhash_rep_structures(
    docs: DataFrame, text_col: str, max_hamming: int, pinned: list | None = None
) -> tuple[DataFrame, DataFrame]:
    """The collapse-guarded core :func:`simhash_pairs` and
    :func:`simhash_overlap_stats` share: ``(mem, rep_pairs)`` where
    ``mem`` is the (rep, doc_id) membership map (rep included) and
    ``rep_pairs`` the distinct (doc_a, doc_b, hamming) pairs over ONE
    representative per distinct signature.  ``pinned``, when given,
    collects persisted intermediates for an explicit
    unpersist-in-finally (round-9 verdict #7); since round 16 the rep
    structures themselves are a localCheckpoint (released by GC +
    ContextCleaner), so only downstream persists land in ``pinned``."""
    # Round-16 (guide §2.4/§5, r15-verdict #2 — the CC-trio recipe):
    # the persist(sig)+count → groupBy(grp) persist → mem join chain is
    # ONE window pass — min(doc_id) OVER (PARTITION BY simhash) gives
    # every doc its representative with no join at all, and the frame is
    # eagerly localCheckpointed so mem / reps / both chunk-join sides
    # plan against a materialized Scan ExistingRDD instead of
    # re-planning (and partially re-running) the signature subtree.
    # Rep-interleaved A/B at sf0.1: sum of per-query mins
    # 4.73 → 2.71 s (simhash_overlap_stats 2.66 → 1.70,
    # simhash_near_dup_pairs 2.07 → 1.01), every sample improved;
    # results bit-identical (oracle re-proved).  The chunks ride along
    # in the window frame — they are functions of ``simhash``, so
    # partitioning by the hash alone is the same grouping.
    sig = simhash_signatures(docs, text_col)
    sig_cols = ["simhash", "chunk0", "chunk1", "chunk2", "chunk3"]
    win = sig.withColumn(
        "__rep", F.min("doc_id").over(Window.partitionBy("simhash"))
    ).localCheckpoint()
    # membership map includes the representative itself (rep → rep)
    mem = win.select(F.col("__rep").alias("rep"), "doc_id")
    reps = win.filter(F.col("doc_id") == F.col("__rep")).select(
        "doc_id", *sig_cols
    )
    a = _chunk_stacked(reps, "doc_a", "sig_a")
    b = _chunk_stacked(reps, "doc_b", "sig_b")
    rep_pairs = (
        a.join(b, ["c", "chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            _hamming(F.col("sig_a"), F.col("sig_b")).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return mem, rep_pairs


def collect_and_unpersist(df: DataFrame, pinned: list) -> DataFrame:
    """Materialize a BOUNDED result eagerly so its pinned intermediates
    can be released deterministically (the ``dup_graph_triangles``
    discipline, round-9 verdict #7): collect the rows, unpersist every
    frame in ``pinned`` (even if the action fails), and return a fresh
    local DataFrame with the same schema.

    Only for outputs known to be small (the count-grain stats queries
    emit ≤ 1 row per document WITH a near-dup partner); corpus-scale
    callers keep the lazy form and write to a sink instead."""
    from video_etl_spark.session import local_frame

    spark = df.sparkSession
    try:
        rows = df.collect()
    finally:
        for p in pinned:
            p.unpersist()
    # one partition: bounded rows, and every consumer action re-ships
    # them driver→JVM — parallelism-many tasks only add round-trips
    return local_frame(spark, rows, df.schema)


def simhash_overlap_stats(
    docs: DataFrame,
    text_col: str = "text",
    max_hamming: int = 3,
    eager: bool = False,
) -> DataFrame:
    """COUNT-grain SimHash readout: per document, how many near-dup
    partners within ``max_hamming`` bits and the closest distance —
    ≤ 1 row per document at ANY duplicate density (round-8 verdict #7,
    mirroring ``winnowing_overlap_stats``).

    Unlike aggregating :func:`simhash_pairs`' output, this never
    materializes the member-pair expansion AT ALL: partner counts are
    computed analytically at REPRESENTATIVE grain — a member of a
    signature group of size s with rep-adjacency {(r', h)} has
    ``(s - 1) + Σ s_{r'}`` partners and min distance 0 if s > 1 else
    min h — then joined back to members once.  A 20k-copy hot page costs
    one group row here where the pair grain emits ~2×10⁸ rows; the
    DuckDB oracle takes the exhaustive doc-grain pair route, re-proving
    the analytic shortcut on every attestation.  Distinct signatures
    always differ in ≥ 1 bit, so the intra-group distance 0 correctly
    dominates every cross-group min.

    ``eager=True`` materializes the (bounded: ≤ 1 row per doc with a
    partner) result and unpersists every intermediate in ``finally``
    instead of leaving them to LRU — the sweeping-caller mode (driver
    gate, bench); corpus-scale callers keep the default lazy plan.
    """
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the 4-chunk blocking "
            "guarantee (recall is only complete for distance <= 3); use "
            "more/finer chunks for larger radii"
        )
    pinned: list | None = [] if eager else None
    mem, rep_pairs = _simhash_rep_structures(docs, text_col, max_hamming, pinned)
    out = rep_grain_overlap_stats(mem, rep_pairs, pinned)
    if eager:
        return collect_and_unpersist(out, pinned)
    return out


def rep_grain_overlap_stats(
    mem: DataFrame, rep_pairs: DataFrame, pinned: list | None = None
) -> DataFrame:
    """The analytic count-grain core :func:`simhash_overlap_stats` and
    ``multimodal.phash_overlap_stats`` share: given a (rep, doc_id)
    membership map and distinct (doc_a, doc_b, hamming) REPRESENTATIVE
    pairs, return per-doc ``(doc_id, n_partners, min_hamming)`` without
    ever materializing member pairs — a member of a group of size s with
    rep-adjacency {(r', h)} has ``(s - 1) + Σ s_{r'}`` partners and min
    distance 0 if s > 1 else min h.  Distinct signatures always differ
    in ≥ 1 bit, so intra-group distance 0 correctly dominates every
    cross-group min.

    Both adj branches below read rep_pairs and two consumers read sizes
    — persist them or the chunk self-join (the expensive part) runs once
    per branch (measured 6.6s → pair-form parity at sf0.1); same
    LRU-eviction convention as the signature frames unless the caller
    passes ``pinned`` to take over the unpersist."""
    rep_pairs = rep_pairs.persist()
    sizes = mem.groupBy("rep").agg(F.count(F.lit(1)).alias("sz")).persist()
    if pinned is not None:
        pinned.extend([rep_pairs, sizes])
    adj = rep_pairs.select(
        F.col("doc_a").alias("rep"), F.col("doc_b").alias("nbr"), "hamming"
    ).unionByName(
        rep_pairs.select(
            F.col("doc_b").alias("rep"), F.col("doc_a").alias("nbr"), "hamming"
        )
    )
    cross_stats = (
        adj.join(
            sizes.select(F.col("rep").alias("nbr"), F.col("sz").alias("nbr_sz")),
            "nbr",
        )
        .groupBy("rep")
        .agg(
            F.sum("nbr_sz").alias("cross_partners"),
            F.min("hamming").alias("min_cross_h"),
        )
    )
    rep_stats = sizes.join(cross_stats, "rep", "left").select(
        "rep",
        (F.col("sz") - 1 + F.coalesce("cross_partners", F.lit(0)))
        .cast("long")
        .alias("n_partners"),
        F.when(F.col("sz") > 1, F.lit(0))
        .otherwise(F.col("min_cross_h"))
        .cast("long")
        .alias("min_hamming"),
    )
    return (
        mem.join(rep_stats, "rep")
        .filter(F.col("n_partners") > 0)
        .select("doc_id", "n_partners", "min_hamming")
    )


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """⊕ training-pipeline op: per-class stratified sampling (class
    balancing for training corpora).  Seeded `sampleBy` is deterministic
    per Spark version/partitioning; for cross-engine-reproducible splits
    use the hash-based `dataset_split` query instead."""
    return docs.sampleBy(strata_col, fractions, seed=seed)


# ---------------------------------------------------------------------------
# U21 — duplicate-CLUSTER formation: connected components over candidate
# pair edges (the step after MinHash/SimHash candidate generation in a real
# dedup pipeline: pairs -> components -> keep one canonical doc per
# component).  Min-label propagation: every node starts labeled with its
# own id; each round a node takes the min label among itself and its
# neighbors, then POINTER-JUMPS (label <- label of its label), so label
# trees halve in depth every round and convergence is O(log diameter) —
# without the jump, sparse giant components (exactly what random band
# collisions produce) need diameter-many rounds, which we measured as the
# difference between 8 s and minutes on the sf0.1 corpus.  Each round is
# two shuffles on node id; localCheckpoint truncates lineage per round
# (the classic iterative-join trap).
#: Rounds for which :func:`connected_components` runs the early
#: monochromatic-edges convergence check (two thin joins + limit(1))
#: after each round; beyond this it falls back to the cheap every-2nd
#: no-change probe so adversarial long-diameter graphs never pay a
#: per-round join check.  Dedup graphs converge in 1-3 pointer-jumped
#: rounds, so the early window covers the realistic cases.
_CC_EARLY_PROBE_ROUNDS = 4
#: round-16: after this many "not yet" answers from the monochromatic-edges
#: probe, stop paying edge-join probes and fall back to the (free) per-round
#: no-change check — see the gate comment in connected_components.
_CC_EARLY_PROBE_MISSES = 1


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    node_col: str = "doc_id",
    max_iter: int = 20,
    on_round=None,
    edges_distinct: bool = False,
) -> DataFrame:
    """(node, component) for every node: component = min node id reachable.

    ``edges`` may be directed pairs (a < b); propagation treats them as
    undirected.  Nodes absent from edges stay singleton components.

    ``on_round``, if given, is called after every round with
    ``(round_index, seconds)`` — the per-round checkpoint is eager, so the
    timing is real work, not lazy-plan assembly.  Used for scale
    rehearsals (flat per-round times prove lineage truncation holds) and
    long-job progress reporting.

    ``edges_distinct``: promise that ``edges`` holds distinct canonical
    (src < dst) pairs — then the mirrored union is dup-free by
    construction and the edge-set dedup shuffle is skipped entirely.
    Candidate generators that end in ``.distinct()`` (the band/chunk
    joins) should pass True: at corpus scale that shuffle re-hashes the
    whole edge set once for nothing.  Duplicate edges would not corrupt
    results (min is idempotent) — only waste join work — so a wrong
    promise degrades speed, not correctness.
    """
    import time

    from pyspark.sql import functions as F

    bidir = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    if not edges_distinct:
        bidir = bidir.distinct()
    bidir = bidir.persist()

    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("label")
    ).localCheckpoint()

    # Round budget is max_iter alone: pointer jumping reaches log-round
    # convergence only when small labels happen to sit "toward" each
    # component's min — for ARBITRARY node-id placement (real doc_ids) a
    # path can need ~diameter rounds, so a log2(n)-derived cap would
    # spuriously raise AND neuter the documented max_iter escape hatch.
    # The cheap per-round probe below exits early in the common
    # tiny-diameter dedup case.
    rounds = max(1, max_iter)

    # Round-15 (guide §2.4): each round formerly ran join → groupBy →
    # LEFT JOIN back to labels → pointer-jump join (three joins + one
    # aggregation).  The neighbor-min + join-back pair fuses into ONE
    # groupBy over the union of self rows and neighbor messages: the
    # self row carries the old label twice, so min(l) is the stepped
    # label and min(sl) (null on messages) recovers ``prev`` for the
    # convergence probe — one shuffle less per round, identical labels
    # (differential-pinned).  A message target absent from ``nodes``
    # would fabricate a row where the old left join dropped it, so
    # groups without a self row (prev IS NULL) are filtered out.
    label_t = dict(labels.dtypes)["label"]
    converged = False
    probe_misses = 0
    for rnd in range(rounds):
        round_t0 = time.perf_counter()
        messages = bidir.join(
            labels, bidir["u"] == labels["node"]
        ).select(
            F.col("v").alias("node"),
            F.col("label").alias("l"),
            F.lit(None).cast(label_t).alias("sl"),
        )
        self_rows = labels.select(
            "node",
            F.col("label").alias("l"),
            F.col("label").alias("sl"),
        )
        stepped = (
            self_rows.unionByName(messages)
            .groupBy("node")
            .agg(
                F.min("l").alias("label"),
                F.min("sl").alias("prev"),
            )
            .filter(F.col("prev").isNotNull())
            .select("node", "prev", "label")
        )
        # pointer jumping: label <- label(label) — halves tree depth
        parents = stepped.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        new_labels = (
            stepped.join(
                parents, stepped["label"] == parents["p_node"], "left"
            )
            .select(
                "node",
                "prev",
                F.least(
                    F.col("label"), F.coalesce("p_label", F.col("label"))
                ).alias("label"),
            )
            # Truncate lineage each round.  EAGER on purpose — a lazy
            # checkpoint (folding each round's materialization into the
            # probe / output action) was benched in the round-15
            # optimization pass and LOST (rep-interleaved trio sum of
            # mins 7.46 eager vs 7.72 lazy: the probe's incremental
            # limit execution computes partial partitions that the
            # checkpoint's fill job then re-runs).
            .localCheckpoint()
        )
        labels = new_labels.select("node", "label")
        if on_round is not None:
            on_round(rnd, time.perf_counter() - round_t0)
        # Convergence detection, two tiers (round-15):
        #
        # Early rounds — MONOCHROMATIC-EDGES check: labels are a fixed
        # point of min-label propagation iff every edge's endpoints
        # carry the same label (labels only ever decrease toward ids
        # reachable in-component, and the component's min node never
        # leaves its own id, so all-edges-equal ⟺ every node is at its
        # component min).  Unlike the no-change probe below, this
        # detects convergence AT the round it happens, skipping the
        # whole no-op confirm round (messages join + union-groupBy +
        # pointer join + checkpoint write — the common dedup graph
        # converges in 1–3 rounds, so this fires almost immediately:
        # rep-interleaved CC-trio A/B 7.92 → 7.03 s sum of medians,
        # output row-identical).  The check is two thin joins against
        # the persisted edge frame + limit(1).
        #
        # Round-16 gate (r15-verdict #8): a "not yet" answer from this
        # probe costs the full 2-join shuffle over the edge set (the
        # limit(1) short-circuits only the reduce side), so long-diameter
        # graphs used to pay up to _CC_EARLY_PROBE_ROUNDS wasted
        # edge-join probes that mostly answered "not yet".  The probe
        # now stops after _CC_EARLY_PROBE_MISSES failed attempts; from
        # then on EVERY round runs the no-change probe (a sub-millisecond
        # filter over the round's already-materialized checkpoint), which
        # detects the fixed point one round late — i.e. an adversarial
        # graph pays at most ONE wasted edge-join probe and one no-op
        # confirm round, while the common converge-at-round-0 dedup
        # graph keeps the at-the-round exit.  The FINAL round (when it
        # falls inside the early window) still runs the edge probe even
        # past the miss budget: a graph that converges exactly at its
        # round budget used to be detected at-the-round, and the gate
        # must not turn that success into a spurious raise (pinned by
        # test_cc_converges_at_final_early_round).  Past the window the
        # final-round no-change check keeps the raise exact, as before.
        if rnd < _CC_EARLY_PROBE_ROUNDS and (
            probe_misses < _CC_EARLY_PROBE_MISSES or rnd == rounds - 1
        ):
            lu = labels.select(
                F.col("node").alias("u"), F.col("label").alias("lu")
            )
            lv = labels.select(
                F.col("node").alias("v"), F.col("label").alias("lv")
            )
            if (
                bidir.join(lu, "u")
                .join(lv, "v")
                .filter(F.col("lu") != F.col("lv"))
                .isEmpty()
            ):
                converged = True
                break
            probe_misses += 1
        elif new_labels.filter(F.col("label") != F.col("prev")).isEmpty():
            converged = True
            break
    bidir.unpersist()
    if not converged:
        # Exhausting the round budget with labels still moving means the
        # returned components are WRONG (some nodes haven't reached their
        # component's min id) — that must never be silent.
        raise RuntimeError(
            f"connected_components did not converge in {rounds} rounds; "
            "label propagation needs up to ~component-diameter rounds when "
            "node ids are adversarially placed — raise max_iter"
        )
    return labels.select("node", F.col("label").alias("component"))


# ---------------------------------------------------------------------------
# U21⊕ — parameterized INCREMENTAL dedup: the operator a production crawl
# pipeline calls per batch (reference runs its dedup offline per corpus;
# the incremental upsert shape is the 100 TB continuous-crawl analog).
# Promoted from the hardcoded 2-band demo in queries/text.py (round-5
# verdict ask #1): n bands × rows-per-band, caller-supplied new/history
# frames.  With n_bands=2, rows_per_band=2 it reproduces the oracle-checked
# `incremental_band_dedup` query bit for bit (same s{j}| salts, same
# '_'-joined band keys).


def minhash_band_signatures(
    docs: DataFrame,
    n_bands: int = 2,
    rows_per_band: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, band_0..band_{n-1}) banded MinHash signatures over ``text``.

    Generalizes ``queries.text._banded_sigs``: minhash j is the min over
    3-word shingles of md5-hash60("s{j}|" + shingle); band b concatenates
    rows ``b*rows_per_band .. (b+1)*rows_per_band - 1``.  Docs with fewer
    than 3 tokens have no shingles and are dropped (cannot collide).
    """
    from video_etl_spark.queries.text import _SPARK_HASH, _spark_shingles

    sh = _spark_shingles(docs)
    # single higher-order `aggregate` pass computing ALL n×r mins at once
    # instead of n×r independent array_min(transform(..)) columns: values
    # are identical (verified against the unfused form and the DuckDB
    # oracle), but whole-stage codegen emits ONE loop over the shingle
    # array, cutting the per-query JIT-compile spike bench pays on first
    # execution (4.5 s → 1.6 s at sf0.1 for the 4-hash instance).
    n_hashes = n_bands * rows_per_band
    init = ", ".join(f"'m{j}', 9223372036854775807L" for j in range(n_hashes))
    body = ", ".join(
        "'m{j}', least(acc.m{j}, {h})".format(
            j=j, h=_SPARK_HASH.format(expr=f"concat('s{j}|', s)")
        )
        for j in range(n_hashes)
    )
    sig = sh.select(
        F.col(id_col),
        F.expr(
            f"aggregate(shingles, named_struct({init}), "
            f"(acc, s) -> named_struct({body}))"
        ).alias("mm"),
    ).select(
        id_col,
        *[F.col(f"mm.m{j}").alias(f"mh{j}") for j in range(n_hashes)],
    )
    band_cols = [
        F.concat_ws(
            "_",
            *[
                F.col(f"mh{b * rows_per_band + r}").cast("string")
                for r in range(rows_per_band)
            ],
        ).alias(f"band{b}")
        for b in range(n_bands)
    ]
    return sig.select(id_col, *band_cols)


def band_candidates(
    new_sigs: DataFrame,
    hist_sigs: DataFrame,
    n_bands: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Asymmetric band join over PRE-COMPUTED signatures.

    (new_doc, dup_of, n_candidates) for every new doc sharing any band with
    history.  Split out from :func:`incremental_dedup` so callers that keep
    a persistent signature INDEX (the streaming path, a bucketed corpus
    table at 100 TB) can join against it without re-signing the corpus.

    Hot-key guard: the NEW side probes by ``collapse_exact_sigs``
    representative (a crawl batch of n identical docs probes once, not n
    times — the quadratic new-dups × old-dups key blowup becomes
    1 × old-dups, which is linear and output-bound), then members expand
    to the representative's result.  The HISTORY side stays raw on
    purpose: pre-collapsing it would cost a corpus-wide aggregation per
    batch, breaking the per-batch-cost-independent-of-corpus contract.
    Output is identical either way (oracle-pinned): collapsed members
    share every band with their representative.
    """
    # NOT persisted here: the streaming paths call this once per
    # micro-batch and could never release an internal persist (pinned
    # blocks would accumulate across batches).  Callers persist
    # ``new_sigs`` (incremental_dedup and both streaming handlers do),
    # so each branch re-runs only a cheap map-side-combined groupBy
    # over the cached signatures.
    new_reps, new_members = collapse_exact_sigs(new_sigs, n_bands, id_col)
    # Round-15 NOTE: the long-format melt that replaced the per-band
    # SELF-joins (band_pairs_from_sigs, band_candidates_within) was
    # benched HERE too and REVERTED (rep-interleaved: 1.19 → 1.35 s min
    # on incremental_band_dedup).  This join is ASYMMETRIC — new_reps vs
    # history — so the melt gets no exchange/broadcast reuse between its
    # two (different) sides, while the per-band legs run as CONCURRENT
    # independent joins under AQE; melting only serialized them.
    hits = None
    for b in range(n_bands):
        n_side = new_reps.select(
            F.col(id_col).alias("new_rep"), F.col(f"band{b}").alias("b")
        )
        o_side = hist_sigs.select(
            F.col(id_col).alias("old_doc"), F.col(f"band{b}").alias("b")
        )
        p = n_side.join(o_side, "b").select("new_rep", "old_doc")
        hits = p if hits is None else hits.unionByName(p)
    per_rep = (
        hits.distinct()
        .groupBy("new_rep")
        .agg(
            F.min("old_doc").alias("dup_of"),
            F.count(F.lit(1)).alias("n_candidates"),
        )
    )
    mem_all = new_reps.select(
        F.col(id_col).alias("new_doc"), F.col(id_col).alias("new_rep")
    ).unionByName(
        new_members.select(
            F.col(id_col).alias("new_doc"), F.col("rep_id").alias("new_rep")
        )
    )
    return mem_all.join(per_rep, "new_rep").select(
        "new_doc", "dup_of", "n_candidates"
    )


def band_candidates_within(
    sigs: DataFrame,
    n_bands: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """INTRA-batch band self-join over pre-computed signatures.

    (new_doc, dup_of, n_candidates) where new_doc is the LATER member
    (higher id) of any same-batch band collision — the earliest-sighting-
    wins convention of :func:`band_candidates` applied within one crawl
    batch.  The streaming curation pipeline composes this with the
    history join so same-micro-batch duplicates cannot slip into the
    clean sink or the signature index.  Same scale shape as every band
    join here: shuffle on band key, pair space bounded by collisions,
    never batch².

    This WITHIN-batch form keeps per-member candidate counts (each
    doc's n_candidates counts only LOWER-id matches, which depends on
    id interleaving), so it does not exact-collapse like
    :func:`band_candidates` — its quadratic exposure is bounded by the
    micro-batch size by construction; a batch consisting mostly of one
    repeated page should be pre-collapsed by the caller (the streaming
    ingest path's content-addressed ids already do this).
    """
    # Round-15: same long-format melt as band_candidates — one
    # self-join over (id, band_key) instead of one per band; identical
    # hit set (disjoint band keys), half the join/exchange legs.
    rows = band_index_rows_from_sigs(sigs, n_bands, id_col)
    n_side = rows.select(F.col(id_col).alias("new_doc"), "band_key")
    o_side = rows.select(F.col(id_col).alias("old_doc"), "band_key")
    hits = (
        n_side.join(o_side, "band_key")
        .where(F.col("old_doc") < F.col("new_doc"))
        .select("new_doc", "old_doc")
    )
    return (
        hits.distinct()
        .groupBy("new_doc")
        .agg(
            F.min("old_doc").alias("dup_of"),
            F.count(F.lit(1)).alias("n_candidates"),
        )
    )


def incremental_dedup(
    new: DataFrame,
    history: DataFrame,
    n_bands: int = 2,
    rows_per_band: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup a NEW crawl batch against the EXISTING corpus via band index.

    Returns (new_doc, dup_of, n_candidates): for each new doc that shares
    at least one MinHash band with some history doc, the minimum matching
    history id and the number of distinct matching history docs.  The join
    is ASYMMETRIC — history is only ever touched through the band
    equi-join (shuffle on band key), so no history×history pair is ever
    generated and the per-batch cost scales with |new|, not |corpus|.  At
    100 TB the banded history lives as a bucketed table keyed on band and
    each crawl batch joins against it without re-signing the corpus.

    Both frames need ``id_col`` and a ``text`` string column.  The band
    signatures feed an n_bands-way join fan-out; since round 16 they are
    eagerly localCheckpointed (blocks are (id, n short strings) — tiny
    relative to the corpus; released by GC + ContextCleaner): the per-band
    probe legs and the collapse/member branches then plan against two
    materialized frames instead of re-planning (and, cache-cold, partially
    re-running) the signature pipelines per AQE subtree.  Rep-interleaved
    A/B at sf0.1: incremental_band_dedup min 1.25 → 0.82 s, every sample
    improved; output identical (oracle re-proved).  The streaming
    handlers do NOT route through here — they persist per micro-batch
    and release explicitly (a checkpoint per batch would pool blocks
    until GC).
    """
    new_b = minhash_band_signatures(
        new, n_bands, rows_per_band, id_col
    ).localCheckpoint()
    hist_b = minhash_band_signatures(
        history, n_bands, rows_per_band, id_col
    ).localCheckpoint()
    return band_candidates(new_b, hist_b, n_bands, id_col)


def incremental_simhash_dedup(
    new: DataFrame,
    history: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """SimHash twin of :func:`incremental_dedup` — Hamming-space near-dups
    of a NEW crawl batch against the corpus.

    (new_doc, dup_of, n_candidates, min_hamming): for each new doc within
    ``max_hamming`` bits of some history doc, the minimum matching history
    id, how many history docs matched, and the closest distance.  Blocking
    is the standard 4×16-bit chunk split (distance ≤ 3 ⇒ some chunk
    agrees), joined ASYMMETRICALLY: history signatures are only touched
    through the chunk equi-join, no history×history pair exists, and at
    100 TB the history side is a persisted signature table (64-bit sig +
    4 chunk keys per doc — not text) bucketed on chunk.

    Hot-key guard: the NEW side probes by one representative per
    distinct signature and members expand to the representative's
    result (quadratic new-dups × old-dups key blowup → 1 × old-dups);
    history stays raw — pre-collapsing it would cost a corpus-wide
    aggregation per batch.  Output unchanged (oracle-pinned).
    """
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the 4-chunk blocking "
            "guarantee (recall is only complete for distance <= 3)"
        )
    # persisted: the signature computation is the expensive stage and the
    # collapse makes three consumers of it (grp twice via mem + chunk
    # side); LRU-evicted like every signature block here (lazy builder —
    # sweeping callers clear caches between queries)
    new_sig = simhash_signatures(new, text_col).persist()
    sig_cols = ["simhash", "chunk0", "chunk1", "chunk2", "chunk3"]
    grp = new_sig.groupBy(*sig_cols).agg(F.min("doc_id").alias("doc_id"))
    mem = new_sig.select("doc_id", "simhash").join(
        grp.select(F.col("doc_id").alias("new_rep"), "simhash"), "simhash"
    ).select("new_rep", F.col("doc_id").alias("new_doc"))
    a = _chunk_stacked(grp.select("doc_id", *sig_cols), "new_rep", "sig_a")
    b = _chunk_stacked(
        simhash_signatures(history, text_col), "old_doc", "sig_b"
    )
    per_rep = (
        a.join(b, ["c", "chunk"])
        .select("new_rep", "old_doc", "sig_a", "sig_b")
        .distinct()
        .withColumn("hamming", _hamming(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("hamming") <= max_hamming)
        .groupBy("new_rep")
        .agg(
            F.min("old_doc").alias("dup_of"),
            F.count(F.lit(1)).alias("n_candidates"),
            F.min("hamming").cast("long").alias("min_hamming"),
        )
    )
    return mem.join(per_rep, "new_rep").select(
        "new_doc", "dup_of", "n_candidates", "min_hamming"
    )


# ---------------------------------------------------------------------------
# U21⊕ (round 8) — SIMHASH INDEX: the persistent 100 TB form this module's
# docstrings promise ("at 100 TB the history side is a persisted signature
# table bucketed on chunk"), now real: chunk rows (with the full 64-bit
# signature for the Hamming re-check) bucketed on the composite chunk key,
# so each crawl batch's candidate join reads co-located index buckets and
# shuffles ONLY the new batch — completing the index symmetry across the
# dedup modalities (band / simhash / embedding-LSH / phash).


def simhash_index_rows(sigs: DataFrame) -> DataFrame:
    """Long-format index rows over :func:`simhash_signatures` output:
    (doc_id, simhash, ckey), ckey = "<c>|<chunk>" — one row per doc per
    16-bit chunk (same key convention as ``multimodal.phash_index_rows``
    and ``band_index_rows``: one string column is both join key and
    bucket key)."""
    return _chunk_stacked(sigs, "doc_id", "simhash").select(
        "doc_id",
        "simhash",
        F.concat_ws("|", F.col("c"), F.col("chunk")).alias("ckey"),
    )


def write_simhash_index(
    docs: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 32,
    text_col: str = "text",
    files_per_bucket: int = 1,
) -> None:
    """Persist the corpus SimHash index as a bucketed external table on
    ``ckey``."""
    from video_etl_spark.operators.io import write_bucketed

    write_bucketed(
        simhash_index_rows(simhash_signatures(docs, text_col)),
        table,
        path,
        ["ckey"],
        n_buckets,
        files_per_bucket,
    )


def incremental_simhash_against_index(
    new: DataFrame,
    index: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """:func:`incremental_simhash_dedup` against a persisted chunk index
    (``spark.table(...)`` written by :func:`write_simhash_index`).

    Same output contract (new_doc, dup_of, n_candidates, min_hamming);
    with the bucketed table the join plan has NO exchange on the index
    side — only the new batch shuffles (plan-asserted in tests).  Same
    hot-key guard as the direct form: the batch probes by one
    representative per distinct signature and members expand after.
    """
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the 4-chunk blocking "
            "guarantee (recall is only complete for distance <= 3)"
        )
    new_sig = simhash_signatures(new, text_col).persist()
    sig_cols = ["simhash", "chunk0", "chunk1", "chunk2", "chunk3"]
    grp = new_sig.groupBy(*sig_cols).agg(F.min("doc_id").alias("doc_id"))
    mem = new_sig.select("doc_id", "simhash").join(
        grp.select(F.col("doc_id").alias("new_rep"), "simhash"), "simhash"
    ).select("new_rep", F.col("doc_id").alias("new_doc"))
    new_rows = simhash_index_rows(grp.select("doc_id", *sig_cols)).select(
        F.col("doc_id").alias("new_rep"),
        F.col("simhash").alias("sig_a"),
        "ckey",
    )
    hist_rows = index.select(
        F.col("doc_id").alias("old_doc"),
        F.col("simhash").alias("sig_b"),
        "ckey",
    )
    per_rep = (
        new_rows.join(hist_rows, "ckey")
        .select("new_rep", "old_doc", "sig_a", "sig_b")
        .distinct()
        .withColumn("hamming", _hamming(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("hamming") <= max_hamming)
        .groupBy("new_rep")
        .agg(
            F.min("old_doc").alias("dup_of"),
            F.count(F.lit(1)).alias("n_candidates"),
            F.min("hamming").cast("long").alias("min_hamming"),
        )
    )
    return mem.join(per_rep, "new_rep").select(
        "new_doc", "dup_of", "n_candidates", "min_hamming"
    )


# ---------------------------------------------------------------------------
# U21⊕ (round 8) — WINNOWING FINGERPRINT INDEX: the incremental/persistent
# form of the MOSS fingerprints (queries.text winnowing family) — the last
# dedup modality without one.  Fingerprints are content-addressed 60-bit
# hashes, so the index is (doc_id, fingerprint) bucketed on fingerprint
# and a new crawl batch joins its own fingerprints against it without
# re-fingerprinting the corpus.  Guarantee carries over: any shared token
# run >= w + k - 1 between a batch doc and an indexed doc shares a
# fingerprint, so candidate recall for that overlap length is complete.


def write_fingerprint_index(
    fps: DataFrame, table: str, path: str, n_buckets: int = 32,
    files_per_bucket: int = 1,
) -> None:
    """Persist (doc_id, fingerprint) winnowing fingerprints (the output
    of ``queries.text._winnowing_fps``/equivalent) as a bucketed external
    table on ``fingerprint``."""
    from video_etl_spark.operators.io import write_bucketed

    write_bucketed(
        fps.select("doc_id", "fingerprint"),
        table,
        path,
        ["fingerprint"],
        n_buckets,
        files_per_bucket,
    )


def append_to_simhash_index(
    new_docs: DataFrame,
    table: str,
    text_col: str = "text",
    files_per_bucket: int = 1,
) -> None:
    """Append a crawl batch's chunk rows to the persisted SimHash index
    (:func:`write_simhash_index`) — batch-sized work, bucket layout (and
    therefore the probe's exchange-free index scan) preserved by
    ``operators.io.append_bucketed``.  Content-derived rows mean append
    == full rebuild of the union corpus BIT-FOR-BIT (tested), the
    property IVF appends cannot have.

    Idempotence: the batch anti-joins the index's existing doc_ids, so a
    crashed-and-retried append cannot double a doc's rows (duplicated
    chunk rows would survive ``incremental_simhash_against_index``'s
    distinct but inflate ``winnowing``-style counted probes; one
    discipline for all index appends).  ``localCheckpoint`` because the
    plan reads the table it appends to.  File-count growth over many
    appends is folded by ``operators.io.compact_bucketed_index``
    (generation rotation); there is no raw batch_id tail here to fold or
    prune — a STREAMING simhash writer would reuse the
    ``compact_stream_index`` raw-layout contract instead.
    """
    from video_etl_spark.operators.io import append_bucketed

    spark = new_docs.sparkSession
    rows = simhash_index_rows(simhash_signatures(new_docs, text_col))
    fresh = rows.join(
        spark.table(table).select("doc_id"), "doc_id", "left_anti"
    ).localCheckpoint()
    append_bucketed(fresh, table, files_per_bucket)


def append_to_fingerprint_index(
    new_fps: DataFrame, table: str, files_per_bucket: int = 1
) -> None:
    """Append a batch's winnowing fingerprints to the persisted index
    (:func:`write_fingerprint_index`).  Same contract as
    :func:`append_to_simhash_index`: doc-grain anti-join idempotence
    (``winnowing_candidates_against_index`` COUNTS shared fingerprints,
    so duplicated rows would inflate ``n_shared`` — not just waste
    space), localCheckpoint for the self-read, bucket layout preserved,
    compaction via ``operators.io.compact_bucketed_index``."""
    from video_etl_spark.operators.io import append_bucketed

    spark = new_fps.sparkSession
    fresh = (
        new_fps.select("doc_id", "fingerprint")
        .join(spark.table(table).select("doc_id"), "doc_id", "left_anti")
        .localCheckpoint()
    )
    append_bucketed(fresh, table, files_per_bucket)


def winnowing_candidates_against_index(
    new_fps: DataFrame, index: DataFrame, min_shared: int = 3
) -> DataFrame:
    """(new_doc, old_doc, n_shared) overlap candidates of a NEW batch's
    fingerprints against the persisted index — asymmetric (no old×old
    pair), shuffle on the fingerprint key only; with the bucketed table
    the index side arrives exchange-free.

    Exact-duplicate documents share EVERY fingerprint, so like the other
    pair-generation paths the batch side should be exact-collapsed
    upstream (``operators.io.read_text_corpus`` content-addressing does
    this at ingest); the output is pair-grain by contract and bounded by
    genuine overlap, with ``min_shared`` gating the noise floor.
    """
    n = new_fps.select(F.col("doc_id").alias("new_doc"), "fingerprint")
    o = index.select(F.col("doc_id").alias("old_doc"), "fingerprint")
    return (
        n.join(o, "fingerprint")
        .groupBy("new_doc", "old_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def incremental_embedding_dedup(
    new: DataFrame,
    history: DataFrame,
    threshold: float = 0.9,
    n_tables: int = 4,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pair_predicate: str | None = None,
) -> DataFrame:
    """Embedding-cosine twin of :func:`incremental_dedup` — semantic
    near-dups of a NEW batch's vectors against the indexed corpus.

    (new_id, dup_of, n_candidates, max_cos): for each new vector whose
    cosine similarity with some history vector reaches ``threshold``, the
    minimum matching history id, match count, and best similarity.
    Candidate generation is the random-hyperplane LSH bucket join from
    ``llm_ops.similarity`` (same deterministic planes), run ASYMMETRICALLY
    new×history on (table, bucket) — ids only ride the candidate join;
    vectors are joined back once per UNIQUE pair for the JVM-side cosine
    (zip_with/aggregate, no Python in the re-rank).  No history×history
    pair is ever generated; at 100 TB history buckets live as a bucketed
    table and each batch joins without re-hashing the corpus.

    ``pair_predicate`` filters candidate id pairs BEFORE aggregation —
    the intra-batch call (``incremental_embedding_dedup(b, b,
    pair_predicate="new_id > old_id")``) needs it to drop self-pairs
    (cos(x,x)=1 would otherwise swamp the max_cos evidence) and enforce
    lowest-id-wins in one place.
    """
    from video_etl_spark.llm_ops.similarity import _bucket_udf, _planes
    from video_etl_spark.session import ensure_executor_package

    ensure_executor_package(new.sparkSession)
    bucketize = _bucket_udf(_planes(n_tables, n_planes, dim))

    def with_buckets(df: DataFrame, out: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out),
            F.posexplode(bucketize(F.col(vec_col))).alias("table_id", "bucket"),
        )

    pair_ids = (
        with_buckets(new, "new_id")
        .join(with_buckets(history, "old_id"), ["table_id", "bucket"])
        .select("new_id", "old_id")
        .distinct()
    )
    if pair_predicate is not None:
        # applied BEFORE the per-new_id aggregation so excluded pairs
        # (e.g. self-pairs in a batch-vs-itself call) cannot pollute
        # dup_of / n_candidates / max_cos evidence
        pair_ids = pair_ids.filter(pair_predicate)
    dot = F.aggregate(
        F.zip_with("vec_a", "vec_b", lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )
    new_vecs = new.select(
        F.col(id_col).alias("new_id"),
        F.col(vec_col).cast("array<double>").alias("vec_a"),
    )
    old_vecs = history.select(
        F.col(id_col).alias("old_id"),
        F.col(vec_col).cast("array<double>").alias("vec_b"),
    )
    return (
        pair_ids.join(new_vecs, "new_id")
        .join(old_vecs, "old_id")
        .withColumn(
            "cos_sim",
            dot / (norm(F.col("vec_a")) * norm(F.col("vec_b"))),
        )
        .filter(F.col("cos_sim") >= threshold)
        .groupBy("new_id")
        .agg(
            F.min("old_id").alias("dup_of"),
            F.count(F.lit(1)).alias("n_candidates"),
            F.max("cos_sim").alias("max_cos"),
        )
    )


# ---------------------------------------------------------------------------
# U21⊕ — the 100 TB shape of the incremental index, made concrete: the
# corpus's band signatures persisted as a BUCKETED table keyed on the band,
# so each crawl batch's candidate join reads co-located index buckets and
# shuffles ONLY the (small) new batch — the index side never re-shuffles.
# (The parquet-dir index in streaming/dedup.py is the simple form; this is
# the form a long-lived corpus uses.)


def band_index_rows_from_sigs(
    sigs: DataFrame, n_bands: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """Long-format band rows over PRE-COMPUTED signatures: (id,
    band_key), band_key = "<band_idx>|<band_value>" — THE one definition
    of the index key format (band_index_rows, incremental_components
    and the streaming paths all go through here, so the format cannot
    drift between writer and prober)."""
    parts = [
        sigs.select(
            F.col(id_col),
            F.concat(F.lit(f"{b}|"), F.col(f"band{b}")).alias("band_key"),
        )
        for b in range(n_bands)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def collapse_exact_sigs(
    sigs: DataFrame, n_bands: int = 2, id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Pre-collapse EXACT-duplicate signatures before any pair self-join.

    Returns ``(rep_sigs, members)``: one REPRESENTATIVE row (min id) per
    distinct full signature — same schema as the input — plus
    (``id_col``, rep_id) rows for every collapsed non-representative doc.

    This is the hot-key guard for the whole pair-generation family
    (round-7 verdict #1): n documents with IDENTICAL content share every
    band, so a bare band self-join puts n(n-1)/2 pairs through ONE join
    key — quadratic OUTPUT that AQE skew-splitting cannot fix (a 100 TB
    crawl with a boilerplate page repeated 1e7 times emits ~5e13 pairs).
    Identical signatures are guaranteed co-members of any component, so
    component-grain consumers pair REPRESENTATIVES only (linear in
    distinct contents) and re-attach members afterwards for free.

    Plan shape: one groupBy on the signature columns (map-side combine
    collapses the hot key BEFORE the shuffle — the property that makes
    this safe at any skew) plus one equi-join back for the membership
    map (hot key × 1 representative row — linear).  Representative = min
    id per group, so component labels (min reachable id) are IDENTICAL
    with and without the collapse — the oracle-pinned CC queries prove
    it every round.  Residual skew (near-identical but distinct contents
    sharing one band) is visible via :func:`band_occupancy`.
    """
    band_cols = [f"band{b}" for b in range(n_bands)]
    # Round-15: ``members`` probes through the RETURNED rep frame (not
    # the bare groupBy) so that a caller persisting the returned frame —
    # corpus_components does — covers the collapse groupBy for EVERY
    # members consumer (the CC node anti-join and the component
    # re-attach each re-ran the corpus-wide aggregation past the cache).
    # Interleaved A/B over the CC trio: sum of per-query mins
    # 11.14 → 9.04 s (every histogram sample improved); persisting
    # members as well added nothing on top.
    rep_out = (
        sigs.groupBy(*band_cols)
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, *band_cols)
    )
    members = (
        sigs.join(
            rep_out.select(
                *band_cols, F.col(id_col).alias("__rep")
            ),
            band_cols,
        )
        .filter(F.col(id_col) != F.col("__rep"))
        .select(id_col, F.col("__rep").alias("rep_id"))
    )
    return rep_out, members


def band_occupancy(
    sigs: DataFrame, n_bands: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """(occupancy, n_keys, candidate_pairs) histogram over band keys —
    the LOUD skew readout for the pair-generation family.

    ``candidate_pairs`` = n_keys · occupancy·(occupancy−1)/2 is the pair
    volume each occupancy level would push through the band self-join; a
    hot key shows up as one row with a huge ``candidate_pairs`` long
    before the join runs.  Run it on raw signatures to see exact-dup
    mass, or on ``collapse_exact_sigs`` output to see the RESIDUAL skew
    the collapse cannot remove (distinct contents colliding in a band).
    Output is bounded by the number of distinct occupancy levels.
    """
    occ = (
        band_index_rows_from_sigs(sigs, n_bands, id_col)
        .groupBy("band_key")
        .agg(F.count(F.lit(1)).alias("occupancy"))
    )
    return occ.groupBy("occupancy").agg(
        F.count(F.lit(1)).alias("n_keys"),
        # integer math (occ·(occ−1) is even, div exact) — float division
        # would silently round for the huge counts this exists to expose
        (
            F.expr("occupancy * (occupancy - 1) div 2")
            * F.count(F.lit(1))
        )
        .cast("long")
        .alias("candidate_pairs"),
    )


def band_pairs_from_sigs(
    sigs: DataFrame, n_bands: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """Distinct canonical (doc_a < doc_b) intra-corpus candidate pairs
    over pre-computed signatures — the one definition of the band
    self-join (corpus_components and incremental_components share it).

    Callers that only need COMPONENTS should pass
    ``collapse_exact_sigs`` representatives (corpus_components and
    incremental_components do): pairing raw signatures emits quadratic
    output on exact-duplicate hot keys.  Pair-grain callers that truly
    need every member pair own that output size by definition.

    Round-15 (guide §2.1, §1.2): ONE self-join over the long-format
    (id, band_key) melt instead of a per-band self-join + union — the
    band index in ``band_key`` ("<b>|<value>") keeps bands disjoint, so
    the pair SET is identical (pinned by a differential test and the
    unchanged CC-family oracles), while the n_bands joins (2·n_bands
    plan legs, each its own exchange/broadcast) collapse to one join
    whose two sides canonicalize identically — Spark plans the second
    side as a ReusedExchange/reused broadcast instead of re-shuffling."""
    rows = band_index_rows_from_sigs(sigs, n_bands, id_col)
    a = rows.select(F.col(id_col).alias("doc_a"), "band_key")
    o = rows.select(F.col(id_col).alias("doc_b"), "band_key")
    return (
        a.join(o, "band_key")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def band_index_rows(
    docs: DataFrame,
    n_bands: int = 2,
    rows_per_band: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Long-format band index rows from raw documents (signatures
    computed here); see :func:`band_index_rows_from_sigs`."""
    sigs = minhash_band_signatures(docs, n_bands, rows_per_band, id_col)
    return band_index_rows_from_sigs(sigs, n_bands, id_col)


def write_band_index(
    docs: DataFrame,
    table: str,
    path: str,
    n_bands: int = 2,
    rows_per_band: int = 2,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    files_per_bucket: int = 1,
) -> None:
    """Persist the corpus band index as a bucketed external table on
    ``band_key`` (via ``operators.io.write_bucketed``)."""
    from video_etl_spark.operators.io import write_bucketed

    write_bucketed(
        band_index_rows(docs, n_bands, rows_per_band, id_col),
        table,
        path,
        ["band_key"],
        n_buckets,
        files_per_bucket,
    )


def band_candidates_against_rows(
    sigs: DataFrame,
    index_rows: DataFrame | list[DataFrame] | tuple[DataFrame, ...],
    n_bands: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Probe PRE-COMPUTED batch signatures against one or more
    LONG-format (id, band_key) index frames — the band_key twin of
    :func:`band_candidates`, shared by :func:`incremental_dedup_against_index`
    and the streaming handler's compacted-generation mode.

    ``index_rows`` may be a LIST of frames — the compaction-boundary
    case (a bucketed compacted generation plus the small raw tail the
    compactor has not folded yet).  Each frame joins the probe
    SEPARATELY and only the thin (new_rep, old_doc) hit pairs union
    before the aggregate, so the bucketed generation keeps its
    exchange-free scan; unioning the frames BEFORE the join would erase
    the bucketing and shuffle the whole index side.  When more than one
    frame is passed the unioned hits are globally de-duplicated: a doc
    whose signatures straddle the boundary (a source re-delivery past
    the exact-dup watermark, or an overlapping tail watermark) must
    count ONCE in ``n_candidates``, exactly as the single-frame path's
    global ``distinct`` guaranteed.

    Hot-key guard: the batch probes by ``collapse_exact_sigs``
    representative and members expand to the representative's result;
    the per-doc index stays raw (its rows are the contract other probers
    share).
    """
    frames = (
        list(index_rows)
        if isinstance(index_rows, (list, tuple))
        else [index_rows]
    )
    if not frames:
        raise ValueError("band_candidates_against_rows: empty index list")
    new_reps, new_members = collapse_exact_sigs(sigs, n_bands, id_col)
    new_rows = band_index_rows_from_sigs(new_reps, n_bands, id_col).select(
        F.col(id_col).alias("new_rep"), "band_key"
    )
    hits = None
    for f in frames:
        hist_rows = f.select(F.col(id_col).alias("old_doc"), "band_key")
        h = new_rows.join(hist_rows, "band_key").select("new_rep", "old_doc")
        hits = h if hits is None else hits.unionByName(h)
    # exactly ONE distinct over the (thin, probe-sized) pair union —
    # it both collapses a doc's multiple band collisions and, in the
    # multi-frame case, de-dups a doc visible through both sides of an
    # overlapping compaction boundary; per-frame distincts before it
    # would just shuffle the same pairs twice (distinct already
    # partial-aggregates map-side)
    hits = hits.distinct()
    per_rep = (
        hits
        .groupBy("new_rep")
        .agg(
            F.min("old_doc").alias("dup_of"),
            F.count(F.lit(1)).alias("n_candidates"),
        )
    )
    mem_all = new_reps.select(
        F.col(id_col).alias("new_doc"), F.col(id_col).alias("new_rep")
    ).unionByName(
        new_members.select(
            F.col(id_col).alias("new_doc"), F.col("rep_id").alias("new_rep")
        )
    )
    return mem_all.join(per_rep, "new_rep").select(
        "new_doc", "dup_of", "n_candidates"
    )


def incremental_dedup_against_index(
    new: DataFrame,
    index: DataFrame | list[DataFrame] | tuple[DataFrame, ...],
    n_bands: int = 2,
    rows_per_band: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """:func:`incremental_dedup` against a persisted band index
    (``spark.table(...)`` written by :func:`write_band_index`).

    Same output contract (new_doc, dup_of, n_candidates).  When ``index``
    is the bucketed table, the join plan has NO exchange on the index
    side — only the new batch shuffles (plan-asserted in tests) — which
    is the property that keeps per-crawl cost independent of corpus size.

    ``index`` may also be a LIST of band-row frames — the
    compaction-boundary case (a bucketed compacted generation plus the
    small raw tail, see ``streaming.dedup.compact_stream_index``); join
    shape, cross-frame dedup and the hot-key guard are
    :func:`band_candidates_against_rows`'s (output unchanged vs the
    single-frame form — oracle-pinned via incremental_band_dedup's
    equivalence tests).
    """
    if isinstance(index, (list, tuple)) and not index:
        # fail before signing — the persist below must not leak
        raise ValueError("incremental_dedup_against_index: empty index list")
    # persisted: signatures feed the collapse (reps + members) and the
    # band-key probe rows — LRU-evicted, same convention as simhash_pairs
    sigs = minhash_band_signatures(new, n_bands, rows_per_band, id_col).persist()
    return band_candidates_against_rows(sigs, index, n_bands, id_col)


# ---------------------------------------------------------------------------
# U21⊕ — quality-aware canonical selection: the step that turns a cluster
# labeling (connected_components output) into the KEPT corpus.  Reference
# keeps min-id per duplicate set (`knob_tuner.py:189-196` seen-set keeps the
# first occurrence); real curation keeps the best-quality member instead so
# a truncated mirror never shadows the full original.


def keep_canonical(
    docs: DataFrame,
    components: DataFrame,
    quality_col: str = "n_chars",
    id_col: str = "doc_id",
    node_col: str = "node",
    component_col: str = "component",
) -> DataFrame:
    """Flag one canonical document per duplicate cluster.

    ``components`` is ``connected_components`` output (``node``,
    ``component``).  Returns ``docs``'s columns plus ``component`` and
    ``is_canonical``: true for exactly the cluster member with the highest
    ``quality_col`` (ties broken by lowest ``id_col`` — deterministic).
    Docs absent from ``components`` are their own singleton cluster.
    Filtering ``is_canonical`` yields the deduplicated corpus; the
    complement is the drop list.

    Plan shape: one equi-join on the id (broadcast when the labeling is
    small, SMJ otherwise) and ONE window shuffle on ``component``.  A
    window (not a max_by groupBy + join back) because the per-doc flag
    needs every row anyway — one shuffle beats two.  Giant skewed
    clusters serialize their own sort, but a cluster that large is
    precisely the boilerplate blob the drop list exists for, and the sort
    key is (quality, id) — two scalars, not text.
    """
    comp = components.select(
        F.col(node_col).alias("__node"),
        F.col(component_col).alias("__component"),
    )
    joined = (
        docs.join(comp, docs[id_col] == comp["__node"], "left")
        .withColumn(
            "component", F.coalesce("__component", F.col(id_col))
        )
        .drop("__node", "__component")
    )
    w = Window.partitionBy("component").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return joined.withColumn(
        "is_canonical", F.row_number().over(w) == F.lit(1)
    )


# ---------------------------------------------------------------------------
# U21⊕ — the COMPONENT index (round 7): materialize-once duplicate-cluster
# labeling for a corpus revision.  `write_band_index` persists the
# signature side of the dedup pipeline; this persists the CLUSTER side —
# (doc_id, component, is_canonical) — so the minhash → band → CC chain
# runs ONCE per corpus revision and every downstream consumer
# (dedup decisions, cluster histograms, leakage-free splits, canonical
# selection) reads the labeling instead of re-deriving it.  At 100 TB the
# CC chain is hours of work; the labeling is three thin columns.


def corpus_components(
    docs: DataFrame,
    n_bands: int = 2,
    rows_per_band: int = 2,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """(id, component) duplicate-cluster labeling for a whole corpus.

    The full-corpus twin of :func:`incremental_dedup`'s asymmetric join:
    band the MinHash signatures, self-join per band (id_a < id_b, shuffle
    on band key — never corpus²), then min-label connected components.
    With ``n_bands=2, rows_per_band=2`` this reproduces the
    oracle-checked ``dedup_connected_clusters`` labeling bit for bit
    (same salts, same band keys — the recursive-CTE oracle pins it).
    Docs with no shingles (< 3 tokens) cannot collide and come out as
    singleton components.

    Since round 8 the band self-join runs over exact-duplicate-collapse
    REPRESENTATIVES only (hot-key guard: pair volume is linear in
    distinct contents, never quadratic in exact-duplicate copies);
    collapsed members re-attach to their representative's component
    afterwards.  Since round 16 the collapse here is a window pass
    (min(id) over the band columns) rather than
    :func:`collapse_exact_sigs`'s groupBy + join-back — same
    representatives, one shuffle instead of two plan legs (the groupBy +
    join form remains the right shape for the incremental/streaming
    callers, where map-side combine shrinks a dup-dense batch before the
    shuffle).  Labels are IDENTICAL either way — the representative is
    its group's min id, so the component label (min reachable id) is
    unchanged — which the recursive-CTE oracle re-proves every round.
    """
    # Round-16 (guide §2.4/§5, r15-verdict #1): the former
    # persist(sigs) → collapse groupBy → join-back members → persist(reps)
    # chain is now ONE window pass over the signatures — min(id) OVER
    # (PARTITION BY band cols) computes every doc's representative in a
    # single shuffle, and rep_sigs/members are filters of that one frame
    # (identical rows: the representative is still the group's min id;
    # the CC-family oracles re-prove it).  The frame is EAGERLY
    # localCheckpointed: every downstream consumer (edges melt, node
    # anti-join, member re-attach) then plans against a tiny
    # Scan ExistingRDD instead of re-planning (and, on a cold cache,
    # re-RUNNING) the whole signature subtree per consumer.
    # Rep-interleaved trio A/B: sum of per-query mins 6.77 → 5.06 s
    # (4-arm × 4-rep) and 7.98 → 6.00 s (6-rep A/E confirm) — every
    # sample improved; the window-only and checkpoint-only halves each
    # measured smaller wins (6.16 / 6.58 vs A 6.77), so BOTH are needed.
    # This is the measured exception to the "eager populate loses
    # locally" rule: the checkpoint removes per-consumer RE-PLANNING
    # (driver latency), not just the compute race.  Checkpoint blocks
    # are released by GC + ContextCleaner (a checkpointed frame has no
    # unpersist hook), same lifecycle as the CC rounds' per-round
    # localCheckpoints; sweeping callers (driver gate, bench) nudge GC
    # between queries.
    band_cols = [f"band{b}" for b in range(n_bands)]
    sigs = minhash_band_signatures(docs, n_bands, rows_per_band, id_col)
    win = sigs.withColumn(
        "__rep", F.min(id_col).over(Window.partitionBy(*band_cols))
    ).localCheckpoint()
    rep_sigs = win.filter(F.col(id_col) == F.col("__rep")).select(
        id_col, *band_cols
    )
    members = win.filter(F.col(id_col) != F.col("__rep")).select(
        id_col, F.col("__rep").alias("rep_id")
    )
    edges = band_pairs_from_sigs(rep_sigs, n_bands, id_col)
    # CC nodes: representatives + shingle-less docs (absent from sigs);
    # collapsed members rejoin below.
    nodes = docs.select(id_col).join(
        members.select(id_col), id_col, "left_anti"
    )
    comp = connected_components(
        edges,
        nodes,
        node_col=id_col,
        max_iter=max_iter,
        edges_distinct=True,
    )
    rep_comp = comp.select(F.col("node").alias(id_col), "component")
    member_comp = members.join(
        rep_comp.select(F.col(id_col).alias("rep_id"), "component"),
        "rep_id",
    ).select(id_col, "component")
    return rep_comp.unionByName(member_comp)


def write_component_index(
    docs: DataFrame,
    table: str,
    path: str,
    n_bands: int = 2,
    rows_per_band: int = 2,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    max_iter: int = 20,
    files_per_bucket: int = 1,
) -> None:
    """Persist the duplicate-cluster labeling as a BUCKETED external table
    keyed on the doc id: (doc_id, component, is_canonical).

    ``is_canonical`` follows the min-id convention (component == doc_id),
    matching ``dedup_connected_clusters``; quality-aware selection layers
    :func:`keep_canonical` over the same labeling when needed.

    Bucketing on ``id_col`` means every doc-grain consumer — the
    canonical join back to the corpus, per-doc drop lists, split
    assignment — reads co-located index buckets with NO exchange on the
    index side (plan-asserted in tests), exactly like
    :func:`write_band_index` does for signatures.  Component-grain
    aggregations still shuffle on ``component`` (three thin columns, not
    the corpus).  Read it back with ``spark.table(table)`` and pass it as
    the ``components=`` argument of the CC-chain queries.
    """
    comp = corpus_components(docs, n_bands, rows_per_band, id_col, max_iter)
    flagged = comp.select(
        id_col,
        "component",
        (F.col("component") == F.col(id_col)).alias("is_canonical"),
    )
    from video_etl_spark.operators.io import write_bucketed

    write_bucketed(flagged, table, path, [id_col], n_buckets,
                   files_per_bucket)


# ---------------------------------------------------------------------------
# U21⊕ (round 7 cont.) — INCREMENTAL component maintenance: the missing
# third of the index lifecycle.  `write_band_index` persists signatures,
# `write_component_index` persists the labeling; this updates the LABELING
# per crawl batch without re-running corpus CC.  The hard case is a new
# document BRIDGING two existing clusters: true CC would relabel one old
# cluster wholesale, which an append-only index cannot do — so, like
# production dedup services, the update emits a MERGE LEDGER
# (component_a ≡ component_b) alongside the new rows; consumers resolve
# labels through the ledger (tiny — one row per observed bridge) and the
# next full rebuild folds it in.


def incremental_components(
    new_docs: DataFrame,
    band_index: DataFrame,
    component_index: DataFrame,
    n_bands: int = 2,
    rows_per_band: int = 2,
    max_iter: int = 20,
) -> tuple[DataFrame, DataFrame]:
    """Label a new batch against the persisted indexes.

    Returns ``(labels, merges)``: ``labels`` is (doc_id, component) for
    every batch doc NOT already present in ``component_index``
    (shingle-less short docs come out as singleton components, matching
    ``corpus_components``) — the rows to append to the component index —
    and ``merges`` is (component_a, component_b) pairs of component ids
    proven equivalent by this batch (component_a < b, distinct).
    RE-INGESTED docs (batch doc_ids the component index already holds)
    are handled uniformly: they contribute edges — so any bridge they
    prove still lands in the ledger — but re-emit NO label row, keeping
    the append-only index duplicate-free (round-7 advice; previously a
    re-ingested doc whose id equaled a matched old component id was
    dropped while any other re-ingested duplicate re-appended its row).
    A ledger entry can reference a NEW component id: a backfill batch
    doc with an id LOWER than a matched history component becomes the
    group's min label, and the old component's equivalence to it is
    recorded rather than silently renaming rows the append-only index
    already holds.  Consumers resolve labels through the ledger with
    :func:`resolve_labels`.

    Plan shape: exact-dup pre-collapse (``collapse_exact_sigs`` — batch
    signatures pair and probe by REPRESENTATIVE, so a crawl batch full
    of one boilerplate page costs linear work, not quadratic), one band
    equi-join against the bucketed band index (no exchange on the index
    side), one id join against the component index, then CC over the
    BATCH-SIZED graph (batch representatives + the matched component
    ids as virtual nodes) — never corpus-sized work.  The differential
    test proves k incremental batches + ledger resolution reproduce the
    full-corpus ``corpus_components`` partition exactly, including
    backfill ids, short docs, and re-ingested batches.
    """
    sigs = minhash_band_signatures(
        new_docs, n_bands, rows_per_band
    ).persist()
    try:
        rep_sigs, members = collapse_exact_sigs(sigs, n_bands)
        # eager for the same reason as corpus_components: the final
        # member re-attach must not re-derive signatures after unpersist
        members = members.localCheckpoint()
        rep_sigs = rep_sigs.persist()

        # intra-batch candidate edges (a < b) — the shared definition,
        # over representatives only
        intra = band_pairs_from_sigs(rep_sigs, n_bands)

        # batch ↔ history hits through the band index, resolved to the
        # matched doc's CURRENT component.  Probing by representative is
        # complete: collapsed members share every band with their rep.
        new_rows = band_index_rows_from_sigs(rep_sigs, n_bands).select(
            F.col("doc_id").alias("new_doc"), "band_key"
        )
        hist_hits = (
            new_rows.join(
                band_index.select(
                    F.col("doc_id").alias("old_doc"), "band_key"
                ),
                "band_key",
            )
            .select("new_doc", "old_doc")
            .distinct()
        )
        comp_edges = (
            hist_hits.join(
                component_index.select(
                    F.col("doc_id").alias("old_doc"),
                    F.col("component").alias("old_comp"),
                ),
                "old_doc",
            )
            .select(
                F.col("new_doc").alias("doc_a"),
                F.col("old_comp").alias("doc_b"),
            )
            .distinct()
        )

        # CC over the batch graph: batch representatives + shingle-less
        # docs (from new_docs, not sigs — they must still get singleton
        # labels) + matched old components as virtual nodes; collapsed
        # members re-attach after CC.
        nodes = (
            new_docs.select("doc_id")
            .join(members.select("doc_id"), "doc_id", "left_anti")
            .unionByName(
                comp_edges.select(F.col("doc_b").alias("doc_id"))
            )
            .distinct()
        )
        edges = (
            intra.unionByName(
                comp_edges.select(
                    F.least("doc_a", "doc_b").alias("doc_a"),
                    F.greatest("doc_a", "doc_b").alias("doc_b"),
                )
            )
            # a re-ingested doc whose id equals its own component id
            # produces an (x, x) comp_edge — drop it here so the
            # edges_distinct promise to CC (mirror union is dup-free)
            # holds; a self-loop adds no connectivity anyway
            .filter(F.col("doc_a") != F.col("doc_b"))
            .distinct()
        )
        # no extra persist: connected_components returns a projection of
        # its final localCheckpoint, already materialized — both outputs
        # below are thin reuses of that checkpoint
        labeled = connected_components(
            edges, nodes, max_iter=max_iter, edges_distinct=True
        )

        # eager: old_comps is tiny (distinct matched component ids) but
        # its lineage contains the history-sized band join — without the
        # checkpoint every downstream action on labels/merges would
        # re-run that join, making "incremental" cost grow with corpus
        # size (measured 6.4 s → 9.0 s for 3× history before this)
        old_comps = (
            comp_edges.select(F.col("doc_b").alias("node"))
            .distinct()
            .localCheckpoint()
        )
        # labels: batch-graph nodes minus virtual old-component nodes,
        # plus collapsed members re-attached to their representative's
        # label (joining ``labeled`` — not the anti-joined frame — so a
        # member whose representative's id collides with an old
        # component id still resolves), then minus doc_ids the component
        # index already holds (re-ingest uniformity — see docstring).
        rep_labels = labeled.join(
            old_comps, "node", "left_anti"
        ).select(F.col("node").alias("doc_id"), "component")
        member_labels = members.join(
            labeled.select(F.col("node").alias("rep_id"), "component"),
            "rep_id",
        ).select("doc_id", "component")
        labels = rep_labels.unionByName(member_labels).join(
            component_index.select("doc_id"), "doc_id", "left_anti"
        )

        # merge ledger: every matched old component is equivalent to its
        # batch-graph group LABEL — which may be another old component
        # (the classic bridge) or a lower batch doc id (backfill).
        # Emitting (label, old_comp) pairs covers both; the former
        # old-pair-only form missed the backfill rename entirely.
        merges = (
            labeled.join(old_comps, "node")
            .filter(F.col("component") != F.col("node"))
            .select(
                F.least("component", "node").alias("component_a"),
                F.greatest("component", "node").alias("component_b"),
            )
            .distinct()
        )
        return labels, merges
    finally:
        sigs.unpersist()
        try:
            rep_sigs.unpersist()
        except NameError:
            pass  # collapse itself raised before rep_sigs existed


def resolve_labels(
    labels: DataFrame,
    merges: DataFrame,
    max_ledger_rows: int = 1_000_000,
) -> DataFrame:
    """Resolve (doc_id, component) labels through a merge LEDGER — THE
    canonical consumer-side companion of :func:`incremental_components`
    (round-7 verdict #7: one shared helper instead of every call site
    re-implementing union-find over the ledger).

    ``merges`` is the accumulated (component_a, component_b) ledger —
    possibly the union of several batches' ledgers.  Each equivalence
    class collapses to its MINIMUM member (the same min-id convention as
    every component label here), so k incremental batches + this helper
    reproduce the full-rebuild ``corpus_components`` partition exactly
    (differential-tested).

    Scale posture: the ledger is tiny by construction — one row per
    observed CLUSTER BRIDGE, not per document — so it is collected to
    the driver for union-find (path-halving) and mapped back over the
    corpus-sized ``labels`` via a broadcast join.  The collect is
    bounded: more than ``max_ledger_rows`` raises loudly (a ledger that
    large means full rebuilds are overdue, not that the collect should
    grow), the same contract as the ANN collects in
    ``llm_ops.similarity``.
    """
    rows = merges.select("component_a", "component_b").limit(
        max_ledger_rows + 1
    ).collect()
    if len(rows) > max_ledger_rows:
        raise RuntimeError(
            f"merge ledger exceeds {max_ledger_rows} rows; run a full "
            "component-index rebuild (write_component_index) instead of "
            "resolving through a ledger this large"
        )
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        ra, rb = find(r["component_a"]), find(r["component_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    remap = [(c, find(c)) for c in list(parent) if find(c) != c]
    if not remap:
        return labels
    spark = labels.sparkSession
    map_df = spark.createDataFrame(
        remap, "component long, __resolved long"
    )
    return (
        labels.join(F.broadcast(map_df), "component", "left")
        .select(
            "doc_id",
            F.coalesce("__resolved", "component").alias("component"),
        )
    )


def compact_component_index(
    component_index: DataFrame,
    merges: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 32,
    files_per_bucket: int = 1,
) -> None:
    """Fold incremental label appends + the merge LEDGER into a fresh
    bucketed component-index snapshot — the third operation of the index
    lifecycle (``write_component_index`` → ``incremental_components``
    appends + ledger → COMPACT), and the step that keeps "the next full
    rebuild folds it in" from meaning corpus-wide CC.

    ``component_index`` is the accumulated labeling: the previous
    snapshot unioned with every batch's appended ``labels`` rows
    ((doc_id, component, ...) — extra columns such as the stale
    ``is_canonical`` are ignored); ``merges`` is the accumulated ledger.
    Labels resolve through the ledger with :func:`resolve_labels`
    (min-id equivalence collapse), so the compacted snapshot equals what
    ``write_component_index`` over the whole corpus would produce —
    differential-tested — at LEDGER cost (a bounded driver union-find
    over bridge rows plus one broadcast-mapped column rewrite over the
    index), never corpus-CC cost: no signatures, no band self-join, no
    label iteration.  ``is_canonical`` is recomputed from the RESOLVED
    labels (min-id convention, component == doc_id — exact, because a
    resolved label is its merged cluster's minimum doc id, which is
    itself a row of the index), so a previous generation's canonical
    that lost its crown to a merged-in lower id flips correctly.

    GENERATION ROTATION: the snapshot lands at a NEW (table, path); the
    caller swaps readers over, drops the old generation, and restarts
    with an EMPTY ledger.  Compacting onto a path the input is being
    read from is refused loudly up front — Spark cannot overwrite a
    path mid-read, and a partially-deleted index is the worst possible
    failure mode for the artifact every dedup consumer keys on.  (The
    BAND index needs no ledger fold — its appended rows are already
    final — so when its file counts warrant, its compaction is simply
    ``write_bucketed`` of the accumulated rows into a fresh
    generation.)
    """
    from video_etl_spark.operators.io import (
        assert_new_generation,
        write_bucketed,
    )

    assert_new_generation(
        path,
        component_index.inputFiles(),
        "an input file of the index being compacted",
    )
    resolved = resolve_labels(
        component_index.select("doc_id", "component"), merges
    )
    flagged = resolved.select(
        "doc_id",
        "component",
        (F.col("component") == F.col("doc_id")).alias("is_canonical"),
    )
    write_bucketed(flagged, table, path, ["doc_id"], n_buckets,
                   files_per_bucket)
