"""Text-analysis and deduplication queries over the `documents` table
(SURVEY.md U21/U23 — the LLM-training-data pipeline surface).

Covers: exact dedup (O5 `knob_tuner.py:189-196` seen-set → dropDuplicates),
normalized-fingerprint dedup, MinHash signatures + banded LSH candidate pairs
(U21), n-gram Jaccard near-dup scoring, token statistics, quality scoring,
language-ID heuristic, and winnowing-style min-hash document fingerprints
(U23).

Scale notes: every query here is expressed with built-in JVM-side functions
(split/transform/md5/explode) — no Python UDFs — so the hot path stays in
whole-stage codegen.  The MinHash pair search is the LSH-banded strategy:
signatures are tiny (4 ints/doc), candidate generation is an equi-join on
band keys (shuffle on band hash), never an all-pairs cross join.  The n-gram
Jaccard query co-partitions by `source` to bound the pair space; at 100 TB
the band join replaces it entirely.

Deterministic hashing uses the md5-prefix trick (functions.parity.hash60) so
Spark == DuckDB bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from video_etl_spark.registry import query
from video_etl_spark.session import load_table

# Shared sub-expressions (Spark SQL + DuckDB SQL dialect pairs) -------------

_SPARK_TOKENS = "split(trim(lower(text)), '\\\\s+')"
_DUCK_TOKENS = r"string_split_regex(trim(lower(text)), '\s+')"

_SPARK_HASH = (
    "cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"
)
_DUCK_HASH = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"

MINHASH_SALTS = ("s0|", "s1|", "s2|", "s3|")

_STOPWORDS = "(the|a|of|and|is|to|in)"
_NORM_RE = "[^a-z0-9 ]"


#: overflow-safe ppm ratio: floor(a * 1e6 / b) without BIGINT wrap — a
#: 100 TB corpus is ~2e13 tokens, past the naive multiply's 9.2e12 wrap
#: point, and Spark would WRAP silently (non-ANSI) where DuckDB errors,
#: so both correctness and engine parity need the guard.  Three branches:
#: multiply-first (EXACT) while a*1e6 fits; the two-term decomposition
#: (a div b)*1e6 + ((a mod b)*1e6) div b (EXACT — the identity
#: floor(a*1e6/b) = (a div b)*1e6 + floor((a mod b)*1e6/b); no wrap since
#: a mod b < b < 1e9); div-first only when BOTH a ≥ 9e12 AND b ≥ 1e9,
#: where its relative error is ≤ 1e6/b ≤ 0.1 %.  Dialects differ only in
#: the integer-div operator ("div" / "//"); all arithmetic is positive.
def _safe_ppm(a: str, b: str, div: str) -> str:
    return (
        f"case when {a} < 9000000000000 then ({a} * 1000000) {div} {b} "
        f"when {b} < 1000000000 then "
        f"(({a} {div} {b}) * 1000000) + ((({a} % {b}) * 1000000) {div} {b}) "
        f"else {a} {div} ({b} {div} 1000000) end"
    )


def _tokens_col(col: str = "text") -> F.Column:
    """THE whitespace tokenizer (lowercase, trim, ASCII \\s+ split) —
    the single Spark-side source of truth matching ``_DUCK_TOKENS``.
    Every operator that must agree with the oracles bit for bit
    (export sharding/packing, BPE training, streaming curation) reuses
    this instead of re-typing the expression: a re-typed ``\\s+`` once
    under-escaped to ``s+`` and silently split on runs of the letter s.

    CONVENTION (round-7 advice): a raw split of empty/whitespace-only
    text yields [''] — one phantom token.  Positional/shingle operators
    keep the raw form (their ≥2/≥3-token guards drop such docs anyway);
    operators whose OUTPUT is a token count (packing offsets and
    manifests, length percentiles, epoch budgets, mixture weights,
    quality sampling, source reports) use ``_nonempty_tokens_col`` /
    ``_DUCK_TOKENS_NE`` so an empty document counts 0 tokens on both
    engines.  ``token_stats``/``ttr`` deliberately keep the raw split:
    they report whitespace-SPLIT statistics (n_ws is "number of split
    fields", the classic wc-style readout), not corpus token budgets.
    """
    return F.split(F.trim(F.lower(F.col(col))), r"\s+")


#: Token-COUNT twin of ``_DUCK_TOKENS`` — empty strings filtered so
#: empty/whitespace-only docs count 0 tokens (see ``_tokens_col``).
_DUCK_TOKENS_NE = rf"list_filter({_DUCK_TOKENS}, x -> x != '')"


def _nonempty_tokens_col(col: str = "text") -> F.Column:
    """Token-COUNT twin of ``_tokens_col`` (phantom empty token filtered);
    matches ``_DUCK_TOKENS_NE`` bit for bit."""
    return F.filter(_tokens_col(col), lambda x: x != F.lit(""))


# --------------------------------------------------------------------------
# O5/U21 — exact dedup: one canonical row per distinct text.
@query(
    "dedup_exact_documents",
    oracle="""
    SELECT min(doc_id) AS canonical_doc_id,
           count(*) AS n_copies,
           CAST(length(text) AS BIGINT) AS text_len
    FROM documents
    GROUP BY text
    """,
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.length("text").cast("long").alias("text_len"),
    ).drop("text")


# --------------------------------------------------------------------------
# U21/U23 — normalized-content fingerprint dedup (md5 of canonical form).
@query(
    "dedup_fingerprint_documents",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id,
             {_DUCK_HASH.format(expr="trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))")} AS fingerprint
      FROM documents)
    SELECT fingerprint, min(doc_id) AS canonical_doc_id, count(*) AS n_docs
    FROM fp GROUP BY fingerprint
    """,
)
def dedup_fingerprint_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), _NORM_RE, " "), " +", " "
        )
    )
    fp = F.conv(F.substring(F.md5(normalized), 1, 15), 16, 10).cast("long")
    return (
        docs.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count(F.lit(1)).alias("n_docs"))
    )


def _spark_minhash_cols():
    """mh_j = min over 3-word shingles of hash60(salt_j || shingle)."""
    cols = []
    for j, salt in enumerate(MINHASH_SALTS):
        h = _SPARK_HASH.format(expr=f"concat('{salt}', s)")
        cols.append(
            F.expr(
                f"array_min(transform(shingles, s -> {h}))"
            ).alias(f"mh{j}")
        )
    return cols


def _spark_shingles(df: DataFrame, spread: bool = True) -> DataFrame:
    # Round-15: a single-row-group local scan serializes the 4-salt md5
    # minhash over the shingle arrays on one core (measured 1.35 s of a
    # 4.5 s CC-chain query); spread it when (and only when) the scan's
    # natural splits are below the session parallelism — a no-op at
    # production scale (guide §2.5 input skew).  ``spread=False`` is for
    # consumers whose plan forks the UN-persisted shingle frame into
    # multiple branches that would each re-pay the repartition shuffle of
    # the raw text scan (benchmark_decontamination: counterbalanced A/B
    # measured +0.42 s with the spread, every spread sample slower than
    # every unspread one — the broadcast-build branch is 1/97 of docs and
    # never needs parallelising).
    if spread:
        from video_etl_spark.operators.skew import spread_small_scan

        df = spread_small_scan(df)
    return (
        df.withColumn("toks", _tokens_col())
        .filter(F.size("toks") >= 3)
        .withColumn(
            "shingles",
            F.expr(
                "transform(sequence(1, size(toks) - 2), i -> "
                "concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), "
                "element_at(toks, i + 2)))"
            ),
        )
    )


def _duck_shingle_cte() -> str:
    """WITH toks/sh CTE prefix (3-word shingles per doc), no trailing comma.

    Shared by the minhash signature CTE and the decontamination oracle —
    compose, don't string-split.
    """
    return f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents
    ), sh AS (
      SELECT doc_id,
             [toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
              FOR i IN generate_series(1, len(toks) - 2)] AS shingles
      FROM toks WHERE len(toks) >= 3
    )"""


def _duck_minhash_cte() -> str:
    mh_exprs = ",\n             ".join(
        "list_min([{h} FOR s IN shingles]) AS mh{j}".format(
            h=_DUCK_HASH.format(expr=f"'{salt}' || s"), j=j
        )
        for j, salt in enumerate(MINHASH_SALTS)
    )
    return (
        _duck_shingle_cte()
        + f""", sig AS (
      SELECT doc_id,
             {mh_exprs}
      FROM sh)
    """
    )


#: Banded projection over the `sig` CTE — the ONE definition of the band
#: scheme on the oracle side (minhash_band_pairs, incremental_band_dedup,
#: dedup_connected_clusters all compose it).
_DUCK_BANDED_CTE = """
    , banded AS (
      SELECT doc_id,
             CAST(mh0 AS VARCHAR) || '_' || CAST(mh1 AS VARCHAR) AS band0,
             CAST(mh2 AS VARCHAR) || '_' || CAST(mh3 AS VARCHAR) AS band1
      FROM sig)"""

#: Recursive reachability over the band-candidate graph — the ONE oracle
#: definition of connected components (dedup_connected_clusters,
#: canonical_cluster_docs, dup_cluster_size_histogram, cluster_aware_split
#: all compose it; requires the WITH to be RECURSIVE).
_DUCK_REACH_CTE = """,
    edges AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b ON a.doc_id < b.doc_id AND a.band0 = b.band0
      UNION
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b ON a.doc_id < b.doc_id AND a.band1 = b.band1),
    bidir AS (
      SELECT doc_a AS u, doc_b AS v FROM edges
      UNION SELECT doc_b AS u, doc_a AS v FROM edges),
    reach AS (
      SELECT u, v FROM bidir
      UNION
      SELECT r.u, b.v FROM reach r JOIN bidir b ON r.v = b.u)"""


def _banded_sigs(docs: DataFrame) -> DataFrame:
    """Spark twin of ``_DUCK_BANDED_CTE``: (doc_id, band0, band1), persisted
    because the signature computation (shingling + 4 md5 passes) feeds both
    sides of every band self-join.

    Since round 6 this is the 2-band × 2-row instance of the parameterized
    ``llm_ops.dedup.minhash_band_signatures`` (same salts, same '_'-joined
    band keys — the oracle hash pins the equivalence).

    The persist is deliberately left to Spark's LRU eviction rather than an
    explicit unpersist: the blocks are (doc_id, two short strings) — tiny
    relative to the corpus — and the query builder returns a LAZY plan, so
    there is no post-action hook here to unpersist without re-running the
    signatures.  Callers that sweep many queries in one session (driver
    gate, bench) clear caches between queries.
    """
    from video_etl_spark.llm_ops.dedup import minhash_band_signatures

    return minhash_band_signatures(docs, n_bands=2, rows_per_band=2).persist()


# --------------------------------------------------------------------------
# U21 — MinHash signatures (shingle → salted hash → min), 4 permutations.
@query(
    "minhash_signatures",
    oracle=_duck_minhash_cte() + "SELECT doc_id, mh0, mh1, mh2, mh3 FROM sig",
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return _spark_shingles(docs).select("doc_id", *_spark_minhash_cols())


# --------------------------------------------------------------------------
# U21 — banded-LSH candidate pairs: docs sharing either 2-hash band.
# Equi-joins on band keys (shuffle on band), NOT an all-pairs cross join.
@query(
    "minhash_band_pairs",
    oracle=_duck_minhash_cte()
    + _DUCK_BANDED_CTE
    + """
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a JOIN banded b
      ON a.doc_id < b.doc_id AND (a.band0 = b.band0)
    UNION
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a JOIN banded b
      ON a.doc_id < b.doc_id AND (a.band1 = b.band1)
    """,
)
def minhash_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-15 (guide §2.1/§1.2): ONE self-join over the long-format
    # (id, band_key) melt instead of one self-join per band + union —
    # the same rewrite `llm_ops.dedup.band_pairs_from_sigs` carries
    # (band index in the key keeps bands disjoint, so the distinct pair
    # SET is identical — this query's own oracle re-proves it); the two
    # join legs' exchanges/broadcast builds collapse to one pair that
    # Spark reuses across the canonically-identical sides.
    from video_etl_spark.llm_ops.dedup import band_pairs_from_sigs

    docs = load_table(spark, sf_dir, "documents")
    return band_pairs_from_sigs(_banded_sigs(docs), n_bands=2)


# --------------------------------------------------------------------------
# U21⊕ (round 8): BAND-OCCUPANCY HISTOGRAM — the loud skew readout for the
# pair-generation family (round-7 verdict #1's companion guard): per band
# key, how many signatures land on it, rolled up to (occupancy, n_keys,
# candidate_pairs).  A boilerplate hot key shows up as one row whose
# candidate_pairs dwarfs the rest LONG before any self-join runs; run it
# on collapse_exact_sigs output to see the residual (post-collapse) skew.
# Plan shape: one map-side-combined groupBy on the band key + one tiny
# rollup — safe at any skew, output bounded by distinct occupancy levels.
@query(
    "band_occupancy_histogram",
    oracle=_duck_minhash_cte()
    + _DUCK_BANDED_CTE
    + """,
    keys AS (
      SELECT '0|' || band0 AS band_key FROM banded
      UNION ALL
      SELECT '1|' || band1 AS band_key FROM banded),
    occ AS (
      SELECT band_key, count(*) AS occupancy FROM keys GROUP BY band_key)
    SELECT occupancy,
           count(*) AS n_keys,
           CAST((occupancy * (occupancy - 1) // 2) * count(*) AS BIGINT)
             AS candidate_pairs
    FROM occ GROUP BY occupancy
    """,
)
def band_occupancy_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from video_etl_spark.llm_ops.dedup import band_occupancy

    docs = load_table(spark, sf_dir, "documents")
    return band_occupancy(_banded_sigs(docs), n_bands=2)


# --------------------------------------------------------------------------
# U21⊕ — INCREMENTAL batch dedup: match a NEW crawl batch against the
# EXISTING corpus via the band index — the upsert shape a production
# training-data pipeline runs per crawl (dedup new docs against history
# without re-pairing history against itself).  Batch split is deterministic
# (doc_id % 10 = 0 plays the new batch).  Scale posture: the history side
# is only ever touched through the band equi-join (shuffle on band key);
# at 100 TB the banded history lives as a bucketed table and each
# incremental batch joins against it without rescanning or re-signing the
# corpus — NO old×old pair is ever generated (the asymmetric join is the
# point; compare minhash_band_pairs, which pairs the whole corpus).
@query(
    "incremental_band_dedup",
    oracle=_duck_minhash_cte()
    + _DUCK_BANDED_CTE
    + """,
    hits AS (
      SELECT n.doc_id AS new_doc, o.doc_id AS old_doc
      FROM banded n JOIN banded o
        ON n.doc_id % 10 = 0 AND o.doc_id % 10 <> 0 AND n.band0 = o.band0
      UNION
      SELECT n.doc_id AS new_doc, o.doc_id AS old_doc
      FROM banded n JOIN banded o
        ON n.doc_id % 10 = 0 AND o.doc_id % 10 <> 0 AND n.band1 = o.band1)
    SELECT new_doc, min(old_doc) AS dup_of, count(*) AS n_candidates
    FROM hits GROUP BY new_doc
    """,
)
def incremental_band_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Thin oracle-checked wrapper over the parameterized library operator
    # (llm_ops.dedup.incremental_dedup) — the deterministic doc_id % 10
    # split stands in for a real crawl-batch boundary.
    from video_etl_spark.llm_ops.dedup import incremental_dedup

    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    old = docs.filter(F.col("doc_id") % 10 != 0)
    return incremental_dedup(new, old, n_bands=2, rows_per_band=2)


# --------------------------------------------------------------------------
# U23⊕ — benchmark DECONTAMINATION: flag corpus documents sharing any
# 3-gram shingle with a (small) benchmark/eval set — the n-gram-overlap
# test-set-contamination check every LLM training pipeline runs before
# training.  Deterministic benchmark split: doc_id % 97 = 0 plays the eval
# set.  Scale posture: the benchmark shingle set is tiny and DISTINCT-ed,
# so Catalyst broadcasts it against the exploded corpus shingles — the
# 100 TB corpus is touched once, streamed through a broadcast hash join
# with the shingle extraction fused into the same stage (no shuffle of
# corpus shingles, no pairwise doc join).
@query(
    "benchmark_decontamination",
    oracle=_duck_shingle_cte()
    + """
    , bench AS (
      SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 97 = 0),
    corpus AS (
      SELECT doc_id, unnest(list_distinct(shingles)) AS s
      FROM sh WHERE doc_id % 97 <> 0)
    SELECT c.doc_id, count(*) AS n_overlapping_shingles
    FROM corpus c JOIN bench b ON c.s = b.s
    GROUP BY c.doc_id
    """,
)
def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # spread=False: this plan forks the un-persisted shingle frame into a
    # tiny bench branch (doc_id % 97 = 0, broadcast build) and the corpus
    # branch — with the round-15 spread each fork re-paid its own
    # round-robin shuffle of the raw text scan, and the broadcast build
    # stalled behind a 32-task exchange for a 1/97 slice (counterbalanced
    # AEEA-EAAE: 1.09–1.27 s unspread vs 1.51–1.75 s spread, REPS=3).
    sh = _spark_shingles(docs, spread=False).select("doc_id", "shingles")
    # explode(array_distinct(..)) — array_distinct is a no-op before the
    # DISTINCT, but a bare explode(attribute) makes Catalyst infer
    # size(..)>0 / isnotnull(..) predicates on the generator input and
    # push them through projection collapse, INLINING the whole O(words²)
    # shingle transform into a Filter evaluated for every corpus row
    # (measured 9 s vs 0.6 s at sf0.1).  A complex generator input blocks
    # the inference; same defense as the corpus side below.
    bench = (
        sh.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(F.array_distinct("shingles")).alias("s"))
        .distinct()
    )
    corpus = sh.filter(F.col("doc_id") % 97 != 0).select(
        "doc_id", F.explode(F.array_distinct("shingles")).alias("s")
    )
    return (
        corpus.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlapping_shingles"))
    )


# --------------------------------------------------------------------------
# U21 — n-gram (token-set) Jaccard near-dup scoring, bounded by co-partition
# on `source`.  Pure relational formulation: explode distinct tokens,
# equi-join on token, count intersections.
@query(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, unnest(list_distinct({_DUCK_TOKENS})) AS token
      FROM documents
    ), counts AS (
      SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM toks a JOIN toks b
        ON a.token = b.token AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common) AS jaccard
    FROM inter
    JOIN counts ca ON ca.doc_id = doc_a
    JOIN counts cb ON cb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common) >= 0.2
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(_tokens_col())).alias("token"),
    # token explode feeds three plan branches (both join sides + counts);
    # persist so the tokenization runs once
    ).persist()
    counts = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # join on (token, source) — source is part of the shuffle key, so
    # cross-source token collisions never materialize
    a = toks.select(F.col("doc_id").alias("doc_a"), "source", "token")
    b = toks.select(F.col("doc_id").alias("doc_b"), "source", "token")
    inter = (
        a.join(b, ["token", "source"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.2)
        .select("doc_a", "doc_b", "jaccard")
    )


# --------------------------------------------------------------------------
# U23 — token counting / type-token statistics.
@query(
    "token_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, source, {_DUCK_TOKENS} AS toks,
                      length(text) AS n_chars_real,
                      length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace
               FROM documents)
    SELECT doc_id, lang, source,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           CAST(n_chars_real AS BIGINT) AS n_chars_real,
           CAST(n_nonspace AS DOUBLE) / len(toks) AS avg_token_len,
           CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS type_token_ratio
    FROM t
    """,
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn("toks", _tokens_col())
    n_tokens = F.size("toks").cast("long")
    n_distinct = F.size(F.array_distinct(F.col("toks"))).cast("long")
    n_nonspace = F.length(F.regexp_replace(F.col("text"), r"\s", ""))
    return docs.select(
        "doc_id",
        "lang",
        "source",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        F.length("text").cast("long").alias("n_chars_real"),
        (n_nonspace.cast("double") / n_tokens).alias("avg_token_len"),
        (n_distinct.cast("double") / n_tokens).alias("type_token_ratio"),
    )


# --------------------------------------------------------------------------
# U23⊕ — BPE-ish token-count estimate: the subword-aware twin of
# token_stats' whitespace counting (the pair the training-cost estimator
# needs: whitespace tokens undercount what a BPE tokenizer will emit).
# The estimator tokenizes like a byte-pair vocabulary behaves without
# shipping one: letter runs split greedily into ≤4-char pieces (BPE merges
# saturate around that length on web text), digits tokenize individually
# (as in GPT-style vocabularies), punctuation runs one piece per char
# class.  Leftmost-greedy regex matching is identical in Java (Spark) and
# RE2 (DuckDB) for this alternation — no lookarounds — so counts agree
# exactly; fertility (BPE pieces per whitespace token) is a ppm integer.
# Plan: pure narrow projection over the scan — no shuffle at any scale.
_BPE_RE = r"[a-z]{1,4}|[0-9]|[^a-z0-9\s]"


@query(
    "bpe_token_estimate",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             len({_DUCK_TOKENS}) AS n_ws,
             len(regexp_extract_all(lower(text), '{_BPE_RE}')) AS n_bpe,
             length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace
      FROM documents)
    SELECT doc_id, source,
           CAST(n_ws AS BIGINT) AS n_ws_tokens,
           CAST(n_bpe AS BIGINT) AS n_bpe_tokens,
           CAST(n_bpe * 1000000 // n_ws AS BIGINT) AS fertility_ppm,
           CAST(n_nonspace * 1000000 // n_bpe AS BIGINT)
             AS chars_per_token_ppm
    FROM t
    """,
)
def bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # regexes go through F.lit / column API only — a SQL-string literal
    # would eat the lone backslash in \s
    n_ws = F.size(_tokens_col()).cast("long")
    n_bpe = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_RE), F.lit(0))
    ).cast("long")
    n_nonspace = F.length(F.regexp_replace(F.col("text"), r"\s", "")).cast("long")
    base = docs.select(
        "doc_id",
        "source",
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        n_nonspace.alias("n_nonspace"),
    )
    return base.select(
        "doc_id",
        "source",
        "n_ws_tokens",
        "n_bpe_tokens",
        F.expr(
            "cast(n_bpe_tokens * 1000000 div n_ws_tokens as bigint)"
        ).alias("fertility_ppm"),
        F.expr(
            "cast(n_nonspace * 1000000 div n_bpe_tokens as bigint)"
        ).alias("chars_per_token_ppm"),
    )


# --------------------------------------------------------------------------
# U23 — quality scoring: length band + stopword ratio + lexical diversity.
@query(
    "text_quality_scores",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKENS} AS toks, length(text) AS n,
                      len(regexp_extract_all(lower(text), '\\b{_STOPWORDS}\\b')) AS n_stop
               FROM documents)
    SELECT doc_id,
           CASE WHEN n BETWEEN 200 AND 2000 THEN 1.0
                WHEN n < 50 THEN 0.0 ELSE 0.5 END AS len_score,
           CAST(n_stop AS DOUBLE) / len(toks) AS stopword_ratio,
           CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS diversity,
           0.4 * (CASE WHEN n BETWEEN 200 AND 2000 THEN 1.0
                       WHEN n < 50 THEN 0.0 ELSE 0.5 END)
             + 0.3 * (CAST(n_stop AS DOUBLE) / len(toks))
             + 0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
             AS quality
    FROM t
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn("toks", _tokens_col())
    n = F.length("text")
    n_stop = F.regexp_count(F.lower(F.col("text")), F.lit(rf"\b{_STOPWORDS}\b"))
    len_score = (
        F.when((n >= 200) & (n <= 2000), 1.0).when(n < 50, 0.0).otherwise(0.5)
    )
    stop_ratio = n_stop.cast("double") / F.size("toks")
    diversity = F.size(F.array_distinct(F.col("toks"))).cast("double") / F.size("toks")
    return docs.select(
        "doc_id",
        len_score.alias("len_score"),
        stop_ratio.alias("stopword_ratio"),
        diversity.alias("diversity"),
        (0.4 * len_score + 0.3 * stop_ratio + 0.3 * diversity).alias("quality"),
    )


# --------------------------------------------------------------------------
# U23 — language-ID n-gram/marker heuristic.  (The synthetic corpus is
# English-shaped regardless of its `lang` label; the *operator* — marker
# scoring + argmax with deterministic tie order — is what's under test.)
_LANG_MARKERS = {
    "en": "(the|a|of|and)",
    "de": "(der|die|und)",
    "fr": "(le|la|et)",
    "es": "(el|los|y)",
}


@query(
    "lang_id_heuristic",
    oracle=(
        "WITH s AS (SELECT doc_id, lang, "
        + ", ".join(
            f"len(regexp_extract_all(lower(text), '\\b{pat}\\b')) AS n_{code}"
            for code, pat in _LANG_MARKERS.items()
        )
        + """ FROM documents)
    SELECT doc_id, lang AS lang_label,
           CASE WHEN n_en = 0 AND n_de = 0 AND n_fr = 0 AND n_es = 0 THEN 'und'
                WHEN n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
                WHEN n_de >= n_fr AND n_de >= n_es THEN 'de'
                WHEN n_fr >= n_es THEN 'fr'
                ELSE 'es' END AS lang_pred,
           CAST(n_en AS BIGINT) AS n_en, CAST(n_de AS BIGINT) AS n_de,
           CAST(n_fr AS BIGINT) AS n_fr, CAST(n_es AS BIGINT) AS n_es
    FROM s
    """
    ),
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    counts = {
        code: F.regexp_count(low, F.lit(rf"\b{pat}\b")).cast("long")
        for code, pat in _LANG_MARKERS.items()
    }
    df = docs.select("doc_id", F.col("lang").alias("lang_label"), *[
        c.alias(f"n_{code}") for code, c in counts.items()
    ])
    n = {code: F.col(f"n_{code}") for code in _LANG_MARKERS}
    pred = (
        F.when(
            (n["en"] == 0) & (n["de"] == 0) & (n["fr"] == 0) & (n["es"] == 0), "und"
        )
        .when((n["en"] >= n["de"]) & (n["en"] >= n["fr"]) & (n["en"] >= n["es"]), "en")
        .when((n["de"] >= n["fr"]) & (n["de"] >= n["es"]), "de")
        .when(n["fr"] >= n["es"], "fr")
        .otherwise("es")
    )
    return df.withColumn("lang_pred", pred)


# --------------------------------------------------------------------------
# U23 — winnowing-style document fingerprint: min hash over 5-gram shingles
# (rolling-hash fingerprinting re-expressed with built-ins).
@query(
    "doc_winnow_fingerprint",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents
    ), sh AS (
      SELECT doc_id,
             [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                      || toks[i+3] || ' ' || toks[i+4]
              FOR i IN generate_series(1, len(toks) - 4)] AS shingles
      FROM toks WHERE len(toks) >= 5)
    SELECT doc_id,
           list_min([{_DUCK_HASH.format(expr="'w|' || s")} FOR s IN shingles])
             AS fingerprint
    FROM sh
    """,
)
def doc_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = _SPARK_HASH.format(expr="concat('w|', s)")
    return (
        docs.withColumn("toks", _tokens_col())
        .filter(F.size("toks") >= 5)
        .withColumn(
            "shingles",
            F.expr(
                "transform(sequence(1, size(toks) - 4), i -> concat_ws(' ', "
                "element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2), "
                "element_at(toks, i + 3), element_at(toks, i + 4)))"
            ),
        )
        .select(
            "doc_id",
            F.expr(f"array_min(transform(shingles, s -> {h}))").alias("fingerprint"),
        )
    )


# --------------------------------------------------------------------------
# U21 — near-dup pair statistics per source: same token-join work as
# ngram_jaccard_pairs, reduced to per-source aggregates (bench headliner;
# jaccard sums quantized for engine-exact aggregation).
@query(
    "jaccard_pair_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, unnest(list_distinct({_DUCK_TOKENS})) AS token
      FROM documents
    ), counts AS (
      SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id
    ), inter AS (
      SELECT a.source AS source, a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS n_common
      FROM toks a JOIN toks b
        ON a.token = b.token AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3
    ), pairs AS (
      SELECT source,
             CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common) AS jaccard
      FROM inter
      JOIN counts ca ON ca.doc_id = doc_a
      JOIN counts cb ON cb.doc_id = doc_b)
    SELECT source,
           count(*) AS n_pairs,
           CAST(sum(CASE WHEN jaccard >= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dups,
           CAST(CAST(sum(CAST(round(jaccard * 1000000) AS BIGINT)) AS DOUBLE)
                / (count(*) * 1000000) AS DOUBLE) AS avg_jaccard
    FROM pairs GROUP BY source
    """,
)
def jaccard_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pair generation is a *salted* within-source self-join of per-doc
    # distinct-token ARRAYS; the intersection is size(array_intersect) in
    # whole-stage codegen.  Versus the exploded token equi-join (the
    # oracle's formulation) this removes the N·k²/V-row shuffle, the
    # (source, doc_a, doc_b) groupBy, and both per-doc count-lookup joins —
    # one shuffle on (source, salt) total.  Salting spreads each source
    # (few, large groups — classic skew) over _N_SALT partitions: the left
    # side keys by doc_id % _N_SALT, the right side replicates _N_SALT ways.
    # The pair space itself is still quadratic per source — at 100 TB the
    # MinHash band join (minhash_band_pairs) replaces this query entirely.
    _N_SALT = 16
    docs = load_table(spark, sf_dir, "documents")
    # repartition before the join: the scan of a small table is one task,
    # and a broadcast join inherits its partitioning — without the spread
    # the quadratic intersect stage below runs single-threaded.
    toksets = (
        docs.select(
            "doc_id", "source", F.array_distinct(_tokens_col()).alias("toks")
        )
        .repartition(64, "source", "doc_id")
        .persist()  # both join branches; tokenize once
    )
    a = toksets.select(
        F.col("doc_id").alias("doc_a"),
        "source",
        F.col("toks").alias("toks_a"),
        F.pmod("doc_id", F.lit(_N_SALT)).cast("int").alias("salt"),
    )
    b = toksets.select(
        F.col("doc_id").alias("doc_b"),
        "source",
        F.col("toks").alias("toks_b"),
        F.explode(F.sequence(F.lit(0), F.lit(_N_SALT - 1))).alias("salt"),
    )
    # The `n_common >= 1` predicate lives in the AGGREGATES, not a filter:
    # a filter on n_common gets pushed into the join condition by Catalyst,
    # making the join evaluate array_intersect a second time per candidate
    # pair.  As conditional sums the intersect is computed exactly once.
    pairs = (
        a.join(b, ["source", "salt"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("n_common", F.size(F.array_intersect("toks_a", "toks_b")))
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.size("toks_a") + F.size("toks_b") - F.col("n_common")),
        )
    )
    matched = F.col("n_common") >= 1
    n_pairs = F.sum(F.when(matched, 1).otherwise(0))
    return (
        pairs.groupBy("source")
        .agg(
            n_pairs.alias("n_pairs"),
            F.sum(F.when(F.col("jaccard") >= 0.2, 1).otherwise(0)).alias("n_near_dups"),
            (
                F.sum(
                    F.when(matched, F.round(F.col("jaccard") * 1_000_000).cast("long"))
                    .otherwise(0)
                )
                / (n_pairs * 1_000_000)
            ).cast("double").alias("avg_jaccard"),
        )
        # The oracle's token equi-join never materializes zero-match pairs,
        # so a source whose pairs share no tokens must emit no row here
        # either (all-pairs enumeration would otherwise produce
        # n_pairs=0 / avg_jaccard=NULL for it).
        .filter(F.col("n_pairs") > 0)
    )


# --------------------------------------------------------------------------
# ⊕ training-pipeline op — deterministic hash-based dataset split (the
# reproducible train/valid/test partitioning a 100 TB corpus needs: no
# sampling state, any engine/worker computes the same assignment).
@query(
    "dataset_split",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id,
             {_DUCK_HASH.format(expr="'split|' || CAST(doc_id AS VARCHAR)")} % 10 AS bucket
      FROM documents)
    SELECT CASE WHEN bucket < 1 THEN 'test'
                WHEN bucket < 2 THEN 'valid'
                ELSE 'train' END AS split,
           count(*) AS n_docs,
           min(doc_id) AS min_doc_id
    FROM assigned GROUP BY 1
    """,
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    bucket = h % 10
    split = (
        F.when(bucket < 1, "test").when(bucket < 2, "valid").otherwise("train")
    )
    return (
        docs.select(split.alias("split"), "doc_id")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


# --------------------------------------------------------------------------
# U23 — vocabulary statistics: term frequency + document frequency (the
# CountVectorizer-shaped corpus pass).
@query(
    "vocabulary_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKENS}) AS token FROM documents)
    SELECT token,
           count(*) AS term_freq,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
           CAST(count(DISTINCT doc_id) AS DOUBLE)
             / (SELECT count(*) FROM documents) AS doc_ratio
    FROM toks GROUP BY token
    """,
)
def vocabulary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # corpus size as a broadcast 1-row aggregate, not a driver-side
    # .count() — one scan total in the executed plan
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    toks = docs.select("doc_id", F.explode(_tokens_col()).alias("token"))
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("term_freq"),
            F.countDistinct("doc_id").cast("long").alias("doc_freq"),
        )
        .crossJoin(F.broadcast(n))
        .select(
            "token",
            "term_freq",
            "doc_freq",
            (F.col("doc_freq").cast("double") / F.col("n_docs")).alias("doc_ratio"),
        )
    )


# --------------------------------------------------------------------------
# U23 — TF-IDF scoring: per-(doc, token) term frequency x ln(N/df).
# tf/df are exact integers, but ln() differs by 1 ulp between engines
# (different libm), so the score is rounded to 6 decimals on both sides.
@query(
    "tfidf_scores",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKENS}) AS token FROM documents),
    tf AS (
      SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
    df AS (
      SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.token, tf.tf,
           df.df,
           round(CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
    FROM tf JOIN df ON df.token = tf.token CROSS JOIN n
    """,
)
def tfidf_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # corpus size folded into the plan as a broadcast 1-row aggregate (no
    # separate driver-side .count() scan)
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    toks = docs.select("doc_id", F.explode(_tokens_col()).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # df is vocabulary-sized (unbounded at corpus scale) — no broadcast
    # hint; AQE chooses BHJ only while it actually fits.
    df = toks.groupBy("token").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    return (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n_docs") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )


# --------------------------------------------------------------------------
# ⊕ training-pipeline op — Gopher-style repetition / quality signals
# (Rae et al. 2021 §A1.1 adapted to a single-line corpus): top-token and
# top-bigram concentration, duplicate-5-gram fraction, mean word length,
# and the combined keep/drop gate.  Every signal is a PER-ROW array
# expression (no explode, no shuffle) — at 100 TB this is a narrow map
# over the corpus that pipelines with the scan, the exact opposite of the
# explode→groupBy formulation which would shuffle ~k rows per document.
# The O(k²) per-row frequency scan is bounded by document token count.
@query(
    "repetition_scores",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents),
    g AS (
      SELECT doc_id, toks, len(toks) AS n,
             CASE WHEN len(toks) >= 2 THEN
               list_transform(generate_series(1, len(toks) - 1),
                              i -> toks[i] || ' ' || toks[i + 1])
             ELSE [] END AS bigrams,
             CASE WHEN len(toks) >= 5 THEN
               list_transform(generate_series(1, len(toks) - 4),
                              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                   || ' ' || toks[i+3] || ' ' || toks[i+4])
             ELSE [] END AS grams5
      FROM t)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(list_max(list_transform(list_distinct(toks),
                  t -> len(list_filter(toks, x -> x = t)))) AS DOUBLE) / n
             AS top_token_frac,
           CASE WHEN len(bigrams) > 0 THEN
             CAST(list_max(list_transform(list_distinct(bigrams),
                    t -> len(list_filter(bigrams, x -> x = t)))) AS DOUBLE)
               / len(bigrams)
           ELSE CAST(0 AS DOUBLE) END AS top_bigram_frac,
           CASE WHEN len(grams5) > 0 THEN
             1.0 - CAST(len(list_distinct(grams5)) AS DOUBLE) / len(grams5)
           ELSE CAST(0 AS DOUBLE) END AS dup_5gram_frac,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / n
             AS mean_word_len,
           (CAST(list_max(list_transform(list_distinct(toks),
                   t -> len(list_filter(toks, x -> x = t)))) AS DOUBLE) / n
              <= 0.2
            AND (CASE WHEN len(grams5) > 0 THEN
                   1.0 - CAST(len(list_distinct(grams5)) AS DOUBLE) / len(grams5)
                 ELSE CAST(0 AS DOUBLE) END) <= 0.3
            AND CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / n
                  BETWEEN 3 AND 10) AS gopher_keep
    FROM g
    """,
)
def repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # The test corpus parquet is a single row group, so the scan is one
    # task and the heavy per-row n-gram lambdas below would run
    # single-threaded.  Real corpora scan into many partitions (the guard
    # keeps this a no-op there — no corpus-wide shuffle at scale); locally
    # the repartition buys cores × speedup.
    target = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < max(2, target // 2):
        docs = docs.repartition(target)
    d = docs.select("doc_id", _tokens_col().alias("toks")).withColumn(
        "n", F.size("toks")
    )
    # n-gram builders guarded for short docs: Spark sequence(1, 0) counts
    # DOWN ([1, 0]) where DuckDB generate_series(1, 0) is empty — the CASE
    # keeps both engines on the empty-array branch.
    d = d.withColumn(
        "bigrams",
        F.when(
            F.col("n") >= 2,
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1)))"
            ),
        ).otherwise(F.expr("array()")),
    ).withColumn(
        "grams5",
        F.when(
            F.col("n") >= 5,
            F.expr(
                "transform(sequence(1, size(toks) - 4), i -> concat_ws(' ', "
                "element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2), "
                "element_at(toks, i + 3), element_at(toks, i + 4)))"
            ),
        ).otherwise(F.expr("array()")),
    )
    top_of = lambda col: F.expr(  # noqa: E731 — local plan fragment
        f"array_max(transform(array_distinct({col}), "
        f"t -> size(filter({col}, x -> x = t))))"
    )
    top_token_frac = top_of("toks").cast("double") / F.col("n")
    top_bigram_frac = F.when(
        F.size("bigrams") > 0,
        top_of("bigrams").cast("double") / F.size("bigrams"),
    ).otherwise(F.lit(0.0))
    dup5 = F.when(
        F.size("grams5") > 0,
        1.0 - F.size(F.array_distinct("grams5")).cast("double") / F.size("grams5"),
    ).otherwise(F.lit(0.0))
    mean_wl = (
        F.expr("aggregate(toks, 0, (acc, x) -> acc + length(x))").cast("double")
        / F.col("n")
    )
    return d.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        top_token_frac.alias("top_token_frac"),
        top_bigram_frac.alias("top_bigram_frac"),
        dup5.alias("dup_5gram_frac"),
        mean_wl.alias("mean_word_len"),
        (
            (top_token_frac <= 0.2)
            & (dup5 <= 0.3)
            & mean_wl.between(3, 10)
        ).alias("gopher_keep"),
    )


# --------------------------------------------------------------------------
# ⊕ training-pipeline op — PII redaction (email/phone scrubbing before a
# corpus reaches training).  The synthetic tables carry no organic PII, so
# the query *constructs* deterministic PII-shaped text from customer rows,
# then proves the redaction operator: regexp_replace runs JVM-side in one
# narrow map (no shuffle), and the counts make the check non-vacuous.
@query(
    "pii_redaction",
    oracle="""
    WITH synth AS (
      SELECT c_custkey,
             'reach ' || lower(c_name) || ' at ' || lower(c_name) ||
             '@example.com or +1-' ||
             lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' ||
             lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
             ' for segment ' || c_mktsegment AS contact_text
      FROM customer)
    SELECT c_custkey,
           CAST(len(regexp_extract_all(contact_text,
                '[a-z0-9#]+@[a-z0-9.]+')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(contact_text,
                '\\+1-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
           regexp_replace(regexp_replace(contact_text,
                '[a-z0-9#]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                '\\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
    FROM synth
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    contact = F.concat(
        F.lit("reach "), F.lower("c_name"), F.lit(" at "),
        F.lower("c_name"), F.lit("@example.com or +1-"),
        F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit(" for segment "), F.col("c_mktsegment"),
    )
    email_re = "[a-z0-9#]+@[a-z0-9.]+"
    phone_re = r"\+1-[0-9]{3}-[0-9]{4}"
    d = cust.select("c_custkey", contact.alias("contact_text"))
    return d.select(
        "c_custkey",
        F.regexp_count("contact_text", F.lit(email_re)).cast("long").alias("n_emails"),
        F.regexp_count("contact_text", F.lit(phone_re)).cast("long").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("contact_text", email_re, "<EMAIL>"),
            phone_re, "<PHONE>",
        ).alias("redacted"),
    )


# --------------------------------------------------------------------------
# U21 — duplicate-cluster formation: MinHash band pairs -> connected
# components -> canonical doc per cluster (the pipeline step that turns
# candidate PAIRS into dedup DECISIONS).  Spark side: min-label propagation
# (llm_ops.dedup.connected_components, one shuffle per round, rounds ~
# component diameter).  Oracle side: recursive-CTE transitive closure —
# tractable at oracle scale, where components are small.
@query(
    "dedup_connected_clusters",
    oracle=_duck_minhash_cte().replace("WITH toks", "WITH RECURSIVE toks")
    + _DUCK_BANDED_CTE
    + _DUCK_REACH_CTE
    + """
    SELECT d.doc_id,
           least(d.doc_id, coalesce(m.mv, d.doc_id)) AS component,
           least(d.doc_id, coalesce(m.mv, d.doc_id)) = d.doc_id AS is_canonical
    FROM documents d
    LEFT JOIN (SELECT u, min(v) AS mv FROM reach GROUP BY u) m
      ON m.u = d.doc_id
    """,
)
def dedup_connected_clusters(
    spark: SparkSession, sf_dir: str, components: DataFrame | None = None
) -> DataFrame:
    comp = _cc_components(spark, sf_dir, components)
    return comp.select(
        "doc_id",
        "component",
        (F.col("component") == F.col("doc_id")).alias("is_canonical"),
    )


def _cc_components(
    spark: SparkSession, sf_dir: str, components: DataFrame | None
) -> DataFrame:
    """(doc_id, component) for the CC-chain query family.

    ``components`` is an optional PRECOMPUTED labeling — typically
    ``spark.table(...)`` over the bucketed index
    ``llm_ops.dedup.write_component_index`` persists — so a corpus
    revision pays the minhash → band → CC chain ONCE and every consumer
    (cluster decisions, size histograms, leakage-free splits, canonical
    selection) reads three thin columns instead of re-deriving the
    labeling.  Without it, the chain runs inline through
    ``llm_ops.dedup.corpus_components`` (the oracle-pinned 2-band ×
    2-row instance) — since round 8 the ONE definition of the inline
    chain, exact-dup pre-collapsed so a boilerplate hot key cannot blow
    the band self-join up quadratically (round-7 verdict #1).
    """
    if components is not None:
        return components.select("doc_id", "component")
    from video_etl_spark.llm_ops.dedup import corpus_components

    docs = load_table(spark, sf_dir, "documents")
    return corpus_components(docs, n_bands=2, rows_per_band=2)


# --------------------------------------------------------------------------
# U21⊕ — fuzzy near-match pairs via edit distance with prefix blocking:
# the string-similarity leg of the dedup family (exact/fingerprint/minhash/
# simhash/embedding + THIS).  The pair space is bounded by the blocking
# key (12-char normalized prefix) — never corpus², same discipline as the
# band joins (cross-source on purpose: near-dups across crawls/sources are
# the realistic fuzzy-match target); levenshtein runs JVM-side on
# candidates only.  Two skew defenses for crawl corpora where a boilerplate
# header sends everything to one block: (1) block size is CAPPED at
# _FUZZY_MAX_BLOCK docs (min doc_id first — deterministic, mirrored in the
# oracle's QUALIFY), bounding any block's pair space; (2) the self-join is
# SALTED so even a full block's quadratic compute spreads across
# _FUZZY_SALT partitions instead of one straggler task.
_FUZZY_MAX_BLOCK = 256
_FUZZY_SALT = 8


@query(
    "fuzzy_text_pairs",
    oracle=f"""
    WITH normed AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents),
    blocked AS (
      SELECT doc_id, t, substr(t, 1, 12) AS blk FROM normed
      QUALIFY row_number() OVER (PARTITION BY blk ORDER BY doc_id)
              <= {_FUZZY_MAX_BLOCK})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(substr(a.t, 1, 64), substr(b.t, 1, 64)) AS BIGINT)
             AS edit_distance
    FROM blocked a JOIN blocked b
      ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE levenshtein(substr(a.t, 1, 64), substr(b.t, 1, 64)) <= 16
    """,
)
def fuzzy_text_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w_blk = Window.partitionBy("blk").orderBy("doc_id")
    normed = (
        docs.select(
            "doc_id",
            F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")).alias("t"),
        )
        .withColumn("blk", F.substring("t", 1, 12))
        .withColumn("blk_rn", F.row_number().over(w_blk))
        .filter(F.col("blk_rn") <= _FUZZY_MAX_BLOCK)
        .persist()  # both join branches; normalize + rank once
    )
    a = normed.select(
        F.col("doc_id").alias("doc_a"), "blk",
        F.substring("t", 1, 64).alias("ta"),
        F.pmod("doc_id", F.lit(_FUZZY_SALT)).cast("int").alias("salt"),
    )
    b = normed.select(
        F.col("doc_id").alias("doc_b"), "blk",
        F.substring("t", 1, 64).alias("tb"),
        F.explode(F.sequence(F.lit(0), F.lit(_FUZZY_SALT - 1))).alias("salt"),
    )
    return (
        a.join(b, ["blk", "salt"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("edit_distance", F.levenshtein("ta", "tb").cast("long"))
        .filter(F.col("edit_distance") <= 16)
        .select("doc_a", "doc_b", "edit_distance")
    )


# --------------------------------------------------------------------------
# ⊕ training-pipeline op — sequence PACKING: assign documents to fixed
# token-budget packs (the pretraining step that concatenates short docs
# into full context windows).  Offset-based assignment: a doc joins the
# pack its cumulative-offset starts in — one window pass per source, fully
# deterministic, no sequential driver loop (the exact greedy first-fit is
# inherently serial; offset packing is the standard distributed
# approximation and over-fills a pack by at most one document).
@query(
    "sequence_packing",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             x -> x != '')) AS n_tokens
      FROM documents),
    offs AS (
      SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) - n_tokens AS off
      FROM toks),
    packed AS (
      SELECT source, CAST(off // 256 AS BIGINT) AS pack_id,
             doc_id, n_tokens FROM offs)
    SELECT source, pack_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
           min(doc_id) AS first_doc
    FROM packed GROUP BY source, pack_id
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source",
        F.size(_nonempty_tokens_col()).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = toks.withColumn(
        "off", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    packed = offs.withColumn(
        "pack_id", F.floor(F.col("off") / 256).cast("long")
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


# --------------------------------------------------------------------------
# U23⊕ — count-based bigram language-model table: conditional continuation
# probabilities P(w2 | w1) = c(w1 w2) / c(w1 ·) over the corpus — the
# n-gram-LM statistics build (quality scoring, perplexity filters, and
# contamination checks all start from this table).  Two aggregations over
# one explode; the probability is a single division of two exact counts.
@query(
    "bigram_lm_counts",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
      FROM documents),
    pairs_l AS (
      SELECT [t[i] || ' ' || t[i + 1]
              FOR i IN generate_series(1, len(t) - 1)] AS bgs
      FROM toks WHERE len(t) >= 2),
    bigrams AS (
      SELECT string_split(u.bg, ' ')[1] AS w1,
             string_split(u.bg, ' ')[2] AS w2
      FROM pairs_l, unnest(bgs) AS u(bg)),
    pair_c AS (
      SELECT w1, w2, count(*) AS c_pair FROM bigrams GROUP BY w1, w2),
    head_c AS (
      SELECT w1, count(*) AS c_head FROM bigrams GROUP BY w1)
    SELECT p.w1, p.w2, p.c_pair, h.c_head,
           CAST(CAST(p.c_pair AS DOUBLE) / h.c_head AS DOUBLE) AS cond_p
    FROM pair_c p JOIN head_c h ON h.w1 = p.w1
    WHERE p.c_pair >= 5
    """,
)
def bigram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(_tokens_col().alias("t")).filter(F.size("t") >= 2)
    bigrams = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> struct(element_at(t, i) as w1, element_at(t, i + 1) as w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    pair_c = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_pair"))
    head_c = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c_head"))
    return (
        pair_c.filter(F.col("c_pair") >= 5)
        .join(head_c, "w1")
        .select(
            "w1", "w2", "c_pair", "c_head",
            (F.col("c_pair").cast("double") / F.col("c_head"))
            .cast("double").alias("cond_p"),
        )
    )


# --------------------------------------------------------------------------
# ⊕ training-pipeline op — per-source corpus report: the governance rollup
# a curation run publishes (doc counts, token mass, duplicate share via
# normalized fingerprints, length profile) — one grouped pass over
# per-doc scalars plus a fingerprint sub-aggregation.
@query(
    "corpus_source_report",
    oracle=f"""
    WITH per_doc AS (
      SELECT doc_id, source,
             len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             x -> x != '')) AS n_toks,
             {_DUCK_HASH.format(expr="trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))")} AS fp
      FROM documents),
    fp_counts AS (
      SELECT source, fp, count(*) AS n FROM per_doc GROUP BY source, fp)
    SELECT d.source,
           count(*) AS n_docs,
           CAST(sum(d.n_toks) AS BIGINT) AS total_tokens,
           CAST(CAST(sum(d.n_toks) AS DOUBLE) / count(*) AS DOUBLE)
             AS mean_doc_tokens,
           CAST(sum(CASE WHEN f.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           CAST(min(d.n_toks) AS BIGINT) AS min_tokens,
           CAST(max(d.n_toks) AS BIGINT) AS max_tokens
    FROM per_doc d JOIN fp_counts f ON f.source = d.source AND f.fp = d.fp
    GROUP BY d.source
    """,
)
def corpus_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), _NORM_RE, " "), " +", " "
        )
    )
    fp = F.conv(F.substring(F.md5(normalized), 1, 15), 16, 10).cast("long")
    per_doc = docs.select(
        "doc_id", "source",
        F.size(_nonempty_tokens_col()).alias("n_toks"),
        fp.alias("fp"),
    )
    fp_counts = per_doc.groupBy("source", "fp").agg(
        F.count(F.lit(1)).alias("n")
    )
    joined = per_doc.join(fp_counts, ["source", "fp"])
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("long").alias("total_tokens"),
        (F.sum("n_toks").cast("double") / F.count(F.lit(1)))
        .cast("double").alias("mean_doc_tokens"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
        .cast("long").alias("n_dup_docs"),
        F.min("n_toks").cast("long").alias("min_tokens"),
        F.max("n_toks").cast("long").alias("max_tokens"),
    )


# --------------------------------------------------------------------------
# U21⊕ — deterministic fixed-k stratified sample (round 5): exactly k docs
# per language, chosen by md5-hash order — the reproducible
# reservoir-sample every training-data pipeline needs for balancing
# strata (hash order IS the uniform random order, identical on every
# engine and every rerun; contrast stratified_sample, which is
# per-fraction Bernoulli).  Scale shape: one window per stratum
# (row_number over hash) — partial top-k per partition then one shuffle
# on lang; no collect, no RNG state.
@query(
    "stratified_topk_sample",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang,
             {_DUCK_HASH.format(expr="'smp|' || CAST(doc_id AS VARCHAR)")} AS hv
      FROM documents)
    SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn
      FROM h) t
    WHERE rn <= 40
    """,
)
def stratified_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("smp|"), F.col("doc_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("lang").orderBy("hv", "doc_id")
    return (
        docs.select("doc_id", "lang", hv.alias("hv"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 40)
        .select("doc_id", "lang", "rn")
    )


# --------------------------------------------------------------------------
# ⊕ training-pipeline op (round 6): per-source MIXTURE WEIGHTS — the data-
# mixing step every LLM training run performs (compute each domain's token
# share, derive the sampling weight that rebalances toward a target — here
# the uniform mixture).  Exact integer arithmetic end to end: token counts
# sum as BIGINT, shares/weights are ppm integer divisions, so both engines
# agree bit for bit.  Plan: one groupBy(source) over the scan, the 1-row
# corpus total folded back as a broadcast scalar — two shuffles total,
# scan-bound at 100 TB.
@query(
    "source_mixture_weights",
    oracle=f"""
    WITH t AS (
      SELECT source, len({_DUCK_TOKENS_NE}) AS n_tok FROM documents),
    s AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens
      FROM t GROUP BY source),
    tot AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS total,
             count(*) AS n_sources
      FROM s)
    SELECT source, n_docs, n_tokens,
           CAST({_safe_ppm("n_tokens", "total", "//")} AS BIGINT)
             AS token_share_ppm,
           CASE WHEN n_tokens = 0 THEN NULL
                ELSE CAST({_safe_ppm("total", "(n_sources * n_tokens)", "//")}
                     AS BIGINT)
           END AS uniform_weight_ppm
    FROM s, tot
    """,
)
def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.select(
        "source",
        F.size(_nonempty_tokens_col()).cast("long").alias("n_tok"),
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )
    return mixture_weights_from_totals(per_source)


def mixture_weights_from_totals(per_source: DataFrame) -> DataFrame:
    """Uniform-target mixture weights from a (source, n_docs, n_tokens)
    totals frame (round-7 ask #6): the derivation half of
    ``source_mixture_weights``, split out so the STREAMING stats
    maintenance (``streaming.stats.current_totals`` — partial-aggregate
    rows, never the corpus) can refresh mixing weights per batch with the
    exact same ppm arithmetic the oracle pins."""
    totals = per_source.agg(
        F.sum("n_tokens").alias("total"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    return (
        per_source.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr(_safe_ppm("n_tokens", "total", "div")).cast("long")
            .alias("token_share_ppm"),
            F.when(F.col("n_tokens") == 0, F.lit(None).cast("long"))
            .otherwise(
                F.expr(
                    _safe_ppm("total", "(n_sources * n_tokens)", "div")
                ).cast("long")
            )
            .alias("uniform_weight_ppm"),
        )
    )


# --------------------------------------------------------------------------
# ⊕ training-pipeline op (round 6): per-document LM familiarity — the
# CCNet-style "score every document under a corpus language model" quality
# filter, in exact arithmetic.  Each doc's bigram occurrences join the
# corpus bigram table (the one bigram_lm_counts builds, same >= 5 pruning);
# the score aggregates are exact BIGINTs (occurrence-weighted corpus
# counts + OOV occurrences), with one final double division — a
# deterministic stand-in for log-prob/perplexity, which is deliberately
# avoided: ln() is not correctly-rounded-guaranteed across engines, so a
# transcendental score would hash-flake (the repo's parity discipline:
# integer sums, division last).  Low mean familiarity + high OOV rate =
# the gibberish/boilerplate tail a perplexity filter would cut.
# Plan shape: docs-side bigram explode (narrow, fused with the scan) ⋈
# corpus bigram dim — a standard fact-dim equi-join AQE sizes; one
# groupBy(doc_id) to finish.  At 100 TB the LM table is built once and
# reused across curation runs.
@query(
    "doc_lm_familiarity",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
      FROM documents),
    occ AS (
      SELECT doc_id,
             string_split(u.bg, ' ')[1] AS w1,
             string_split(u.bg, ' ')[2] AS w2
      FROM (SELECT doc_id,
                   [t[i] || ' ' || t[i + 1]
                    FOR i IN generate_series(1, len(t) - 1)] AS bgs
            FROM toks WHERE len(t) >= 2) d, unnest(bgs) AS u(bg)),
    lm AS (
      SELECT w1, w2, count(*) AS c_pair FROM occ GROUP BY w1, w2
      HAVING count(*) >= 5)
    SELECT o.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(COALESCE(l.c_pair, 0)) AS BIGINT) AS familiarity_mass,
           CAST(sum(CASE WHEN l.c_pair IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(CAST(sum(COALESCE(l.c_pair, 0)) AS DOUBLE) / count(*)
                AS DOUBLE) AS mean_familiarity
    FROM occ o LEFT JOIN lm l ON l.w1 = o.w1 AND l.w2 = o.w2
    GROUP BY o.doc_id
    """,
)
def doc_lm_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    occ = (
        docs.select("doc_id", _tokens_col().alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> struct(element_at(t, i) as w1, "
                    "element_at(t, i + 1) as w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
        # the bigram explode feeds BOTH the LM aggregation and the fact
        # side of the join (different exchanges — ReuseExchange cannot
        # dedupe them); persist so the scan+explode runs once, same as
        # repeated_span_fraction's shared (doc, span) frame
        .persist()
    )
    lm = (
        occ.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_pair"))
        .filter(F.col("c_pair") >= 5)
    )
    return (
        occ.join(lm, ["w1", "w2"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.coalesce("c_pair", F.lit(0))).alias("familiarity_mass"),
            F.sum(
                F.when(F.col("c_pair").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
            (
                F.sum(F.coalesce("c_pair", F.lit(0))).cast("double")
                / F.count(F.lit(1))
            ).cast("double").alias("mean_familiarity"),
        )
    )


# --------------------------------------------------------------------------
# ⊕ training-pipeline op (round 6): per-document REPEATED-SPAN fraction —
# the cross-document repeated-substring measure behind exact-substring
# deduplication (Lee et al. 2022 "Deduplicating Training Data Makes
# Language Models Better" deduplicates 50-token spans that appear in more
# than one document; the 3-word shingle here is the same structure at test
# scale).  A high shared_ppm marks boilerplate-heavy documents whose spans
# the dedup pass would cut.  Exact arithmetic: span identity is the shared
# 60-bit md5 hash, counts are BIGINTs, the fraction is a ppm integer
# division.
# Plan shape: shingle explode fused with the scan (narrow), distinct on
# (doc_id, span-hash) — longs, not strings, cross the wire — one
# groupBy(span) for document frequency, one hash-join back, one
# groupBy(doc_id) to finish.  Every shuffle key is a 60-bit hash, so the
# shape is scan + 3 well-distributed shuffles at any corpus size; this is
# the identical skeleton a 50-token-span pass uses at 100 TB.
def _spark_spans(df: DataFrame, span_len: int) -> DataFrame:
    """Parameterized L-word span arrays per doc (the 3-word instance is
    bit-identical to ``_spark_shingles``'s shingle column)."""
    if span_len < 2:
        raise ValueError(f"span_len must be >= 2, got {span_len}")
    # Same single-task-scan spread as _spark_shingles (round-15): the
    # span md5s of the repeated-span/winnowing family all evaluate in
    # the narrow stage rooted here.
    from video_etl_spark.operators.skew import spread_small_scan

    df = spread_small_scan(df)
    parts = ", ".join(f"element_at(toks, i + {k})" for k in range(span_len))
    return (
        df.withColumn("toks", _tokens_col())
        .filter(F.size("toks") >= span_len)
        .withColumn(
            "spans",
            F.expr(
                f"transform(sequence(1, size(toks) - {span_len - 1}), "
                f"i -> concat_ws(' ', {parts}))"
            ),
        )
    )


def _duck_span_cte(span_len: int) -> str:
    concat = " || ' ' || ".join(f"toks[i + {k}]" for k in range(span_len))
    return f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents
    ), sh AS (
      SELECT doc_id,
             [{concat}
              FOR i IN generate_series(1, len(toks) - {span_len - 1})]
               AS shingles
      FROM toks WHERE len(toks) >= {span_len}
    )"""


def _span_fraction_oracle(span_len: int, min_df: int) -> str:
    return (
        _duck_span_cte(span_len)
        + f""", spans AS (
      SELECT DISTINCT doc_id,
             {_DUCK_HASH.format(expr="s")} AS h
      FROM sh, unnest(shingles) AS u(s)),
    df AS (
      SELECT h, count(*) AS n_docs_with FROM spans GROUP BY h)
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN d.n_docs_with >= {min_df} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_shared_spans,
           CAST(sum(CASE WHEN d.n_docs_with >= {min_df} THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS shared_ppm
    FROM spans s JOIN df d ON d.h = s.h
    GROUP BY s.doc_id
    """
    )


def repeated_span_fraction_frame(
    docs: DataFrame, span_len: int = 3, min_df: int = 2
) -> DataFrame:
    """Parameterized repeated-span measure (round-7 ask #5): span length
    and the shared-document threshold are arguments — the Lee et al.
    recipe runs ~50-token spans at production scale; the 3-word instance
    stays the attested query.  Plan shape is span-length-independent:
    scan-fused explode, distinct on (doc, hash), one groupBy(span), one
    join back, one groupBy(doc)."""
    h = F.expr(_SPARK_HASH.format(expr="s"))
    # persisted: the document-frequency branch and the join-back both read
    # this frame — without it the shingle+md5 explode/distinct runs twice.
    # explode takes array_distinct input for the InferFiltersFromGenerate
    # defense (see benchmark_decontamination; measured 8.9 s → ~1.2 s at
    # sf0.1 combined).  Rows are (long, long) — tiny relative to the
    # corpus; LRU eviction is safe (recompute is one subtree) and
    # bench/driver clear caches between queries.
    spans = (
        _spark_spans(docs, span_len)
        .select("doc_id", F.explode(F.array_distinct("spans")).alias("s"))
        .select("doc_id", h.alias("h"))
        .distinct()
        .persist()
    )
    df_counts = spans.groupBy("h").agg(
        F.count(F.lit(1)).alias("n_docs_with")
    )
    shared = F.sum(
        F.when(F.col("n_docs_with") >= min_df, 1).otherwise(0)
    )
    return (
        spans.join(df_counts, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            shared.alias("n_shared_spans"),
            F.expr(
                f"cast(sum(case when n_docs_with >= {min_df} then 1 else 0 "
                "end) * 1000000 div count(1) as bigint)"
            ).alias("shared_ppm"),
        )
    )


@query("repeated_span_fraction", oracle=_span_fraction_oracle(3, 2))
def repeated_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return repeated_span_fraction_frame(docs, span_len=3, min_df=2)


# --------------------------------------------------------------------------
# ⊕ training-pipeline op (round 6): per-source QUALITY PERCENTILE GATE —
# the "keep the top quartile of each domain" selection step of a curation
# pipeline (per-domain, not global, so a verbose domain cannot crowd out a
# terse one).  The quality score is the type-token ratio in ppm — exact
# integer arithmetic (distinct-token count vs token count), a standard
# lexical-diversity proxy with none of the float-parity risk of entropy
# scores.  Rank arithmetic is pure integers from row_number/count, so both
# engines agree bit for bit, including ties (broken by doc_id).
# Plan shape: one narrow projection computing the score from the scan (the
# distinct-token count is an array expression, no shuffle), then a single
# window shuffle on source.  At 100 TB: one shuffle partitioned by domain;
# skewed mega-domains are exactly the AQE skew-split case the repo tests.
@query(
    "quality_percentile_gate",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             CAST(len(list_distinct({_DUCK_TOKENS})) * 1000000
                  // len({_DUCK_TOKENS}) AS BIGINT) AS ttr_ppm
      FROM documents),
    ranked AS (
      SELECT doc_id, source, ttr_ppm,
             row_number() OVER (PARTITION BY source
                                ORDER BY ttr_ppm DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY source) AS n
      FROM scored)
    SELECT doc_id, source, ttr_ppm,
           CAST(CASE WHEN n = 1 THEN 0
                     ELSE (rn - 1) * 1000000 // (n - 1) END
                AS BIGINT) AS rank_ppm
    FROM ranked WHERE rn * 4 <= n
    """,
)
def quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.expr(
            f"cast(size(array_distinct({_SPARK_TOKENS})) * 1000000 "
            f"div size({_SPARK_TOKENS}) as bigint)"
        ).alias("ttr_ppm"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("ttr_ppm").desc(), F.col("doc_id")
    )
    wn = Window.partitionBy("source")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .filter(F.col("rn") * 4 <= F.col("n"))
        .select(
            "doc_id",
            "source",
            "ttr_ppm",
            F.expr(
                "cast(case when n = 1 then 0 "
                "else (rn - 1) * 1000000 div (n - 1) end as bigint)"
            ).alias("rank_ppm"),
        )
    )


# --------------------------------------------------------------------------
# ⊕ training-pipeline op (round 6): CROSS-SOURCE CONTAMINATION matrix —
# for every pair of domains, how many distinct 3-word spans they share.
# This is the corpus-governance twin of benchmark_decontamination: instead
# of bench-vs-corpus it measures domain-vs-domain content bleed (mirror
# sites, syndicated text, scraped duplicates across crawls), which decides
# whether two "sources" are really independent for mixture weighting.
# Plan shape: distinct (source, span-hash) pairs — the corpus collapses to
# one row per (domain, span) BEFORE anything else — then ONE groupBy(span)
# collecting each span's sorted source set; ordered pairs explode from the
# set (≤ domains² per span, domains in the tens — never corpus²) and the
# per-source totals derive from the same grouped frame, so the expensive
# shingle+md5 subtree runs exactly once.  The ppm denominator joins
# per-source distinct-span totals (broadcast-sized: one row per domain).
#: round-16 guard bound for the driver-collected per-source totals —
#: sources are DOMAINS (tens at any corpus size); a per-URL source column
#: must be aggregated to domain grain before this query.
_CROSS_SOURCE_MAX_SOURCES = 10_000


@query(
    "cross_source_contamination",
    oracle=_duck_shingle_cte()
    + f""", spans AS (
      SELECT DISTINCT d.source,
             {_DUCK_HASH.format(expr="s")} AS h
      FROM sh JOIN documents d ON d.doc_id = sh.doc_id,
           unnest(sh.shingles) AS u(s)),
    totals AS (
      SELECT source, count(*) AS n_spans FROM spans GROUP BY source)
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_shared_spans,
           CAST(count(*) * 1000000
                // least(ta.n_spans, tb.n_spans) AS BIGINT)
             AS overlap_ppm
    FROM spans a
    JOIN spans b ON b.h = a.h AND a.source < b.source
    JOIN totals ta ON ta.source = a.source
    JOIN totals tb ON tb.source = b.source
    GROUP BY a.source, b.source, ta.n_spans, tb.n_spans
    """,
)
def cross_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOTE: BUILDING this frame runs an action (the bounded per-source
    # totals collect below populates `by_span`), so plan capture /
    # explain on the returned frame executes the shingle pipeline — the
    # same eager-at-build convention as the localCheckpoint-based
    # builders (corpus_components, the hash-family rep structures).
    #
    # One pass instead of a span self-join: group each span's DISTINCT
    # source set once (one shuffle on the span hash), then explode the
    # bounded source-pair fan-out (≤ domains² per span, domains in the
    # tens) and the per-source totals from the SAME grouped frame — the
    # original a⋈b self-join recomputed the shingle+md5 subtree on both
    # join sides and shuffled the full span table twice.  explode takes
    # array_distinct input for the InferFiltersFromGenerate defense (see
    # benchmark_decontamination — a bare explode(attr) inlines the
    # O(words²) shingle transform into a per-row Filter; measured 10.5 s
    # → ~1.9 s at sf0.1 combined).  by_span is persisted because the
    # totals branch and the pair branch both read it; it is one compact
    # row per distinct span (LRU eviction is safe — recompute is one
    # aggregation, and bench/driver clear caches between queries).
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(_SPARK_HASH.format(expr="s"))
    spans = (
        _spark_shingles(docs)
        .select("source", F.explode(F.array_distinct("shingles")).alias("s"))
        .select("source", h.alias("h"))
        .distinct()
    )
    by_span = (
        spans.groupBy("h")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
        .persist()
    )
    # Round-15: per-source totals are BOUNDED (one row per source —
    # domains, in the tens at any corpus size), so collect them once —
    # the action also populates by_span — and broadcast a local
    # one-partition frame.  Lazily, this plan had THREE racing consumers
    # of the unpopulated by_span cache (the pair branch plus one
    # broadcast build per ta/tb alias), each re-running the full
    # shingle+md5 pipeline (profiled: 3 × ~0.7 s duplicate stages).
    # Interleaved A/B: sum 15.08 → 12.74 s over 6 reps, hash-identical.
    from video_etl_spark.session import local_frame

    # Round-16 cardinality guard (r15-verdict #6): "one row per source"
    # was a data-shape ASSUMPTION — a high-cardinality source column
    # (e.g. per-URL instead of per-domain) would ship unbounded rows to
    # the driver at corpus scale.  The collect is now bounded: limit
    # n+1 (the limit truncates only the one-row-per-source readout; the
    # groupBy underneath still scans all of by_span, so the cache
    # populate the pair branch relies on is unchanged) and a loud raise
    # past the bound instead of a silent driver OOM.
    totals_rows = (
        by_span.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_spans"))
        .limit(_CROSS_SOURCE_MAX_SOURCES + 1)
        .collect()
    )
    if len(totals_rows) > _CROSS_SOURCE_MAX_SOURCES:
        raise RuntimeError(
            "cross_source_contamination: more than "
            f"{_CROSS_SOURCE_MAX_SOURCES} distinct sources — the "
            "driver-collected totals (and the domains^2 pair fan-out) "
            "assume source is a DOMAIN-grain column; aggregate the "
            "source column to domain grain first"
        )
    totals = local_frame(
        spark, totals_rows, "source string, n_spans bigint"
    )
    pairs = (
        by_span.filter(F.size("ss") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, (x, i) -> "
                    "transform(slice(ss, i + 2, size(ss)), y -> "
                    "struct(x as source_a, y as source_b))))"
                )
            ).alias("p")
        )
        .select("p.source_a", "p.source_b")
    )
    ta = totals.alias("ta")
    tb = totals.alias("tb")
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared_spans"))
        .join(F.broadcast(ta), F.col("ta.source") == F.col("source_a"))
        .join(F.broadcast(tb), F.col("tb.source") == F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            "n_shared_spans",
            F.expr(
                "cast(n_shared_spans * 1000000 "
                "div least(ta.n_spans, tb.n_spans) as bigint)"
            ).alias("overlap_ppm"),
        )
    )


# --------------------------------------------------------------------------
# ⊕ training-pipeline op (round 6): CANONICAL DOC PER DUPLICATE CLUSTER —
# the step that turns the cluster labeling (dedup_connected_clusters) into
# the kept corpus: per near-dup cluster, keep the highest-quality member
# (longest text, ties to lowest doc_id) so a truncated mirror never
# shadows the full original.  Composes the band-candidate → connected-
# components pipeline with llm_ops.dedup.keep_canonical; the oracle
# extends the same recursive-CTE reachability the CC oracle uses, so the
# ENTIRE pipeline — shingles → minhash → bands → CC → quality pick — is
# hash-pinned end to end.
# Plan shape on top of CC: one join of labels back to (doc_id, n_chars)
# and one window shuffle on component.  At 100 TB the labeling is ids
# only; text never moves.
@query(
    "canonical_cluster_docs",
    oracle=_duck_minhash_cte().replace("WITH toks", "WITH RECURSIVE toks")
    + _DUCK_BANDED_CTE
    + _DUCK_REACH_CTE
    + """,
    comp AS (
      SELECT d.doc_id, d.n_chars,
             least(d.doc_id, coalesce(m.mv, d.doc_id)) AS component
      FROM documents d
      LEFT JOIN (SELECT u, min(v) AS mv FROM reach GROUP BY u) m
        ON m.u = d.doc_id),
    ranked AS (
      SELECT doc_id, n_chars, component,
             row_number() OVER (PARTITION BY component
                                ORDER BY n_chars DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY component) AS n
      FROM comp)
    SELECT component,
           doc_id AS canonical_doc_id,
           CAST(n_chars AS BIGINT) AS canonical_chars,
           CAST(n AS BIGINT) AS n_members
    FROM ranked WHERE rn = 1
    """,
)
def canonical_cluster_docs(
    spark: SparkSession, sf_dir: str, components: DataFrame | None = None
) -> DataFrame:
    from video_etl_spark.llm_ops.dedup import keep_canonical

    docs = load_table(spark, sf_dir, "documents")
    comp = _cc_components(spark, sf_dir, components)
    flagged = keep_canonical(
        docs.select("doc_id", "n_chars"), comp, node_col="doc_id"
    )
    wn = Window.partitionBy("component")
    return (
        flagged.withColumn(
            "n_members", F.count(F.lit(1)).over(wn).cast("long")
        )
        .filter("is_canonical")
        .select(
            "component",
            F.col("doc_id").alias("canonical_doc_id"),
            F.col("n_chars").cast("long").alias("canonical_chars"),
            "n_members",
        )
    )


# --------------------------------------------------------------------------
# ⊕ training-pipeline op (round 6): TRAINING SHARD MANIFEST — the terminal
# export step: every document gets a deterministic shard in [0, N) via
# md5-hash mod (llm_ops.export.shard_assignments — no RNG, stable across
# engines and reruns), and the manifest a training job reads to plan
# worker↔shard ownership is one groupBy(shard).  Hash-order sharding is
# uniform sampling, so shard sizes concentrate around corpus/N — the
# manifest is also the balance check.
# Plan shape: assignment is a narrow column expression fused with the scan;
# the manifest is a single well-distributed shuffle on an 8-value key (the
# partial aggregation does almost all the work map-side).  The sibling
# writer (export.write_training_shards) adds exactly one more shuffle on
# (shard, subfile) to bound output file sizes at 100 TB.
_N_SHARDS = 8


@query(
    "training_shard_manifest",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, text,
             {_DUCK_HASH.format(expr="'shard|' || CAST(doc_id AS VARCHAR)")}
               % {_N_SHARDS} AS shard
      FROM documents)
    SELECT CAST(shard AS BIGINT) AS shard,
           count(*) AS n_docs,
           CAST(sum(len({_DUCK_TOKENS_NE})) AS BIGINT) AS n_tokens,
           CAST(sum(length(text)) AS BIGINT) AS n_chars,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id
    FROM s GROUP BY shard
    """,
)
def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from video_etl_spark.llm_ops.export import shard_assignments, shard_manifest

    docs = load_table(spark, sf_dir, "documents")
    sharded = shard_assignments(docs, _N_SHARDS)
    return shard_manifest(sharded)


# --------------------------------------------------------------------------
# ⊕ training-pipeline op (round 6): N-GRAM NOVELTY BY SOURCE — how much
# genuinely new text each domain contributes to the corpus.  Every distinct
# 3-gram is attributed to its FIRST source (min source name — a
# deterministic, engine-independent tiebreak standing in for crawl order);
# a source's novelty is the ppm of its distinct grams that it introduced.
# This is the marginal-value measure behind data-mixing decisions: a mirror
# domain scores ~0 novelty even when huge, and pairs with
# source_mixture_weights (share) and cross_source_contamination (overlap).
# Plan shape: shingle explode fused with the scan, distinct on
# (gram-hash, source) — longs cross the wire — one groupBy(gram) for the
# first-source attribution, one hash-join back, one groupBy(source) to
# finish.  Scan + 3 well-distributed shuffles on 60-bit keys at any corpus
# size; no step is quadratic in sources or grams.
@query(
    "ngram_novelty_by_source",
    oracle=f"""
    WITH toks AS (
      SELECT source, {_DUCK_TOKENS} AS toks FROM documents
    ), sh AS (
      SELECT source,
             [toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
              FOR i IN generate_series(1, len(toks) - 2)] AS shingles
      FROM toks WHERE len(toks) >= 3
    ), grams AS (
      SELECT DISTINCT source, {_DUCK_HASH.format(expr="s")} AS g
      FROM sh, unnest(shingles) AS u(s)),
    first_seen AS (
      SELECT g, min(source) AS first_source FROM grams GROUP BY g)
    SELECT gr.source,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN gr.source = f.first_source THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(sum(CASE WHEN gr.source = f.first_source THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS novelty_ppm
    FROM grams gr JOIN first_seen f ON f.g = gr.g
    GROUP BY gr.source
    """,
)
def ngram_novelty_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(_SPARK_HASH.format(expr="s"))
    grams = (
        _spark_shingles(docs.select("source", "text"))
        .select("source", F.explode(F.array_distinct("shingles")).alias("s"))
        .select("source", h.alias("g"))
        .distinct()
    )
    # one pass: the first-source attribution and the per-source membership
    # explode both come from a single groupBy(gram) — no join back, so the
    # shingle+md5 subtree runs exactly once (same restructure as
    # cross_source_contamination).
    per = (
        grams.groupBy("g")
        .agg(
            F.min("source").alias("first_source"),
            F.collect_set("source").alias("ss"),
        )
        .select(
            "first_source", F.explode("ss").alias("source")
        )
        .select(
            "source",
            F.when(F.col("source") == F.col("first_source"), 1)
            .otherwise(0)
            .alias("novel"),
        )
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("novel").cast("long").alias("n_novel"),
        F.expr(
            "cast(sum(novel) * 1000000 div count(1) as bigint)"
        ).alias("novelty_ppm"),
    )


# --------------------------------------------------------------------------
# U21⊕ (round 6): PER-SOURCE DEDUP RATE — which domains are feeding the
# corpus duplicates.  A document is FLAGGED when it is the later (higher
# doc_id) member of any MinHash band candidate pair — the same
# earliest-sighting-wins convention as incremental_dedup.  Per domain:
# doc count, flagged count, flagged ppm.  This is the governance readout
# that decides which crawl sources get down-weighted or dropped; pairs
# with source_mixture_weights (share) and ngram_novelty_by_source
# (novelty).
# Plan shape: the band-pair join (never corpus²) → distinct flagged ids →
# one hash join back to (doc_id, source) → groupBy(source).  The flagged
# set scales with the number of DUPLICATES in the corpus, not with the
# domain count, so it is deliberately NOT broadcast — at a duplicate-heavy
# 100 TB crawl it can be hundreds of millions of ids; the shuffle join on
# a long key is the safe form (AQE will still broadcast when it proves
# the set small at runtime).
@query(
    "dedup_rate_by_source",
    oracle=_duck_minhash_cte()
    + _DUCK_BANDED_CTE
    + """,
    flagged AS (
      SELECT DISTINCT b.doc_id
      FROM banded a JOIN banded b
        ON a.doc_id < b.doc_id
       AND (a.band0 = b.band0 OR a.band1 = b.band1))
    SELECT d.source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged,
           CAST(sum(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS flagged_ppm
    FROM documents d LEFT JOIN flagged f ON f.doc_id = d.doc_id
    GROUP BY d.source
    """,
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    flagged = (
        minhash_band_pairs(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("is_flagged", F.lit(1))
    )
    return (
        docs.select("doc_id", "source")
        .join(flagged, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("is_flagged", F.lit(0)))
            .cast("long")
            .alias("n_flagged"),
            F.expr(
                "cast(sum(coalesce(is_flagged, 0)) * 1000000 "
                "div count(1) as bigint)"
            ).alias("flagged_ppm"),
        )
    )


# --------------------------------------------------------------------------
# U23⊕ (round 6): N-GRAM CONCENTRATION — what fraction of all span
# occurrences the top-k most frequent 3-grams account for (the corpus-
# level boilerplate/templating indicator: a high top-100 share means the
# crawl is dominated by repeated structure and exact-substring dedup will
# reclaim a lot).  Exact integer arithmetic: occurrence counts are
# BIGINTs, the share is ppm; top-k ties broken by span hash so both
# engines pick the same set.
# Plan shape: span explode fused with the scan, one groupBy(span-hash),
# top-k via one ORDER BY LIMIT on the grouped (already small) frame, and
# the 1-row total folded back as a broadcast scalar.
_CONC_TOP_K = 100


@query(
    "ngram_concentration_topk",
    oracle=_duck_shingle_cte()
    + f""", occ AS (
      SELECT {_DUCK_HASH.format(expr="s")} AS h, count(*) AS n
      FROM sh, unnest(shingles) AS u(s) GROUP BY h),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM occ),
    topk AS (
      SELECT h, n FROM occ ORDER BY n DESC, h LIMIT {_CONC_TOP_K})
    SELECT CAST(count(*) AS BIGINT) AS k,
           CAST(sum(topk.n) AS BIGINT) AS topk_occurrences,
           CAST(max(tot.total) AS BIGINT) AS total_occurrences,
           CAST({_safe_ppm("sum(topk.n)", "max(tot.total)", "//")} AS BIGINT)
             AS concentration_ppm
    FROM topk, tot
    """,
)
def ngram_concentration_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(_SPARK_HASH.format(expr="s"))
    # identity-transform guard (not array_distinct — raw occurrence
    # counts, every span instance counts).  Persisted: the top-k branch
    # and the total branch both read it — without it the corpus-wide
    # span explode + aggregation runs twice.
    occ = (
        _spark_shingles(docs)
        .select(F.explode(F.expr("transform(shingles, x -> x)")).alias("s"))
        .select(h.alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    topk = occ.orderBy(F.col("n").desc(), "h").limit(_CONC_TOP_K)
    tot = occ.agg(F.sum("n").alias("total"))
    return (
        topk.crossJoin(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum("n").cast("long").alias("topk_occurrences"),
            F.max("total").cast("long").alias("total_occurrences"),
            F.expr(
                "cast("
                + _safe_ppm("sum(n)", "max(total)", "div")
                + " as bigint)"
            ).alias("concentration_ppm"),
        )
    )


# --------------------------------------------------------------------------
# U23⊕ (round 6): VOCABULARY GROWTH CURVE (Heaps' law) — how many NEW word
# types each successive slice of the corpus contributes.  Every distinct
# token is attributed to the first 500-doc bucket that contains it (min
# doc_id, the same crawl-order proxy as ngram_novelty_by_source); the
# cumulative sum is the empirical vocabulary-growth curve a tokenizer
# budget is planned against (Heaps: V(n) ~ K·n^β — a corpus whose curve
# flattens early is saturated; one still rising rewards more crawling).
# Plan shape: explode distinct (token, doc) — one shuffle on token for the
# min-bucket attribution, one tiny groupBy(bucket), one 70-row window for
# the cumulative sum.  Scan + 2 bounded shuffles at any corpus size.
_VOCAB_BUCKET_DOCS = 500


@query(
    "vocab_growth_curve",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct({_DUCK_TOKENS})) AS token
      FROM documents),
    first_seen AS (
      SELECT token, min(doc_id) // {_VOCAB_BUCKET_DOCS} AS bucket
      FROM tok GROUP BY token),
    per_bucket AS (
      SELECT bucket, count(*) AS n_new_types
      FROM first_seen GROUP BY bucket)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(n_new_types AS BIGINT) AS n_new_types,
           CAST(sum(n_new_types) OVER (ORDER BY bucket) AS BIGINT)
             AS vocab_size
    FROM per_bucket
    """,
)
def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(_tokens_col())).alias("token")
    )
    first_seen = tok.groupBy("token").agg(
        F.expr(f"min(doc_id) div {_VOCAB_BUCKET_DOCS}").alias("bucket")
    )
    per_bucket = first_seen.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_new_types")
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_bucket.select(
        "bucket",
        "n_new_types",
        F.sum("n_new_types").over(w).cast("long").alias("vocab_size"),
    )


# --------------------------------------------------------------------------
# U21⊕ (round 6): EXACT REPEATED-SPAN REMOVAL — the transform that REWRITES
# the corpus, not just measures it (Lee et al. 2022's exact substring
# deduplication at span grain): every token covered by a 3-word span that
# occurs in ≥ _SPAN_DF_K distinct documents is dropped; the cleaned text
# is what a dedup pass would actually train on.  Pairs with
# repeated_span_fraction (the measure) the way canonical_cluster_docs
# pairs with dedup_connected_clusters.
# Cleaned text is rebuilt from the canonical token stream (lowercased,
# whitespace-normalized) — the transform operates on the token sequence,
# as the reference algorithm does on the token-id sequence.
# Plan shape: positions explode narrowly off the scan; one groupBy(span)
# for document frequency, one join of hot spans back to positions (hits
# only), one collect_set per doc; the rewrite itself is a higher-order
# filter — pure JVM expression, no Python.  Hot-span starts per doc are
# bounded by doc length, so state never exceeds the document itself.
_SPAN_DF_K = 3


def _remove_spans_oracle(span_len: int, df_k: int) -> str:
    concat = " || ' ' || ".join(f"toks[i + {k}]" for k in range(span_len))
    end = span_len - 1
    return f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents),
    sp AS (
      SELECT doc_id,
             unnest(generate_series(1, len(toks) - {end})) AS p,
             unnest([{_DUCK_HASH.format(expr=concat)}
              FOR i IN generate_series(1, len(toks) - {end})]) AS h
      FROM toks WHERE len(toks) >= {span_len}),
    hot AS (
      SELECT h FROM (
        SELECT h, count(DISTINCT doc_id) AS nd FROM sp GROUP BY h)
      WHERE nd >= {df_k}),
    starts AS (
      SELECT sp.doc_id, list(DISTINCT sp.p) AS ps
      FROM sp JOIN hot USING (h) GROUP BY sp.doc_id),
    kept AS (
      SELECT t.doc_id, t.toks,
             [t.toks[i] FOR i IN generate_series(1, len(t.toks))
              IF len(list_filter(coalesce(s.ps, CAST([] AS BIGINT[])),
                                 p -> p <= i AND i <= p + {end})) = 0]
               AS keep
      FROM toks t LEFT JOIN starts s ON s.doc_id = t.doc_id)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(toks) - len(keep) AS BIGINT) AS n_removed,
           -- coalesce: DuckDB's array_to_string yields NULL for a fully
           -- removed doc's empty list; Spark's concat_ws yields ''
           coalesce(array_to_string(keep, ' '), '') AS cleaned_text
    FROM kept
    """


def remove_repeated_spans_frame(
    docs: DataFrame, span_len: int = 3, df_k: int = _SPAN_DF_K
) -> DataFrame:
    """Parameterized exact repeated-span REMOVAL (round-7 ask #5): every
    token covered by an L-token span occurring in ≥ ``df_k`` distinct
    documents is dropped.  The Lee et al. production recipe uses ~50-token
    spans; the 3-word × DF≥3 instance stays the attested headline query.
    Plan shape is span-length-independent (see the query docstring)."""
    h = F.expr(_SPARK_HASH.format(expr="s"))
    sh = _spark_spans(docs, span_len)
    end = span_len - 1
    # positions are 1-based to match the oracle's generate_series.  The
    # identity transform around the generator input is the positional
    # variant of the InferFiltersFromGenerate defense (array_distinct
    # would reorder/drop positions): a bare posexplode(attr) inlines the
    # O(words²) shingle transform into a per-row Filter — measured 9.7 s
    # → 0.65 s at sf0.1 for this subtree.  Persisted: the hot-span
    # aggregation and the starts join both read it.
    sp = (
        sh.select(
            "doc_id",
            F.posexplode(F.expr("transform(spans, x -> x)")).alias(
                "p0", "s"
            ),
        )
        .select(
            "doc_id", (F.col("p0") + 1).cast("long").alias("p"), h.alias("h")
        )
        .persist()
    )
    hot = (
        sp.select("doc_id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= df_k)
        .select("h")
    )
    starts = (
        sp.join(hot, "h")
        .groupBy("doc_id")
        .agg(F.collect_set("p").alias("ps"))
    )
    # Round-15: spread the REBUILD side too — the final keep-filter
    # (exists() per token + concat_ws over every document) ran as one
    # 0.57 s single task on the raw single-split scan (profiled at
    # sf0.1), while everything upstream was already 32-way.  One
    # consumer, no cache, so no racing-duplicate risk.
    from video_etl_spark.operators.skew import spread_small_scan

    toks = spread_small_scan(docs).select("doc_id", _tokens_col().alias("toks"))
    kept = (
        toks.join(starts, "doc_id", "left")
        .withColumn(
            "ps", F.coalesce("ps", F.expr("cast(array() as array<bigint>)"))
        )
        .withColumn(
            "keep",
            F.expr(
                "filter(toks, (t, i0) -> not exists(ps, "
                f"p -> p <= i0 + 1 and i0 + 1 <= p + {end}))"
            ),
        )
    )
    return kept.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        (F.size("toks") - F.size("keep")).cast("long").alias("n_removed"),
        F.concat_ws(" ", "keep").alias("cleaned_text"),
    )


@query("remove_repeated_spans", oracle=_remove_spans_oracle(3, _SPAN_DF_K))
def remove_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return remove_repeated_spans_frame(docs, span_len=3, df_k=_SPAN_DF_K)


# --------------------------------------------------------------------------
# U21⊕ (round 7): the LONGER-SPAN instance of the parameterized family —
# 10-token spans shared by ≥ 2 documents, the shape of the Lee et al.
# ~50-token production recipe at testdata document lengths (docs are
# 10-90 words, so 50-token spans would barely exist at gate scale; 10
# exercises the same multi-token overlap-window arithmetic).
@query("remove_repeated_spans_10w", oracle=_remove_spans_oracle(10, 2))
def remove_repeated_spans_10w(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return remove_repeated_spans_frame(docs, span_len=10, df_k=2)


# --------------------------------------------------------------------------
# U21⊕ (round 6): DUPLICATE-CLUSTER SIZE HISTOGRAM — the corpus-health
# readout of the dedup pipeline: how many clusters of each size exist and
# how many documents they hold.  Size-1 rows are the unique docs; the tail
# is the duplication inflation a dedup pass will reclaim (sum over sz>=2 of
# (sz-1)*n_clusters docs).  Runs the SAME minhash→band→CC pipeline as
# dedup_connected_clusters, so the recursive-CTE oracle pins the whole
# chain end to end a second way (aggregate view vs row view).
# Plan shape: CC output → groupBy(component) count → groupBy(size) count —
# two tiny shuffles after the CC rounds; keys are longs.
@query(
    "dup_cluster_size_histogram",
    oracle=_duck_minhash_cte().replace("WITH toks", "WITH RECURSIVE toks")
    + _DUCK_BANDED_CTE
    + _DUCK_REACH_CTE
    + """,
    comp AS (
      SELECT d.doc_id,
             least(d.doc_id, coalesce(m.mv, d.doc_id)) AS component
      FROM documents d
      LEFT JOIN (SELECT u, min(v) AS mv FROM reach GROUP BY u) m
        ON m.u = d.doc_id),
    sizes AS (
      SELECT component, count(*) AS sz FROM comp GROUP BY component)
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           count(*) AS n_clusters,
           CAST(sz * count(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY sz
    """,
)
def dup_cluster_size_histogram(
    spark: SparkSession, sf_dir: str, components: DataFrame | None = None
) -> DataFrame:
    comp = _cc_components(spark, sf_dir, components)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return sizes.groupBy("sz").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("sz") * F.count(F.lit(1))).cast("long").alias("n_docs"),
    ).select(
        F.col("sz").cast("long").alias("cluster_size"),
        "n_clusters",
        "n_docs",
    )


# --------------------------------------------------------------------------
# ⊕ training-pipeline op (round 6): MIXTURE RESAMPLE — the APPLY half of
# source_mixture_weights: deterministically downsample every domain to the
# smallest domain's token budget so the surviving corpus is (approximately)
# the uniform mixture.  keep_ppm = floor(min_tokens * 1e6 / source_tokens);
# a document survives iff its salted md5 hash mod 1e6 falls below its
# domain's keep rate — no RNG state, any engine/worker/rerun selects the
# same documents (the reproducibility property hash-based dataset_split
# establishes, applied to mixture rebalancing).
# Plan shape: one groupBy(source) pass builds the (tiny) rate table, the
# 1-row floor folds in as a broadcast scalar, and the selection pass is a
# broadcast dim join + scan-fused filter — two scans total, each
# partition-parallel; nothing driver-side.  At 100 TB the rate table is
# computed once per mixture revision and reused across runs.
@query(
    "mixture_resample",
    oracle=f"""
    WITH t AS (
      SELECT source, doc_id, len({_DUCK_TOKENS_NE}) AS n_tok FROM documents),
    s AS (
      SELECT source, CAST(sum(n_tok) AS BIGINT) AS n_tokens
      FROM t GROUP BY source),
    f AS (SELECT min(n_tokens) AS floor_tokens FROM s),
    r AS (
      SELECT source, n_tokens,
             CAST({_safe_ppm("floor_tokens", "n_tokens", "//")} AS BIGINT)
               AS keep_ppm
      FROM s, f),
    kept AS (
      SELECT t.source,
             count(*) AS n_docs_kept,
             CAST(sum(t.n_tok) AS BIGINT) AS n_tokens_kept
      FROM t JOIN r ON t.source = r.source
      WHERE {_DUCK_HASH.format(expr="'resample|' || CAST(t.doc_id AS VARCHAR)")}
              % 1000000 < r.keep_ppm
      GROUP BY t.source)
    SELECT r.source, r.n_tokens, r.keep_ppm,
           CAST(COALESCE(k.n_docs_kept, 0) AS BIGINT) AS n_docs_kept,
           CAST(COALESCE(k.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept
    FROM r LEFT JOIN kept k ON r.source = k.source
    """,
)
def mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source", "doc_id",
        F.size(_nonempty_tokens_col()).cast("long").alias("n_tok"),
    )
    per_source = t.groupBy("source").agg(F.sum("n_tok").alias("n_tokens"))
    floor_tokens = per_source.agg(F.min("n_tokens").alias("floor_tokens"))
    rates = (
        per_source.crossJoin(F.broadcast(floor_tokens))
        .select(
            "source",
            "n_tokens",
            F.expr(_safe_ppm("floor_tokens", "n_tokens", "div"))
            .cast("long")
            .alias("keep_ppm"),
        )
    )
    h = F.expr(
        _SPARK_HASH.format(expr="concat('resample|', cast(doc_id as string))")
    )
    kept = (
        t.join(F.broadcast(rates.select("source", "keep_ppm")), "source")
        .filter((h % 1_000_000) < F.col("keep_ppm"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_tok").alias("n_tokens_kept"),
        )
    )
    return rates.join(F.broadcast(kept), "source", "left").select(
        "source",
        "n_tokens",
        "keep_ppm",
        F.coalesce("n_docs_kept", F.lit(0)).cast("long").alias("n_docs_kept"),
        F.coalesce("n_tokens_kept", F.lit(0)).cast("long").alias("n_tokens_kept"),
    )


# --------------------------------------------------------------------------
# ⊕ training-pipeline op (round 6): CLUSTER-AWARE SPLIT — the leakage-free
# train/valid/test partitioning: near-duplicate documents must land on the
# SAME side of the split, or validation loss is measured on training data's
# mirrors.  dataset_split hashes the doc id; this hashes the near-dup
# CLUSTER id (the CC component from the minhash band graph), so every
# member of a duplicate cluster shares one assignment by construction.
# The oracle extends the recursive-CTE reachability pin, so the whole
# shingle → minhash → band → CC → hash-split chain is verified end to end.
# Plan shape on top of CC: one column expression + one groupBy(split) —
# the labeling is ids only; text never moves.  At 100 TB this replaces
# dataset_split in the curation pipeline at the cost CC already paid.
@query(
    "cluster_aware_split",
    oracle=_duck_minhash_cte().replace("WITH toks", "WITH RECURSIVE toks")
    + _DUCK_BANDED_CTE
    + _DUCK_REACH_CTE
    + """,
    comp AS (
      SELECT d.doc_id,
             least(d.doc_id, coalesce(m.mv, d.doc_id)) AS component
      FROM documents d
      LEFT JOIN (SELECT u, min(v) AS mv FROM reach GROUP BY u) m
        ON m.u = d.doc_id),
    assigned AS (
      SELECT doc_id, component,
             {bucket} % 10 AS bucket
      FROM comp)
    SELECT CASE WHEN bucket < 1 THEN 'test'
                WHEN bucket < 2 THEN 'valid'
                ELSE 'train' END AS split,
           count(*) AS n_docs,
           CAST(count(DISTINCT component) AS BIGINT) AS n_clusters,
           min(doc_id) AS min_doc_id
    FROM assigned GROUP BY 1
    """.format(
        bucket=_DUCK_HASH.format(
            expr="'csplit|' || CAST(component AS VARCHAR)"
        )
    ),
)
def cluster_aware_split(
    spark: SparkSession, sf_dir: str, components: DataFrame | None = None
) -> DataFrame:
    comp = _cc_components(spark, sf_dir, components)
    h = F.expr(
        _SPARK_HASH.format(expr="concat('csplit|', cast(component as string))")
    )
    bucket = h % 10
    split = (
        F.when(bucket < 1, "test").when(bucket < 2, "valid").otherwise("train")
    )
    return (
        comp.select(split.alias("split"), "doc_id", "component")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("component").cast("long").alias("n_clusters"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


# --------------------------------------------------------------------------
# ⊕ training-pipeline op (round 6): QUALITY-WEIGHTED SAMPLE — soft data
# selection: instead of a hard quality gate (quality_percentile_gate), keep
# each document with probability equal to its type-token ratio, so
# repetitive/boilerplate docs are down-weighted smoothly (the "sample
# proportionally to quality score" recipe).  Deterministic: the keep
# decision is salted-hash mod 1e6 < ttr_ppm — integer arithmetic, no RNG,
# identical selection on any engine/worker/rerun.
# Plan shape: TTR is a narrow per-row expression fused with the scan; the
# readout is one groupBy(source).  At 100 TB this is a single scan-bound
# pass, the cheapest possible corpus reweighting.
@query(
    "quality_weighted_sample",
    oracle=f"""
    WITH t AS (
      SELECT source, doc_id,
             len(list_filter({_DUCK_TOKENS}, x -> x != '')) AS n_tok,
             len(list_distinct(list_filter({_DUCK_TOKENS}, x -> x != '')))
               AS n_types
      FROM documents),
    scored AS (
      SELECT source, doc_id, n_tok,
             CASE WHEN n_tok = 0 THEN 0
                  ELSE CAST(n_types * 1000000 // n_tok AS BIGINT)
             END AS ttr_ppm
      FROM t),
    kept AS (
      SELECT *,
             ({_DUCK_HASH.format(expr="'qsample|' || CAST(doc_id AS VARCHAR)")}
               % 1000000 < ttr_ppm) AS keep
      FROM scored)
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT)
             AS kept_tokens,
           CAST(sum(ttr_ppm) // count(*) AS BIGINT) AS mean_ttr_ppm,
           CAST(CASE WHEN sum(CASE WHEN keep THEN 1 ELSE 0 END) = 0 THEN 0
                ELSE sum(CASE WHEN keep THEN ttr_ppm ELSE 0 END)
                     // sum(CASE WHEN keep THEN 1 ELSE 0 END)
                END AS BIGINT) AS kept_mean_ttr_ppm
    FROM kept GROUP BY source
    """,
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # empty/whitespace-only text: split('') yields [''] (size 1), which
    # would fabricate a perfect TTR of 1e6 and always keep degenerate docs
    # at max weight — filter empty tokens (mirrors streaming/curation.py
    # _with_ttr) so such docs score 0 and are never sampled.
    toks = F.filter(_tokens_col(), lambda x: x != "")
    scored = docs.select(
        "source",
        "doc_id",
        F.size(toks).cast("long").alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_types"),
    ).withColumn(
        "ttr_ppm",
        F.when(F.col("n_tok") == 0, F.lit(0).cast("long")).otherwise(
            F.expr("(n_types * 1000000) div n_tok").cast("long")
        ),
    )
    h = F.expr(
        _SPARK_HASH.format(expr="concat('qsample|', cast(doc_id as string))")
    )
    kept = scored.withColumn("keep", (h % 1_000_000) < F.col("ttr_ppm"))
    n_kept = F.sum(F.when(F.col("keep"), 1).otherwise(0))
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        n_kept.cast("long").alias("n_kept"),
        F.sum(F.when(F.col("keep"), F.col("n_tok")).otherwise(0))
        .cast("long")
        .alias("kept_tokens"),
        F.expr("sum(ttr_ppm) div count(1)").cast("long").alias("mean_ttr_ppm"),
        F.expr(
            "case when sum(case when keep then 1 else 0 end) = 0 then 0 "
            "else sum(case when keep then ttr_ppm else 0 end) "
            "div sum(case when keep then 1 else 0 end) end"
        )
        .cast("long")
        .alias("kept_mean_ttr_ppm"),
    )


# --------------------------------------------------------------------------
# U23⊕ — BPE TOP MERGES (round 6): the first real step of byte-pair-
# encoding tokenizer TRAINING — count adjacent character pairs inside
# words across the corpus and rank the merge candidates
# (bpe_token_estimate is the inference-side estimate; this is the
# training-side pair-statistics pass every BPE/WordPiece build starts
# with, and at 100 TB it is THE expensive step — one explode + one
# groupBy here, rerun per merge round on re-segmented text).
# Top-20 pairs, ties broken lexicographically, exact integer counts.
@query(
    "bpe_top_merges",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_DUCK_TOKENS}) AS tok FROM documents),
    pairs AS (
      SELECT unnest([substr(tok, i, 2)
                     FOR i IN generate_series(1, len(tok) - 1)]) AS pair
      FROM toks WHERE len(tok) >= 2),
    counted AS (
      SELECT pair, count(*) AS n_occurrences FROM pairs GROUP BY pair)
    SELECT pair, n_occurrences, CAST(rn AS BIGINT) AS rn
    FROM (SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, pair)
                    AS rn
          FROM counted)
    WHERE rn <= 20
    """,
)
def bpe_top_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(_tokens_col()).alias("tok")).filter(
        F.length("tok") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(tok) - 1), "
                "i -> substr(tok, i, 2))"
            )
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    w = Window.orderBy(F.desc("n_occurrences"), "pair")
    return (
        counts.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 20)
        .select("pair", "n_occurrences", "rn")
    )


# --------------------------------------------------------------------------
# U23⊕/A11⊕ — COUNT-MIN SKETCH heavy-hitter estimates (round 6): the
# mergeable-sketch pattern for token frequencies — a depth-4 × width-1024
# counter matrix built with one groupBy per hash row, then point estimates
# as the min over rows of the hashed-bucket counters.  Deterministic md5
# hashing makes the whole sketch — collisions included — bit-identical in
# both engines, so unlike most sketch twins this one carries a FULL
# oracle (the t-digest/HLL twins are rows-only; CMS is exactly
# reproducible).  Output: the top-20 exact tokens with exact count, CMS
# estimate, and the overestimate (always ≥ 0 — CMS never undercounts).
# At 100 TB: counter matrices are tiny (k×w longs), merge by cell-wise
# addition across partitions/days (the partial agg IS the merge), and the
# estimate pass touches only candidates — the standard streaming
# heavy-hitter recipe.
_CMS_W = 1024
_CMS_SALTS = ("c0|", "c1|", "c2|", "c3|")


@query(
    "token_count_cms_estimates",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_DUCK_TOKENS}) AS token FROM documents),
    exact AS (
      SELECT token, count(*) AS exact_count FROM toks GROUP BY token),
    top AS (
      SELECT token, exact_count FROM (
        SELECT *, row_number() OVER (ORDER BY exact_count DESC, token)
                  AS rn
        FROM exact) WHERE rn <= 20),
    counters AS (
      {" UNION ALL ".join(
        f'''SELECT {i} AS row_id,
             {_DUCK_HASH.format(expr=f"'{salt}' || token")} % {_CMS_W}
               AS bucket,
             count(*) AS cnt
      FROM toks GROUP BY 2'''
        for i, salt in enumerate(_CMS_SALTS)
      )}),
    est AS (
      SELECT t.token, t.exact_count, min(c.cnt) AS cms_estimate
      FROM top t
      JOIN counters c
        ON ((c.row_id = 0 AND c.bucket =
             {_DUCK_HASH.format(expr="'c0|' || t.token")} % {_CMS_W})
         OR (c.row_id = 1 AND c.bucket =
             {_DUCK_HASH.format(expr="'c1|' || t.token")} % {_CMS_W})
         OR (c.row_id = 2 AND c.bucket =
             {_DUCK_HASH.format(expr="'c2|' || t.token")} % {_CMS_W})
         OR (c.row_id = 3 AND c.bucket =
             {_DUCK_HASH.format(expr="'c3|' || t.token")} % {_CMS_W}))
      GROUP BY t.token, t.exact_count)
    SELECT token, exact_count,
           CAST(cms_estimate AS BIGINT) AS cms_estimate,
           CAST(cms_estimate - exact_count AS BIGINT) AS overestimate
    FROM est
    """,
)
def token_count_cms_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(_tokens_col()).alias("token")).persist()

    def bucket(salt: str) -> F.Column:
        return (
            F.expr(_SPARK_HASH.format(expr=f"concat('{salt}', token)"))
            % _CMS_W
        )

    counters = None
    for i, salt in enumerate(_CMS_SALTS):
        c = (
            toks.select(bucket(salt).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.lit(i).alias("row_id"), "bucket", "cnt")
        )
        counters = c if counters is None else counters.unionByName(c)

    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_count"))
    w = Window.orderBy(F.desc("exact_count"), "token")
    top = (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .drop("rn")
    )
    probes = None
    for i, salt in enumerate(_CMS_SALTS):
        p = top.select(
            "token",
            "exact_count",
            F.lit(i).alias("row_id"),
            bucket(salt).alias("bucket"),
        )
        probes = p if probes is None else probes.unionByName(p)
    return (
        probes.join(F.broadcast(counters), ["row_id", "bucket"])
        .groupBy("token", "exact_count")
        .agg(F.min("cnt").cast("long").alias("cms_estimate"))
        .select(
            "token",
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count"))
            .cast("long")
            .alias("overestimate"),
        )
    )


# --------------------------------------------------------------------------
# U23⊕ — LANGUAGE-ID CONFUSION MATRIX (round 6): the evaluation readout
# for the lang-ID gate — predicted × labeled language counts plus recall
# ppm per true class.  Every classifier in a curation stack (lang-ID,
# quality, toxicity) needs exactly this audit before its threshold gates
# real data; here it composes the existing heuristic against the labeled
# lang column.  One groupBy over the scan-fused prediction expression.
@query(
    "lang_id_confusion",
    oracle=(
        "WITH s AS (SELECT doc_id, lang, "
        + ", ".join(
            f"len(regexp_extract_all(lower(text), '\\b{pat}\\b')) AS n_{code}"
            for code, pat in _LANG_MARKERS.items()
        )
        + """ FROM documents),
    p AS (
      SELECT lang AS lang_label,
             CASE WHEN n_en = 0 AND n_de = 0 AND n_fr = 0 AND n_es = 0
                    THEN 'und'
                  WHEN n_en >= n_de AND n_en >= n_fr AND n_en >= n_es
                    THEN 'en'
                  WHEN n_de >= n_fr AND n_de >= n_es THEN 'de'
                  WHEN n_fr >= n_es THEN 'fr'
                  ELSE 'es' END AS lang_pred
      FROM s),
    cm AS (
      SELECT lang_label, lang_pred, count(*) AS n_docs
      FROM p GROUP BY lang_label, lang_pred),
    tot AS (
      SELECT lang_label, CAST(sum(n_docs) AS BIGINT) AS n_label
      FROM cm GROUP BY lang_label)
    SELECT cm.lang_label, cm.lang_pred, cm.n_docs, tot.n_label,
           CAST(cm.n_docs * 1000000 // tot.n_label AS BIGINT) AS share_ppm
    FROM cm JOIN tot ON cm.lang_label = tot.lang_label
    """
    ),
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = lang_id_heuristic(spark, sf_dir).select("lang_label", "lang_pred")
    cm = pred.groupBy("lang_label", "lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = cm.groupBy("lang_label").agg(
        F.sum("n_docs").cast("long").alias("n_label")
    )
    return cm.join(F.broadcast(tot), "lang_label").select(
        "lang_label",
        "lang_pred",
        "n_docs",
        "n_label",
        F.expr("(n_docs * 1000000) div n_label").cast("long")
        .alias("share_ppm"),
    )


# --------------------------------------------------------------------------
# ⊕ training-pipeline op (round 6): TEMPERATURE-SCALED MIXTURE WEIGHTS —
# the standard multilingual/multi-domain sampling recipe (w_i ∝ p_i^(1/T),
# here T=2 i.e. sqrt): low-resource domains are up-weighted relative to
# their raw share without the uniform mixture's full flattening.  Closes
# the mixture family: source_mixture_weights (uniform target),
# mixture_resample (apply), this (temperature target).
# Determinism across engines WITHOUT transcendental risk: sqrt is IEEE
# correctly-rounded (unlike ln/exp, which the repo bans from oracles), so
# t_i = floor(sqrt(share_ppm)) is bit-identical everywhere; the final
# normalization is pure BIGINT (t_i * 1e6 div Σt — order-independent).
@query(
    "mixture_temperature_weights",
    oracle=f"""
    WITH t AS (
      SELECT source, len({_DUCK_TOKENS_NE}) AS n_tok FROM documents),
    s AS (
      SELECT source, CAST(sum(n_tok) AS BIGINT) AS n_tokens
      FROM t GROUP BY source),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM s),
    sh AS (
      SELECT source, n_tokens,
             CAST({_safe_ppm("n_tokens", "total", "//")} AS BIGINT)
               AS share_ppm
      FROM s, tot),
    tw AS (
      SELECT source, n_tokens, share_ppm,
             CAST(floor(sqrt(CAST(share_ppm AS DOUBLE))) AS BIGINT) AS t_i
      FROM sh),
    norm AS (SELECT CAST(sum(t_i) AS BIGINT) AS t_sum FROM tw)
    SELECT tw.source, tw.n_tokens, tw.share_ppm,
           CAST(tw.t_i * 1000000 // greatest(1, norm.t_sum) AS BIGINT)
             AS weight_ppm
    FROM tw, norm
    """,
)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_source = (
        docs.select(
        "source", F.size(_nonempty_tokens_col()).cast("long").alias("n_tok")
    )
        .groupBy("source")
        .agg(F.sum("n_tok").alias("n_tokens"))
    )
    return temperature_weights_from_totals(per_source)


def temperature_weights_from_totals(per_source: DataFrame) -> DataFrame:
    """Temperature (T=2, sqrt) mixture weights from a (source, n_tokens)
    totals frame — the derivation half of ``mixture_temperature_weights``,
    reusable over the streaming partial-aggregate totals (round-7 ask #6).
    """
    per_source = per_source.select("source", "n_tokens")
    total = per_source.agg(F.sum("n_tokens").alias("total"))
    sh = per_source.crossJoin(F.broadcast(total)).select(
        "source",
        "n_tokens",
        F.expr(_safe_ppm("n_tokens", "total", "div"))
        .cast("long")
        .alias("share_ppm"),
    )
    tw = sh.withColumn(
        "t_i",
        F.floor(F.sqrt(F.col("share_ppm").cast("double"))).cast("long"),
    )
    norm = tw.agg(F.sum("t_i").alias("t_sum"))
    return tw.crossJoin(F.broadcast(norm)).select(
        "source",
        "n_tokens",
        "share_ppm",
        # greatest(1, ·): a degenerate all-empty corpus gives t_sum = 0,
        # where Spark div returns NULL but DuckDB // errors — weight 0 on
        # both engines instead
        F.expr("(t_i * 1000000) div greatest(1, t_sum)")
        .cast("long")
        .alias("weight_ppm"),
    )


# --------------------------------------------------------------------------
# U21⊕ (round 7): PERCEPTUAL-HASH IMAGE DEDUP — aHash over the frame
# payloads: 8×8 pixel grid, each pixel thresholded against the grid mean
# → 64-bit signature as 4 × 16-bit chunks; near-dup frames are pairs
# within Hamming distance 3, blocked by shared chunks (pigeonhole — the
# same candidate discipline as simhash_near_dup_pairs; never corpus²).
# The "decode" is this repo's sanctioned codec seam: pixels derive from
# salted md5 of the (deterministic fake) payload — pure integer
# arithmetic both engines replay, so the query carries a FULL oracle.
# The oracle is deliberately the ALL-PAIRS formulation: at gate scale it
# also re-proves the pigeonhole recall claim (blocked join == exhaustive
# join for distance ≤ 3), not just value parity.  Since round 8 the gate
# instances run with collide_near_dups payloads (every doc_id % 5 == 0 doc
# shares its doc_id div 10 bucket partner's payload — see
# multimodal.attach_fake_payload), so both phash gates compare NON-EMPTY
# pair sets (round-7 verdict #3: they previously attested 0 vs 0 rows)
# while pair volume stays linear (bucket size is exactly 2 at any sf).
_PHASH_PAYLOAD_SQL = (
    "CASE WHEN doc_id % 5 = 0 "
    "THEN md5('ph|' || CAST(doc_id // 10 AS VARCHAR)) "
    "ELSE md5(text) END"
)


def _phash_oracle(stats: bool = False) -> str:
    px_cols = []
    for idx in range(64):
        j, t = divmod(idx, 16)
        px_cols.append(
            f"CAST(('0x' || substr(hx{j}, {2 * t + 1}, 2)) AS BIGINT)"
            f" AS px{idx}"
        )
    total = " + ".join(f"px{i}" for i in range(64))
    chunk_cols = [
        "("
        + " + ".join(
            f"(CASE WHEN 64 * px{16 * c + t} > tot THEN {1 << t} "
            "ELSE 0 END)"
            for t in range(16)
        )
        + f") AS chunk{c}"
        for c in range(4)
    ]
    hamming = " + ".join(
        f"bit_count(xor(a.chunk{c}, b.chunk{c}))" for c in range(4)
    )
    prefix = f"""
    WITH pay AS (
      SELECT doc_id, {_PHASH_PAYLOAD_SQL} AS payload FROM documents),
    hx AS (
      SELECT doc_id,
             md5('p0|' || payload) AS hx0,
             md5('p1|' || payload) AS hx1,
             md5('p2|' || payload) AS hx2,
             md5('p3|' || payload) AS hx3
      FROM pay),
    px AS (SELECT doc_id, {", ".join(px_cols)} FROM hx),
    pxt AS (SELECT *, {total} AS tot FROM px),
    sig AS (SELECT doc_id, {", ".join(chunk_cols)} FROM pxt)"""
    pairs = f"""
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST({hamming} AS BIGINT) AS hamming
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE {hamming} <= 3"""
    if not stats:
        return prefix + pairs
    # exhaustive doc-grain aggregate of the pair form — re-proves the
    # Spark side's analytic rep-grain shortcut on every attestation
    return (
        prefix
        + f""",
    pairs AS ({pairs}),
    adj AS (
      SELECT doc_a AS doc_id, hamming FROM pairs
      UNION ALL
      SELECT doc_b AS doc_id, hamming FROM pairs)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_partners,
           CAST(min(hamming) AS BIGINT) AS min_hamming
    FROM adj GROUP BY doc_id
    """
    )


@query("phash_near_dup_pairs", oracle=_phash_oracle())
def phash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from video_etl_spark.llm_ops.multimodal import (
        attach_fake_payload,
        phash_pairs,
        phash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    frames = attach_fake_payload(docs, collide_near_dups=True)
    return phash_pairs(phash_signatures(frames))


@query("phash_overlap_stats", oracle=_phash_oracle(stats=True))
def phash_overlap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-grain twin of ``phash_near_dup_pairs`` (round 9): per-frame
    (n_partners, min_hamming), ≤ 1 row per frame at any dup density —
    the same analytic rep-grain shortcut as ``simhash_overlap_stats``,
    re-proved by the exhaustive all-pairs DuckDB aggregate.  Eager:
    sweeping callers must not leave pinned frames (r9 verdict #7)."""
    return phash_overlap_stats_build(spark, sf_dir, eager=True)


def phash_overlap_stats_build(
    spark: SparkSession, sf_dir: str, eager: bool = False
) -> DataFrame:
    """The ONE construction the registry entry (eager=True) and the
    plan-golden test (eager=False) share — see
    ``advanced.simhash_overlap_stats_build``."""
    from video_etl_spark.llm_ops.multimodal import (
        attach_fake_payload,
        phash_overlap_stats as _stats,
        phash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    frames = attach_fake_payload(docs, collide_near_dups=True)
    return _stats(phash_signatures(frames), eager=eager)


# --------------------------------------------------------------------------
# ⊕ training-pipeline op (round 7): SEQUENCE-PACKING MANIFEST — the
# export step between curation and the trainer: documents concatenate in
# a deterministic per-shard order and cut into fixed-length training
# sequences (concat-then-chunk, the standard pretraining layout).  The
# manifest a loader plans from: sequences per shard, boundary-straddling
# documents (the attention-masking cases), tail padding waste.
# Plan shape: ONE shuffle on the shard key for the per-shard ordered
# window (never a global sort — shards are independent token streams,
# embarrassingly parallel at 100 TB), then one groupBy(shard).
_PACK_SEQ_LEN = 256
_PACK_SHARDS = 4


@query(
    "sequence_packing_manifest",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len({_DUCK_TOKENS_NE}) AS BIGINT) AS n_tok,
             {_DUCK_HASH.format(expr="'pack|' || CAST(doc_id AS VARCHAR)")}
               % {_PACK_SHARDS} AS shard
      FROM documents),
    c AS (
      SELECT shard, n_tok,
             sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id)
               AS cum_after
      FROM t),
    e AS (
      SELECT shard, n_tok, cum_after,
             (cum_after - n_tok) // {_PACK_SEQ_LEN} AS start_seq,
             greatest((cum_after - n_tok) // {_PACK_SEQ_LEN},
                      (cum_after - 1) // {_PACK_SEQ_LEN}) AS end_seq
      FROM c)
    SELECT CAST(shard AS BIGINT) AS shard,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST((max(cum_after) + {_PACK_SEQ_LEN - 1}) // {_PACK_SEQ_LEN}
                AS BIGINT) AS n_seqs,
           CAST(sum(CASE WHEN start_seq <> end_seq THEN 1 ELSE 0 END)
                AS BIGINT) AS n_straddle_docs,
           CAST(((max(cum_after) + {_PACK_SEQ_LEN - 1})
                 // {_PACK_SEQ_LEN}) * {_PACK_SEQ_LEN} - max(cum_after)
                AS BIGINT) AS tail_padding
    FROM e GROUP BY shard
    """,
)
def sequence_packing_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from video_etl_spark.llm_ops.export import (
        pack_sequences,
        packing_manifest,
    )

    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(
        docs, seq_len=_PACK_SEQ_LEN, n_shards=_PACK_SHARDS
    )
    return packing_manifest(packed, seq_len=_PACK_SEQ_LEN).select(
        F.col("shard").cast("long").alias("shard"),
        "n_docs",
        "n_tokens",
        "n_seqs",
        "n_straddle_docs",
        "tail_padding",
    )


# --------------------------------------------------------------------------
# U21⊕ (round 7 cont.): INCREMENTAL perceptual-hash dedup — the new-batch
# vs corpus form of phash_near_dup_pairs (asymmetric chunk join, no
# old×old pair), completing the incremental dedup family across all
# modalities: band (text), simhash (text), embedding (vectors), phash
# (frames).  Same deterministic batch split as incremental_band_dedup
# (doc_id % 10 = 0 plays the new crawl).  Oracle: all-pairs asymmetric
# join — also re-proves blocked recall at gate scale.
def _phash_incremental_oracle() -> str:
    base = _phash_oracle()
    # reuse the signature CTEs; replace the final all-pairs SELECT with
    # the asymmetric aggregate
    head = base[: base.index("SELECT a.doc_id")]
    hamming = " + ".join(
        f"bit_count(xor(a.chunk{c}, b.chunk{c}))" for c in range(4)
    )
    return (
        head
        + f"""
    SELECT a.doc_id AS new_doc,
           min(b.doc_id) AS dup_of,
           count(*) AS n_candidates,
           CAST(min({hamming}) AS BIGINT) AS min_hamming
    FROM sig a JOIN sig b
      ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
    WHERE {hamming} <= 3
    GROUP BY a.doc_id
    """
    )


@query("incremental_phash_dedup", oracle=_phash_incremental_oracle())
def incremental_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from video_etl_spark.llm_ops.multimodal import (
        attach_fake_payload,
        incremental_phash_dedup as _inc,
        phash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    sigs = phash_signatures(
        attach_fake_payload(docs, collide_near_dups=True)
    ).persist()
    new = sigs.filter(F.col("doc_id") % 10 == 0)
    hist = sigs.filter(F.col("doc_id") % 10 != 0)
    return _inc(new, hist)


# --------------------------------------------------------------------------
# U23⊕ (round 7 cont.): ITERATIVE BPE TRAINING, oracle-pinned — 3 merge
# rounds of llm_ops.bpe.bpe_train verified against a DuckDB unrolled-CTE
# twin.  The oracle's trick: after each merge, the merged symbol is
# REPLACED BY A SINGLE RESERVED MARKER CHARACTER (chr(1)/chr(2)/chr(3)),
# so every symbol stays one character and (a) adjacent-pair extraction
# remains substr arithmetic, (b) the greedy left-to-right non-overlapping
# merge is exactly SQL replace() — while tie-breaks and the output rows
# rank/report the EXPANDED real strings, matching the Spark trainer's
# (count DESC, left, right) ordering bit for bit.  Assumes the corpus
# contains no chr(1)-chr(3) bytes, and no adjacent chr(30)chr(31) pair
# (the early-stop sentinel in bsafe — see _bpe_chain_ctes): the whole
# reserved alphabet is control chars that crawl scrubbing drops long
# before tokenizer training.
_BPE_TRAIN_ROUNDS = 3


def _bpe_expand(col: str, rnd: int) -> str:
    """SQL expr expanding a single-char symbol of round ``rnd`` (1-based)
    to its real string: markers chr(1..rnd-1) expand recursively."""
    if rnd == 1:
        return col
    whens = "".join(
        f"WHEN {col} = chr({i}) THEN {_bpe_merged_sql(i)} "
        for i in range(1, rnd)
    )
    return f"(CASE {whens}ELSE {col} END)"


def _bpe_merged_sql(rnd: int) -> str:
    """Expanded merged string of round ``rnd`` as SQL over b{rnd}."""
    return (
        f"({_bpe_expand(f'b{rnd}.l', rnd)} || "
        f"{_bpe_expand(f'b{rnd}.r', rnd)})"
    )


def _bpe_chain_ctes(k: int) -> str:
    """The shared k-round marker-unroll CTE prefix: w0 (word-frequency
    table, carrying the ORIGINAL word through every round) → p{j} (pair
    counts) → b{j} (best pair, ranked on expanded strings) → w{j}
    (greedy merge as replace-with-marker).

    ``bsafe{j}`` guards EARLY STOP: when the corpus exhausts its pairs
    before round j, ``b{j}`` is an empty LIMIT-1 CTE and a bare cross
    join would annihilate ``w{j}`` and every downstream state — so the
    merge step falls back to a sentinel pair (chr(30), chr(31)) whose
    replace is a no-op, making w{j} == w{j-1}, exactly the Spark
    trainer's early-stop semantics.  The TRAIN query's output rows still
    read the real (possibly empty) b{j}, so exhausted rounds emit no
    merge row on either side."""
    ctes = [
        f"""
    WITH w0 AS (
      SELECT word AS orig, word, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT unnest({_DUCK_TOKENS}) AS word FROM documents)
      WHERE len(word) >= 1 GROUP BY word)"""
    ]
    for j in range(1, k + 1):
        prev = f"w{j - 1}"
        b_joins = ", ".join(f"b{i}" for i in range(1, j))
        b_from = (", " + b_joins) if b_joins else ""
        ctes.append(
            f"""
    p{j} AS (
      SELECT substr(word, i, 1) AS l, substr(word, i + 1, 1) AS r,
             CAST(sum(n) AS BIGINT) AS cnt
      FROM {prev}, unnest(generate_series(1, len(word) - 1)) AS t(i)
      WHERE len(word) >= 2
      GROUP BY 1, 2),
    b{j} AS (
      SELECT p{j}.l AS l, p{j}.r AS r, p{j}.cnt AS cnt
      FROM p{j}{b_from}
      ORDER BY p{j}.cnt DESC, {_bpe_expand(f'p{j}.l', j)},
               {_bpe_expand(f'p{j}.r', j)}
      LIMIT 1),
    bsafe{j} AS (
      SELECT l, r FROM b{j}
      UNION ALL
      SELECT chr(30), chr(31)
      WHERE NOT EXISTS (SELECT 1 FROM b{j})),
    w{j} AS (
      SELECT {prev}.orig,
             replace({prev}.word, bsafe{j}.l || bsafe{j}.r, chr({j}))
               AS word,
             {prev}.n
      FROM {prev}, bsafe{j})"""
        )
    return ",".join(ctes)


def _bpe_train_oracle(k: int) -> str:
    selects = []
    for j in range(1, k + 1):
        b_all = ", ".join(f"b{i}" for i in range(1, j + 1))
        selects.append(
            f"""
    SELECT CAST({j - 1} AS BIGINT) AS rnd,
           {_bpe_expand(f'b{j}.l', j)} AS left_sym,
           {_bpe_expand(f'b{j}.r', j)} AS right_sym,
           {_bpe_merged_sql(j)} AS merged,
           b{j}.cnt AS n_occurrences
    FROM {b_all}"""
        )
    return _bpe_chain_ctes(k) + " UNION ALL ".join(selects)


@query("bpe_train_merges", oracle=_bpe_train_oracle(_BPE_TRAIN_ROUNDS))
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from video_etl_spark.llm_ops.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges, _ = bpe_train(docs, _BPE_TRAIN_ROUNDS)
    from video_etl_spark.session import local_frame

    return local_frame(
        spark,
        [
            (
                m["rnd"],
                m["left"],
                m["right"],
                m["merged"],
                m["n_occurrences"],
            )
            for m in merges
        ],
        "rnd long, left_sym string, right_sym string, merged string, "
        "n_occurrences long",
    )


# --------------------------------------------------------------------------
# U23⊕ (round 7 cont.): BPE FERTILITY AFTER TRAINING — the APPLY side of
# the trainer: segment every corpus token with the k trained merges and
# report per-source compression (symbols-per-token fertility and chars
# saved).  This is the readout that decides whether a tokenizer build is
# good enough to ship — fertility directly multiplies training cost.
# Plan shape: the segmentation lives on the VOCAB-grain word table
# (bpe_train's output — at 100 TB it broadcasts); the corpus pass is one
# explode + one hash join + one groupBy(source).  Oracle: the same
# marker-unroll chain, final word strings' char counts ARE the symbol
# counts (each symbol is one char by construction).
@query(
    "bpe_fertility_after_merges",
    oracle=_bpe_chain_ctes(_BPE_TRAIN_ROUNDS)
    + f""",
    seg AS (
      SELECT orig, CAST(len(word) AS BIGINT) AS n_syms,
             CAST(len(orig) AS BIGINT) AS n_chars
      FROM w{_BPE_TRAIN_ROUNDS}),
    toks AS (
      SELECT source, unnest({_DUCK_TOKENS}) AS word FROM documents)
    SELECT t.source,
           count(*) AS n_tokens,
           CAST(sum(s.n_syms) AS BIGINT) AS n_symbols,
           CAST(sum(s.n_chars) AS BIGINT) AS n_chars,
           CAST({_safe_ppm("sum(s.n_syms)", "count(*)", "//")} AS BIGINT)
             AS fertility_ppm,
           CAST({_safe_ppm("(sum(s.n_chars) - sum(s.n_syms))",
                           "sum(s.n_chars)", "//")} AS BIGINT)
             AS saved_ppm
    FROM toks t JOIN seg s ON t.word = s.orig
    GROUP BY t.source
    """,
)
def bpe_fertility_after_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from video_etl_spark.llm_ops.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    _, words = bpe_train(docs, _BPE_TRAIN_ROUNDS)
    seg = words.select(
        F.col("word"),
        F.size("syms").cast("long").alias("n_syms"),
        F.length("word").cast("long").alias("n_chars_w"),
    )
    toks = docs.select(
        "source", F.explode(_tokens_col()).alias("word")
    ).filter(F.length("word") >= 1)
    return (
        toks.join(seg, "word")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n_syms").alias("n_symbols"),
            F.sum("n_chars_w").alias("n_chars"),
            # overflow-safe: per-source symbol/char sums pass the naive
            # multiply's 9.2e12 wrap point at the 100 TB design scale
            F.expr(_safe_ppm("sum(n_syms)", "count(1)", "div"))
            .cast("long")
            .alias("fertility_ppm"),
            F.expr(
                _safe_ppm(
                    "(sum(n_chars_w) - sum(n_syms))",
                    "sum(n_chars_w)",
                    "div",
                )
            )
            .cast("long")
            .alias("saved_ppm"),
        )
    )


# --------------------------------------------------------------------------
# ⊕ governance readout (round 7 cont.): DOCUMENT-LENGTH PERCENTILES per
# source — the length-distribution dashboard a curation pipeline watches
# per domain (truncation budgets, the short-doc tail a length gate would
# cut, the long-doc tail that dominates packing).  Percentiles run on
# exact integer token counts, so Spark `percentile` == DuckDB
# `quantile_cont` order statistics bit for bit (the
# value_percentiles_by_type convention on BIGINTs — interpolation of
# integers is exact in double).
@query(
    "doc_length_percentiles_by_source",
    oracle=f"""
    WITH t AS (
      SELECT source, CAST(len({_DUCK_TOKENS_NE}) AS BIGINT) AS n_tok
      FROM documents)
    SELECT source,
           count(*) AS n_docs,
           CAST(min(n_tok) AS BIGINT) AS min_tok,
           round(quantile_cont(n_tok, 0.50), 4) AS p50,
           round(quantile_cont(n_tok, 0.90), 4) AS p90,
           round(quantile_cont(n_tok, 0.99), 4) AS p99,
           CAST(max(n_tok) AS BIGINT) AS max_tok,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM t GROUP BY source
    """,
)
def doc_length_percentiles_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source", F.size(_nonempty_tokens_col()).cast("long").alias("n_tok")
    )
    return t.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_tok").alias("min_tok"),
        F.round(F.expr("percentile(n_tok, 0.50D)"), 4).alias("p50"),
        F.round(F.expr("percentile(n_tok, 0.90D)"), 4).alias("p90"),
        F.round(F.expr("percentile(n_tok, 0.99D)"), 4).alias("p99"),
        F.max("n_tok").alias("max_tok"),
        F.sum("n_tok").alias("n_tokens"),
    )


# --------------------------------------------------------------------------
# ⊕ governance readout (round 7 cont.): CORPUS REVISION DIFF — what
# changed between two corpus revisions (rev N vs N+1, stood in by the
# deterministic doc_id-parity split): per source, documents only in A,
# only in B, and — for the doc_ids present in both — whether the TEXT
# changed (content_key inequality; the read_text_corpus identity
# convention).  The change-data-capture readout every incremental
# pipeline (dedup index maintenance, stats partials, shard refresh)
# plans its work from.
# Plan shape: one full-outer join on doc_id + one groupBy(source) —
# id + 60-bit content hash cross the wire, never text.
@query(
    "corpus_revision_diff",
    oracle=f"""
    WITH a AS (
      SELECT doc_id / 2 AS k, source,
             {_DUCK_HASH.format(expr="text")} AS h
      FROM documents WHERE doc_id % 2 = 0),
    b AS (
      SELECT (doc_id - 1) / 2 AS k, source,
             {_DUCK_HASH.format(expr="text")} AS h
      FROM documents WHERE doc_id % 2 = 1)
    SELECT coalesce(a.source, b.source) AS source,
           CAST(sum(CASE WHEN b.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS only_in_a,
           CAST(sum(CASE WHEN a.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS only_in_b,
           CAST(sum(CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL
                         AND a.h = b.h THEN 1 ELSE 0 END) AS BIGINT)
             AS unchanged,
           CAST(sum(CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL
                         AND a.h <> b.h THEN 1 ELSE 0 END) AS BIGINT)
             AS changed
    FROM a FULL OUTER JOIN b ON a.k = b.k AND a.source = b.source
    GROUP BY 1
    """,
)
def corpus_revision_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(_SPARK_HASH.format(expr="text"))
    a = docs.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") / 2).cast("long").alias("k"),
        F.col("source").alias("source_a"),
        h.alias("ha"),
    )
    b = docs.filter(F.col("doc_id") % 2 == 1).select(
        ((F.col("doc_id") - 1) / 2).cast("long").alias("k"),
        F.col("source").alias("source_b"),
        h.alias("hb"),
    )
    j = a.join(
        b,
        (a["k"] == b["k"]) & (a["source_a"] == b["source_b"]),
        "full_outer",
    )
    return j.groupBy(
        F.coalesce("source_a", "source_b").alias("source")
    ).agg(
        F.sum(F.when(F.col("hb").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("only_in_a"),
        F.sum(F.when(F.col("ha").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("only_in_b"),
        F.sum(
            F.when(
                F.col("ha").isNotNull()
                & F.col("hb").isNotNull()
                & (F.col("ha") == F.col("hb")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("unchanged"),
        F.sum(
            F.when(
                F.col("ha").isNotNull()
                & F.col("hb").isNotNull()
                & (F.col("ha") != F.col("hb")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("changed"),
    )


# --------------------------------------------------------------------------
# U23⊕ (round 7 cont.): BIGRAM LM TABLE — the trained artifact the
# doc_lm_familiarity scorer consumes: for every left word seen ≥ 5
# times, the top-3 continuations with exact conditional ppm
# P(w2|w1) = count(w1,w2)/count(w1,·).  Integer arithmetic end to end
# (counts are BIGINTs, the conditional is a ppm floor division), ties on
# count break lexicographically — deterministic on any engine.
# Plan shape: one explode fused with the scan, one groupBy(w1, w2), one
# window over w1 (well-distributed: fan-out bounded by vocabulary) —
# the same three-shuffle skeleton at any corpus size; at 100 TB the
# output is a vocab²-bounded model table a serving join broadcasts.
@query(
    "bigram_lm_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents),
    bg AS (
      SELECT t[i] AS w1, t[i + 1] AS w2
      FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 2),
    c AS (
      SELECT w1, w2, count(*) AS c_pair FROM bg GROUP BY w1, w2),
    l AS (
      SELECT w1, CAST(sum(c_pair) AS BIGINT) AS c_left FROM c GROUP BY w1)
    SELECT w1, w2, c_pair, c_left,
           CAST({_safe_ppm("c_pair", "c_left", "//")} AS BIGINT)
             AS cond_ppm,
           CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT c.w1, c.w2, c.c_pair, l.c_left,
             row_number() OVER (PARTITION BY c.w1
                                ORDER BY c.c_pair DESC, c.w2) AS rn
      FROM c JOIN l ON c.w1 = l.w1
      WHERE l.c_left >= 5)
    WHERE rn <= 3
    """,
)
def bigram_lm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bg = (
        docs.select(_tokens_col().alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), i -> "
                    "struct(element_at(t, i) as w1, "
                    "element_at(t, i + 1) as w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    c = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_pair"))
    l = c.groupBy("w1").agg(F.sum("c_pair").alias("c_left"))
    w = Window.partitionBy("w1").orderBy(F.desc("c_pair"), "w2")
    return (
        c.join(l, "w1")
        .filter(F.col("c_left") >= 5)
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select(
            "w1",
            "w2",
            "c_pair",
            "c_left",
            # overflow-safe: a boilerplate-heavy 100 TB corpus can push a
            # single bigram count past the naive multiply's wrap point
            F.expr(_safe_ppm("c_pair", "c_left", "div"))
            .cast("long")
            .alias("cond_ppm"),
            "rn",
        )
    )


# --------------------------------------------------------------------------
# U21⊕ (round 7 cont.): WINNOWING FINGERPRINTS — the MOSS local
# fingerprinting algorithm (Schleimer et al. 2003), the dedup family's
# guaranteed-detection member: hash every k-gram, slide a w-position
# window, keep each window's MINIMUM hash — any match of length
# ≥ w + k − 1 tokens between two documents is GUARANTEED to share a
# fingerprint (minhash gives probabilistic recall; winnowing gives a
# hard bound).  Pairs sharing ≥ 3 fingerprints are plagiarism/mirror
# candidates.
# Plan shape: position hashes off the scan, ONE bounded ROWS window per
# doc (w consecutive positions — no unbounded frame), distinct, then the
# standard inverted-index equi-join on the fingerprint hash (shuffle on
# 60-bit keys, pair space bounded by shared fingerprints — never
# corpus²).  Same skeleton at 100 TB.
_WINNOW_W = 4   # window positions; guarantee threshold = w + k - 1 = 6
_WINNOW_MIN_SHARED = 3

#: Shared winnowing-fingerprint CTEs (toks → position hashes → window-min
#: fingerprints) — ONE oracle definition for the pair- and count-grain
#: queries.
_WINNOW_FP_CTES = f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents),
    pos AS (
      SELECT doc_id, i AS p,
             {_DUCK_HASH.format(
                 expr="t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]")} AS h,
             len(t) - 2 AS n_pos
      FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
      WHERE len(t) >= 3),
    fp AS (
      SELECT DISTINCT doc_id, wmin AS fingerprint
      FROM (
        SELECT doc_id, p, n_pos,
               min(h) OVER (PARTITION BY doc_id ORDER BY p
                            ROWS BETWEEN CURRENT ROW
                            AND {_WINNOW_W - 1} FOLLOWING) AS wmin
        FROM pos)
      WHERE p <= n_pos - {_WINNOW_W - 1})"""

_WINNOW_PAIR_CTE = f""",
    wpairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS n_shared
      FROM fp a JOIN fp b
        ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING count(*) >= {_WINNOW_MIN_SHARED})"""


def _winnowing_fps(docs: DataFrame, pinned: list | None = None) -> DataFrame:
    """(doc_id, fingerprint) winnowing fingerprints — the Spark twin of
    ``_WINNOW_FP_CTES``, persisted because it feeds both sides of the
    overlap self-join (LRU-evicted like every signature block here,
    unless an eager caller passes ``pinned`` to own the unpersist)."""
    h = F.expr(_SPARK_HASH.format(expr="s"))
    sh = _spark_spans(docs, 3)
    pos = (
        sh.select(
            "doc_id",
            F.size("spans").cast("long").alias("n_pos"),
            F.posexplode(F.expr("transform(spans, x -> x)")).alias(
                "p0", "s"
            ),
        )
        .select(
            "doc_id",
            "n_pos",
            (F.col("p0") + 1).cast("long").alias("p"),
            h.alias("h"),
        )
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.currentRow, _WINNOW_W - 1)
    )
    fp = (
        pos.withColumn("wmin", F.min("h").over(w))
        .filter(F.col("p") <= F.col("n_pos") - (_WINNOW_W - 1))
        .select("doc_id", F.col("wmin").alias("fingerprint"))
        .distinct()
        .persist()
    )
    if pinned is not None:
        pinned.append(fp)
    return fp


def _winnowing_pairs(docs: DataFrame, pinned: list | None = None) -> DataFrame:
    fp = _winnowing_fps(docs, pinned)
    a = fp.select(F.col("doc_id").alias("doc_a"), "fingerprint")
    b = fp.select(F.col("doc_id").alias("doc_b"), "fingerprint")
    return (
        a.join(b, "fingerprint")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _WINNOW_MIN_SHARED)
    )


@query(
    "winnowing_overlap_pairs",
    oracle=_WINNOW_FP_CTES
    + _WINNOW_PAIR_CTE
    + """
    SELECT doc_a, doc_b, n_shared FROM wpairs
    """,
)
def winnowing_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAIR-grain overlap evidence: (doc_a, doc_b, n_shared).

    Output grows with overlap density (PERF.md measured 26× output at
    10× data on a dup-heavy corpus), so at 100 TB this grain is for
    BOUNDED investigations (one domain, one cluster, a sampled slice);
    the corpus-wide default artifact is ``winnowing_overlap_stats``,
    whose output is capped at one row per document."""
    docs = load_table(spark, sf_dir, "documents")
    return _winnowing_pairs(docs)


# --------------------------------------------------------------------------
# U21⊕ (round 8): COUNT-GRAIN winnowing readout — the corpus-scale default
# artifact for overlap monitoring (round-7 verdict #5: the pair-grain
# output's growth is density-driven, so the governance readout must be the
# per-doc aggregate).  Same fingerprint stage, same inverted-index join;
# the pair rows collapse to (doc, partners/max/total) before leaving the
# shuffle, so output is ≤ one row per document at any duplicate density.
@query(
    "winnowing_overlap_stats",
    oracle=_WINNOW_FP_CTES
    + _WINNOW_PAIR_CTE
    + """,
    bidir AS (
      SELECT doc_a AS doc_id, n_shared FROM wpairs
      UNION ALL
      SELECT doc_b AS doc_id, n_shared FROM wpairs)
    SELECT doc_id,
           count(*) AS n_partners,
           CAST(max(n_shared) AS BIGINT) AS max_shared,
           CAST(sum(n_shared) AS BIGINT) AS total_shared
    FROM bidir GROUP BY doc_id
    """,
)
def winnowing_overlap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eager-stats discipline (round-9 verdict #7): this registry entry
    materializes its gate/bench-scale output and unpersists the
    fingerprint block in ``finally`` instead of leaving it to LRU.  The
    output is ≤ 1 row per doc WITH overlap, which on a dup-dense corpus
    approaches one row per document — corpus-scale callers must use the
    LAZY :func:`winnowing_overlap_stats_frame` and write to a sink, not
    round-trip the result through the driver."""
    return winnowing_overlap_stats_build(spark, sf_dir, eager=True)


def winnowing_overlap_stats_build(
    spark: SparkSession, sf_dir: str, eager: bool = False
) -> DataFrame:
    """The ONE construction the registry entry (eager=True) and the
    plan-golden test (eager=False) share — see
    ``advanced.simhash_overlap_stats_build``."""
    from video_etl_spark.llm_ops.dedup import collect_and_unpersist

    docs = load_table(spark, sf_dir, "documents")
    if not eager:
        return winnowing_overlap_stats_frame(docs)
    pinned: list = []
    out = winnowing_overlap_stats_frame(docs, pinned)
    return collect_and_unpersist(out, pinned)


def winnowing_overlap_stats_frame(
    docs: DataFrame, pinned: list | None = None
) -> DataFrame:
    """LAZY per-doc winnowing overlap stats — the corpus-scale form
    (plan streams to whatever sink the caller writes; nothing collects).
    The fingerprint block persists for the self-join's two sides; pass
    ``pinned`` to own the unpersist, else it follows the LRU-eviction
    convention of the signature blocks."""
    pairs = _winnowing_pairs(docs, pinned)
    bidir = pairs.select(
        F.col("doc_a").alias("doc_id"), "n_shared"
    ).unionByName(pairs.select(F.col("doc_b").alias("doc_id"), "n_shared"))
    return bidir.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_partners"),
        F.max("n_shared").cast("long").alias("max_shared"),
        F.sum("n_shared").cast("long").alias("total_shared"),
    )


# --------------------------------------------------------------------------
# ⊕ training-pipeline op (round 7 cont.): DOCUMENT CHUNKING with overlap
# — the RAG/embedding-prep transform: split every document into
# fixed-size token windows with a stride (size 32, overlap 8 → stride
# 24), each chunk content-addressed by the hash of its token slice.
# Trailing partial chunks are kept (standard retrieval chunking).  The
# chunk table is what an embedding job maps over and a retriever
# indexes.
# Plan shape: pure per-row generator fused with the scan (sequence +
# explode + slice) — a narrow map at any corpus size, no shuffle at all.
_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24  # size - overlap(8)


@query(
    "chunk_documents",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents),
    ch AS (
      SELECT doc_id,
             CAST(u.i AS BIGINT) AS start_tok,
             ((u.i - 1) / {_CHUNK_STRIDE}) AS chunk_idx0,
             least({_CHUNK_SIZE}, len(t) - u.i + 1) AS chunk_len,
             array_to_string(t[u.i : u.i + least({_CHUNK_SIZE},
                             len(t) - u.i + 1) - 1], ' ') AS chunk_text
      FROM toks, unnest(generate_series(1, len(t), {_CHUNK_STRIDE}))
        AS u(i))
    SELECT doc_id,
           CAST(chunk_idx0 AS BIGINT) AS chunk_idx,
           start_tok,
           CAST(chunk_len AS BIGINT) AS chunk_len,
           {_DUCK_HASH.format(expr="chunk_text")} AS chunk_hash
    FROM ch
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", _tokens_col().alias("t"))
    ch = t.select(
        "doc_id",
        F.explode(
            F.expr(f"sequence(1, size(t), {_CHUNK_STRIDE})")
        ).alias("start_tok"),
        "t",
    ).select(
        "doc_id",
        F.col("start_tok").cast("long").alias("start_tok"),
        F.expr(f"(start_tok - 1) div {_CHUNK_STRIDE}")
        .cast("long")
        .alias("chunk_idx"),
        F.expr(f"least({_CHUNK_SIZE}, size(t) - start_tok + 1)")
        .cast("long")
        .alias("chunk_len"),
        F.expr(
            f"concat_ws(' ', slice(t, start_tok, "
            f"least({_CHUNK_SIZE}, size(t) - start_tok + 1)))"
        ).alias("chunk_text"),
    )
    return ch.select(
        "doc_id",
        "chunk_idx",
        "start_tok",
        "chunk_len",
        F.expr(_SPARK_HASH.format(expr="chunk_text")).alias("chunk_hash"),
    )


# --------------------------------------------------------------------------
# ⊕ training-pipeline op (round 7 cont.): SEQUENCE FILL — the
# sequence-grain view of packing: explode each document over the
# sequences it touches (sequence(start_seq, end_seq) — a doc may span
# many) with the EXACT token count it contributes to each, i.e. the
# overlap of [cum_before, cum_after) with [s·L, (s+1)·L).  The
# invariant a loader relies on falls out: every sequence holds exactly
# L tokens except each shard's tail.  Also the attention-masking
# manifest (docs-per-sequence = segment count per training row).
# Plan shape: pack_sequences' per-shard window + one narrow explode +
# one groupBy(shard, seq) — keys are (small int, long).
@query(
    "sequence_fill",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len({_DUCK_TOKENS_NE}) AS BIGINT) AS n_tok,
             {_DUCK_HASH.format(expr="'pack|' || CAST(doc_id AS VARCHAR)")}
               % {_PACK_SHARDS} AS shard
      FROM documents),
    c AS (
      SELECT shard, n_tok,
             sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id)
               AS cum_after
      FROM t),
    d AS (
      SELECT shard, n_tok, cum_after, cum_after - n_tok AS cum_before
      FROM c),
    x AS (
      -- n_tok > 0: a 0-token doc occupies no sequence.  generate_series
      -- is INCLUSIVE, so without the guard a mid-sequence empty doc
      -- would still emit one (toks_here = 0) row here while the Spark
      -- side (which filters n_tok > 0 before exploding) emits none.
      SELECT shard, u.s AS seq_id,
             least(cum_after, (u.s + 1) * {_PACK_SEQ_LEN})
               - greatest(cum_before, u.s * {_PACK_SEQ_LEN})
               AS toks_here
      FROM d, unnest(generate_series(
               CAST(cum_before // {_PACK_SEQ_LEN} AS BIGINT),
               CAST((cum_after - 1) // {_PACK_SEQ_LEN} AS BIGINT)))
        AS u(s)
      WHERE n_tok > 0)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(seq_id AS BIGINT) AS seq_id,
           count(*) AS n_docs,
           CAST(sum(toks_here) AS BIGINT) AS n_tokens
    FROM x GROUP BY shard, seq_id
    """,
)
def sequence_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from video_etl_spark.llm_ops.export import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(
        docs, seq_len=_PACK_SEQ_LEN, n_shards=_PACK_SHARDS
    )
    L = _PACK_SEQ_LEN
    # 0-token docs occupy no sequence — filtered on BOTH engines (the
    # oracle guards its inclusive generate_series with n_tok > 0 too)
    x = packed.filter(F.col("n_tok") > 0).select(
        "shard",
        F.explode(F.expr("sequence(start_seq, end_seq)")).alias("seq_id"),
        "cum_before",
        (F.col("cum_before") + F.col("n_tok")).alias("cum_after"),
    ).select(
        "shard",
        F.col("seq_id").cast("long").alias("seq_id"),
        (
            F.least(F.col("cum_after"), (F.col("seq_id") + 1) * L)
            - F.greatest(F.col("cum_before"), F.col("seq_id") * L)
        ).alias("toks_here"),
    )
    return x.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks_here").cast("long").alias("n_tokens"),
    )


# --------------------------------------------------------------------------
# ⊕ graph readout (round 7 cont.): DUP-GRAPH TRIANGLE CENSUS — how
# transitive is the near-duplicate relation?  High transitivity (shared
# neighbors are themselves neighbors) is what justifies collapsing band
# candidates into CC clusters and picking one canonical per cluster; a
# low-transitivity graph would mean band collisions chain UNRELATED
# documents and cluster-grain dedup over-merges.  Exact integers:
# triangle/wedge counts are BIGINTs, transitivity = 3T/wedges in ppm.
# Spark side runs the DEGREE-ORIENTED algorithm (orient each edge toward
# the higher-(degree, id) endpoint; every wedge is enumerated at its
# lowest-degree apex, bounding per-node work by out-degree ~ O(√m) on
# skewed graphs — the 100 TB-safe form); the oracle is the naive
# a<b<c 3-way self-join, so the parity gate proves the oriented
# algorithm counts exactly like the textbook definition.
@query(
    "dup_graph_triangles",
    oracle=_duck_minhash_cte()
    + _DUCK_BANDED_CTE
    + f""",
    e AS (
      SELECT a.doc_id AS u, b.doc_id AS v
      FROM banded a JOIN banded b ON a.doc_id < b.doc_id
        AND (a.band0 = b.band0)
      UNION
      SELECT a.doc_id AS u, b.doc_id AS v
      FROM banded a JOIN banded b ON a.doc_id < b.doc_id
        AND (a.band1 = b.band1)),
    deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
      GROUP BY node),
    tri AS (
      SELECT count(*) AS t
      FROM e e1 JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
    w AS (
      SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) AS wedges FROM deg)
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           w.wedges AS n_wedges,
           CAST(tri.t AS BIGINT) AS n_triangles,
           CAST(CASE WHEN w.wedges = 0 THEN 0
                ELSE {_safe_ppm("3 * tri.t", "w.wedges", "//")}
                END AS BIGINT) AS transitivity_ppm
    FROM tri, w
    """,
)
def dup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census over the band-pair graph.

    The EDGE SET here is the pair-grain graph by definition, so n exact
    copies contribute an n-clique (C(n,2) edges, C(n,3) triangles) —
    inherent to the metric, not a join defect.  On a corpus with heavy
    exact duplication, run `band_occupancy_histogram` first; if it
    shows a hot key, the component-grain readouts
    (`dup_cluster_size_histogram` over the component index) are the
    scale-safe health metric, and cliques' triangle mass is derivable
    from cluster sizes in closed form.
    """
    # Round-16 (guide §2.4/§5): edges/deg/oriented are eagerly
    # localCheckpointed instead of lazily persisted — the wedge join's
    # five concurrent AQE subtrees (o1/o2/dx/dy/closing) then plan
    # against three materialized frames instead of re-planning the
    # signature pipeline per subtree (the r15 action reorder removed the
    # racing RE-COMPUTE; the checkpoint also removes the racing
    # RE-PLANNING).  Rep-interleaved A/B: min 2.29 → 1.47 s, every
    # sample improved; census identical.  Checkpoint blocks are released
    # by GC + ContextCleaner (no unpersist hook), same lifecycle as the
    # CC chain's frames.
    edges = minhash_band_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).localCheckpoint()
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint()
    )
    # orient each edge toward the higher-(degree, id) endpoint
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | (
                    (F.col("du") == F.col("dv"))
                    & (F.col("u") < F.col("v"))
                ),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(
                F.struct(F.col("v").alias("s"), F.col("u").alias("t"))
            )
            .alias("o")
        )
        .select("o.s", "o.t")
        .localCheckpoint()
    )
    # wedges at the apex s: pairs of out-neighbors; closing edge must
    # be oriented low→high too, so join once on the oriented table
    o1 = oriented.select(F.col("s"), F.col("t").alias("x"))
    o2 = oriented.select(F.col("s"), F.col("t").alias("y"))
    dx = deg.select(F.col("node").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("node").alias("y"), F.col("d").alias("dy"))
    wedges_df = (
        o1.join(o2, "s")
        .join(dx, "x")
        .join(dy, "y")
        .filter(
            (F.col("dx") < F.col("dy"))
            | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
        )
        .select(F.col("x").alias("s"), F.col("y").alias("t"))
    )
    closing = oriented.select("s", "t")
    # the three checkpoints above already materialized the expensive
    # pipeline, so these actions read blocks; order no longer matters
    n_edges = edges.count()
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges"),
    ).collect()[0]
    n_tri = wedges_df.join(closing, ["s", "t"]).count()
    n_wedges = int(stats["n_wedges"] or 0)
    # Python ints are arbitrary precision, so the plain formula is exact
    # at any scale; it equals the oracle's _safe_ppm on branches 1-2
    # (both exact) and only diverges on the doubly-huge branch 3, which
    # needs 9e12 TRIANGLES — beyond any gate or rehearsal scale.
    trans = 0 if n_wedges == 0 else (3 * n_tri * 1_000_000) // n_wedges
    from video_etl_spark.session import local_frame

    return local_frame(
        spark,
        [
            (
                int(stats["n_nodes"]),
                int(n_edges),
                n_wedges,
                int(n_tri),
                int(trans),
            )
        ],
        "n_nodes long, n_edges long, n_wedges long, n_triangles long, "
        "transitivity_ppm long",
    )


# --------------------------------------------------------------------------
# ⊕ training-pipeline op (round 7 cont.): EPOCH SAMPLING PLAN — turn the
# temperature mixture weights into an exact per-source token budget for
# one training epoch via LARGEST-REMAINDER (Hamilton) apportionment:
# base_i = floor(B·w_i / W), the leftover (< n_sources by construction)
# goes +1 each to the sources with the largest remainders (ties:
# source asc).  Budgets sum to B EXACTLY — the property a data loader
# needs and proportional-rounding does not give.  Overflow-safe at any
# B: floor(B·w/W) = (B div W)·w + floor((B mod W)·w / W) keeps every
# term under ~1e12 even for a 1e13-token epoch ((B mod W) < W ≤ ~1e6·n).
_EPOCH_BUDGET = 1_000_000_000  # 1B tokens/epoch, the attested instance


@query(
    "epoch_sampling_plan",
    oracle=f"""
    WITH t AS (
      SELECT source, len({_DUCK_TOKENS_NE}) AS n_tok FROM documents),
    s AS (
      SELECT source, CAST(sum(n_tok) AS BIGINT) AS n_tokens
      FROM t GROUP BY source),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM s),
    sh AS (
      SELECT source, n_tokens,
             CAST({_safe_ppm("n_tokens", "total", "//")} AS BIGINT)
               AS share_ppm
      FROM s, tot),
    tw AS (
      SELECT source, n_tokens,
             CAST(floor(sqrt(CAST(share_ppm AS DOUBLE))) AS BIGINT) AS w
      FROM sh),
    ww AS (
      -- greatest(1, ·): an all-empty corpus gives W = 0, where Spark
      -- div returns NULL but DuckDB // errors — weight-0 rows get base
      -- 0 on both engines instead (same guard as the temperature query)
      SELECT CAST(greatest(1, sum(w)) AS BIGINT) AS bigw FROM tw),
    q AS (
      SELECT source, n_tokens, w,
             ({_EPOCH_BUDGET} // bigw) * w
               + (({_EPOCH_BUDGET} % bigw) * w) // bigw AS base,
             (({_EPOCH_BUDGET} % bigw) * w) % bigw AS rem
      FROM tw, ww),
    l AS (
      SELECT CAST({_EPOCH_BUDGET} - sum(base) AS BIGINT) AS leftover
      FROM q),
    r AS (
      SELECT q.*, row_number() OVER (ORDER BY rem DESC, source) AS rk
      FROM q)
    SELECT r.source, r.n_tokens,
           CAST(r.w AS BIGINT) AS weight,
           CAST(r.base + CASE WHEN r.rk <= l.leftover THEN 1 ELSE 0 END
                AS BIGINT) AS epoch_tokens
    FROM r, l
    """,
)
def epoch_sampling_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_source = (
        docs.select(
            "source",
            F.size(_nonempty_tokens_col()).cast("long").alias("n_tok"),
        )
        .groupBy("source")
        .agg(F.sum("n_tok").alias("n_tokens"))
    )
    total = per_source.agg(F.sum("n_tokens").alias("total"))
    tw = (
        per_source.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_tokens",
            F.expr(_safe_ppm("n_tokens", "total", "div"))
            .cast("long")
            .alias("share_ppm"),
        )
        .withColumn(
            "w",
            F.floor(F.sqrt(F.col("share_ppm").cast("double"))).cast("long"),
        )
    )
    ww = tw.agg(F.expr("greatest(1L, sum(w))").alias("bigw"))
    B = _EPOCH_BUDGET
    q = tw.crossJoin(F.broadcast(ww)).select(
        "source",
        "n_tokens",
        "w",
        F.expr(
            f"({B} div bigw) * w + (({B} % bigw) * w) div bigw"
        ).alias("base"),
        F.expr(f"(({B} % bigw) * w) % bigw").alias("rem"),
    )
    leftover = q.agg((F.lit(B) - F.sum("base")).alias("leftover"))
    wdw = Window.orderBy(F.desc("rem"), "source")
    return (
        q.withColumn("rk", F.row_number().over(wdw))
        .crossJoin(F.broadcast(leftover))
        .select(
            "source",
            "n_tokens",
            F.col("w").cast("long").alias("weight"),
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("long")
            .alias("epoch_tokens"),
        )
    )


# --------------------------------------------------------------------------
# U21⊕ (round 7 cont.): CHUNK-GRAIN EXACT DEDUP — dedup at the retrieval
# unit: chunks (chunk_documents' windows) whose content hash repeats
# across the corpus, with the doc span they came from.  A RAG index
# stores each repeated chunk ONCE; this is the readout that sizes that
# saving and flags the boilerplate chunks an embedding job should skip.
# Composes the chunking generator with the exact-dedup groupBy — one
# narrow generate + one hash aggregate.
@query(
    "chunk_dedup_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents),
    ch AS (
      SELECT doc_id,
             {_DUCK_HASH.format(
                 expr="array_to_string(t[u.i : u.i + least("
                 + str(_CHUNK_SIZE) + ", len(t) - u.i + 1) - 1], ' ')"
             )} AS chunk_hash
      FROM toks, unnest(generate_series(1, len(t), {_CHUNK_STRIDE}))
        AS u(i)),
    g AS (
      SELECT chunk_hash,
             count(*) AS n_copies,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             min(doc_id) AS first_doc
      FROM ch GROUP BY chunk_hash)
    SELECT CAST(count(*) AS BIGINT) AS n_distinct_chunks,
           CAST(sum(n_copies) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN n_copies > 1 THEN n_copies - 1 ELSE 0 END)
                AS BIGINT) AS n_redundant,
           CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_cross_doc_chunks
    FROM g
    """,
)
def chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = chunk_documents(spark, sf_dir)
    g = chunks.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_distinct_chunks"),
        F.sum("n_copies").cast("long").alias("n_chunks"),
        F.sum(
            F.when(F.col("n_copies") > 1, F.col("n_copies") - 1).otherwise(0)
        )
        .cast("long")
        .alias("n_redundant"),
        F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_cross_doc_chunks"),
    )


# --------------------------------------------------------------------------
# U23⊕ (round 7 cont.): NORMALIZED DOMAIN OVERLAP — the Jaccard form of
# cross_source_contamination: |shared distinct 3-grams| / |union| per
# source pair, in exact ppm.  The symmetric, size-normalized number a
# mixing decision actually compares (raw shared counts favor big
# domains).  Same skeleton: distinct (gram, source) longs, pair join
# bounded by shared grams, per-source distinct counts folded in.
@query(
    "source_pair_jaccard",
    oracle=f"""
    WITH toks AS (
      SELECT source, {_DUCK_TOKENS} AS toks FROM documents),
    sh AS (
      SELECT source,
             [toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
              FOR i IN generate_series(1, len(toks) - 2)] AS shingles
      FROM toks WHERE len(toks) >= 3),
    gs AS (
      SELECT DISTINCT source, {_DUCK_HASH.format(expr="s")} AS h
      FROM sh, unnest(shingles) AS u(s)),
    per AS (
      SELECT source, count(*) AS n_grams FROM gs GROUP BY source),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             count(*) AS n_shared
      FROM gs a JOIN gs b ON a.h = b.h AND a.source < b.source
      GROUP BY 1, 2)
    SELECT s.source_a, s.source_b, s.n_shared,
           CAST(pa.n_grams AS BIGINT) AS n_grams_a,
           CAST(pb.n_grams AS BIGINT) AS n_grams_b,
           CAST({_safe_ppm(
               "s.n_shared",
               "(pa.n_grams + pb.n_grams - s.n_shared)",
               "//",
           )} AS BIGINT) AS jaccard_ppm
    FROM shared s
    JOIN per pa ON pa.source = s.source_a
    JOIN per pb ON pb.source = s.source_b
    """,
)
def source_pair_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(_SPARK_HASH.format(expr="s"))
    gs = (
        _spark_spans(docs, 3)
        .select("source", F.explode(F.array_distinct("spans")).alias("s"))
        .select("source", h.alias("h"))
        .distinct()
        .persist()  # feeds the pair join (twice) and the per-source counts
    )
    per = gs.groupBy("source").agg(F.count(F.lit(1)).alias("n_grams"))
    a = gs.select(F.col("source").alias("source_a"), "h")
    b = gs.select(F.col("source").alias("source_b"), "h")
    shared = (
        a.join(b, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    pa = per.select(
        F.col("source").alias("source_a"), F.col("n_grams").alias("n_grams_a")
    )
    pb = per.select(
        F.col("source").alias("source_b"), F.col("n_grams").alias("n_grams_b")
    )
    return (
        shared.join(F.broadcast(pa), "source_a")
        .join(F.broadcast(pb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.col("n_grams_a").cast("long").alias("n_grams_a"),
            F.col("n_grams_b").cast("long").alias("n_grams_b"),
            F.expr(
                _safe_ppm(
                    "n_shared", "(n_grams_a + n_grams_b - n_shared)", "div"
                )
            )
            .cast("long")
            .alias("jaccard_ppm"),
        )
    )
