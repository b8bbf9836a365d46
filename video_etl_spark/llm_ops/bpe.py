"""Iterative BPE tokenizer training (U23⊕, round 7).

The reference's text stack tokenizes with a FIXED GloVe vocabulary
(`workloads/streaming/runtime.py:30-43`); the matching LLM-pipeline
capability is training the subword vocabulary itself.  This module extends
the single-round pair-statistics pass (``queries.text.bpe_top_merges``)
into the full Sennrich-style loop: count adjacent symbol pairs → merge the
most frequent pair into one symbol → re-segment → repeat.

Scale posture: training runs over the DISTINCT-WORD frequency table, not
the corpus — pair counts weighted by word multiplicity are identical to
counting every token occurrence, but the table is vocabulary-sized (a
100 TB corpus has ~1e7 distinct words, not ~1e13 tokens), so the corpus is
scanned exactly ONCE (to build the table) and every merge round is two
small jobs over the vocab table.  The per-round "best pair" is a 1-row
``limit(1).collect()`` — the sanctioned control-loop aggregate, same as
the CC convergence probe.  ``localCheckpoint`` truncates lineage every
``checkpoint_every`` rounds (same discipline as
``queries.advanced.pagerank_iterate``), so a 32k-merge production run has
bounded plans and flat per-round cost.

Determinism: ties on pair count break lexicographically smallest
``(left, right)`` — no RNG, identical merges on any engine/partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequency_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n, syms): the table BPE trains on.

    ``syms`` starts as the character segmentation; single-character words
    are kept (they contribute no pairs but belong to the vocabulary).
    Tokenization matches ``queries.text._tokens_col`` (lowercase,
    ASCII-whitespace split) so round-1 pair counts line up bit for bit
    with the oracle-checked ``bpe_top_merges``.
    """
    from video_etl_spark.queries.text import _tokens_col

    toks = docs.select(
        F.explode(_tokens_col(text_col)).alias("word")
    ).filter(F.length("word") >= 1)
    return (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("syms", F.split("word", ""))
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """(left, right, n_occurrences): adjacent-symbol pairs weighted by
    word frequency.  Overlapping occurrences count individually (the
    standard Sennrich convention: "aaa" yields two (a,a) pairs even though
    only one merge can apply)."""
    # guard size < 2 BEFORE sequence(1, size-1): Spark's sequence(1, 0)
    # generates a DESCENDING [1, 0], not an empty array
    pairs = (
        words.filter(F.size("syms") >= 2)
        .select(
            "n",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(element_at(syms, i) as left, "
                    "element_at(syms, i + 1) as right))"
                )
            ).alias("p"),
        )
        .select("n", "p.left", "p.right")
    )
    return pairs.groupBy("left", "right").agg(
        F.sum("n").alias("n_occurrences")
    )


def merge_pair(words: DataFrame, left: str, right: str) -> DataFrame:
    """Apply ONE merge (left, right) → left+right to every word's symbol
    array, greedily left to right (non-overlapping: "xxxx" under (x,x)
    becomes [xx, xx]).

    A single ``aggregate`` fold per row — whole-stage-codegen'd, no
    Python.  The fold's "last element == left" test can never fire on a
    symbol produced by THIS round's merge: the merged symbol is
    left+right, which differs from ``left`` whenever ``right`` is
    non-empty — so the greedy scan is exact, not approximate.  Literals
    go through ``F.lit`` (no SQL-string escaping hazards on corpus text).
    """
    merged = left + right

    def step(acc, s):
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right))
        )
        return F.when(
            hit,
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(s)))

    return words.withColumn(
        "syms",
        F.aggregate("syms", F.array().cast("array<string>"), step),
    )


def bpe_train(
    docs: DataFrame,
    k: int,
    text_col: str = "text",
    checkpoint_every: int = 4,
) -> tuple[list[dict], DataFrame]:
    """Run ``k`` BPE merge rounds over ``docs``.

    Returns ``(merges, words)``: ``merges`` is the learned merge table —
    one dict per round with ``rnd, left, right, merged, n_occurrences`` —
    and ``words`` is the final (word, n, syms) segmentation (the state a
    tokenizer export serializes alongside the merge list).  Stops early
    if no pair remains (every word fully merged).
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    words = word_frequency_table(docs, text_col).localCheckpoint()
    merges: list[dict] = []
    for rnd in range(k):
        best = (
            pair_counts(words)
            .orderBy(F.desc("n_occurrences"), "left", "right")
            .limit(1)
            .collect()
        )
        if not best:
            break
        row = best[0]
        merges.append(
            {
                "rnd": rnd,
                "left": row["left"],
                "right": row["right"],
                "merged": row["left"] + row["right"],
                "n_occurrences": row["n_occurrences"],
            }
        )
        words = merge_pair(words, row["left"], row["right"])
        if (rnd + 1) % checkpoint_every == 0:
            words = words.localCheckpoint()
    return merges, words


def symbol_vocabulary(words: DataFrame) -> DataFrame:
    """(symbol, n_words, frequency): the vocabulary the final
    segmentation implies — ``n_words`` is the number of DISTINCT words
    containing the symbol (a word's syms array repeats symbols, so a
    bare count would overstate it), ``frequency`` is occurrence-weighted
    by word multiplicity.  One explode + one groupBy over the VOCAB-grain
    word table (never the corpus)."""
    return (
        words.select("word", "n", F.explode("syms").alias("symbol"))
        .groupBy("symbol")
        .agg(
            F.countDistinct("word").alias("n_words"),
            F.sum("n").alias("frequency"),
        )
    )


def write_tokenizer(
    merges: list[dict], words: DataFrame, path: str
) -> None:
    """Persist the trained tokenizer: ``merges.parquet`` (the ordered
    merge table a tokenizer runtime replays), ``vocab.parquet`` (the
    symbol vocabulary with corpus frequencies) and ``words.parquet``
    (the (word, n, syms) segmentation table — the frame
    :func:`tokenize_corpus` joins against, so a serving job can
    ``spark.read.parquet(f"{path}/words.parquet")`` instead of
    replaying merges).  All three are vocab-grain broadcastable
    artifacts."""
    spark = words.sparkSession
    words.coalesce(1).write.mode("overwrite").parquet(
        f"{path}/words.parquet"
    )
    spark.createDataFrame(
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
        "rnd long, left string, right string, merged string, "
        "n_occurrences long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/merges.parquet")
    symbol_vocabulary(words).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/vocab.parquet"
    )


def tokenize_corpus(
    docs: DataFrame,
    words: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained segmentation to the CORPUS: (id, subwords) where
    ``subwords`` is the document's token stream re-segmented by the
    trained merges, in order.

    The segmentation lives on the vocab-grain ``words`` table
    (:func:`bpe_train`'s output) — the corpus pass is one positional
    explode + one hash join against it (broadcast at production scale:
    the vocabulary is tiny next to the corpus) + one ordered re-assembly
    per doc.  Words never seen at training time fall back to their
    character segmentation (the standard unseen-word rule for a
    character-alphabet BPE).
    """
    from video_etl_spark.queries.text import _nonempty_tokens_col

    toks = docs.select(
        F.col(id_col),
        F.posexplode(_nonempty_tokens_col(text_col)).alias("pos", "word"),
    )
    seg = words.select("word", "syms")
    joined = toks.join(seg, "word", "left").withColumn(
        "syms", F.coalesce("syms", F.split("word", ""))
    )
    grouped = joined.groupBy(id_col).agg(
        F.flatten(
            F.array_sort(F.collect_list(F.struct("pos", "syms"))).syms
        ).alias("subwords")
    )
    # row-preserving: empty/whitespace-only docs have no token rows and
    # would vanish from the groupBy — a downstream join back to the
    # corpus would silently lose them; left-join from docs restores them
    # with an empty subword stream
    return docs.select(id_col).join(grouped, id_col, "left").withColumn(
        "subwords",
        F.coalesce("subwords", F.expr("cast(array() as array<string>)")),
    )
