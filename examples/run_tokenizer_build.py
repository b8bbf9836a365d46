#!/usr/bin/env python
"""End-to-end tokenizer build (llm_ops/bpe.py): train k BPE merges over
the corpus word-frequency table, report per-source fertility/compression,
and persist the merges + vocabulary artifacts a tokenize job replays.

Usage: python examples/run_tokenizer_build.py [sf_dir] [k] (defaults
sf0.01, 12 merges)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

from video_etl_spark.llm_ops.bpe import bpe_train, write_tokenizer
from video_etl_spark.session import get_spark, load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    spark = get_spark("video-etl-spark-tokenizer")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    merges, words = bpe_train(docs, k)
    t_train = time.perf_counter() - t0
    print(f"trained {len(merges)} merges in {t_train:.1f}s:")
    for m in merges:
        print(
            f"  round {m['rnd']:>2}: '{m['left']}' + '{m['right']}' -> "
            f"'{m['merged']}' ({m['n_occurrences']} occurrences)"
        )

    out = tempfile.mkdtemp(prefix="tokenizer_")
    write_tokenizer(merges, words, out)
    vocab = spark.read.parquet(f"{out}/vocab.parquet")
    n_syms = vocab.count()
    from pyspark.sql import functions as F

    top = vocab.orderBy(F.desc("frequency")).limit(8).collect()
    print(f"vocabulary: {n_syms} symbols -> {out}")
    for r in top:
        print(f"  {r['symbol']!r}: freq {r['frequency']}")

    from video_etl_spark.queries.text import bpe_fertility_after_merges

    print("fertility after the attested k=3 merges (per source):")
    for r in (
        bpe_fertility_after_merges(spark, sf_dir)
        .orderBy("source")
        .limit(5)
        .collect()
    ):
        print(
            f"  {r['source']}: {r['fertility_ppm'] / 1e6:.3f} symbols/"
            f"token, {r['saved_ppm'] / 1e4:.1f}% chars saved"
        )


if __name__ == "__main__":
    main()
