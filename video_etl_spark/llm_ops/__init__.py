"""LLM-training-data pipeline operators (SURVEY.md U21-U23 ⊕, build-brief
north star): deduplication, similarity search, multimodal column plumbing.

The SQL-expressible members (exact/fingerprint/MinHash dedup, n-gram
Jaccard, brute-force cosine top-k) live in queries/text.py and
queries/vectors.py with DuckDB oracles; this package holds the
pandas-UDF-backed pieces (SimHash, LSH ANN, binary decode stubs) that have
rows-only checks plus pytest coverage against the oracle-verified baselines.
"""

from video_etl_spark.llm_ops.dedup import simhash_pairs, simhash_signatures  # noqa: F401
from video_etl_spark.llm_ops.similarity import lsh_topk  # noqa: F401
from video_etl_spark.llm_ops.multimodal import (  # noqa: F401
    attach_fake_payload,
    extract_features,
    sample_frames,
)
