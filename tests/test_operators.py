"""Unit tests for the reusable temporal operators on tiny hand-built frames."""

import datetime as dt

from pyspark.sql import functions as F

from video_etl_spark.operators.temporal import fill_forward, merge_asof, sessionize


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_merge_asof_picks_newest_preceding(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:10"), "L1"), (1, _ts("2024-01-01T00:00:02"), "L2"),
         (2, _ts("2024-01-01T00:00:05"), "L3")],
        "k long, lts timestamp, lid string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:01"), 100), (1, _ts("2024-01-01T00:00:09"), 200),
         (1, _ts("2024-01-01T00:00:11"), 300), (3, _ts("2024-01-01T00:00:00"), 400)],
        "k long, rts timestamp, rv long",
    )
    out = merge_asof(
        left, right, keys=["k"], left_ts="lts", right_ts="rts",
        pickup={"rv": "rv_out"}, right_tiebreak=["rv"],
    )
    got = {r["lid"]: r["rv_out"] for r in out.collect()}
    assert got == {"L1": 200, "L2": 100, "L3": None}


def test_merge_asof_inclusive_and_tiebreak(spark):
    t = _ts("2024-01-01T00:00:05")
    left = spark.createDataFrame([(1, t, "L")], "k long, lts timestamp, lid string")
    right = spark.createDataFrame(
        [(1, t, 7), (1, t, 9)], "k long, rts timestamp, rv long"
    )
    out = merge_asof(
        left, right, keys=["k"], left_ts="lts", right_ts="rts",
        pickup={"rv": "rv_out"}, right_tiebreak=["rv"],
    )
    assert out.collect()[0]["rv_out"] == 9  # same-ts match allowed, max tiebreak


def test_sessionize_islands(spark):
    rows = [
        (1, _ts("2024-01-01T00:00:00")),
        (1, _ts("2024-01-01T00:10:00")),   # same session (gap 600 < 1800)
        (1, _ts("2024-01-01T01:00:00")),   # new session (gap 3000 > 1800)
        (2, _ts("2024-01-01T00:00:00")),
    ]
    df = spark.createDataFrame(rows, "user long, ts timestamp")
    out = sessionize(df, key="user", ts="ts", gap_seconds=1800)
    got = {(r["user"], r["ts"].minute, r["ts"].hour): r["session_id"] for r in out.collect()}
    assert got[(1, 0, 0)] == 0 and got[(1, 10, 0)] == 0
    assert got[(1, 0, 1)] == 1
    assert got[(2, 0, 0)] == 0


def test_fill_forward(spark):
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 10.0),
        (1, _ts("2024-01-01T00:00:01"), None),
        (1, _ts("2024-01-01T00:00:02"), None),
        (1, _ts("2024-01-01T00:00:03"), 20.0),
        (2, _ts("2024-01-01T00:00:00"), None),
    ]
    df = spark.createDataFrame(rows, "user long, ts timestamp, v double")
    out = fill_forward(df, key="user", ts="ts", col="v", out="vf")
    got = [(r["user"], r["vf"]) for r in out.orderBy("user", "ts").collect()]
    assert got == [(1, 10.0), (1, 10.0), (1, 10.0), (1, 20.0), (2, None)]


def test_partitioned_sink_roundtrip(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import functions as F

    from video_etl_spark.operators.io import (
        read_partitioned,
        with_day_partition,
        write_partitioned,
    )

    rows = [
        (1, dt.datetime(2024, 1, 1, 10), 5.0),
        (2, dt.datetime(2024, 1, 2, 11), 6.0),
        (3, dt.datetime(2024, 1, 2, 12), 7.0),
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, v double")
    path = str(tmp_path / "sink")
    write_partitioned(with_day_partition(df), path, ["day"])
    back = read_partitioned(spark, path)
    assert back.count() == 3
    # partition pruning: filtering on day reads one directory
    one_day = back.filter(F.col("day") == "2024-01-02")
    assert one_day.count() == 2
    plan = one_day.queryExecution if False else one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan


def test_binary_folder_scan_natural_order(spark, tmp_path):
    from video_etl_spark.operators.io import read_binary_folder

    # files named so lexicographic != numeric order
    for name, payload in [("img2.bin", b"b"), ("img10.bin", b"c"), ("img1.bin", b"a")]:
        (tmp_path / name).write_bytes(payload)
    df = read_binary_folder(spark, str(tmp_path))
    rows = df.collect()
    assert [r["frame_no"] for r in rows] == [1, 2, 10]  # natural, not lexicographic
    assert [bytes(r["content"]) for r in rows] == [b"a", b"b", b"c"]
    assert all(r["n_bytes"] == 1 for r in rows)


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    from video_etl_spark.operators.io import write_bucketed

    a = spark.range(0, 10_000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(0, 10_000).selectExpr("id AS k", "id * 3 AS vb")
    write_bucketed(a, "t_bucket_a", str(tmp_path / "a"), ["k"])
    write_bucketed(b, "t_bucket_b", str(tmp_path / "b"), ["k"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_bucket_a").join(spark.table("t_bucket_b"), "k")
        assert joined.count() == 10_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: sort-merge join with NO shuffle exchange on either side
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        # and a bucket-key aggregation also skips the exchange
        agg = spark.table("t_bucket_a").groupBy("k").count()
        agg.count()
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in agg_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_bucketed_join_mismatched_buckets_reintroduces_exchange(spark, tmp_path):
    """Negative probe for the co-location claim: when the bucket counts
    differ, Spark must re-shuffle at least one side — proving the
    no-Exchange assertion above is load-bearing, not vacuous."""
    from video_etl_spark.operators.io import write_bucketed

    a = spark.range(0, 1_000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(0, 1_000).selectExpr("id AS k", "id * 3 AS vb")
    write_bucketed(a, "t_bucket_m8", str(tmp_path / "m8"), ["k"], n_buckets=8)
    write_bucketed(b, "t_bucket_m4", str(tmp_path / "m4"), ["k"], n_buckets=4)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_bucket_m8").join(spark.table("t_bucket_m4"), "k")
        assert joined.count() == 1_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_bucket_m8")
        spark.sql("DROP TABLE IF EXISTS t_bucket_m4")


def test_aqe_splits_skewed_join(spark):
    """Scale evidence for the skew story: a hot-key sort-merge join must be
    split by AQE's OptimizeSkewedJoin (plan shows skew=true), and the
    negative probe (skew handling off) must not."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "100KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
    }
    old = {k: spark.conf.get(k) for k in confs}
    # pad is incompressible (md5 hex) and flows through the join: skew
    # detection sees COMPRESSED shuffle sizes, so a constant key column
    # alone would dedupe to nothing and never trip the threshold.
    left = spark.range(0, 150_000).select(
        F.when(F.col("id") < 145_000, 0).otherwise(F.col("id")).alias("k"),
        F.md5(F.col("id").cast("string")).alias("pad"),
    )
    right = spark.range(0, 64).select(F.col("id").alias("k"))
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # NOTE: no groupBy on the join key downstream — an aggregation
        # would REQUIRE hashpartitioning(k), which forbids AQE from
        # splitting the skewed partition.  Collect the bare join output
        # (executes THIS frame's plan so AQE finalizes it).
        j = left.join(right, "k")
        rows = j.collect()
        assert len(rows) == 145_000 and all(r["k"] == 0 for r in rows)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        j2 = left.join(right, "k")
        j2.collect()
        plan2 = j2._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" not in plan2
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_plan_shapes_pushdown_and_pruning(spark, sf_dir):
    """Plan-shape regression guards for the properties PERF.md claims:
    predicate pushdown, column pruning, and no Python in JVM-only paths."""
    from video_etl_spark.queries.relational import (
        pricing_summary,
        top_revenue_orders,
    )
    from video_etl_spark.queries.text import jaccard_pair_stats

    # pushdown: the shipdate filter reaches the parquet scan
    plan = (
        pricing_summary(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan

    # pruning: only the referenced lineitem columns are read
    plan2 = (
        top_revenue_orders(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan2)
    li_schema = next(s for s in read_schemas if "l_orderkey" in s)
    assert set(c.split(":")[0] for c in li_schema.split(",")) == {
        "l_orderkey", "l_extendedprice", "l_discount",
    }

    # JVM-only path: no Python eval in the text pipeline
    plan3 = (
        jaccard_pair_stats(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan3 and "BatchEvalPython" not in plan3


def test_runtime_bloom_filter_join_pruning(spark):
    """Runtime row-level filtering: a selective dim join injects a Bloom
    filter (might_contain) on the fact side — rows are dropped before the
    shuffle, the cheapest possible pre-join pruning at 100 TB.  Negative
    probe: disabling the optimizer removes it."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    big = spark.range(0, 500_000).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("pad")
    )
    small = (
        spark.range(0, 500_000, 9973)
        .select(F.col("id").alias("k"))
        .filter(F.col("k") % 2 == 0)
    )
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = big.join(small, "k")
        n = len(j.collect())
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:1500]

        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        j2 = big.join(small, "k")
        assert len(j2.collect()) == n
        plan2 = j2._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" not in plan2
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_plan_shapes_no_pathological_joins(spark, sf_dir):
    """More plan goldens: the headline candidate-generation queries must
    never contain a cartesian product or broadcast nested loop, the as-of
    join must be the union+window form (no range join explosion), and the
    brute-force kNN must broadcast the query side."""
    from video_etl_spark.queries.temporal import (
        asof_purchase_click,
        sessionize_events,
    )
    from video_etl_spark.queries.text import minhash_band_pairs
    from video_etl_spark.queries.vectors import knn_cosine_bruteforce

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    for df in (
        minhash_band_pairs(spark, sf_dir),
        asof_purchase_click(spark, sf_dir),
        sessionize_events(spark, sf_dir),
    ):
        p = plan_of(df)
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p

    # as-of is union+window: no join operator at all in the plan
    p_asof = plan_of(asof_purchase_click(spark, sf_dir))
    assert "Join" not in p_asof

    # brute-force kNN: the 5-row query side is BROADCAST against the
    # streaming corpus — a BroadcastNestedLoopJoin is the correct plan for
    # a keyless pairing with a tiny side (what must NOT appear is a
    # shuffle-based CartesianProduct, which would reshuffle the corpus)
    p_knn = plan_of(knn_cosine_bruteforce(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p_knn
    assert "CartesianProduct" not in p_knn


def test_dynamic_partition_overwrite_backfill(spark, tmp_path):
    """Idempotent backfill: with dynamic partitionOverwriteMode, rewriting
    one day replaces ONLY that partition — the nightly-rerun pattern that
    makes a 100 TB partitioned sink safely re-runnable."""
    import datetime as dt

    from pyspark.sql import functions as F

    path = str(tmp_path / "days")
    rows = [
        (1, "2024-01-01", 10.0), (2, "2024-01-02", 20.0), (3, "2024-01-03", 30.0),
    ]
    df = spark.createDataFrame(rows, "id long, day string, v double")
    df.write.partitionBy("day").mode("overwrite").parquet(path)

    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        fix = spark.createDataFrame(
            [(99, "2024-01-02", 99.0)], "id long, day string, v double"
        )
        fix.write.partitionBy("day").mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)

    back = {
        (str(r["day"]), r["id"]): r["v"]  # partition col inferred as DATE
        for r in spark.read.parquet(path).collect()
    }
    # day2 replaced, day1/day3 untouched
    assert back == {
        ("2024-01-01", 1): 10.0,
        ("2024-01-02", 99): 99.0,
        ("2024-01-03", 3): 30.0,
    }


def test_merge_schema_evolution_read(spark, tmp_path):
    """Schema evolution: batches written with added columns are readable
    as one table with mergeSchema; missing cells are NULL."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, s string").write.parquet(p + "/b1")
    spark.createDataFrame(
        [(2, "b", 3.5)], "id long, s string, score double"
    ).write.parquet(p + "/b2")
    merged = spark.read.option("mergeSchema", "true").parquet(p + "/b1", p + "/b2")
    assert set(merged.columns) == {"id", "s", "score"}
    got = {r["id"]: r["score"] for r in merged.collect()}
    assert got == {1: None, 2: 3.5}


def test_global_topk_uses_take_ordered(spark, sf_dir):
    """O9 plan golden: a global orderBy+limit must compile to
    TakeOrderedAndProject (per-partition top-k + driver merge), never a
    full sort."""
    from video_etl_spark.queries.relational import top_orders_global

    df = top_orders_global(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_observation_metrics_piggyback_on_action(spark, sf_dir):
    """df.observe() collects pipeline metrics DURING the action — at 100 TB
    the row-count/sum audit comes for free with the job instead of a
    second full scan."""
    from pyspark.sql import Observation

    from video_etl_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("audit")
    audited = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("cents"),
    )
    kept = audited.filter(F.col("l_quantity") > 25).count()
    m = obs.get
    assert m["n_rows"] == li.count()
    assert m["cents"] == li.agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
    ).collect()[0][0]
    assert 0 < kept < m["n_rows"]


# ---------------------------------------------------------------------------
# Plan goldens for EVERY bench.py headline query (round-3 ask #4 / round-4
# ask #8).  Baseline contract for all 24: no cartesian product, no
# row-at-a-time Python eval (BatchEvalPython) in the hot path; arrow-
# vectorized python (ArrowEvalPython / *InPandas) is the sanctioned slow
# path for model/UDF ops only.  Per-query extras pin the physical strategy
# a 100 TB user needs (pushdown reaching the scan, broadcast on the dim
# side, TakeOrdered for global top-k, union+window for as-of...).

import pytest as _pytest

# (must_contain, may_use_bnlj, may_use_python)
_HEADLINE_PLAN_EXPECTATIONS = {
    "pricing_summary": (["HashAggregate", "PushedFilters: [IsNotNull(l_shipdate)"], False, False),
    "top_revenue_orders": (["TakeOrderedAndProject"], False, False),
    "regional_revenue": (["BroadcastHashJoin"], False, False),
    "top_orders_per_customer": (["Window"], False, False),
    "event_chunk_agg_2s": (["HashAggregate"], False, False),
    "sessionize_events": (["Window"], False, False),
    "asof_purchase_click": (["Window"], False, False),
    "range_join_clicks_before_purchase": ([], False, False),
    "minhash_band_pairs": ([], False, True),
    "jaccard_pair_stats": ([], False, True),
    # fully relational since the round-6 continuation (no Arrow stage)
    "simhash_near_dup_pairs": (["HashAggregate"], False, False),
    "knn_cosine_bruteforce": (["BroadcastNestedLoopJoin"], True, False),
    "multimodal_features": (["MapInPandas"], False, True),
    "token_stats": (["PushedFilters"], False, False),
    "iou_edge_stats": (["HashAggregate"], False, False),
    "small_quantity_revenue": (["PushedFilters"], False, False),
    "chunk_scores_pipeline": (["BroadcastHashJoin"], False, False),
    "repetition_scores": ([], False, True),
    "sole_returning_suppliers": (["Join"], False, False),
    "min_cost_supplier_per_part": ([], False, False),
    "mlp_embedding": ([], False, True),
    "dedup_connected_clusters": ([], False, True),
    "trailing_hour_user_sum": (["Window"], False, False),
    "nation_market_share": (["BroadcastHashJoin"], False, False),
    # round-6 additions (moved from the round-5 parametrize list into the
    # headline contract as bench.HEADLINE grew; pagerank's executed plan is
    # the post-localCheckpoint scan, so only the negative probes apply)
    "pagerank_trade_flow": ([], False, False),
    "incremental_band_dedup": ([], False, False),
    "benchmark_decontamination": (["BroadcastHashJoin"], False, False),
    "value_percentiles_by_type": (["HashAggregate"], False, False),
    "value_percentiles_approx": (["ObjectHashAggregate"], False, False),
    "shipmode_priority_counts": (["HashAggregate", "PushedFilters"], False, False),
    # round-6 late additions
    "repeated_span_fraction": (["HashAggregate"], False, False),
    "quality_percentile_gate": (["Window"], False, False),
    "cross_source_contamination": (["BroadcastHashJoin"], False, False),
    # round-6 export/novelty additions (the cluster histogram's executed
    # plan, like CC's, is the post-localCheckpoint scan → negative probes
    # plus the final aggregation only)
    "training_shard_manifest": (["HashAggregate"], False, False),
    "ngram_novelty_by_source": (["HashAggregate"], False, False),
    "dup_cluster_size_histogram": (["HashAggregate"], False, True),
    "remove_repeated_spans": (["HashAggregate"], False, False),
    "vocab_growth_curve": (["Window", "HashAggregate"], False, False),
    # round-6 continuation: the BNLJ allowances are the sanctioned
    # broadcast-tiny-side fan-outs (1-row scalar fold for the resample
    # floor; the always-small center/query sets for the embedding family)
    "mixture_resample": (["BroadcastHashJoin", "HashAggregate"], True, False),
    # executed plan is the post-localCheckpoint scan of the CC labeling,
    # like dedup_connected_clusters
    "cluster_aware_split": (["HashAggregate"], False, False),
    "kmeans_lloyd_embeddings": (["HashAggregate"], True, False),
    "semantic_dedup_pairs": (["Window", "HashAggregate"], True, False),
    "knn_label_accuracy": (["Window", "HashAggregate"], True, False),
    # round-7 additions: chunk-blocked equi-join + distinct aggregate;
    # signatures are a scan-fused projection (no Python, no BNLJ)
    "phash_near_dup_pairs": (["HashAggregate"], False, False),
    # round-7 continuation: per-shard ordered window + manifest agg;
    # vocab window for the LM table; bounded ROWS window + inverted-index
    # join for winnowing; chunking is a pure scan-fused generator;
    # drift/percentiles are two-key aggregates
    "sequence_packing_manifest": (["Window", "HashAggregate"], False, False),
    "bigram_lm_topk": (["Window", "HashAggregate"], False, False),
    "winnowing_overlap_pairs": (["Window", "HashAggregate"], False, False),
    "chunk_documents": (["Generate"], False, False),
    "embedding_drift_by_dim": (["HashAggregate"], False, False),
    "doc_length_percentiles_by_source": (["HashAggregate"], False, False),
    # triangle census computes eagerly (bounded 1-row collect pattern) —
    # the returned plan is a local scan; the negative probes still apply
    "dup_graph_triangles": ([], False, False),
    # BNLJ allowance: the sanctioned broadcast 1-row scalar folds
    # (corpus total, weight sum, leftover), same as mixture_resample
    "epoch_sampling_plan": (["Window"], True, False),
    # round-8 additions: count-grain winnowing readout (same window +
    # inverted-index skeleton as the pair form) and the band-occupancy
    # skew histogram (two map-side-combined aggregates)
    "winnowing_overlap_stats": (["Window", "HashAggregate"], False, False),
    "band_occupancy_histogram": (["HashAggregate"], False, False),
    # round-9 additions: rep-grain analytic partner counts — chunked
    # equi-joins + group arithmetic, no window, no Python stage
    "simhash_overlap_stats": (["HashAggregate"], False, False),
    "phash_overlap_stats": (["HashAggregate"], False, False),
}


def test_headline_plan_expectations_cover_bench():
    """The expectation table must stay in lockstep with bench.HEADLINE."""
    import bench

    assert set(_HEADLINE_PLAN_EXPECTATIONS) == set(bench.HEADLINE)


def test_io_cold_probe_detects_cache_state(tmp_path):
    """Round-12 verdict #3: the driver's single-run bench booked a
    phantom 1.9× on the parquet-heavy family because page-cache eviction
    is invisible to every control ratio (the ~1 s controls re-warm their
    own inputs).  The mincore probe must (a) read ~1.0 on just-written
    files, (b) read ~0.0 after a targeted eviction
    (posix_fadvise DONTNEED — the unit-test stand-in for the purged-box
    replay), (c) return to ~1.0 after a plain read, and (d) return None
    — unknown, never 'warm' — when no input files exist.  The io_cold
    threshold must split states (a) and (b)."""
    import os

    import bench

    p = tmp_path / "blob.parquet"
    with open(p, "wb") as fh:
        fh.write(b"\x37" * (4 << 20))
        fh.flush()
        os.fsync(fh.fileno())
    files = bench._bench_input_files(str(tmp_path))
    assert files == [str(p)]

    warm = bench.page_cache_resident_fraction(files)
    if warm is None:
        import pytest

        pytest.skip("mincore probe unavailable on this platform")
    assert warm > bench._IO_COLD_THRESHOLD

    fd = os.open(p, os.O_RDONLY)
    try:
        os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
    finally:
        os.close(fd)
    cold = bench.page_cache_resident_fraction(files)
    assert cold is not None
    if cold > bench._IO_COLD_THRESHOLD:
        # fadvise(DONTNEED) cannot drop tmpfs pages — on boxes whose
        # pytest tmp dir is tmpfs the eviction stand-in is unavailable;
        # bench.py itself reads REAL parquet inputs, so the probe still
        # works where it matters
        import pytest

        pytest.skip("tmp dir cannot be evicted (tmpfs?) — no way to "
                    "stage a cold cache in-test")
    assert cold < bench._IO_COLD_THRESHOLD

    with open(p, "rb") as fh:
        fh.read()
    rewarmed = bench.page_cache_resident_fraction(files)
    assert rewarmed is not None and rewarmed > bench._IO_COLD_THRESHOLD

    assert bench.page_cache_resident_fraction([]) is None
    assert (
        bench.page_cache_resident_fraction([str(tmp_path / "missing")])
        is None
    )


def test_jitter_flags_fire_on_replayed_case_quiet_on_stable():
    """Round-13 verdict #5: the in-run jitter class (a sub-1.5s query's
    median landing >2x its own cross-rep min) must be flagged IN the
    artifact so it stops costing a manual code-unchanged +
    standalone-re-time defense per occurrence.  Replay the two
    historical cases (vocab_growth_curve r13 in-run samples ~0.30 /
    1.2 / 1.43s; semantic_dedup_pairs r12, same shape) -> flagged;
    the stable family (spread well under 2x), a genuinely-slow-but-
    steady query, and sub-floor scheduler wobble on a tiny query ->
    quiet."""
    import bench

    def disp(samples):
        s = sorted(samples)
        return {"min": round(s[0], 4), "median": round(s[len(s) // 2], 4)}

    dispersion = {
        # replayed r13 jitter case: min unchanged, median 4x min
        "vocab_growth_curve": disp([0.30, 1.20, 1.43]),
        # replayed r12 case, same class
        "semantic_dedup_pairs": disp([0.35, 0.95, 1.10]),
        # stable family: tight spread
        "dedup_exact_documents": disp([1.01, 1.05, 1.08]),
        # slow but steady: big absolute times, spread < 2x
        "dedup_connected_clusters": disp([4.10, 4.50, 4.70]),
        # sub-floor wobble: 2.5x ratio but only 50ms of delta — the
        # floor keeps scheduler noise on tiny queries from firing
        "region_count": disp([0.020, 0.050, 0.055]),
    }
    # worst-first ordering (vocab at 4.0x ratio outranks semantic at
    # 2.7x) so the compact line's cap keeps the biggest offenders
    assert bench.jitter_flags(dispersion) == [
        "vocab_growth_curve",
        "semantic_dedup_pairs",
    ]
    # a min of zero (clock resolution) must not divide-by-zero
    assert bench.jitter_flags({"q": {"min": 0.0, "median": 1.0}}) == []


def test_bench_artifact_lines_fit_tail_capture():
    """The driver records bench output through a ~2000-char TAIL capture
    that truncates from the FRONT — the failure that cost round 9 its
    headline number and round 10 half its per-query map.  Pin the
    protocol's size contract against the REAL headline names (plus the
    index-build prelude entries main() adds) with worst-case-width
    values, so a future query registration can't silently regrow it:
    every chunk line must fit the window with lots of margin, and a
    simulated 2000-char tail of the full print sequence must recover
    the compact line plus whole trailing chunks."""
    import json

    import bench

    # two extra keys stand in for the non-HEADLINE prelude timings the
    # real artifact carries (e.g. the ANN index builds); 999.1234 is the
    # widest value round(x, 4) emits for any sub-1000-second query
    timings = {n: 999.1234 for n in bench.HEADLINE}
    timings["knn_pq_indexed_build_prelude"] = 999.1234
    timings["knn_ivf_indexed_build_prelude"] = 999.1234
    lines = bench.query_map_lines(timings)

    parsed = [json.loads(ln) for ln in lines]
    got = {}
    for p in parsed:
        assert p["n_parts"] == len(lines)
        got.update(p["queries"])
    assert got == timings  # chunks partition the map exactly
    assert max(len(ln) for ln in lines) < 600  # window is ~2000

    # compact line with EVERY optional key at worst-case width
    compact = {
        "metric": "headline_queries_total", "value": 9999.1234,
        "value_min": 9999.1234,
        "unit": "sec", "sf": 0.1, "n_queries": len(timings),
        "control_ratio": 1.1234, "control_ratio_start": 1.1234,
        "control_ratio_mid": 1.1234, "control_ratio_end": 1.1234,
        "degraded_during_run": False, "start_elevated": False,
        "mid_elevated": False, "repin_recommended": False,
        "value_normalized": 9999.1234,
        "io_cold": False,
        # worst case the compact line carries: the cap in main() is 5
        # names; these are among the longest registered query names
        "jitter_flagged": [
            "incremental_semantic_dedup_pairs",
            "range_join_clicks_before_purchase",
            "min_cost_supplier_per_part",
            "benchmark_decontamination",
            "cross_source_contamination",
        ],
        "full_artifact": "BENCH_FULL_latest.json",
    }
    compact_line = json.dumps(compact)
    assert len(compact_line) < 700

    # the driver's capture: last 2000 chars of the printed sequence
    # (full line first, then chunks, then compact) — the first surviving
    # line is torn mid-JSON and must be dropped, not crash the reader
    tail = "\n".join([json.dumps({"queries": timings})] + lines
                     + [compact_line])[-2000:]
    recovered = []
    for ln in tail.splitlines():
        try:
            recovered.append(json.loads(ln))
        except ValueError:
            continue  # the torn front line
    assert recovered and recovered[-1] == compact
    whole_chunks = [r for r in recovered if "queries_part" in r]
    assert len(whole_chunks) >= 2  # real per-query data survives too


def test_bench_pin_lifecycle(tmp_path, monkeypatch):
    """Round-11 verdict #5: pins are box/Spark-version-dated constants —
    load_pins must fall back to the in-code constants WITH their
    recorded provenance, prefer the --repin sidecar when present, and
    survive a corrupt sidecar (constants, not a crash); the compact
    artifact's staleness marker is a boolean so the tail-capture size
    contract holds."""
    import json

    import bench

    # no sidecar: constants + their provenance
    monkeypatch.setattr(bench, "_PIN_FILE", str(tmp_path / "none.json"))
    p, pm, prov = bench.load_pins()
    assert p == bench.CONTROL_PINNED and pm == bench.CONTROL_PINNED_MID
    assert prov["measured"] == "2026-08-15" and prov["spark_version"]

    # sidecar present: overrides both pin sets, provenance names the file
    side = tmp_path / "bench_pins.json"
    doc = {
        "control_pinned": {k: 1.0 for k in bench.CONTROL_PINNED},
        "control_pinned_mid": {k: 2.0 for k in bench.CONTROL_PINNED_MID},
        "measured": "2030-01-01",
        "spark_version": "9.9.9",
        "config": bench._PIN_CONFIG,
        "n_runs": 3,
    }
    side.write_text(json.dumps(doc))
    monkeypatch.setattr(bench, "_PIN_FILE", str(side))
    p, pm, prov = bench.load_pins()
    assert p == doc["control_pinned"] and pm == doc["control_pinned_mid"]
    assert prov == {
        "measured": "2030-01-01",
        "spark_version": "9.9.9",
        "source": "bench_pins.json",
    }

    # corrupt sidecar: loud fallback to constants, never a crash
    side.write_text("{not json")
    p, pm, prov = bench.load_pins()
    assert p == bench.CONTROL_PINNED
    assert prov["source"].startswith("in-code")

    # sidecar whose pin keys don't match the CURRENT control set (a
    # control added/renamed after a --repin): constants, with the
    # mismatch named in provenance — not a KeyError at the end of a
    # full run, not a silently skewed pin_sum
    stale = dict(doc)
    stale["control_pinned"] = dict(doc["control_pinned"], ctl_gone=1.0)
    side.write_text(json.dumps(stale))
    p, pm, prov = bench.load_pins()
    assert p == bench.CONTROL_PINNED
    assert "do not match" in prov["source"]


def test_bench_repin_medians_and_sidecar(tmp_path, monkeypatch):
    """--repin's subprocess-parse / per-metric-median / sidecar-write
    path, with the expensive fresh-process runs mocked: each run's LAST
    matching JSON line wins (progress lines and stray prints must not
    confuse the parser), medians are per metric across runs, and the
    sidecar carries full provenance that load_pins then prefers."""
    import json
    import subprocess

    import bench

    trio = list(bench.CONTROL_PINNED)
    calls = {"n": 0}
    # three start-mode runs then three mid-mode runs; values chosen so
    # the per-metric median differs from any single run
    vals = [1.0, 3.0, 2.0, 10.0, 30.0, 20.0]

    def fake_run(cmd, capture_output, text, env, check):
        v = vals[calls["n"]]
        calls["n"] += 1
        key = (
            "control"
            if "SPARK_GRAFT_BENCH_CONTROL_ONLY" in env
            else "control_mid"
        )
        assert key == "control" or "SPARK_GRAFT_BENCH_MID_CONTROL_ONLY" in env
        payload = {key: {k: v for k in trio}, "sf": 0.1}
        if key == "control_mid":
            payload["control_start"] = {k: -1.0 for k in trio}  # decoy
        out = "\n".join(
            ["[Stage 1:> ] progress noise", json.dumps({"unrelated": 1}),
             json.dumps(payload)]
        )
        return subprocess.CompletedProcess(cmd, 0, stdout=out, stderr="")

    monkeypatch.setattr(bench.os, "environ", dict(
        bench.os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
        SPARK_GRAFT_CPUS="32",
    ))
    monkeypatch.setattr(bench, "_PIN_FILE", str(tmp_path / "pins.json"))
    monkeypatch.setattr(subprocess, "run", fake_run)
    bench.repin(n_runs=3)

    side = json.load(open(tmp_path / "pins.json"))
    assert side["control_pinned"] == {k: 2.0 for k in trio}  # median
    assert side["control_pinned_mid"] == {k: 20.0 for k in trio}
    assert side["n_runs"] == 3 and side["config"] == bench._PIN_CONFIG
    import pyspark

    assert side["spark_version"] == pyspark.__version__ and side["measured"]
    p, pm, prov = bench.load_pins()
    assert p == side["control_pinned"] and prov["source"] == "pins.json"


def _eager_stats_lazy_forms():
    """The three count-grain stats registry queries return an eagerly
    materialized local frame since round 10 (verdict #7: unpersist in
    finally), so their REGISTRY plan is a LocalTableScan — the golden
    must pin the underlying LAZY computation instead, which is what
    actually executes (and what a corpus-scale caller runs).  The lazy
    form comes from the SAME ``*_build`` function the registry entry
    wraps, so a parameter change in the query cannot silently diverge
    from what this golden asserts."""
    from video_etl_spark.queries.advanced import simhash_overlap_stats_build
    from video_etl_spark.queries.text import (
        phash_overlap_stats_build,
        winnowing_overlap_stats_build,
    )

    return {
        "simhash_overlap_stats": simhash_overlap_stats_build,
        "phash_overlap_stats": phash_overlap_stats_build,
        "winnowing_overlap_stats": winnowing_overlap_stats_build,
    }


@_pytest.mark.parametrize("name", sorted(_HEADLINE_PLAN_EXPECTATIONS))
def test_headline_plan_golden(spark, sf_dir, name):
    from video_etl_spark import registry

    registry.load_all()
    must_contain, may_bnlj, may_python = _HEADLINE_PLAN_EXPECTATIONS[name]
    lazy = _eager_stats_lazy_forms()
    if name in lazy:
        df = lazy[name](spark, sf_dir)
    else:
        df = registry.QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()

    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if not may_bnlj:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: BNLJ"
    if not may_python:
        assert "ArrowEvalPython" not in plan, f"{name}: unexpected Python stage"
        assert "InPandas" not in plan, f"{name}: unexpected Python stage"
    for token in must_contain:
        assert token in plan, f"{name}: expected {token!r} in physical plan"


@_pytest.mark.parametrize(
    "name,expect",
    [
        ("value_histogram_bins", ["HashAggregate"]),
        ("value_time_correlation", ["HashAggregate"]),
        ("stratified_topk_sample", ["Window"]),
        ("hard_negative_mining", ["Window"]),
        ("quality_weighted_sample", ["HashAggregate"]),
        ("bpe_top_merges", ["Window", "HashAggregate"]),
        ("semantic_canonical_vecs", ["HashAggregate"]),
        ("token_count_cms_estimates", ["HashAggregate", "BroadcastHashJoin"]),
        ("cluster_quality_profile", ["HashAggregate", "PushedFilters"]),
    ],
)
def test_round5_query_plan_shapes(spark, sf_dir, name, expect):
    """Round-5 additions: same physical-plan contract as the headline set —
    no cartesian products, no row-at-a-time Python, plus per-query
    strategy pins (broadcast for the decontamination dim side, hash agg
    for the aggregate family, window top-k for the sampler)."""
    from video_etl_spark import registry

    registry.load_all()
    df = registry.QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    assert "BatchEvalPython" not in plan, name
    assert "InPandas" not in plan and "ArrowEvalPython" not in plan, name
    for token in expect:
        assert token in plan, (name, token)


@_pytest.mark.parametrize(
    "name",
    [
        "benchmark_decontamination",
        # the other shingle-exploding queries hit the same trap (measured
        # 5-9× at sf0.1 each) — all pinned
        "repeated_span_fraction",
        "cross_source_contamination",
        "ngram_novelty_by_source",
        # posexplode variant (identity-transform guard — array_distinct
        # would reorder positions)
        "remove_repeated_spans",
        # occurrence-count variant (identity-transform guard — counts,
        # not distinct sets)
        "ngram_concentration_topk",
    ],
)
def test_shingle_explodes_filter_not_quadratic(spark, sf_dir, name):
    """Regression pin for the InferFiltersFromGenerate trap: a bare
    explode(shingles) lets Catalyst infer size(..)>0/isnotnull(..) on the
    generator input and push the whole O(words²) shingle transform into a
    per-row Filter (measured 7× slowdown at sf0.1).  The executed plan's
    Filter nodes must not evaluate the shingle transform."""
    import re

    from video_etl_spark import registry

    registry.load_all()
    df = registry.QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for m in re.finditer(r"Filter [^\n]*", plan):
        assert "transform(sequence" not in m.group(0), (
            "shingle transform inlined into a Filter:\n" + m.group(0)[:300]
        )


def test_benchmark_decontamination_shingles_unspread(spark, sf_dir):
    """Round-15 pin: benchmark_decontamination opts OUT of the
    small-scan spread (``_spark_shingles(.., spread=False)``).  Its plan
    forks the un-persisted shingle frame into a tiny broadcast-build
    branch (1/97 of docs) and the corpus branch, so the spread made each
    fork re-pay a round-robin shuffle of the raw text scan
    (counterbalanced A/B: every spread sample ≥ +0.24 s over every
    unspread one).  Pins (a) no RoundRobinPartitioning exchange in the
    plan, (b) the opt-out changes no rows (repartition-only delta)."""
    from video_etl_spark import registry
    from video_etl_spark.queries.text import _spark_shingles
    from video_etl_spark.session import load_table

    registry.load_all()
    df = registry.QUERIES["benchmark_decontamination"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" not in plan

    docs = load_table(spark, sf_dir, "documents")
    rows = lambda d: sorted(  # noqa: E731 — local shorthand
        (r.doc_id, tuple(r.shingles))
        for r in d.select("doc_id", "shingles").collect()
    )
    assert rows(_spark_shingles(docs, spread=False)) == rows(
        _spark_shingles(docs, spread=True)
    )


@_pytest.mark.parametrize(
    "name,expect",
    [
        # Arrow pandas UDFs are the sanctioned path for signature /
        # bucketing compute here; row-at-a-time Python and cartesian
        # products remain forbidden.
        ("incremental_simhash_dedup", ["HashAggregate"]),
        ("incremental_embedding_dedup", ["HashAggregate"]),
        ("source_mixture_weights", ["HashAggregate", "BroadcastNestedLoopJoin"]),
        ("doc_lm_familiarity", ["HashAggregate"]),
    ],
)
def test_round6_incremental_plan_shapes(spark, sf_dir, name, expect):
    """Round-6 incremental dedup family: no cartesians, no row-at-a-time
    Python; candidate generation must be an equi-join (SortMergeJoin or
    BroadcastHashJoin on chunk/bucket/label keys), never a nested-loop
    over the corpus."""
    from video_etl_spark import registry

    registry.load_all()
    df = registry.QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    assert "BatchEvalPython" not in plan, name
    if "BroadcastNestedLoopJoin" not in expect:
        # the only sanctioned BNLJ is the broadcast 1-row scalar fold
        assert "BroadcastNestedLoopJoin" not in plan, name
    for token in expect:
        assert token in plan, (name, token)


def test_remove_repeated_spans_crafted(spark, tmp_path):
    """Hand-built corpus pinning the span-removal semantics: the 3-gram
    'a b c' occurs in 3 docs (== _SPAN_DF_K) so its token coverage is
    removed wherever it appears; everything else survives."""
    from video_etl_spark import registry

    registry.load_all()
    rows = [
        (1, "a b c p q r", "en", "s0"),
        (2, "u v a b c w", "en", "s0"),
        (3, "a b c", "en", "s1"),
        (4, "m n o q", "en", "s1"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("long"))
    df.write.parquet(str(tmp_path / "documents.parquet"))

    out = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in registry.QUERIES["remove_repeated_spans"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out[1] == (6, 3, "p q r")
    assert out[2] == (6, 3, "u v w")
    assert out[3] == (3, 3, "")          # fully removed
    assert out[4] == (4, 0, "m n o q")   # untouched


def test_orc_roundtrip_pushdown_and_pruning(spark, sf_dir, tmp_path):
    """ORC source/sink parity with the parquet path: values round-trip
    exactly, predicate pushdown reaches the ORC scan (PushedFilters), and
    hive partition pruning keeps non-matching day directories out of the
    executed plan."""
    from video_etl_spark.operators.io import (
        read_orc,
        with_day_partition,
        write_orc_partitioned,
    )
    from video_etl_spark.session import load_table

    events = with_day_partition(
        load_table(spark, sf_dir, "events").limit(2000)
    )
    out = str(tmp_path / "events_orc")
    write_orc_partitioned(events, out, ["day"])

    back = read_orc(spark, out)
    want = events.agg(
        F.count(F.lit(1)).alias("n"), F.sum("user_id").alias("s")
    ).collect()[0]
    got = back.agg(
        F.count(F.lit(1)).alias("n"), F.sum("user_id").alias("s")
    ).collect()[0]
    assert (got["n"], got["s"]) == (want["n"], want["s"])

    one_day = back.filter(
        (F.col("day") == F.lit(events.select(F.min("day")).collect()[0][0]))
        & (F.col("user_id") > 10)
    )
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "user_id" in plan
    # partition pruning: the day predicate becomes a PartitionFilter
    assert "PartitionFilters: [isnotnull(day" in plan
    scanned = one_day.count()
    assert 0 < scanned < got["n"]


def test_text_corpus_scan_content_addressed(spark, tmp_path):
    """Raw .txt ingestion: content-addressed ids are stable across reads,
    duplicate lines collapse with multiplicity, blank lines drop, and
    source carries the originating file."""
    from video_etl_spark.operators.io import read_text_corpus

    (tmp_path / "a.txt").write_text("alpha doc one\nshared line\n\n")
    (tmp_path / "b.txt").write_text("shared line\nshared line\nbeta doc\n")
    df = read_text_corpus(spark, str(tmp_path))
    rows = {r["text"]: r for r in df.collect()}
    # identical lines collapse corpus-wide: doc_id is a true key
    assert set(rows) == {"alpha doc one", "shared line", "beta doc"}
    assert df.count() == df.select("doc_id").distinct().count()
    # content_key is the full 128-bit md5 hex — the true identity column
    assert df.count() == df.select("content_key").distinct().count()
    import hashlib

    assert (
        rows["shared line"]["content_key"]
        == hashlib.md5(b"shared line").hexdigest()
    )
    assert rows["shared line"]["n_copies"] == 3
    assert rows["shared line"]["source"] == "a.txt"  # min() attribution
    assert rows["alpha doc one"]["doc_id"] != rows["beta doc"]["doc_id"]
    # deterministic across reads
    again = {
        r["text"]: r["doc_id"]
        for r in read_text_corpus(spark, str(tmp_path)).collect()
    }
    assert again == {k: v["doc_id"] for k, v in rows.items()}


def test_span_family_parameterized(spark):
    """round-7 ask #5: span length and DF threshold are parameters.  With
    span_len=4/df_k=2 the shared 4-gram 'a b c d' is removed from both
    carriers while the 3-gram-only overlap 'x y z' survives (a 3-word
    pass WOULD cut it — the length parameter changes the decision); the
    fraction measure counts spans at the requested length."""
    from video_etl_spark.queries.text import (
        remove_repeated_spans_frame,
        repeated_span_fraction_frame,
    )

    rows = [
        (1, "a b c d p q"),
        (2, "r a b c d s"),
        (3, "x y z k1 k2"),
        (4, "k3 x y z k4"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in remove_repeated_spans_frame(
            docs, span_len=4, df_k=2
        ).collect()
    }
    assert out[1] == (6, 4, "p q")
    assert out[2] == (6, 4, "r s")
    assert out[3] == (5, 0, "x y z k1 k2")
    assert out[4] == (5, 0, "k3 x y z k4")

    frac = {
        r["doc_id"]: (r["n_spans"], r["n_shared_spans"])
        for r in repeated_span_fraction_frame(
            docs, span_len=4, min_df=2
        ).collect()
    }
    # doc 1: 3 distinct 4-grams, only 'a b c d' shared; docs 3/4 share
    # no 4-gram despite the 3-word overlap
    assert frac[1] == (3, 1) and frac[2] == (3, 1)
    assert frac[3] == (2, 0) and frac[4] == (2, 0)

    import pytest as _pt

    with _pt.raises(ValueError, match="span_len"):
        remove_repeated_spans_frame(docs, span_len=1)


@_pytest.mark.parametrize(
    "name",
    [
        "dedup_exact_documents",
        "minhash_band_pairs",
        "simhash_near_dup_pairs",
        "dedup_connected_clusters",
        "repeated_span_fraction",
        "remove_repeated_spans",
        "source_mixture_weights",
        "mixture_resample",
        "mixture_temperature_weights",
        "quality_weighted_sample",
        "bpe_top_merges",
        "phash_near_dup_pairs",
        "sequence_packing_manifest",
        "sequence_fill",
        "chunk_documents",
        "winnowing_overlap_pairs",
        "bigram_lm_topk",
        "doc_length_percentiles_by_source",
        "corpus_revision_diff",
        "training_shard_manifest",
    ],
)
def test_text_queries_survive_empty_corpus(spark, tmp_path_factory, name):
    """Robustness sweep: an EMPTY documents table (day-one pipeline, a
    filter that matched nothing) must yield a schema-stable empty result
    from every major text/dedup/export query — not a crash inside a
    window, an aggregate fold, or a driver-side control loop."""
    import pathlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from video_etl_spark import registry

    registry.load_all()
    tmp_path = tmp_path_factory.mktemp("empty_corpus")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    import os

    for p in pathlib.Path("/root/testdata/sf0.001").iterdir():
        if p.name != "documents.parquet":
            if not (tmp_path / p.name).exists():
                os.symlink(p, tmp_path / p.name)

    df = registry.QUERIES[name](spark, str(tmp_path))
    assert df.count() == 0
    assert len(df.columns) > 0


def test_norm_storage_uri_and_generation_guard():
    """The generation-rotation guard must be URI-aware: hdfs/s3 paths
    run through os.path.abspath become cwd-relative strings that never
    prefix-match, silently bypassing the refusal the guard exists for."""
    import pytest

    from video_etl_spark.operators.io import (
        assert_new_generation,
        norm_storage_uri,
    )

    # default-port vs portless authority refer to the same namenode
    assert norm_storage_uri("hdfs://nn:8020/warehouse/gen0") == (
        norm_storage_uri("hdfs://nn/warehouse/gen0")
    )
    # s3 scheme aliases are one storage
    assert norm_storage_uri("s3a://bkt/idx") == norm_storage_uri("s3://bkt/idx")
    # local forms normalize together
    assert norm_storage_uri("file:/tmp/x/../x/gen0") == norm_storage_uri(
        "/tmp/x/gen0"
    )
    # different hosts stay distinct
    assert norm_storage_uri("hdfs://nn1/x") != norm_storage_uri("hdfs://nn2/x")
    # userinfo in the authority is NOT part of the storage identity
    # (s3a://key@bucket/x is the same bucket as s3a://bucket/x); a
    # manual netloc split kept 'key@bucket' together and the overlap
    # guards silently stopped matching
    assert norm_storage_uri("s3a://AKIA123@bkt/idx") == (
        norm_storage_uri("s3://bkt/idx")
    )
    # IPv6 without a port: '[::1]'.rsplit(':', 1) used to yield '[:'
    assert norm_storage_uri("hdfs://[::1]/x") == (
        norm_storage_uri("hdfs://[::1]:8020/x")
    )

    for target, inp in [
        ("hdfs://nn/warehouse/gen0", "hdfs://nn:8020/warehouse/gen0/part-0"),
        ("s3://bkt/idx", "s3a://bkt/idx/part-0.parquet"),
        ("/tmp/g0", "file:/tmp/g0/part-0.parquet"),
        ("/tmp/g0/sub", "/tmp/g0"),  # target INSIDE the input dir
    ]:
        with pytest.raises(ValueError, match="NEW generation"):
            assert_new_generation(target, [inp], "an input")

    # disjoint paths and disjoint storages pass
    assert_new_generation("/tmp/g1", ["file:/tmp/g0/part-0.parquet"], "x")
    assert_new_generation("hdfs://nn1/x", ["hdfs://nn2/x/part-0"], "x")


def test_write_bucketed_files_per_bucket_dial(spark, tmp_path):
    """files_per_bucket trades file count for write parallelism without
    losing the bucketing contract: k×n_buckets files land (partition p
    of the aligned shuffle holds only bucket p % n_buckets), appends add
    at most k files per bucket, and consumers keep the exchange-free
    bucketed scan."""
    import os

    from pyspark.sql import functions as F

    from video_etl_spark.operators.io import append_bucketed, write_bucketed

    def n_files(root):
        return sum(
            1 for _, _, fs in os.walk(root)
            for f in fs if f.endswith(".parquet")
        )

    df = spark.range(0, 20000).select(
        F.col("id"), (F.col("id") % 997).cast("string").alias("k")
    )
    try:
        write_bucketed(
            df, "t_fpb", str(tmp_path / "fpb"), ["k"], n_buckets=8,
            files_per_bucket=2,
        )
        assert n_files(str(tmp_path / "fpb")) == 16
        append_bucketed(
            spark.range(20000, 40000).select(
                F.col("id"), (F.col("id") % 997).cast("string").alias("k")
            ),
            "t_fpb",
            files_per_bucket=2,
        )
        assert n_files(str(tmp_path / "fpb")) == 32
        t = spark.table("t_fpb")
        assert t.count() == 40000
        agg = t.groupBy("k").count()
        agg.count()
        plan = (
            agg._jdf.queryExecution().executedPlan().toString()
        ).split("== Initial Plan ==")[0]
        assert "Bucketed: true" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_fpb")


def test_local_frame_one_partition_and_values(spark):
    """session.local_frame: bounded driver rows come back as a ONE-
    partition frame (parallelism-many tasks only add Python round-trips
    per consumer action) with rows and schema identical to the default
    createDataFrame path, including empty input."""
    from video_etl_spark.session import local_frame

    rows = [(i, f"s{i}", float(i) / 7) for i in range(257)]
    schema = "a long, b string, c double"
    lf = local_frame(spark, rows, schema)
    ref = spark.createDataFrame(rows, schema)
    assert lf.rdd.getNumPartitions() == 1
    assert lf.schema == ref.schema
    assert lf.collect() == ref.collect()  # collect order preserved too
    empty = local_frame(spark, [], schema)
    assert empty.rdd.getNumPartitions() <= 1
    assert empty.count() == 0
    assert empty.schema == ref.schema


def test_cross_source_totals_guard_raises_past_bound(spark, monkeypatch):
    """Round-16 cardinality guard: the driver-collected per-source
    totals assume domain-grain sources; past the documented bound the
    query must raise loudly instead of collecting unbounded rows."""
    import pytest

    from video_etl_spark.queries import text as qt

    monkeypatch.setattr(qt, "_CROSS_SOURCE_MAX_SOURCES", 1)
    with pytest.raises(RuntimeError, match="distinct sources"):
        qt.cross_source_contamination(spark, "/root/testdata/sf0.001")


def test_cross_source_totals_guard_passes_at_domain_grain(spark):
    """Within the bound the guard is invisible: same rows as the oracle
    pins every round (smoke: non-empty, schema intact)."""
    from video_etl_spark.queries import text as qt

    out = qt.cross_source_contamination(spark, "/root/testdata/sf0.001")
    assert out.columns == [
        "source_a", "source_b", "n_shared_spans", "overlap_ppm"
    ]
    assert out.count() > 0


def test_bench_compact_line_carries_full_query_map():
    """Round-16 (r15-verdict #7): PERF_r15.per_query came back EMPTY
    because the chunk lines only ever fit ~38/58 queries into the
    driver's exactly-2000-char tail.  The final line now carries the
    FULL per-query map at 2-decimal resolution and must (a) stay inside
    the budget with realistic bench-scale values, (b) parse with every
    headline name present, and (c) degrade GRACEFULLY — shedding
    advisory fields, then the map — when values widen, never emitting
    an over-budget (= front-torn, unparseable) line."""
    import json

    import bench

    compact = {
        "metric": "headline_queries_total", "value": 53.7777,
        "value_min": 49.8921, "unit": "sec", "sf": 0.1, "n_queries": 58,
        "io_cold": False, "jitter_flagged": [],
        "control_ratio_start": 1.5421, "control_ratio_mid": 0.9158,
        "control_ratio_end": 0.7139, "control_ratio": 1.2289,
        "degraded_during_run": False, "start_elevated": True,
        "mid_elevated": False, "repin_recommended": True,
        "value_normalized": 43.7608,
        "full_artifact": "BENCH_FULL_latest.json",
    }
    # realistic widths: sf0.1 headline queries run 0.1-9.9 s
    timings = {n: 2.6423 for n in bench.HEADLINE}
    timings["dedup_connected_clusters@index"] = 0.1039
    timings["cluster_aware_split@index"] = 0.3006
    line = bench.compact_line(compact, timings)
    assert len(line) <= bench._COMPACT_LINE_BUDGET
    d = json.loads(line)
    assert set(d["queries"]) == set(timings)
    assert d["queries"]["dedup_connected_clusters@index"] == 0.1
    # the core driver contract survives every shed tier
    for k in ("metric", "value", "value_min", "unit", "sf",
              "control_ratio", "repin_recommended", "value_normalized"):
        assert k in d, k

    # pathological widths (every query >100 s): the map itself cannot
    # fit, so it sheds LAST and the line falls back to the pre-r16 shape
    wide = {n: 999.1234 for n in timings}
    line2 = bench.compact_line(compact, wide)
    assert len(line2) <= bench._COMPACT_LINE_BUDGET
    d2 = json.loads(line2)
    assert "queries" not in d2
    assert d2["value"] == compact["value"]
