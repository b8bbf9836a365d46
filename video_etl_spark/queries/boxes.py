"""Bounding-box / detection-geometry queries (SURVEY.md J1, P5/P6/P9).

The driver's test tables carry no pixel data, so boxes are *derived
deterministically* from the `part` table (integer arithmetic — identical in
both engines), mirroring the shapes of the reference's detection records
(D4, `workloads/transMOT/object_detection.py:10`): a "frame" is a `p_brand`
group, a box is (x0, y0, x1, y1) with integer coords.

* ``iou_pairs`` is the pairwise-IoU edge matrix (J1,
  `object_detection.py:51-63`; vectorized form `sort.py:47-63`) as a
  per-frame self-join — at scale this shuffles once on the frame key and
  computes IoU JVM-side, no Python.
* ``bbox_transforms`` covers clamp/derive (P6 `object_detection.py:21-36`),
  format conversion [x0,y0,x1,y1] → [cx,cy,s,r] (P9 `sort.py:66-91`), and
  coordinate remap (P5 `covid_workload.py:74-81`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from video_etl_spark.registry import query
from video_etl_spark.session import load_table

# Deterministic synthetic boxes from `part` (integer math only).
_DUCK_BOXES = """
    SELECT p_partkey AS box_id, p_brand AS frame,
           CAST(p_partkey % 50 AS DOUBLE) AS x0,
           CAST((p_partkey * 7) % 40 AS DOUBLE) AS y0,
           CAST(p_partkey % 50 + 5 + p_partkey % 13 AS DOUBLE) AS x1,
           CAST((p_partkey * 7) % 40 + 3 + p_partkey % 11 AS DOUBLE) AS y1
    FROM part
"""


def _spark_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("box_id"),
        F.col("p_brand").alias("frame"),
        (F.col("p_partkey") % 50).cast("double").alias("x0"),
        ((F.col("p_partkey") * 7) % 40).cast("double").alias("y0"),
        (F.col("p_partkey") % 50 + 5 + F.col("p_partkey") % 13)
        .cast("double")
        .alias("x1"),
        ((F.col("p_partkey") * 7) % 40 + 3 + F.col("p_partkey") % 11)
        .cast("double")
        .alias("y1"),
    )


# --------------------------------------------------------------------------
# J1 — pairwise IoU edges within a frame (per-frame self-join).
@query(
    "iou_pairs",
    oracle=f"""
    WITH boxes AS ({_DUCK_BOXES})
    SELECT a.box_id AS box_a, b.box_id AS box_b,
           CAST(greatest(least(a.x1, b.x1) - greatest(a.x0, b.x0), 0)
              * greatest(least(a.y1, b.y1) - greatest(a.y0, b.y0), 0) AS DOUBLE)
           / ((a.x1 - a.x0) * (a.y1 - a.y0) + (b.x1 - b.x0) * (b.y1 - b.y0)
              - greatest(least(a.x1, b.x1) - greatest(a.x0, b.x0), 0)
              * greatest(least(a.y1, b.y1) - greatest(a.y0, b.y0), 0)) AS iou
    FROM boxes a JOIN boxes b ON a.frame = b.frame AND a.box_id < b.box_id
    WHERE greatest(least(a.x1, b.x1) - greatest(a.x0, b.x0), 0)
        * greatest(least(a.y1, b.y1) - greatest(a.y0, b.y0), 0) > 0
    """,
)
def iou_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _iou_pairs_with_frame(spark, sf_dir).select("box_a", "box_b", "iou")


def _iou_pairs_with_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(frame, box_a, box_b, iou) pair edges.  The streamed side is
    round-robin repartitioned before the join: the `part` scan is a single
    task at bench scale and a broadcast join would inherit it, leaving the
    quadratic IoU stage single-threaded.  At cluster scale the frame-key
    count grows with data (per-frame box counts stay bounded), so the SMJ
    fallback AQE picks there is skew-free without salting."""
    boxes = _spark_boxes(spark, sf_dir)
    a = boxes.select(
        F.col("box_id").alias("box_a"), F.col("frame"),
        F.col("x0").alias("ax0"), F.col("y0").alias("ay0"),
        F.col("x1").alias("ax1"), F.col("y1").alias("ay1"),
    ).repartition(64)
    b = boxes.select(
        F.col("box_id").alias("box_b"), F.col("frame").alias("frame_b"),
        F.col("x0").alias("bx0"), F.col("y0").alias("by0"),
        F.col("x1").alias("bx1"), F.col("y1").alias("by1"),
    )
    ix = F.greatest(F.least("ax1", "bx1") - F.greatest("ax0", "bx0"), F.lit(0.0))
    iy = F.greatest(F.least("ay1", "by1") - F.greatest("ay0", "by0"), F.lit(0.0))
    inter = ix * iy
    area_a = (F.col("ax1") - F.col("ax0")) * (F.col("ay1") - F.col("ay0"))
    area_b = (F.col("bx1") - F.col("bx0")) * (F.col("by1") - F.col("by0"))
    return (
        a.join(b, (F.col("frame") == F.col("frame_b")) & (F.col("box_a") < F.col("box_b")))
        .withColumn("iou", inter / (area_a + area_b - inter))
        .filter(inter > 0)
        .select("frame", "box_a", "box_b", "iou")
    )


# --------------------------------------------------------------------------
# P5/P6/P9 — clamp to bounds, tile-coordinate remap, center-format convert.
@query(
    "bbox_transforms",
    oracle=f"""
    WITH boxes AS ({_DUCK_BOXES})
    SELECT box_id, frame,
           greatest(x0, 0) AS x0c,
           greatest(y0, 0) AS y0c,
           least(x1, 64) AS x1c,
           least(y1, 48) AS y1c,
           (greatest(x0, 0) + least(x1, 64)) / 2 AS cx,
           (greatest(y0, 0) + least(y1, 48)) / 2 AS cy,
           (least(x1, 64) - greatest(x0, 0)) * (least(y1, 48) - greatest(y0, 0)) AS s,
           (least(x1, 64) - greatest(x0, 0)) / (least(y1, 48) - greatest(y0, 0)) AS r,
           x0 + 64 AS gx0,
           y0 + 48 AS gy0
    FROM boxes
    """,
)
def bbox_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    boxes = _spark_boxes(spark, sf_dir)
    x0c = F.greatest("x0", F.lit(0.0))
    y0c = F.greatest("y0", F.lit(0.0))
    x1c = F.least("x1", F.lit(64.0))
    y1c = F.least("y1", F.lit(48.0))
    w = x1c - x0c
    h = y1c - y0c
    return boxes.select(
        "box_id",
        "frame",
        x0c.alias("x0c"),
        y0c.alias("y0c"),
        x1c.alias("x1c"),
        y1c.alias("y1c"),
        ((x0c + x1c) / 2).alias("cx"),
        ((y0c + y1c) / 2).alias("cy"),
        (w * h).alias("s"),
        (w / h).alias("r"),
        (F.col("x0") + 64).alias("gx0"),
        (F.col("y0") + 48).alias("gy0"),
    )


# --------------------------------------------------------------------------
# J1+A1 — per-frame IoU edge statistics: the same per-frame self-join as
# iou_pairs but reduced to per-frame aggregates (the shape a tracker
# actually consumes; also the bench headliner — output stays tiny while the
# full O(n²/frame) join still executes).  IoU sums are quantized to 1e-6
# units so the aggregation is order-independent across engines.
@query(
    "iou_edge_stats",
    oracle=f"""
    WITH boxes AS ({_DUCK_BOXES}),
    pairs AS (
      SELECT a.frame,
             CAST(greatest(least(a.x1, b.x1) - greatest(a.x0, b.x0), 0)
                * greatest(least(a.y1, b.y1) - greatest(a.y0, b.y0), 0) AS DOUBLE)
             / ((a.x1 - a.x0) * (a.y1 - a.y0) + (b.x1 - b.x0) * (b.y1 - b.y0)
                - greatest(least(a.x1, b.x1) - greatest(a.x0, b.x0), 0)
                * greatest(least(a.y1, b.y1) - greatest(a.y0, b.y0), 0)) AS iou
      FROM boxes a JOIN boxes b ON a.frame = b.frame AND a.box_id < b.box_id
      WHERE greatest(least(a.x1, b.x1) - greatest(a.x0, b.x0), 0)
          * greatest(least(a.y1, b.y1) - greatest(a.y0, b.y0), 0) > 0)
    SELECT frame,
           count(*) AS n_edges,
           CAST(CAST(sum(CAST(round(iou * 1000000) AS BIGINT)) AS DOUBLE)
                / (count(*) * 1000000) AS DOUBLE) AS avg_iou
    FROM pairs GROUP BY frame
    """,
)
def iou_edge_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # frame travels with the pair edges (the pair join already keyed on
    # it) — no join back to boxes to recover it.
    return (
        _iou_pairs_with_frame(spark, sf_dir)
        .groupBy("frame")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            (
                F.sum(F.round(F.col("iou") * 1_000_000).cast("long"))
                / (F.count(F.lit(1)) * 1_000_000)
            ).cast("double").alias("avg_iou"),
        )
    )


# --------------------------------------------------------------------------
# P4 — tiling projection: slice each frame into r×c ROI tiles via explode
# (`covid_workload.py:16-36`'s tile loop as a generate-and-explode, plus the
# P5 tile→global coordinate remap).
@query(
    "tile_explode",
    oracle="""
    WITH frames AS (
      SELECT DISTINCT p_brand AS frame FROM part),
    tiles AS (
      SELECT frame, r.r AS tile_row, c.c AS tile_col
      FROM frames,
           (SELECT unnest(generate_series(0, 1)) AS r) r,
           (SELECT unnest(generate_series(0, 1)) AS c) c)
    SELECT frame,
           CAST(tile_row AS BIGINT) AS tile_row,
           CAST(tile_col AS BIGINT) AS tile_col,
           CAST(tile_col * 640 AS DOUBLE) AS tx0,
           CAST(tile_row * 360 AS DOUBLE) AS ty0,
           CAST(tile_col * 640 + 640 AS DOUBLE) AS tx1,
           CAST(tile_row * 360 + 360 AS DOUBLE) AS ty1
    FROM tiles
    """,
)
def tile_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = load_table(spark, sf_dir, "part").select(
        F.col("p_brand").alias("frame")
    ).distinct()
    tiled = frames.select(
        "frame",
        F.explode(F.sequence(F.lit(0), F.lit(1))).alias("tile_row"),
    ).select(
        "frame",
        "tile_row",
        F.explode(F.sequence(F.lit(0), F.lit(1))).alias("tile_col"),
    )
    return tiled.select(
        "frame",
        F.col("tile_row").cast("long").alias("tile_row"),
        F.col("tile_col").cast("long").alias("tile_col"),
        (F.col("tile_col") * 640).cast("double").alias("tx0"),
        (F.col("tile_row") * 360).cast("double").alias("ty0"),
        (F.col("tile_col") * 640 + 640).cast("double").alias("tx1"),
        (F.col("tile_row") * 360 + 360).cast("double").alias("ty1"),
    )
