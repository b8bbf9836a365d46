"""Streaming nearest-centroid classification (SURVEY §2.8 ⊕ U14/U22 — the
serving twin of ``queries.vectors.kmeans_lloyd_embeddings``).

The batch side trains centroids (Lloyd iterations); serving assigns every
arriving embedding to its nearest centroid — topic routing, IVF cell
assignment for streaming ANN ingest, or the reference's per-chunk content
classification (``knob_switcher.py:88``) generalized to embeddings.

The key design point is that assignment needs NO aggregation: the K
centroids are control-plane data (K × dim integers), so they fold into the
projection as literal arrays and the per-row argmin is a pure column
expression — the stream runs stateless in append mode with no shuffle, no
state store, and no watermark.  The same expression applied to a batch
frame is the equivalence check (and matches the groupBy-argmin the batch
KMeans query uses, same (dist, center_id) tiebreak).

Scale posture: centroids are collected ONCE onto the driver (bounded —
loud raise beyond ``MAX_CENTERS``, the same discipline as the similarity
module's bounded collects) and ship inside the serialized plan; per-row
cost is K quantized-distance evaluations, embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: refuse to inline an unboundedly large centroid set into the plan — at
#: this size the caller wants the join-based batch assignment instead.
MAX_CENTERS = 4096


def center_literals(centers: DataFrame) -> list[tuple[int, list[int]]]:
    """Collect a (center_id, c: array<bigint>) frame into plan literals,
    ordered by center_id (the argmin tiebreak order).  Raises if the
    centroid set is too large to broadcast as literals."""
    # limit+1 collect: ONE job both fetches the literals and proves the
    # bound (a separate count() would re-run the centroid plan — for
    # kmeans-derived centers that is the full training aggregation)
    rows = centers.select("center_id", "c").limit(MAX_CENTERS + 1).collect()
    if len(rows) > MAX_CENTERS:
        raise ValueError(
            f">{MAX_CENTERS} centroids exceed MAX_CENTERS={MAX_CENTERS}; "
            "use the join-based batch assignment for centroid sets this "
            "large (they are no longer control-plane data)"
        )
    return sorted((int(r["center_id"]), list(r["c"])) for r in rows)


def nearest_center_col(
    lits: list[tuple[int, list[int]]], q_col: str = "q"
) -> Column:
    """Pure column expression: the center_id (among ``lits``) minimizing
    squared distance to the BIGINT-quantized embedding in ``q_col``; ties
    break to the smallest center_id (lits are sorted).

    array_position finds the FIRST index matching the minimum, which is
    the lowest center_id — identical semantics to the batch
    min(struct(dist, center_id)) argmin.
    """
    dists = []
    for _, c in lits:
        arr = ", ".join(str(v) for v in c)
        dists.append(
            f"aggregate(zip_with({q_col}, array({arr}), "
            "(x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"
        )
    darr = "array(" + ", ".join(dists) + ")"
    ids = ", ".join(str(cid) for cid, _ in lits)
    return F.expr(
        f"element_at(array({ids}), "
        f"cast(array_position({darr}, array_min({darr})) as int))"
    ).cast("long")


def quantize_embedding(df: DataFrame, col: str = "embedding") -> DataFrame:
    """Attach the 1e6-unit BIGINT quantization column ``q`` (the same
    convention as queries/vectors.py)."""
    return df.withColumn(
        "q",
        F.expr(
            f"transform({col}, x -> "
            "cast(round(cast(x as double) * 1000000) as bigint))"
        ),
    )


def classify_stream(
    stream: DataFrame, centers: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Assign each embedding in a (vec_id, embedding) STREAM (or batch
    frame — the expression is mode-agnostic) to its nearest centroid.

    Returns (id_col, center_id) in append mode: stateless, no shuffle —
    the physical plan is scan → project.
    """
    lits = center_literals(centers)
    return quantize_embedding(stream).select(
        id_col, nearest_center_col(lits).alias("center_id")
    )
