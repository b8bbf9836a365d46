"""Content-category fitting via Spark ML KMeans (SURVEY.md U14/D7;
reference `knob_plan.py:280-281`, paper §3.2).

The reference clusters per-chunk quality vectors into |C| content
categories with sklearn KMeans and classifies online by nearest center
(Eq. 5).  Here the fit runs as a Spark ML job over a DataFrame of quality
vectors (scales to the full profiling history), and the resulting centers
feed the driver-side switcher (control/switcher.py) and the
`classify_nearest_center` query.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector, vector_to_array

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_categories(
    scores: DataFrame,
    k: int,
    vec_col: str = "scores",
    seed: int = 42,
) -> list[list[float]]:
    """Fit |C|=k category centers over an array<double> quality column.

    Returns centers sorted by first component (deterministic ordering for
    downstream tables)."""
    assembled = scores.select(array_to_vector(F.col(vec_col)).alias("features"))
    model = KMeans(k=k, seed=seed).fit(assembled)
    centers = sorted([list(map(float, c)) for c in model.clusterCenters()])
    return centers


def assign_categories(
    scores: DataFrame, centers: list[list[float]], vec_col: str = "scores"
) -> DataFrame:
    """Nearest-center assignment (Eq. 5 over full vectors) as a JVM-side
    expression — no UDF: squared distance via aggregate+zip_with, argmin via
    array_position."""
    dims = len(centers[0])
    dist_cols = []
    for i, center in enumerate(centers):
        lit_center = F.array(*[F.lit(float(x)) for x in center])
        dist_cols.append(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col), lit_center, lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias(f"d{i}")
        )
    with_d = scores.select("*", *dist_cols)
    d_arr = F.array(*[F.col(f"d{i}") for i in range(len(centers))])
    return with_d.withColumn(
        "category",
        (F.array_position(d_arr, F.array_min(d_arr)) - 1).cast("int"),
    ).drop(*[f"d{i}" for i in range(len(centers))])
