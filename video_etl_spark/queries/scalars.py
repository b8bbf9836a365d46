"""Scalar-function-family queries completing SURVEY.md §2.7: JSON/map
access, array/higher-order functions, and homography projection (P12).

* json_functions — the Map/JSON family (`main.py:46-51`,
  `knob_switcher.py:14-31` config-dict lookups): extract typed values from
  the `events.props` JSON column.
* array_functions — the Array/matrix family (`lflstm.py:31-33` pad,
  `data_prepare.py:24-39` square-pad, O7 truncation `lflstm.py:48-53`):
  slice / flatten / array_repeat / reverse over quantized embeddings.
* homography_project — P12 (`covid_measures.py:239-244`,
  `calibrate_camera.py:125-142`): image→world plane projection through a
  fixed 3×3 DLT matrix, as pure column arithmetic (the matrix is tiny and
  broadcast-inlined; no UDF needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from video_etl_spark.registry import query
from video_etl_spark.session import load_table

_QUANT = (
    "transform(embedding, x -> cast(round(cast(x as double) * 1000000) as bigint))"
)
_DUCK_QUANT = (
    "[CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) FOR x IN embedding]"
)


# --------------------------------------------------------------------------
# §2.7 Map/JSON — typed extraction from the props JSON column.
@query(
    "json_functions",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) >= 50
                THEN 'high' ELSE 'low' END AS k_band
    FROM events
    """,
)
def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id",
        k.alias("k_value"),
        (k % 10).alias("k_mod"),
        F.when(k >= 50, "high").otherwise("low").alias("k_band"),
    )


# --------------------------------------------------------------------------
# §2.7 Array — slice (O7 truncation), flatten, repeat, reverse; exact on
# quantized ints.
@query(
    "array_functions",
    oracle=f"""
    WITH q AS (SELECT vec_id, {_DUCK_QUANT} AS qv FROM embeddings)
    SELECT vec_id,
           CAST(len(qv[1:8]) AS BIGINT) AS head_len,
           CAST(list_sum(qv[1:8]) AS BIGINT) AS head_sum,
           CAST(len(flatten([qv[1:2], qv[1:2], qv[1:2]])) AS BIGINT) AS repeat_len,
           qv[1] AS first_q,
           list_reverse(qv)[1] AS last_q
    FROM q
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").withColumn("qv", F.expr(_QUANT))
    return emb.select(
        "vec_id",
        F.size(F.slice("qv", 1, 8)).cast("long").alias("head_len"),
        F.expr(
            "aggregate(slice(qv, 1, 8), 0L, (acc, v) -> acc + v)"
        ).alias("head_sum"),
        F.size(F.flatten(F.array_repeat(F.slice("qv", 1, 2), 3))).cast("long").alias(
            "repeat_len"
        ),
        F.element_at("qv", 1).alias("first_q"),
        F.element_at(F.reverse("qv"), 1).alias("last_q"),
    )


# --------------------------------------------------------------------------
# P12 — homography projection through a fixed DLT matrix (column math).
_P = (
    (0.8, 0.05, 12.0),
    (-0.02, 1.1, 3.0),
    (0.0005, 0.0002, 1.0),
)


@query(
    "homography_project",
    oracle=f"""
    WITH pts AS (
      SELECT p_partkey AS pt_id,
             CAST(p_partkey % 1280 AS DOUBLE) AS px,
             CAST((p_partkey * 3) % 720 AS DOUBLE) AS py
      FROM part)
    SELECT pt_id,
           ({_P[0][0]} * px + {_P[0][1]} * py + {_P[0][2]})
             / ({_P[2][0]} * px + {_P[2][1]} * py + {_P[2][2]}) AS wx,
           ({_P[1][0]} * px + {_P[1][1]} * py + {_P[1][2]})
             / ({_P[2][0]} * px + {_P[2][1]} * py + {_P[2][2]}) AS wy
    FROM pts
    """,
)
def homography_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    px = (F.col("p_partkey") % 1280).cast("double")
    py = ((F.col("p_partkey") * 3) % 720).cast("double")
    denom = _P[2][0] * px + _P[2][1] * py + _P[2][2]
    return part.select(
        F.col("p_partkey").alias("pt_id"),
        ((_P[0][0] * px + _P[0][1] * py + _P[0][2]) / denom).alias("wx"),
        ((_P[1][0] * px + _P[1][1] * py + _P[1][2]) / denom).alias("wy"),
    )
