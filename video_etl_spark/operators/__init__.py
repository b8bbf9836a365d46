from video_etl_spark.operators.temporal import (  # noqa: F401
    fill_forward,
    merge_asof,
    sessionize,
)
