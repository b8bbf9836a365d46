from video_etl_spark.streaming.pipeline import (  # noqa: F401
    chunk_aggregates,
    events_stream,
    run_switch_loop,
)
