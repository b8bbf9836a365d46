from video_etl_spark.functions.parity import (  # noqa: F401
    hash60,
    hash60_sql,
    money_avg,
    money_avg_sql,
    money_sum,
    money_sum_sql,
)
