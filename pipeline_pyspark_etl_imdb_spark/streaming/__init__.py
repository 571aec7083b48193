from pipeline_pyspark_etl_imdb_spark.streaming.ops import (
    click_purchase_join_stream,
    read_events_stream,
    run_available_now,
    sessionize_stream,
    sliding_kpi_stream,
    stream_dedup,
    stream_to_parquet,
    tumbling_kpi_stream,
    user_running_totals_stream,
)

__all__ = [
    "click_purchase_join_stream",
    "read_events_stream",
    "run_available_now",
    "sessionize_stream",
    "sliding_kpi_stream",
    "stream_dedup",
    "stream_to_parquet",
    "tumbling_kpi_stream",
    "user_running_totals_stream",
]
