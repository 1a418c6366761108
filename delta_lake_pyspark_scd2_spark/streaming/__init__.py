from delta_lake_pyspark_scd2_spark.streaming.stream_jobs import (
    run_stream_once,
    scd2_stream,
    windowed_event_agg,
)

__all__ = ["run_stream_once", "scd2_stream", "windowed_event_agg"]
