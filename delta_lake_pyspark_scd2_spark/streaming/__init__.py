from delta_lake_pyspark_scd2_spark.streaming.stream_jobs import (
    corpus_ingest_stream,
    bloom_stream,
    count_min_stream,
    drift_monitor_stream,
    histogram_stream,
    kmeans_model_stream,
    length_drift_stream,
    run_stream_once,
    scd2_stream,
    semantic_index_stream,
    windowed_event_agg,
)

__all__ = [
    "corpus_ingest_stream",
    "bloom_stream",
    "count_min_stream",
    "drift_monitor_stream",
    "histogram_stream",
    "kmeans_model_stream",
    "length_drift_stream",
    "run_stream_once",
    "scd2_stream",
    "semantic_index_stream",
    "windowed_event_agg",
]
