"""Structured Streaming surface.

The reference is batch-per-file with idempotent re-runs (SURVEY.md
§2.10: no streaming anywhere); its natural Spark-first upgrade is a
file-source stream with ``Trigger.AvailableNow`` — same per-batch
semantics, incremental file discovery, exactly-once via checkpoint +
the SCD2 merge's own idempotency key. That is what this module does:

  * :func:`windowed_event_agg` — tumbling-window counts/sums with a
    watermark for late data (the streaming twin of the batch
    ``stream_window_agg`` query in plans/llm_ops.py).
  * :func:`scd2_stream` — streaming SCD2 ingestion: each micro-batch of
    newly-arrived files runs through the same ``run_scd2_batch`` as the
    batch pipeline (``foreachBatch``), so batch and streaming ingestion
    are literally one code path.

Scale: file-source streams list only new files per trigger; the window
agg carries watermark-bounded state in the state store (RocksDB on a
real cluster); SCD2 merge cost stays ∝ batch size, as in batch mode.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from delta_lake_pyspark_scd2_spark.pipeline.scd2_pipeline import (
    SCD2Spec,
    run_scd2_batch,
)

#: Schema of the driver's events table with a proper timestamp column
#: (file-source streams require an explicit schema).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_event_agg(
    spark: SparkSession,
    source_dir: str,
    *,
    schema: T.StructType = EVENTS_SCHEMA,
    ts_col: str = "ts",
    group_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming tumbling-window aggregation with late-data watermark.

    Append output mode emits a window only once its end passes the
    watermark — finalized, exactly-once rows (late rows inside the
    watermark still count; later ones are dropped, by contract).
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast(T.DecimalType(18, 2))), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), group_col, "n", "sum_value")
    )


def run_stream_once(
    sdf: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    output_mode: str = "append",
) -> StreamingQuery:
    """Drain everything currently available to a parquet sink and stop
    (``Trigger.AvailableNow`` — incremental, checkpointed, restartable).
    """
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def scd2_stream(
    spark: SparkSession,
    spec: SCD2Spec,
    source_dir: str,
    table_path: str,
    checkpoint_dir: str,
    *,
    schema: T.StructType = EVENTS_SCHEMA,
    on_batch: Callable[[int, dict], None] | None = None,
) -> StreamingQuery:
    """Streaming SCD2 ingestion: new files under ``source_dir`` flow
    through :func:`run_scd2_batch` per micro-batch (foreachBatch).

    Exactly-once story: the checkpoint makes file discovery incremental
    and replay-safe, and the merge's ``(key, valid_from)`` idempotency
    key makes a replayed micro-batch a no-op — the same guarantee the
    reference gets from Phase B (src/header_etl.py:247-280), now under
    streaming restarts.
    """

    def _process(batch_df: DataFrame, batch_no: int) -> None:
        if not batch_df.isEmpty():
            m = run_scd2_batch(
                spark, spec, batch_df, table_path, batch_id=f"stream-{batch_no}"
            )
            if on_batch is not None:
                on_batch(batch_no, m)

    q = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
