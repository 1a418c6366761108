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

from collections.abc import Sequence
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from delta_lake_pyspark_scd2_spark.pipeline.scd2_pipeline import (
    SCD2Spec,
    run_scd2_batch,
)

def _txn_reset_guard(table, app_id: str, batch_no: int, what: str) -> None:
    """Fail loud when a stream checkpoint was reset against a sink
    that kept its transaction watermark.

    A crash replay legitimately redelivers ``batch_no == watermark``
    (the txn itself skips it, or it lands once across a commit race),
    but ``batch_no < watermark`` means the CHECKPOINT restarted while
    the sink kept folding — silently skipping would drop every delta
    the old run applied after the replayed id, and re-applying would
    double-fold. Shared by every maintainer whose fold is not
    idempotent (aggregate deltas, sketch counters); a fix to this
    semantics lands once, here.
    """
    last = table.last_txn_version(app_id)
    if last is not None and batch_no < last:
        raise RuntimeError(
            f"stream checkpoint appears reset: batch {batch_no} < "
            f"{what} txn watermark {last} for {app_id!r}; rebuild "
            f"the {what} table or restore the original checkpoint"
        )


def _run_foreach_stream(stream_df, checkpoint_dir: str, fold) -> StreamingQuery:
    """``foreachBatch`` + ``Trigger.AvailableNow`` run to completion —
    the shared sink wiring of every maintainer stream."""
    q = (
        stream_df.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


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


def enriched_stream(
    spark: SparkSession,
    source_dir: str,
    dim: DataFrame,
    *,
    schema: T.StructType = EVENTS_SCHEMA,
    on: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join — the most common streaming shape
    in practice: each micro-batch joins against a static (or
    slowly-refreshed) dimension. Stateless for the stream (no
    watermark needed, nothing accumulates): Spark re-plans the join
    per micro-batch, broadcasting the dim side when it is small — at
    100 TB/day of events the dim broadcast is what keeps enrichment a
    map-side operation instead of a per-batch shuffle.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return stream.join(F.broadcast(dim), on=on, how=how)


def deduped_stream(
    spark: SparkSession,
    source_dir: str,
    *,
    schema: T.StructType = EVENTS_SCHEMA,
    key_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exactly-once event dedup: ``dropDuplicates`` on the
    key with a watermark bounding the dedup state — duplicates arriving
    within the watermark are dropped; state for keys older than the
    watermark is evicted (bounded memory at any runtime length).
    The batch twin is a plain ``dropDuplicates``/`row_number`.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return stream.withWatermark(ts_col, watermark).dropDuplicates(
        [*key_cols, ts_col]
    )


def interval_joined_stream(
    spark: SparkSession,
    source_dir: str,
    *,
    schema: T.StructType = EVENTS_SCHEMA,
    left_type: str = "error",
    right_type: str = "click",
    lookback: str = "5 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream interval join — the streaming twin of
    the batch ``j9_range_join`` query: for each *error* event, the
    *click* events by the same user within the preceding ``lookback``.

    Both sides carry a watermark and the join has a time-range bound on
    the event-time columns, so the state store only retains each side
    for ``watermark + lookback`` — bounded state at any stream length
    (an unbounded stream-stream join would otherwise keep every row
    forever). Inner join ⇒ append mode emits each match exactly once.
    """
    errs = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .filter(F.col("event_type") == left_type)
        .select(
            F.col("event_id").alias("err_event_id"),
            F.col("user_id").alias("err_user_id"),
            F.col("ts").alias("err_ts"),
        )
        .withWatermark("err_ts", watermark)
    )
    clicks = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .filter(F.col("event_type") == right_type)
        .select(
            F.col("event_id").alias("click_event_id"),
            F.col("user_id").alias("click_user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    return errs.join(
        clicks,
        (F.col("err_user_id") == F.col("click_user_id"))
        & (F.col("click_ts") >= F.col("err_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("click_ts") <= F.col("err_ts")),
        "inner",
    ).select("err_event_id", "click_event_id", "err_user_id", "err_ts", "click_ts")


def sessionize_stream(
    spark: SparkSession,
    source_dir: str,
    *,
    schema: T.StructType = EVENTS_SCHEMA,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming gap-sessionization — a custom stateful operator via
    ``applyInPandasWithState`` (the batch twin is
    ``operators.sessions.sessionize``; same output schema).

    State per key = the open session (start/end/count). An incoming
    batch's events extend or close it; event-time timeout (watermark)
    flushes sessions no late event can reopen — state is bounded by
    (keys active inside the watermark), not history. A closed session is
    emitted exactly once (append semantics).
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start", T.LongType()),   # µs since epoch
            T.StructField("end", T.LongType()),
            T.StructField("count", T.LongType()),
        ]
    )
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        # normalize to µs regardless of the Arrow batch's time unit
        us = lambda s: s.astype("datetime64[us]").astype("int64")  # noqa: E731
        if state.hasTimedOut:
            start, end, cnt = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(end, unit="us")],
                    "n_events": [cnt],
                }
            )
            return
        times = []
        for pdf in pdf_iter:
            times.append(us(pdf[ts_col]))
        ts_all = pd.concat(times).sort_values().to_numpy()
        sessions = []  # closed sessions to emit
        if state.exists:
            start, end, cnt = state.get
        else:
            start = end = int(ts_all[0])
            cnt = 0
            ts_all = ts_all  # first event counted in loop
        for t in ts_all:
            t = int(t)
            if t - end > gap_us:
                sessions.append((start, end, cnt))
                start, end, cnt = t, t, 1
            else:
                end = max(end, t)
                cnt += 1
        state.update((start, end, cnt))
        # event-time timeout: fires once the watermark passes end + gap
        state.setTimeoutTimestamp(end // 1000 + gap_seconds * 1000)
        if sessions:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(sessions),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in sessions],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in sessions],
                    "n_events": [c for _, _, c in sessions],
                }
            )

    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def corpus_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    store_base: str,
    checkpoint_dir: str,
    *,
    schema: str = "doc_id long, text string",
    on_batch: Callable[[int, object], None] | None = None,
    app_id: str = "corpus_ingest",
    **ingest_opts,
) -> StreamingQuery:
    """Streaming corpus ingestion: new document files under
    ``source_dir`` flow through the incremental dedup pipeline
    (``pipeline.corpus_ingest.CorpusIngest``) per micro-batch.
    ``ingest_opts`` pass through to :class:`CorpusIngest` — the opt-in
    screens (``containment=True``, ``keep="best"``) work identically
    streaming and batch.

    The continuous twin of batch ingestion: each micro-batch is deduped
    exactly (in-batch + against the fingerprint store) before landing
    in the corpus table, so a crawler can stream its output straight
    into a training-ready corpus. Exactly-once story: checkpointed file
    discovery makes batch delivery replay-safe, and each table commit
    carries the ``(app_id, batch_no)`` writer transaction — a replayed
    micro-batch's append is skipped at the committed watermark (the
    Delta ``txnAppId``/``txnVersion`` handshake), even in the crash
    window where the corpus commit landed but the fingerprint commit
    did not.
    """
    from delta_lake_pyspark_scd2_spark.pipeline.corpus_ingest import CorpusIngest

    ingest = CorpusIngest(spark, store_base, **ingest_opts)

    def _process(batch_df: DataFrame, batch_no: int) -> None:
        if not batch_df.isEmpty():
            m = ingest.ingest(batch_df, txn=(app_id, batch_no))
            if on_batch is not None:
                on_batch(batch_no, m)

    return _run_foreach_stream(
        spark.readStream.schema(schema).json(source_dir),
        checkpoint_dir,
        _process,
    )


def count_min_stream(
    spark: SparkSession,
    source_dir: str,
    sketch_path: str,
    checkpoint_dir: str,
    *,
    schema: str = "doc_id long, text string",
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    app_id: str = "cms_maintain",
    on_batch: Callable[[int, dict], None] | None = None,
) -> StreamingQuery:
    """Streaming count-min sketch maintenance: document batches
    arriving under ``source_dir`` continuously fold into a persisted
    frequency sketch — the online twin of
    ``operators.sketches.count_min_build`` and the frequency-side
    companion of the HLL vocab stream, for pipelines that want
    token-frequency estimates WHILE ingesting (e.g. live stop-word /
    boilerplate-phrase detection over a crawl).

    Because the sketch is mergeable, each micro-batch is one bounded
    fold: tokens collapse map-side into the batch's vocab-sized count
    table, the batch sketch is at most ``depth × width`` cells, and the
    MERGE into the persisted sketch touches only those cells —
    per-batch table work is O(depth × width) regardless of batch size
    or corpus history.

    Exactly-once: counter ADDITION is not idempotent, so each fold's
    MERGE carries the ``(app_id, batch_no)`` writer transaction — a
    micro-batch replayed after a sink crash skips at the committed
    watermark instead of double-counting. A batch id BELOW the
    watermark means the stream checkpoint was reset against a sketch
    that kept folding; that cannot be repaired silently (the deltas in
    between are unknown), so it fails loud like the aggregate
    maintainer.
    """
    from delta_lake_pyspark_scd2_spark.operators import sketches
    from delta_lake_pyspark_scd2_spark.operators.text import word_counts
    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )

    geometry = {"cms.depth": str(depth), "cms.width": str(width)}
    if not VersionedParquetTable.is_table(sketch_path):
        VersionedParquetTable.create(
            spark,
            spark.createDataFrame([], "d INT, bucket BIGINT, cnt BIGINT"),
            sketch_path,
            properties=geometry,
        )

    def _fold(batch_df: DataFrame, batch_no: int) -> None:
        if batch_df.isEmpty():
            return
        sk = VersionedParquetTable(spark, sketch_path)
        # Geometry is part of the bucket layout: folding depth/width A
        # into a sketch built with B spreads an item's counts across
        # cells its probes never read, silently UNDER-estimating — the
        # one thing a count-min sketch must never do. The table pins
        # its geometry as properties at create time; a reconfigured
        # restart fails here instead. A table with NO geometry
        # properties (handed over from elsewhere) is unpinned: its
        # layout can't be verified either way, so the configured
        # geometry is adopted rather than bricking the stream.
        props = sk.properties()
        have = {k: props.get(k) for k in geometry}
        if any(v is not None for v in have.values()) and have != geometry:
            raise ValueError(
                f"sketch at {sketch_path} has geometry {have}, stream "
                f"is configured {geometry}: bucket layouts are "
                "incompatible; rebuild the sketch or match the config"
            )
        _txn_reset_guard(sk, app_id, batch_no, "sketch")
        counts = word_counts(batch_df, text_col)
        delta = sketches.count_min_build(
            counts, "word", "c", depth=depth, width=width
        ).withColumnRenamed("cnt", "__delta")
        merged = delta.join(
            sk.read().withColumnRenamed("cnt", "__cur"),
            ["d", "bucket"],
            "left",
        ).select(
            "d",
            "bucket",
            (F.coalesce(F.col("__cur"), F.lit(0)) + F.col("__delta"))
            .cast("long")
            .alias("cnt"),
        )
        m = sk.upsert(
            merged,
            ["d", "bucket"],
            operation="CMS_FOLD",
            txn=(app_id, batch_no),
        )
        if on_batch is not None:
            on_batch(batch_no, m)

    return _run_foreach_stream(
        spark.readStream.schema(schema).json(source_dir),
        checkpoint_dir,
        _fold,
    )


def drift_monitor_stream(
    spark: SparkSession,
    source_dir: str,
    counts_path: str,
    checkpoint_dir: str,
    *,
    schema: str = "doc_id long, text string, source string",
    group_col: str = "source",
    text_col: str = "text",
    app_id: str = "drift_maintain",
    on_batch: Callable[[int, list], None] | None = None,
) -> StreamingQuery:
    """Streaming distribution-drift monitoring: document batches fold
    into a persisted per-(slice, word) count table, and after each
    fold the per-slice KL(slice ‖ corpus) report is recomputed from
    it — drift scores that track the corpus WHILE it ingests, without
    ever re-tokenizing history.

    Per micro-batch work: one batch-sized token collapse (the shared
    :func:`operators.text.word_counts`, so the maintained table is
    bit-identical to what batch tokenization would build), one MERGE
    touching only the batch's (slice, word) keys, then the KL pass
    over the VOCABULARY-sized count table — corpus text is read
    exactly once, ever. Exactly-once like the other maintainers:
    counter addition is not idempotent, so folds carry the
    ``(app_id, batch_no)`` writer transaction and a reset checkpoint
    fails loud.

    ``on_batch(batch_no, rows)`` receives each post-fold KL report
    (``Row(group_col, n_tokens, kl_divergence)`` list, slice-count-
    sized) — the hook a monitoring sink alerts from.
    """
    from delta_lake_pyspark_scd2_spark.operators.text import (
        kl_from_word_counts,
        word_counts,
    )
    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )

    if not VersionedParquetTable.is_table(counts_path):
        VersionedParquetTable.create(
            spark,
            spark.createDataFrame(
                [], f"{group_col} STRING, word STRING, c BIGINT"
            ),
            counts_path,
        )

    def _fold(batch_df: DataFrame, batch_no: int) -> None:
        if batch_df.isEmpty():
            return
        tbl = VersionedParquetTable(spark, counts_path)
        _txn_reset_guard(tbl, app_id, batch_no, "counts")
        delta = word_counts(batch_df, text_col, group_col).withColumnRenamed(
            "c", "__delta"
        )
        merged = delta.join(
            tbl.read().withColumnRenamed("c", "__cur"),
            [group_col, "word"],
            "left",
        ).select(
            group_col,
            "word",
            (F.coalesce(F.col("__cur"), F.lit(0)) + F.col("__delta"))
            .cast("long")
            .alias("c"),
        )
        tbl.upsert(
            merged,
            [group_col, "word"],
            operation="DRIFT_FOLD",
            txn=(app_id, batch_no),
        )
        if on_batch is not None:
            on_batch(
                batch_no,
                kl_from_word_counts(tbl.read(), group_col).collect(),
            )

    return _run_foreach_stream(
        spark.readStream.schema(schema).json(source_dir),
        checkpoint_dir,
        _fold,
    )


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

    return _run_foreach_stream(
        spark.readStream.schema(schema).parquet(source_dir),
        checkpoint_dir,
        _process,
    )


def vtable_sink_stream(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    *,
    partition_cols: Sequence[str] | None = None,
    app_id: str | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Generic exactly-once streaming sink into a
    :class:`VersionedParquetTable` — the ``.writeStream.format
    ("delta")`` analogue, built from ``foreachBatch`` + writer
    transactions.

    Exactly-once: Spark's checkpoint replays a failed micro-batch with
    the SAME batch id, and the append carries ``(app_id, batch_id)``
    as a writer transaction — the table skips any batch at or below
    its committed watermark, so replays land nothing twice even if the
    sink crashed between Spark's commit log and the table commit (the
    textbook foreachBatch double-write window).

    Scale: each micro-batch is one blind append (no read-modify-write);
    auto-compaction (table property ``autoCompact``) keeps the
    small-file accumulation of high-frequency triggers bounded.
    """
    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )

    app = app_id or f"vtable_sink:{table_path}"
    spark = stream_df.sparkSession
    pc = list(partition_cols or [])

    def _process(batch_df: DataFrame, batch_no: int) -> None:
        if batch_df.isEmpty():
            return
        if VersionedParquetTable.is_table(table_path):
            VersionedParquetTable(spark, table_path).append(
                batch_df, txn=(app, batch_no)
            )
        else:
            VersionedParquetTable.create(
                spark, batch_df, table_path,
                partition_cols=pc, txn=(app, batch_no),
            )

    w = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    q = w.start()
    if trigger_available_now:
        q.awaitTermination()
    return q


def maintain_aggregate_stream(
    spark,
    src_path: str,
    agg_path: str,
    checkpoint_dir: str,
    *,
    key_cols: Sequence[str],
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n",
) -> StreamingQuery:
    """Streaming materialized-view maintenance — the continuous twin of
    ``operators.incremental``: the base table's CDC stream feeds a
    signed-delta fold per micro-batch, so the aggregate table tracks
    the base with change-volume-proportional work, forever.

    Exactly-once end to end: the stream checkpoint replays a failed
    micro-batch with the same batch id, and the fold's MERGE carries
    ``(app_id, batch_id)`` as a writer transaction — a replayed batch
    is skipped before any work (or lands once across a commit race),
    so no delta is ever double-applied. That matters more here than
    for an append sink: double-applying a signed delta CORRUPTS the
    aggregate rather than duplicating a row.

    Scale: each micro-batch touches only changed rows (executor-
    parallel CDC file reads) and rewrites only aggregate partitions
    holding changed groups.
    """
    from delta_lake_pyspark_scd2_spark.operators.incremental import (
        apply_change_rows,
    )
    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )
    from delta_lake_pyspark_scd2_spark.sources.vtable_stream import (
        VTableChangesDataSource,
    )

    spark.dataSource.register(VTableChangesDataSource)
    app = f"agg_maintain:{agg_path}"

    def _fold(batch_df, batch_no: int) -> None:
        if batch_df.isEmpty():
            return
        agg = VersionedParquetTable(spark, agg_path)
        _txn_reset_guard(agg, app, batch_no, "aggregate")
        apply_change_rows(
            agg,
            batch_df,
            list(group_cols),
            list(sum_cols),
            count_col=count_col,
            txn=(app, batch_no),
        )

    return _run_foreach_stream(
        spark.readStream.format("vtable_changes")
        .option("path", src_path)
        .option("keycols", ",".join(key_cols))
        .load(),
        checkpoint_dir,
        _fold,
    )


def kmeans_model_stream(
    spark: SparkSession,
    source_dir: str,
    model_path: str,
    checkpoint_dir: str,
    *,
    k: int = 4,
    dim: int,
    schema: str = "vec_id long, embedding array<double>",
    app_id: str = "kmeans_stream",
    on_batch: Callable[[int, int], None] | None = None,
) -> StreamingQuery:
    """Streaming mini-batch k-means: embedding batches arriving under
    ``source_dir`` continuously maintain a k-centroid model table —
    the online twin of ``operators.clustering.kmeans_fit``, for
    pipelines that cluster a corpus WHILE ingesting it (assignment
    consumers read the model table; no full-corpus retrain).

    Update rule (mini-batch k-means, weighted running mean): each
    micro-batch assigns its vectors to the current centroids (one
    broadcast join + one map-side-combined aggregate — the same
    per-round shape and 6-dp rounding as the batch trainer), then

        c' = (c·w + Σ assigned) / (w + n),   w' = w + n

    so a centroid's state is its running mean over every vector ever
    assigned to it. Driver state per batch is k×(dim+1) floats; the
    model table holds ``(vec_id, embedding, weight)``.

    Exactly-once: the model update is an ``overwrite`` carrying the
    ``(app_id, batch_no)`` writer transaction — a micro-batch replayed
    after a sink crash must NOT fold its vectors in twice (the update
    is not idempotent by itself), so the replay short-circuits at the
    committed watermark.

    The first batch seeds the model with its ``k`` lowest-id vectors
    (weight 0) before processing — deterministic, like the batch
    trainer's seeding.
    """
    from delta_lake_pyspark_scd2_spark.operators.similarity import (
        assign_to_centroids,
    )
    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )

    def _process(batch_df: DataFrame, batch_no: int) -> None:
        if batch_df.isEmpty():
            return
        cent_schema = "vec_id long, embedding array<double>, weight double"
        if not VersionedParquetTable.is_table(model_path):
            seed = [
                (int(r["vec_id"]), [float(x) for x in r["embedding"]], 0.0)
                for r in batch_df.orderBy("vec_id").limit(k).collect()
            ]
            VersionedParquetTable.create(
                spark,
                spark.createDataFrame(seed, cent_schema),
                model_path,
            )
        model = VersionedParquetTable(spark, model_path)
        _txn_reset_guard(model, app_id, batch_no, "model")
        if (model.last_txn_version(app_id) or -1) == batch_no:
            return  # replayed micro-batch: already folded in
        cents = {
            int(r["vec_id"]): (
                [float(x) for x in r["embedding"]],
                float(r["weight"]),
            )
            for r in model.read().collect()  # k rows — model-sized
        }
        cdf = spark.createDataFrame(
            [(cid, vec) for cid, (vec, _) in cents.items()],
            "vec_id long, embedding array<double>",
        )
        stats = (
            assign_to_centroids(batch_df, cdf)
            .groupBy("centroid_id")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                *[
                    F.sum(F.col("embedding")[i]).alias(f"__s{i}")
                    for i in range(dim)
                ],
            )
            .collect()  # ≤ k rows
        )
        for r in stats:
            cid = int(r["centroid_id"])
            vec, w = cents[cid]
            n = float(r["__n"])
            cents[cid] = (
                [
                    round((vec[i] * w + float(r[f"__s{i}"])) / (w + n), 6)
                    for i in range(dim)
                ],
                w + n,
            )
        model.overwrite(
            spark.createDataFrame(
                [(cid, vec, w) for cid, (vec, w) in sorted(cents.items())],
                cent_schema,
            ),
            txn=(app_id, batch_no),
        )
        if on_batch is not None:
            on_batch(batch_no, len(stats))

    return _run_foreach_stream(
        spark.readStream.schema(schema).json(source_dir),
        checkpoint_dir,
        _process,
    )


def semantic_index_stream(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    centroids: DataFrame,
    *,
    threshold: float = 0.3,
    schema: str = "vec_id long, embedding array<double>",
    app_id: str = "semantic_index",
    on_batch: "Callable[[int, int], None] | None" = None,
) -> StreamingQuery:
    """Streaming incremental SemDeDup — the online twin of
    ``operators.dedup.semantic_dedup_incremental``: each embedding
    micro-batch (1) emits its near-duplicate pairs — batch x the
    already-ingested corpus, reading ONLY the batch's clusters'
    partitions, plus batch x batch — into a pairs table, then (2)
    appends itself (with its cluster assignment) into the index, so
    every later batch dedups against it. Centroids are FROZEN serving
    state (retrain offline and rebuild on drift — the
    ``extend_ivfpq_index`` caveat applies verbatim).

    Exactly-once: the pair append and the index append carry separate
    ``(app_id, batch_no)`` writer txns — a micro-batch replayed after
    a crash BETWEEN the two writes completes the missing half without
    duplicating the committed one, and the operator's stored-side
    anti-join on the batch's own ids keeps the recomputed pairs
    identical even when the index append already landed. Per-batch
    cost: O(batch + probed partitions); the corpus is never rescanned.
    """
    from delta_lake_pyspark_scd2_spark.operators.dedup import (
        semantic_dedup_incremental,
    )
    from delta_lake_pyspark_scd2_spark.operators.similarity import (
        assign_to_centroids,
    )
    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )

    idx_schema = "vec_id long, embedding array<double>, cluster_id long"
    pair_schema = "id_a long, id_b long, cos_sim double"

    def _process(batch_df: DataFrame, batch_no: int) -> None:
        if batch_df.isEmpty():
            return
        if not VersionedParquetTable.is_table(index_path):
            VersionedParquetTable.create(
                spark,
                spark.createDataFrame([], idx_schema),
                index_path,
                partition_cols=["cluster_id"],
            )
        if not VersionedParquetTable.is_table(pairs_path):
            VersionedParquetTable.create(
                spark, spark.createDataFrame([], pair_schema), pairs_path
            )
        index = VersionedParquetTable(spark, index_path)
        pairs_t = VersionedParquetTable(spark, pairs_path)
        _txn_reset_guard(index, app_id, batch_no, "index")
        _txn_reset_guard(pairs_t, app_id, batch_no, "pairs")
        if (pairs_t.last_txn_version(app_id) or -1) < batch_no:
            pairs = semantic_dedup_incremental(
                index, batch_df, centroids, threshold=threshold
            )
            pairs_t.append(pairs, txn=(app_id, batch_no))
        n_pairs = pairs_t.read().count()  # cumulative — small table
        if (index.last_txn_version(app_id) or -1) < batch_no:
            # assignment output carries the batch columns — no join-back
            rows = assign_to_centroids(batch_df, centroids).select(
                "vec_id",
                "embedding",
                F.col("centroid_id").alias("cluster_id"),
            )
            index.append(rows, txn=(app_id, batch_no))
        if on_batch is not None:
            on_batch(batch_no, n_pairs)

    return _run_foreach_stream(
        spark.readStream.schema(schema).json(source_dir),
        checkpoint_dir,
        _process,
    )


def histogram_stream(
    spark: SparkSession,
    source_dir: str,
    sketch_path: str,
    checkpoint_dir: str,
    *,
    schema: str = "doc_id long, text string",
    text_col: str = "text",
    app_id: str = "hist_maintain",
    on_batch: Callable[[int, dict], None] | None = None,
) -> StreamingQuery:
    """Streaming log2-histogram maintenance: document batches arriving
    under ``source_dir`` fold their per-doc token-count histogram into
    a persisted sketch — the online twin of
    ``operators.sketches.histogram_build``, completing the maintained
    sketch trio (CMS frequency, HLL cardinality, histogram shape).
    A live quantile probe (``histogram_quantile``) over the maintained
    table answers "what does the length distribution of everything
    ingested so far look like" without scanning history.

    Per-batch work: one map-side-combinable aggregation to the batch's
    ≤ 64-row sketch, then a MERGE touching only those rows. Bucketing
    has no geometry to pin (log2 bins are parameter-free), so unlike
    the CMS stream there is no layout handshake. Exactly-once via the
    ``(app_id, batch_no)`` writer txn; a batch id below the watermark
    fails loud (counter addition is not idempotent).
    """
    from delta_lake_pyspark_scd2_spark.operators import sketches, text
    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )

    if not VersionedParquetTable.is_table(sketch_path):
        VersionedParquetTable.create(
            spark,
            spark.createDataFrame([], "bucket INT, cnt BIGINT"),
            sketch_path,
        )

    def _fold(batch_df: DataFrame, batch_no: int) -> None:
        if batch_df.isEmpty():
            return
        sk = VersionedParquetTable(spark, sketch_path)
        _txn_reset_guard(sk, app_id, batch_no, "sketch")
        delta = sketches.histogram_build(
            batch_df, text.token_count_ws(F.col(text_col))
        ).withColumnRenamed("cnt", "__delta")
        merged = delta.join(
            sk.read().withColumnRenamed("cnt", "__cur"),
            ["bucket"],
            "left",
        ).select(
            "bucket",
            (F.coalesce(F.col("__cur"), F.lit(0)) + F.col("__delta"))
            .cast("long")
            .alias("cnt"),
        )
        m = sk.upsert(
            merged,
            ["bucket"],
            operation="HIST_FOLD",
            txn=(app_id, batch_no),
        )
        if on_batch is not None:
            on_batch(batch_no, m)

    return _run_foreach_stream(
        spark.readStream.schema(schema).json(source_dir),
        checkpoint_dir,
        _fold,
    )


def length_drift_stream(
    spark: SparkSession,
    source_dir: str,
    counts_path: str,
    checkpoint_dir: str,
    *,
    schema: str = "doc_id long, text string, source string",
    group_col: str = "source",
    text_col: str = "text",
    app_id: str = "lendrift_maintain",
    on_batch: Callable[[int, list], None] | None = None,
) -> StreamingQuery:
    """Streaming LENGTH-distribution drift monitoring: batches fold
    into a persisted per-(slice, log2-bucket) count table (≤ 65 rows
    per slice — far smaller state than the KL monitor's vocab table),
    and after each fold the per-slice L1 report is recomputed from it
    (``operators.sketches.histogram_drift_from_counts``) — the shape
    companion of :func:`drift_monitor_stream`, alive WHILE ingesting.

    ``on_batch(batch_no, rows)`` receives each post-fold report
    (``Row(group_col, n, l1_distance)``). Exactly-once via the writer
    txn; a reset checkpoint fails loud (counter addition is not
    idempotent).
    """
    from delta_lake_pyspark_scd2_spark.operators import sketches, text
    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )

    if not VersionedParquetTable.is_table(counts_path):
        VersionedParquetTable.create(
            spark,
            spark.createDataFrame(
                [], f"{group_col} STRING, bucket INT, __cgb BIGINT"
            ),
            counts_path,
        )

    def _fold(batch_df: DataFrame, batch_no: int) -> None:
        if batch_df.isEmpty():
            return
        tbl = VersionedParquetTable(spark, counts_path)
        _txn_reset_guard(tbl, app_id, batch_no, "counts")
        delta = (
            batch_df.select(
                F.col(group_col),
                sketches.histogram_bucket(
                    text.token_count_ws(F.col(text_col))
                ).alias("bucket"),
            )
            .groupBy(group_col, "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("__delta"))
        )
        merged = delta.join(
            tbl.read().withColumnRenamed("__cgb", "__cur"),
            [group_col, "bucket"],
            "left",
        ).select(
            group_col,
            "bucket",
            (F.coalesce(F.col("__cur"), F.lit(0)) + F.col("__delta"))
            .cast("long")
            .alias("__cgb"),
        )
        tbl.upsert(
            merged,
            [group_col, "bucket"],
            operation="LENDRIFT_FOLD",
            txn=(app_id, batch_no),
        )
        if on_batch is not None:
            from delta_lake_pyspark_scd2_spark.functions.caching import (
                tracked_scope,
            )

            # the scoring half persist_tracked's the count frame — a
            # long-running stream must not accumulate one cached frame
            # per micro-batch; scoped, so frames a surrounding caller
            # registered stay cached
            with tracked_scope():
                on_batch(
                    batch_no,
                    sketches.histogram_drift_from_counts(
                        VersionedParquetTable(spark, counts_path).read(),
                        group_col,
                    ).collect(),  # slice-count-sized
                )

    return _run_foreach_stream(
        spark.readStream.schema(schema).json(source_dir),
        checkpoint_dir,
        _fold,
    )


def bloom_stream(
    spark: SparkSession,
    source_dir: str,
    sketch_path: str,
    checkpoint_dir: str,
    *,
    schema: str = "doc_id long, text string",
    text_col: str = "text",
    bits: int | None = None,
    hashes: int | None = None,
    app_id: str = "bloom_maintain",
    on_batch: Callable[[int, int], None] | None = None,
) -> StreamingQuery:
    """Streaming Bloom-filter maintenance (``on_batch`` receives
    ``(batch_no, committed_table_version)`` after each fold): each micro-batch folds its
    docs' exact-content fingerprints (md5 of the normalized text) into
    a persisted seen-content filter — the online membership twin of
    ``operators.sketches.bloom_build`` and the fourth maintained
    sketch (CMS frequency, HLL cardinality, histogram shape, Bloom
    membership). A live probe over the maintained table answers "has
    this content been ingested before, ever" in KBs of state at any
    corpus history, the constant-size prefilter in front of the exact
    fingerprint-store lookup that ``CorpusIngest`` does.

    Per-batch work: one bounded fold — the batch's ≤ bits-row position
    set, anti-joined against the stored positions so each commit
    appends only NEW bits (the table stays ≤ ``bits`` rows forever).

    Exactly-once comes FREE here, and that is the point of contrast
    with the counter maintainers: set union is idempotent, so a
    replayed micro-batch (crash between append and checkpoint commit)
    re-derives positions that all anti-join away — no writer
    transaction, no reset guard; even a fully RESET checkpoint merely
    re-folds history into a no-op instead of corrupting the sketch.
    (Counter addition has no such luck: CMS/histogram folds carry
    ``(app_id, batch_no)`` txns and fail loud on reset.) Should two
    concurrent folds ever race the same new position past the
    anti-join, the blind-append rebase lands both — duplicate ``pos``
    rows degrade the probe's join fanout, never its answer
    (``bloom_might_contain`` counts distinct matched hash rows).

    Geometry IS layout (a position from a 4×16384 build means nothing
    in a 2×1024 filter), so like the CMS stream the table pins
    ``bloom.bits`` / ``bloom.hashes`` as properties at create time and
    a reconfigured restart fails loud; an untagged handed-over table
    adopts the configured geometry.
    """
    from delta_lake_pyspark_scd2_spark.operators import sketches
    from delta_lake_pyspark_scd2_spark.operators.text import normalize_text
    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )

    bits = sketches.BLOOM_BITS if bits is None else bits
    hashes = sketches.BLOOM_HASHES if hashes is None else hashes
    geometry = {"bloom.bits": str(bits), "bloom.hashes": str(hashes)}
    if not VersionedParquetTable.is_table(sketch_path):
        VersionedParquetTable.create(
            spark,
            spark.createDataFrame([], "pos BIGINT"),
            sketch_path,
            properties=geometry,
        )

    def _fold(batch_df: DataFrame, batch_no: int) -> None:
        if batch_df.isEmpty():
            return
        sk = VersionedParquetTable(spark, sketch_path)
        props = sk.properties()
        have = {k: props.get(k) for k in geometry}
        if any(v is not None for v in have.values()) and have != geometry:
            raise ValueError(
                f"bloom at {sketch_path} has geometry {have}, stream "
                f"is configured {geometry}: bit layouts are "
                "incompatible; rebuild the filter or match the config"
            )
        fps = batch_df.select(
            F.md5(normalize_text(F.col(text_col))).alias("fp")
        )
        delta = sketches.bloom_build(fps, "fp", bits=bits, hashes=hashes)
        new_bits = delta.join(sk.read(), ["pos"], "left_anti")
        version = sk.append(new_bits)
        if on_batch is not None:
            on_batch(batch_no, version)

    return _run_foreach_stream(
        spark.readStream.schema(schema).json(source_dir),
        checkpoint_dir,
        _fold,
    )


def bradley_terry_stream(
    spark: SparkSession,
    source_dir: str,
    counts_path: str,
    checkpoint_dir: str,
    *,
    schema: str = "winner string, loser string",
    winner_col: str = "winner",
    loser_col: str = "loser",
    app_id: str = "bt_maintain",
    on_batch: Callable[[int, dict], None] | None = None,
) -> StreamingQuery:
    """Streaming Bradley-Terry maintenance: duel batches arriving
    under ``source_dir`` continuously fold into a persisted directed
    pair-count table — the online twin of
    ``operators.ranking.bradley_terry``, for live arena-style
    leaderboards where preferences arrive as a stream.

    The MM fit only ever needs the pair-count AGGREGATE, so that is
    what the maintainer persists: each micro-batch collapses map-side
    to its own (winner, loser) counts and MERGEs additively into the
    store — per-batch table work is O(pairs in the batch), and
    re-fitting ratings (:func:`bradley_terry_ratings`) costs
    O(dueling pairs) regardless of how many duels the log has seen.

    Exactly-once: counter ADDITION is not idempotent, so each fold's
    MERGE carries the ``(app_id, batch_no)`` writer transaction — a
    replayed micro-batch skips at the committed watermark instead of
    double-counting, and a reset checkpoint against a table that kept
    folding fails loud (shared ``_txn_reset_guard`` semantics).
    """
    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )

    if not VersionedParquetTable.is_table(counts_path):
        VersionedParquetTable.create(
            spark,
            spark.createDataFrame([], "a STRING, b STRING, cnt BIGINT"),
            counts_path,
        )

    def _fold(batch_df: DataFrame, batch_no: int) -> None:
        if batch_df.isEmpty():
            return
        store = VersionedParquetTable(spark, counts_path)
        _txn_reset_guard(store, app_id, batch_no, "pair-count")
        delta = batch_df.groupBy(
            F.col(winner_col).alias("a"), F.col(loser_col).alias("b")
        ).agg(F.count(F.lit(1)).alias("__delta"))
        merged = delta.join(
            store.read().withColumnRenamed("cnt", "__cur"),
            ["a", "b"],
            "left",
        ).select(
            "a",
            "b",
            (F.coalesce(F.col("__cur"), F.lit(0)) + F.col("__delta"))
            .cast("long")
            .alias("cnt"),
        )
        m = store.upsert(
            merged,
            ["a", "b"],
            operation="BT_FOLD",
            txn=(app_id, batch_no),
        )
        if on_batch is not None:
            on_batch(batch_no, m)

    return _run_foreach_stream(
        spark.readStream.schema(schema).json(source_dir),
        checkpoint_dir,
        _fold,
    )


def bradley_terry_ratings(
    spark: SparkSession, counts_path: str, *, iters: int = 5
) -> DataFrame:
    """Current ratings from a :func:`bradley_terry_stream` store: the
    MM fit over the persisted pair-count aggregate — identical to
    running ``operators.ranking.bradley_terry`` over the whole duel
    log (pytest-pinned), at O(dueling pairs) cost."""
    from delta_lake_pyspark_scd2_spark.operators.ranking import (
        bradley_terry_from_counts,
    )
    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )

    store = VersionedParquetTable(spark, counts_path)
    return bradley_terry_from_counts(store.read(), iters=iters, count_col="cnt")


def hll_stream(
    spark: SparkSession,
    source_dir: str,
    sketch_path: str,
    checkpoint_dir: str,
    *,
    schema: str = "doc_id long, text string",
    text_col: str = "text",
    app_id: str = "hll_maintain",
    on_batch: Callable[[int, dict], None] | None = None,
) -> StreamingQuery:
    """Streaming HyperLogLog maintenance: document batches arriving
    under ``source_dir`` fold their token registers into a persisted
    md5-HLL sketch — the online twin of
    ``operators.sketches.hll_build`` and the cardinality side the CMS
    (frequency) / histogram (shape) / Bloom (membership) maintainers
    referenced; a live ``hll_estimate`` over the maintained table
    answers "how many distinct tokens has this crawl ingested so far"
    without scanning history.

    Per-batch work: one map-side-combinable aggregation to the batch's
    ≤ ``HLL_M``-row register table, then a MERGE touching only those
    rows (register-wise MAX). Unlike the CMS/histogram counters the
    max-fold is IDEMPOTENT — a double-applied replay cannot corrupt
    the registers — but the ``(app_id, batch_no)`` writer txn is kept
    anyway: it keeps the maintained table's history one commit per
    micro-batch and fails loud on a checkpoint reset, matching the
    family's operational contract rather than silently diverging from
    it.
    """
    from delta_lake_pyspark_scd2_spark.operators import sketches, text
    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )

    if not VersionedParquetTable.is_table(sketch_path):
        VersionedParquetTable.create(
            spark,
            spark.createDataFrame([], "bucket INT, max_rho INT"),
            sketch_path,
        )

    def _fold(batch_df: DataFrame, batch_no: int) -> None:
        if batch_df.isEmpty():
            return
        sk = VersionedParquetTable(spark, sketch_path)
        _txn_reset_guard(sk, app_id, batch_no, "sketch")
        words = batch_df.select(
            F.explode(
                F.split(text.normalize_text(F.col(text_col)), " ")
            ).alias("__w")
        ).filter(F.col("__w") != "")
        delta = sketches.hll_build(words, F.col("__w")).withColumnRenamed(
            "max_rho", "__delta"
        )
        merged = delta.join(
            sk.read().withColumnRenamed("max_rho", "__cur"),
            ["bucket"],
            "left",
        ).select(
            "bucket",
            F.greatest(F.coalesce(F.col("__cur"), F.lit(0)), F.col("__delta"))
            .cast("int")
            .alias("max_rho"),
        )
        m = sk.upsert(
            merged,
            ["bucket"],
            operation="HLL_FOLD",
            txn=(app_id, batch_no),
        )
        if on_batch is not None:
            on_batch(batch_no, m)

    return _run_foreach_stream(
        spark.readStream.schema(schema).json(source_dir),
        checkpoint_dir,
        _fold,
    )
