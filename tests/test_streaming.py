"""Structured Streaming tests: watermarked window agg and streaming
SCD2 ingestion (file source, Trigger.AvailableNow).

The reference has no streaming (SURVEY.md §2.10); these pin the
streaming upgrade's contract: results equal the batch pipeline's, and
checkpointed restarts are exactly-once.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.pipeline import SCD2Spec, run_scd2_batch
from delta_lake_pyspark_scd2_spark.sources.vtable import VersionedParquetTable
from delta_lake_pyspark_scd2_spark.streaming import (
    run_stream_once,
    scd2_stream,
    windowed_event_agg,
)
from delta_lake_pyspark_scd2_spark.streaming.stream_jobs import sessionize_stream

SPEC = SCD2Spec(
    key_cols=("user_id",),
    event_ts_col="ts",
    tracked_cols=("event_type", "value"),
    tiebreak_cols=("event_id",),
)


def ev_row(event_id, t, user_id, event_type, value):
    return Row(
        event_id=event_id,
        ts=dt.datetime.fromisoformat(t),
        user_id=user_id,
        event_type=event_type,
        value=float(value),
        props=None,
    )


EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write_batch(spark, rows, path):
    spark.createDataFrame(rows, EVENTS_DDL).coalesce(1).write.mode("append").parquet(path)


def test_windowed_agg_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    rows = [
        ev_row(1, "2024-01-01T00:10:00", 1, "click", 1.0),
        ev_row(2, "2024-01-01T00:20:00", 2, "click", 2.0),
        ev_row(3, "2024-01-01T01:10:00", 1, "view", 3.0),
        ev_row(4, "2024-01-01T05:00:00", 3, "click", 4.0),  # advances watermark
    ]
    _write_batch(spark, rows, src)
    run_stream_once(windowed_event_agg(spark, src), out, ck)
    got = {
        (str(r.window_start), r.event_type): (r.n, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    # windows ending before watermark (05:00 - 2h = 03:00) are emitted
    assert got[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert got[("2024-01-01 01:00:00", "view")] == (1, 3.0)
    # the 05:00 window is still open (not past watermark) => withheld
    assert ("2024-01-01 05:00:00", "click") not in got


def test_windowed_agg_incremental_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    _write_batch(
        spark,
        [
            ev_row(1, "2024-01-01T00:10:00", 1, "click", 1.0),
            ev_row(2, "2024-01-01T03:00:00", 2, "click", 1.0),
        ],
        src,
    )
    run_stream_once(windowed_event_agg(spark, src), out, ck)
    n1 = spark.read.parquet(out).count()
    assert n1 == 1  # only the 00:00 window finalized
    # second file arrives; restart drains only the new data
    _write_batch(spark, [ev_row(3, "2024-01-01T06:00:00", 1, "view", 1.0)], src)
    run_stream_once(windowed_event_agg(spark, src), out, ck)
    rows = spark.read.parquet(out).collect()
    starts = sorted(str(r.window_start) for r in rows)
    # 03:00 window finalized by the 06:00 watermark advance; no dup of 00:00
    assert starts == ["2024-01-01 00:00:00", "2024-01-01 03:00:00"]


def test_deduped_stream_drops_cross_batch_duplicates(spark, tmp_path):
    from delta_lake_pyspark_scd2_spark.streaming.stream_jobs import deduped_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    _write_batch(
        spark,
        [
            ev_row(1, "2024-01-01T00:00:00", 1, "click", 1.0),
            ev_row(1, "2024-01-01T00:00:00", 1, "click", 1.0),  # intra-file dup
            ev_row(2, "2024-01-01T00:30:00", 2, "view", 1.0),
        ],
        src,
    )
    run_stream_once(deduped_stream(spark, src), out, ck)
    assert spark.read.parquet(out).count() == 2
    # the same event re-arrives in a later file (within watermark): dropped
    _write_batch(
        spark,
        [
            ev_row(1, "2024-01-01T00:00:00", 1, "click", 1.0),  # cross-file dup
            ev_row(3, "2024-01-01T01:00:00", 1, "view", 1.0),
        ],
        src,
    )
    run_stream_once(deduped_stream(spark, src), out, ck)
    rows = spark.read.parquet(out).collect()
    assert sorted(r.event_id for r in rows) == [1, 2, 3]


def test_sessionize_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    rows = [
        # user 1: two sessions separated by a 2h gap
        ev_row(1, "2024-01-01T00:00:00", 1, "click", 1.0),
        ev_row(2, "2024-01-01T00:10:00", 1, "click", 1.0),
        ev_row(3, "2024-01-01T02:30:00", 1, "view", 1.0),
        # user 2: one session
        ev_row(4, "2024-01-01T01:00:00", 2, "click", 1.0),
        # watermark driver: far-future event closes everything above
        ev_row(5, "2024-01-02T00:00:00", 3, "click", 1.0),
    ]
    _write_batch(spark, rows, src)
    run_stream_once(
        sessionize_stream(spark, src, gap_seconds=1800, watermark="1 hour"),
        out, ck,
    )
    # second trigger advances the watermark past earlier timeouts
    _write_batch(spark, [ev_row(6, "2024-01-03T00:00:00", 3, "click", 1.0)], src)
    run_stream_once(
        sessionize_stream(spark, src, gap_seconds=1800, watermark="1 hour"),
        out, ck,
    )
    got = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in spark.read.parquet(out).collect()
    }
    # batch twin over the same closed horizon
    from delta_lake_pyspark_scd2_spark.operators.sessions import sessionize

    batch = spark.createDataFrame(rows, EVENTS_DDL)
    want = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in sessionize(batch, "user_id", "ts", gap_seconds=1800)
        .filter(F.col("session_end") < "2024-01-01 23:00:00")  # closed by watermark
        .collect()
    }
    assert want  # sanity: the horizon contains sessions
    assert want <= got  # every watermark-closed session was emitted once
    counts = [r for r in spark.read.parquet(out).collect()]
    assert len(counts) == len(got)  # exactly-once: no duplicate emissions


def test_scd2_stream_matches_batch_pipeline(spark, tmp_path):
    src = str(tmp_path / "src")
    stream_table = str(tmp_path / "stream_table")
    batch_table = str(tmp_path / "batch_table")
    ck = str(tmp_path / "ck")

    b1 = [
        ev_row(1, "2024-01-01T10:00:00", 1, "click", 1.0),
        ev_row(2, "2024-01-02T10:00:00", 1, "view", 2.0),
        ev_row(3, "2024-01-01T12:00:00", 2, "click", 1.0),
    ]
    b2 = [
        ev_row(4, "2024-01-03T10:00:00", 1, "purchase", 9.0),
        ev_row(5, "2024-01-03T12:00:00", 2, "click", 1.0),  # unchanged values
    ]

    seen: list[tuple[int, dict]] = []
    _write_batch(spark, b1, src)
    scd2_stream(spark, SPEC, src, stream_table, ck, on_batch=lambda n, m: seen.append((n, m)))
    _write_batch(spark, b2, src)
    scd2_stream(spark, SPEC, src, stream_table, ck, on_batch=lambda n, m: seen.append((n, m)))

    run_scd2_batch(spark, SPEC, spark.createDataFrame(b1, EVENTS_DDL), batch_table, batch_id="b1")
    run_scd2_batch(spark, SPEC, spark.createDataFrame(b2, EVENTS_DDL), batch_table, batch_id="b2")

    key_cols = ["user_id", "valid_from", "valid_to", "is_current", "event_type", "value"]
    got = sorted(
        VersionedParquetTable(spark, stream_table).read().select(*key_cols).collect(),
        key=str,
    )
    want = sorted(
        VersionedParquetTable(spark, batch_table).read().select(*key_cols).collect(),
        key=str,
    )
    assert got == want
    assert len(seen) == 2
    # replay safety: re-running with the same checkpoint moves nothing
    scd2_stream(spark, SPEC, src, stream_table, ck, on_batch=lambda n, m: seen.append((n, m)))
    assert len(seen) == 2  # no new micro-batch fired
    assert VersionedParquetTable(spark, stream_table).read().count() == len(want)


def test_interval_joined_stream_matches_batch_and_crosses_files(spark, tmp_path):
    from delta_lake_pyspark_scd2_spark.streaming.stream_jobs import (
        interval_joined_stream,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    _write_batch(
        spark,
        [
            ev_row(1, "2024-01-01T00:00:00", 1, "click", 1.0),
            ev_row(2, "2024-01-01T00:03:00", 1, "error", 1.0),  # joins click 1
            ev_row(3, "2024-01-01T00:10:00", 1, "error", 1.0),  # out of range
            ev_row(4, "2024-01-01T00:04:00", 2, "click", 1.0),  # other user
        ],
        src,
    )
    run_stream_once(interval_joined_stream(spark, src), out, ck)
    got = {
        (r.err_event_id, r.click_event_id)
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(2, 1)}
    # a click and a matching error arrive in a LATER file, plus a late
    # click matching the first file's error (within watermark): both
    # matches come from cross-file state
    _write_batch(
        spark,
        [
            ev_row(5, "2024-01-01T00:02:00", 1, "click", 1.0),  # late, joins err 2
            ev_row(6, "2024-01-01T00:30:00", 2, "click", 1.0),
            ev_row(7, "2024-01-01T00:31:00", 2, "error", 1.0),  # joins click 6
        ],
        src,
    )
    run_stream_once(interval_joined_stream(spark, src), out, ck)
    got = {
        (r.err_event_id, r.click_event_id)
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(2, 1), (2, 5), (7, 6)}


def test_scd2_stream_out_of_order_files_converge(spark, tmp_path):
    """Streaming SCD2 with late_policy="rebuild": files arriving out of
    event-time order still converge to the from-scratch history (the
    event-log sidecar works identically under foreachBatch)."""
    from delta_lake_pyspark_scd2_spark.streaming import scd2_stream

    spec = SCD2Spec(
        key_cols=("user_id",),
        event_ts_col="ts",
        tracked_cols=("event_type",),
        tiebreak_cols=("event_id",),
        late_policy="rebuild",
    )
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ck = str(tmp_path / "ck")
    # file 1: hours 0 and 2 share a value (the h2 event collapses away)
    _write_batch(
        spark,
        [
            ev_row(1, "2024-01-01T00:00:00", 1, "z", 1.0),
            ev_row(2, "2024-01-01T02:00:00", 1, "z", 1.0),
            ev_row(3, "2024-01-01T03:00:00", 1, "x", 1.0),
        ],
        src,
    )
    q = scd2_stream(spark, spec, src, table, ck)
    q.awaitTermination()
    # file 2 arrives later with an hour-1 event that interleaves before
    # the collapsed h2 — only the event log can resurrect z@2
    _write_batch(spark, [ev_row(4, "2024-01-01T01:00:00", 1, "x", 1.0)], src)
    q = scd2_stream(spark, spec, src, table, ck)
    q.awaitTermination()
    rows = sorted(
        VersionedParquetTable(spark, table).read().collect(),
        key=lambda r: r.valid_from,
    )
    # from-scratch ground truth over all 4 events: z@0, x@1, z@2, x@3
    assert [(r.event_type, r.valid_from.hour, r.is_current) for r in rows] == [
        ("z", 0, False),
        ("x", 1, False),
        ("z", 2, False),
        ("x", 3, True),
    ]


def test_stream_static_enrichment_matches_batch(spark, tmp_path):
    """Stream-static join: per-micro-batch broadcast enrichment equals
    the batch join; unmatched stream rows survive (left join); appended
    source files are enriched incrementally through the checkpoint."""
    from delta_lake_pyspark_scd2_spark.streaming.stream_jobs import enriched_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    dim = spark.createDataFrame(
        [Row(user_id=1, cohort="alpha"), Row(user_id=2, cohort="beta")],
        "user_id long, cohort string",
    )
    rows1 = [
        ev_row(1, "2024-01-01T00:10:00", 1, "click", 1.0),
        ev_row(2, "2024-01-01T00:20:00", 2, "click", 2.0),
        ev_row(3, "2024-01-01T00:30:00", 9, "view", 3.0),  # no dim row
    ]
    _write_batch(spark, rows1, src)
    run_stream_once(enriched_stream(spark, src, dim), out, ck)
    got = {r.event_id: r.cohort for r in spark.read.parquet(out).collect()}
    assert got == {1: "alpha", 2: "beta", 3: None}
    # incremental restart: only the new file is processed and enriched
    _write_batch(spark, [ev_row(4, "2024-01-01T01:00:00", 2, "click", 4.0)], src)
    run_stream_once(enriched_stream(spark, src, dim), out, ck)
    got = {r.event_id: r.cohort for r in spark.read.parquet(out).collect()}
    assert got == {1: "alpha", 2: "beta", 3: None, 4: "beta"}
