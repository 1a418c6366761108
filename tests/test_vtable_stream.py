"""Streaming CDC source over the versioned table
(sources/vtable_stream.py, Spark 4 Python DataSource API)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.sources.vtable import VersionedParquetTable
from delta_lake_pyspark_scd2_spark.sources.vtable_stream import (
    VTableChangesDataSource,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(VTableChangesDataSource)


def _drain(spark, path, ck, batches, keycols="id"):
    q = (
        spark.readStream.format("vtable_changes")
        .option("path", path)
        .option("keycols", keycols)
        .load()
        .writeStream.foreachBatch(lambda df, n: batches.append(df.collect()))
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_delivers_versions_incrementally(spark, tmp_path):
    path, ck = str(tmp_path / "t"), str(tmp_path / "ck")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    t = VersionedParquetTable.create(spark, df1, path)

    batches: list = []
    _drain(spark, path, ck, batches)
    rows = [r for b in batches for r in b]
    # initial snapshot arrives as inserts of version 0
    assert sorted((r["id"], r["_change_type"]) for r in rows) == [
        (1, "insert"),
        (2, "insert"),
    ]

    # new commits: an append and an upsert -> only deltas arrive
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"))
    t.upsert(spark.createDataFrame([(2, "B!")], "id long, s string"), ["id"])
    batches.clear()
    _drain(spark, path, ck, batches)
    rows = [r for b in batches for r in b]
    kinds = sorted((r["id"], r["_change_type"]) for r in rows)
    assert (3, "insert") in kinds
    assert (2, "update_preimage") in kinds and (2, "update_postimage") in kinds
    assert all(r["_commit_version"] in (1, 2) for r in rows)

    # nothing new -> empty drain (exactly-once, no replay)
    batches.clear()
    _drain(spark, path, ck, batches)
    assert [r for b in batches for r in b] == []


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    path, ck = str(tmp_path / "t"), str(tmp_path / "ck")
    t = VersionedParquetTable.create(
        spark, spark.createDataFrame([(1, "a")], "id long, s string"), path
    )
    batches: list = []
    _drain(spark, path, ck, batches)
    assert len([r for b in batches for r in b]) == 1

    t.append(spark.createDataFrame([(2, "b")], "id long, s string"))
    batches.clear()
    _drain(spark, path, ck, batches)  # fresh query object, same checkpoint
    rows = [r for b in batches for r in b]
    assert [(r["id"], r["_change_type"]) for r in rows] == [(2, "insert")]


def test_replication_converges_to_source(spark, tmp_path):
    from delta_lake_pyspark_scd2_spark.sources.vtable_stream import (
        replicate_stream,
    )

    src, dst, ck = (
        str(tmp_path / "src"),
        str(tmp_path / "dst"),
        str(tmp_path / "ck"),
    )
    t = VersionedParquetTable.create(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"),
        src,
    )
    replicate_stream(spark, src, dst, ck, key_cols=["id"])
    # mutate source: append, update, delete
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"))
    t.upsert(spark.createDataFrame([(1, "A!")], "id long, s string"), ["id"])
    t.delete([("id", "=", 2)])
    replicate_stream(spark, src, dst, ck, key_cols=["id"])
    got = VersionedParquetTable(spark, dst).read()
    want = t.read()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert sorted(r["id"] for r in got.collect()) == [1, 3]


def test_vtable_sink_stream_exactly_once(spark, tmp_path):
    """Generic streaming sink: file-source rows land in the table
    exactly once across triggers, and re-running the stream with the
    same checkpoint (no new files) appends nothing."""
    import json as _json
    import os

    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )
    from delta_lake_pyspark_scd2_spark.streaming.stream_jobs import (
        vtable_sink_stream,
    )

    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    table = str(tmp_path / "table")

    def write_file(name, rows):
        with open(src / name, "w") as fh:
            for r in rows:
                fh.write(_json.dumps(r) + "\n")

    write_file("a.json", [{"k": 1, "v": "x"}, {"k": 2, "v": "y"}])
    stream = spark.readStream.schema("k long, v string").json(str(src))
    vtable_sink_stream(stream, table, ckpt)
    t = VersionedParquetTable(spark, table)
    assert t.read().count() == 2

    write_file("b.json", [{"k": 3, "v": "z"}])
    stream = spark.readStream.schema("k long, v string").json(str(src))
    vtable_sink_stream(stream, table, ckpt)
    assert VersionedParquetTable(spark, table).read().count() == 3

    # no new files: the re-run discovers nothing and the table is unchanged
    v_before = VersionedParquetTable(spark, table).latest_version()
    stream = spark.readStream.schema("k long, v string").json(str(src))
    vtable_sink_stream(stream, table, ckpt)
    assert VersionedParquetTable(spark, table).latest_version() == v_before

    # direct replay of an already-committed batch id is skipped (the
    # crash-between-commit-log-and-table window)
    t2 = VersionedParquetTable(spark, table)
    replay = spark.createDataFrame([(9, "dup")], "k long, v string")
    assert t2.last_txn_version(f"vtable_sink:{table}") is not None
    t2.append(replay, txn=(f"vtable_sink:{table}", 0))
    assert t2.read().count() == 3  # batch 0 already applied; nothing lands
