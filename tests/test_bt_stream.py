"""Streaming Bradley-Terry maintenance: the persisted pair-count store
after N micro-batches must equal the batch aggregate of the whole duel
log, ratings from the store must equal the batch operator over the
union, and replay/reset semantics follow the shared maintainer
contract (additive fold => writer txn + reset guard)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.operators.ranking import bradley_terry
from delta_lake_pyspark_scd2_spark.sources.vtable import VersionedParquetTable
from delta_lake_pyspark_scd2_spark.streaming import (
    bradley_terry_ratings,
    bradley_terry_stream,
)

BATCHES = [
    [("A", "B"), ("A", "B"), ("B", "C")],
    [("A", "C"), ("C", "B"), ("A", "B")],
    [("B", "A"), ("B", "C"), ("A", "C")],
]


def _write_batch(src, i: int, duels) -> None:
    with open(src / f"b{i}.json", "w") as f:
        for w, l in duels:
            f.write(json.dumps({"winner": w, "loser": l}) + "\n")


def _all_duels_df(spark):
    rows = [d for b in BATCHES for d in b]
    return spark.createDataFrame(rows, "winner string, loser string")


def test_stream_counts_equal_whole_log_aggregate(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    counts, ckpt = str(tmp_path / "counts"), str(tmp_path / "ckpt")
    for i, duels in enumerate(BATCHES):
        _write_batch(src, i, duels)
        bradley_terry_stream(spark, str(src), counts, ckpt)
    got = {
        (r["a"], r["b"]): r["cnt"]
        for r in VersionedParquetTable(spark, counts).read().collect()
    }
    want = {
        (r["winner"], r["loser"]): r["n"]
        for r in _all_duels_df(spark)
        .groupBy("winner", "loser")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_stream_ratings_equal_batch_operator(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    counts, ckpt = str(tmp_path / "counts"), str(tmp_path / "ckpt")
    for i, duels in enumerate(BATCHES):
        _write_batch(src, i, duels)
        bradley_terry_stream(spark, str(src), counts, ckpt)
    got = {
        r["item"]: (r["wins"], r["n_duels"], r["rating"])
        for r in bradley_terry_ratings(spark, counts, iters=5).collect()
    }
    want = {
        r["item"]: (r["wins"], r["n_duels"], r["rating"])
        for r in bradley_terry(_all_duels_df(spark), iters=5).collect()
    }
    assert got == want


def test_checkpoint_reset_fails_loud(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    counts = str(tmp_path / "counts")
    for i, duels in enumerate(BATCHES):
        _write_batch(src, i, duels)
        bradley_terry_stream(spark, str(src), counts, str(tmp_path / "ck1"))
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(
        (RuntimeError, StreamingQueryException, Py4JJavaError),
        match="checkpoint appears reset",
    ):
        bradley_terry_stream(spark, str(src), counts, str(tmp_path / "ck2"))


def test_txn_replay_is_noop_for_fold(spark, tmp_path):
    # a replayed micro-batch re-issues the same (app, batch) MERGE —
    # the additive fold must not double-count.
    t = VersionedParquetTable.create(
        spark,
        spark.createDataFrame([("A", "B", 2)], "a STRING, b STRING, cnt BIGINT"),
        str(tmp_path / "counts"),
    )
    delta = spark.createDataFrame(
        [("A", "B", 3)], "a STRING, b STRING, cnt BIGINT"
    )
    t.upsert(delta, ["a", "b"], txn=("bt_maintain", 7))
    replay = t.upsert(delta, ["a", "b"], txn=("bt_maintain", 7))
    assert replay.get("skipped_txn") or t.read().collect()[0]["cnt"] == 3
