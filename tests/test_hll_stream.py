"""Streaming HLL maintenance: the persisted registers after N
micro-batches must be bit-identical to the batch registers of the
union of all documents (mergeability end to end), the live estimate
must track exact distinct counts within the sketch's rsd, and a
checkpoint reset against a sketch that kept folding fails loud."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.operators import sketches
from delta_lake_pyspark_scd2_spark.operators.text import normalize_text
from delta_lake_pyspark_scd2_spark.sources.vtable import VersionedParquetTable
from delta_lake_pyspark_scd2_spark.streaming import hll_stream

BATCHES = [
    ["the quick brown fox", "the lazy dog sleeps"],
    ["merge sort beats bubble sort", "the fox returns"],
    ["entirely novel vocabulary arrives here tonight"],
]


def _write_batch(src, i: int, texts) -> None:
    with open(src / f"b{i}.json", "w") as f:
        for j, t in enumerate(texts):
            f.write(json.dumps({"doc_id": i * 100 + j, "text": t}) + "\n")


def _words(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    return df.select(
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("__w")
    ).filter(F.col("__w") != "")


def test_stream_registers_equal_whole_corpus_sketch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    sketch_path, ckpt = str(tmp_path / "sketch"), str(tmp_path / "ckpt")
    for i, texts in enumerate(BATCHES):
        _write_batch(src, i, texts)
        hll_stream(spark, str(src), sketch_path, ckpt)
    got = {
        (r["bucket"], r["max_rho"])
        for r in VersionedParquetTable(spark, sketch_path).read().collect()
    }
    whole = sketches.hll_build(
        _words(spark, [t for b in BATCHES for t in b]), F.col("__w")
    )
    want = {(r["bucket"], r["max_rho"]) for r in whole.collect()}
    assert got == want

    # live estimate within the m=256 sketch's error of the exact count
    est = sketches.hll_estimate(
        VersionedParquetTable(spark, sketch_path).read()
    ).collect()[0]["approx_distinct"]
    exact = (
        _words(spark, [t for b in BATCHES for t in b]).distinct().count()
    )
    assert abs(est - exact) <= max(3, 0.2 * exact)


def test_checkpoint_reset_fails_loud(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    sketch_path, ckpt = str(tmp_path / "sketch"), str(tmp_path / "ckpt")
    _write_batch(src, 0, BATCHES[0])
    hll_stream(spark, str(src), sketch_path, ckpt)
    _write_batch(src, 1, BATCHES[1])
    hll_stream(spark, str(src), sketch_path, ckpt)
    # fresh checkpoint replays batch 0 against the advanced sketch
    with pytest.raises(Exception, match="watermark|txn|reset"):
        hll_stream(spark, str(src), sketch_path, str(tmp_path / "ckpt2"))
