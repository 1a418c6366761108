"""Streaming count-min maintenance: the persisted sketch after N
micro-batches must be bit-identical to the batch sketch of the union
of all documents (mergeability, end to end), and a checkpoint reset
against a sketch that kept folding must fail loud instead of
double-counting."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.operators import sketches
from delta_lake_pyspark_scd2_spark.operators.text import normalize_text
from delta_lake_pyspark_scd2_spark.sources.vtable import VersionedParquetTable
from delta_lake_pyspark_scd2_spark.streaming import count_min_stream

BATCHES = [
    ["the quick brown fox", "the lazy dog sleeps"],
    ["merge sort beats bubble sort", "the fox returns"],
    ["the the the repeated row"],
]


def _write_batch(src, i: int, texts) -> None:
    with open(src / f"b{i}.json", "w") as f:
        for j, t in enumerate(texts):
            f.write(json.dumps({"doc_id": i * 100 + j, "text": t}) + "\n")


def _batch_sketch_cells(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    counts = (
        df.select(
            F.explode(F.split(normalize_text(F.col("text")), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    cms = sketches.count_min_build(counts, "w", "c")
    return {(r["d"], r["bucket"]): r["cnt"] for r in cms.collect()}


def test_stream_sketch_equals_whole_corpus_sketch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    sketch_path, ckpt = str(tmp_path / "sketch"), str(tmp_path / "ckpt")
    for i, texts in enumerate(BATCHES):
        _write_batch(src, i, texts)
        count_min_stream(spark, str(src), sketch_path, ckpt)
    got = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in VersionedParquetTable(spark, sketch_path).read().collect()
    }
    want = _batch_sketch_cells(spark, [t for b in BATCHES for t in b])
    assert got == want


def test_checkpoint_reset_fails_loud(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    sketch_path = str(tmp_path / "sketch")
    # incremental runs advance the txn watermark to batch id 2
    for i, texts in enumerate(BATCHES):
        _write_batch(src, i, texts)
        count_min_stream(spark, str(src), sketch_path, str(tmp_path / "ckpt1"))
    # fresh checkpoint restarts batch ids at 0 — folding those batches
    # again against the already-advanced sketch would double-count, so
    # the watermark guard must abort the stream.
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(
        (RuntimeError, StreamingQueryException, Py4JJavaError),
        match="checkpoint appears reset",
    ):
        count_min_stream(
            spark, str(src), sketch_path, str(tmp_path / "ckpt2")
        )


def test_upsert_txn_replay_is_noop_for_fold(spark, tmp_path):
    # The crash window the stream relies on: a replayed micro-batch
    # re-issues the same (app, batch) MERGE — it must not add twice.
    t = VersionedParquetTable.create(
        spark,
        spark.createDataFrame([(0, 5, 10)], "d INT, bucket INT, cnt LONG"),
        str(tmp_path / "t"),
    )
    add = spark.createDataFrame([(0, 5, 13)], "d INT, bucket INT, cnt LONG")
    t.upsert(add, ["d", "bucket"], txn=("cms", 7))
    t.upsert(add, ["d", "bucket"], txn=("cms", 7))  # replay
    assert t.read().collect()[0]["cnt"] == 13


def test_geometry_mismatch_fails_loud(spark, tmp_path):
    # a sketch built 4x1024 must refuse folds from a 4x2048-configured
    # stream: mixing bucket layouts would break never-under-estimate.
    src = tmp_path / "src"
    src.mkdir()
    sketch_path = str(tmp_path / "sketch")
    _write_batch(src, 0, BATCHES[0])
    count_min_stream(spark, str(src), sketch_path, str(tmp_path / "ck1"))
    _write_batch(src, 1, BATCHES[1])
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(
        (ValueError, StreamingQueryException, Py4JJavaError),
        match="geometry",
    ):
        count_min_stream(
            spark, str(src), sketch_path, str(tmp_path / "ck2"), width=2048
        )


def test_histogram_stream_matches_batch_and_is_exactly_once(spark, tmp_path):
    """The maintained histogram after N micro-batches equals the batch
    sketch of all docs; a replayed batch does not double-count; a reset
    checkpoint fails loud."""
    import json

    from pyspark.sql import functions as F

    from delta_lake_pyspark_scd2_spark.operators.sketches import (
        histogram_build,
    )
    from delta_lake_pyspark_scd2_spark.operators.text import token_count_ws
    from delta_lake_pyspark_scd2_spark.streaming import histogram_stream

    src = tmp_path / "src"
    src.mkdir()
    sk_path, ck = str(tmp_path / "hist"), str(tmp_path / "ck")
    batches = [
        [(1, "a b c"), (2, "one two three four five six seven")],
        [(3, ""), (4, "x " * 40)],
        [(5, "lone")],
    ]
    for i, rows in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for did, t in rows:
                f.write(json.dumps({"doc_id": did, "text": t}) + "\n")
        histogram_stream(spark, str(src), sk_path, ck)
    all_docs = spark.createDataFrame(
        [r for b in batches for r in b], "doc_id long, text string"
    )
    want = {
        r["bucket"]: r["cnt"]
        for r in histogram_build(all_docs, token_count_ws(F.col("text"))).collect()
    }
    got = {
        r["bucket"]: r["cnt"]
        for r in VersionedParquetTable(spark, sk_path).read().collect()
    }
    assert got == want
    # re-run with same checkpoint: nothing new, no double count
    histogram_stream(spark, str(src), sk_path, ck)
    got2 = {
        r["bucket"]: r["cnt"]
        for r in VersionedParquetTable(spark, sk_path).read().collect()
    }
    assert got2 == want
    # fresh checkpoint against the kept sketch: loud failure
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(
        (RuntimeError, StreamingQueryException, Py4JJavaError),
        match="checkpoint appears reset",
    ):
        histogram_stream(spark, str(src), sk_path, str(tmp_path / "ck2"))


def test_length_drift_stream_matches_batch(spark, tmp_path):
    """The maintained per-(source, bucket) counts reproduce the batch
    operator's drift report bit-for-bit after every micro-batch, and a
    reset checkpoint fails loud."""
    import json

    from pyspark.sql import functions as F

    from delta_lake_pyspark_scd2_spark.operators.sketches import (
        histogram_drift,
    )
    from delta_lake_pyspark_scd2_spark.operators.text import token_count_ws
    from delta_lake_pyspark_scd2_spark.streaming import length_drift_stream

    src = tmp_path / "src"
    src.mkdir()
    cp, ck = str(tmp_path / "counts"), str(tmp_path / "ck")
    batches = [
        [(1, "a b c", "s1"), (2, "x " * 30, "s2")],
        [(3, "one two", "s1"), (4, "y " * 31, "s2"), (5, "", "s1")],
    ]
    reports = []
    seen = []
    for i, rows in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for did, t, s_ in rows:
                f.write(
                    json.dumps({"doc_id": did, "text": t, "source": s_})
                    + "\n"
                )
        length_drift_stream(
            spark, str(src), cp, ck,
            on_batch=lambda n, r: seen.append((n, r)),
        )
        all_docs = spark.createDataFrame(
            [r for b in batches[: i + 1] for r in b],
            "doc_id long, text string, source string",
        )
        want = {
            (r["source"], r["n"], r["l1_distance"])
            for r in histogram_drift(
                all_docs, token_count_ws(F.col("text")), "source"
            ).collect()
        }
        got = {(r[0], r["n"], r["l1_distance"]) for r in seen[-1][1]}
        assert got == want, f"batch {i}"
        reports.append(got)
    assert reports[0] != reports[1]  # the report really tracks folds
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(
        (RuntimeError, StreamingQueryException, Py4JJavaError),
        match="checkpoint appears reset",
    ):
        length_drift_stream(spark, str(src), cp, str(tmp_path / "ck2"))


def test_bloom_stream_matches_batch_and_replay_is_free(spark, tmp_path):
    """The maintained seen-content filter after N micro-batches equals
    the batch bloom of all docs' fingerprints; a replayed checkpoint
    adds nothing; and — unlike the counter maintainers — even a fully
    RESET checkpoint converges (set union is idempotent) instead of
    failing loud. A true member probes as might_contain; geometry
    mismatch on restart fails loud."""
    import json

    from pyspark.sql import functions as F

    from delta_lake_pyspark_scd2_spark.operators import sketches
    from delta_lake_pyspark_scd2_spark.operators.text import normalize_text
    from delta_lake_pyspark_scd2_spark.streaming import bloom_stream

    src = tmp_path / "src"
    src.mkdir()
    sk_path, ck = str(tmp_path / "bloom"), str(tmp_path / "ck")
    batches = [
        [(1, "alpha beta gamma"), (2, "one two three")],
        [(3, "alpha beta gamma"), (4, "fresh content here")],
        [(5, "lone doc")],
    ]
    for i, rows in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for did, t in rows:
                f.write(json.dumps({"doc_id": did, "text": t}) + "\n")
        bloom_stream(spark, str(src), sk_path, ck)
    all_docs = spark.createDataFrame(
        [r for b in batches for r in b], "doc_id long, text string"
    )
    fps = all_docs.select(F.md5(normalize_text(F.col("text"))).alias("fp"))
    want = {r["pos"] for r in sketches.bloom_build(fps, "fp").collect()}
    stored = VersionedParquetTable(spark, sk_path)
    got = {r["pos"] for r in stored.read().collect()}
    assert got == want
    assert stored.read().count() == len(want)  # no duplicate rows
    # replay with the same checkpoint: no new rows
    bloom_stream(spark, str(src), sk_path, ck)
    assert {r["pos"] for r in stored.read().collect()} == want
    # RESET checkpoint: the idempotent fold converges, no guard needed
    bloom_stream(spark, str(src), sk_path, str(tmp_path / "ck2"))
    assert {r["pos"] for r in stored.read().collect()} == want
    assert stored.read().count() == len(want)
    # membership: every ingested fingerprint probes True
    flags = sketches.bloom_might_contain(stored.read(), fps.distinct(), "fp")
    assert all(r["might_contain"] for r in flags.collect())
    # geometry mismatch fails loud
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with open(src / "b9.json", "w") as f:
        f.write(json.dumps({"doc_id": 9, "text": "later batch"}) + "\n")
    with pytest.raises(
        (RuntimeError, StreamingQueryException, Py4JJavaError, ValueError),
        match="geometry",
    ):
        bloom_stream(
            spark, str(src), sk_path, str(tmp_path / "ck3"), bits=1024
        )
