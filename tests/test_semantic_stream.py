"""Streaming incremental SemDeDup: the pairs table after N
micro-batches must equal the union of sequential batch-operator runs,
the index must hold every ingested vector exactly once, and a replay
(fresh checkpoint, same batches, same txn ids) must not duplicate
either."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.operators import dedup
from delta_lake_pyspark_scd2_spark.operators.clustering import kmeans_fit
from delta_lake_pyspark_scd2_spark.sources.tables import load_table
from delta_lake_pyspark_scd2_spark.sources.vtable import VersionedParquetTable
from delta_lake_pyspark_scd2_spark.streaming import semantic_index_stream

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def parts(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    rows = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.orderBy("vec_id").limit(90).collect()
    ]
    cents = kmeans_fit(
        spark.createDataFrame(rows[:30], "vec_id long, embedding array<double>"),
        k=4,
        iters=1,
        dim=64,
    )
    batches = [rows[:30], rows[30:60], rows[60:90]]
    src = tmp_path / "src"
    src.mkdir()
    return src, str(tmp_path / "idx"), str(tmp_path / "pairs"), str(
        tmp_path / "ckpt"
    ), cents, batches


def _write_batch(src, i, rows):
    with open(src / f"b{i}.json", "w") as f:
        for vid, vec in rows:
            f.write(json.dumps({"vec_id": vid, "embedding": vec}) + "\n")


def test_stream_pairs_equal_sequential_operator(spark, parts):
    src, idx, pairs, ckpt, cents, batches = parts
    seen = []
    for i, rows in enumerate(batches):
        _write_batch(src, i, rows)
        semantic_index_stream(
            spark, str(src), idx, pairs, ckpt, cents, threshold=0.2,
            on_batch=lambda b, n: seen.append((b, n)),
        )
    got = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in VersionedParquetTable(spark, pairs).read().collect()
    }
    # sequential batch-operator twin over growing offline indexes
    want = set()
    stored = None
    for i, rows in enumerate(batches):
        bdf = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        if stored is None:
            stored = dedup.build_semantic_index(
                bdf.limit(0), cents, str(src.parent / f"off{i}")
            )
        w = {
            (r["id_a"], r["id_b"], r["cos_sim"])
            for r in dedup.semantic_dedup_incremental(
                stored, bdf, cents, threshold=0.2
            ).collect()
        }
        want |= w
        # grow the offline index the same way the stream does
        from delta_lake_pyspark_scd2_spark.operators.similarity import (
            assign_to_centroids,
        )

        stored.append(
            bdf.join(
                assign_to_centroids(bdf, cents).select(
                    "vec_id", F.col("centroid_id").alias("cluster_id")
                ),
                "vec_id",
            )
        )
    assert got == want and got
    # index holds every ingested vector exactly once
    ids = [r["vec_id"] for r in VersionedParquetTable(spark, idx).read().collect()]
    assert sorted(ids) == sorted(v for b in batches for v, _ in b)


def test_stream_rerun_same_checkpoint_is_noop(spark, parts):
    src, idx, pairs, ckpt, cents, batches = parts
    for i, rows in enumerate(batches[:2]):
        _write_batch(src, i, rows)
        semantic_index_stream(
            spark, str(src), idx, pairs, ckpt, cents, threshold=0.2
        )
    p0 = VersionedParquetTable(spark, pairs).read().count()
    n0 = VersionedParquetTable(spark, idx).read().count()
    # crash-recovery semantics: same checkpoint, no new files — the
    # re-run delivers nothing and both tables are untouched
    semantic_index_stream(
        spark, str(src), idx, pairs, ckpt, cents, threshold=0.2
    )
    assert VersionedParquetTable(spark, pairs).read().count() == p0
    assert VersionedParquetTable(spark, idx).read().count() == n0
    # a RESET checkpoint against kept sinks fails loud (renumbered
    # batches under the old watermark could silently skip new data)
    import pytest as _pytest

    # the guard's RuntimeError surfaces wrapped in Spark's
    # StreamingQueryException — match on the message
    with _pytest.raises(Exception, match="checkpoint appears reset"):
        semantic_index_stream(
            spark, str(src), idx, pairs, str(src.parent / "ckpt_reset"),
            cents, threshold=0.2,
        )


def test_pair_recompute_after_index_commit_is_identical(spark, parts):
    """The crash window: pairs not yet committed, the batch's index
    append already landed. The operator's stored-side anti-join on the
    batch's own ids makes the recomputed pairs identical — no
    self-pairs, no duplicates."""
    from delta_lake_pyspark_scd2_spark.operators.similarity import (
        assign_to_centroids,
    )

    src, idx, pairs, ckpt, cents, batches = parts
    b0 = spark.createDataFrame(
        batches[0], "vec_id long, embedding array<double>"
    )
    b1 = spark.createDataFrame(
        batches[1], "vec_id long, embedding array<double>"
    )
    index = dedup.build_semantic_index(b0, cents, idx)
    key = lambda df: {
        (r["id_a"], r["id_b"], r["cos_sim"]) for r in df.collect()
    }
    before = key(
        dedup.semantic_dedup_incremental(index, b1, cents, threshold=0.2)
    )
    index.append(
        b1.join(
            assign_to_centroids(b1, cents).select(
                "vec_id", F.col("centroid_id").alias("cluster_id")
            ),
            "vec_id",
        )
    )
    after = key(
        dedup.semantic_dedup_incremental(index, b1, cents, threshold=0.2)
    )
    assert after == before and before
