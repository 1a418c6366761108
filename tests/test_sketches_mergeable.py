"""Mergeable HLL sketches: union-of-parts must equal the whole-corpus
sketch even when the per-batch sketch binaries round-trip through a
versioned table — the property that lets 100 TB pipelines answer
corpus-wide distincts from stored per-partition sketches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.operators.text import normalize_text
from delta_lake_pyspark_scd2_spark.sources.tables import load_table
from delta_lake_pyspark_scd2_spark.sources.vtable import VersionedParquetTable


def _words(docs):
    return docs.select(
        "source",
        (F.col("doc_id") % 4).alias("part"),
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("word"),
    ).filter(F.col("word") != "")


def test_sketch_union_survives_vtable_roundtrip(spark, sf_dir, tmp_path):
    words = _words(load_table(spark, sf_dir, "documents"))
    parts = words.groupBy("source", "part").agg(
        F.hll_sketch_agg("word", F.lit(12)).alias("sk")
    )
    store = VersionedParquetTable.create(
        spark, parts, str(tmp_path / "sketches")
    )
    unioned = {
        r["source"]: r["est"]
        for r in store.read()
        .groupBy("source")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    whole = {
        r["source"]: (r["est"], r["exact"])
        for r in words.groupBy("source")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("word", F.lit(12))).alias(
                "est"
            ),
            F.countDistinct("word").alias("exact"),
        )
        .collect()
    }
    assert set(unioned) == set(whole)
    for src, est_u in unioned.items():
        est_w, exact = whole[src]
        assert est_u == est_w  # merge is exact, not approximate
        assert abs(est_u - exact) <= 0.05 * exact


def test_sketch_incremental_append(spark, sf_dir, tmp_path):
    """Appending a new batch's sketch row updates the answer without
    touching old batches — only the new batch's words are scanned."""
    words = _words(load_table(spark, sf_dir, "documents"))
    first = words.filter(F.col("part") < 3)
    last = words.filter(F.col("part") == 3)
    store = VersionedParquetTable.create(
        spark,
        first.groupBy("source", "part").agg(
            F.hll_sketch_agg("word", F.lit(12)).alias("sk")
        ),
        str(tmp_path / "sketches"),
    )
    store.append(
        last.groupBy("source", "part").agg(
            F.hll_sketch_agg("word", F.lit(12)).alias("sk")
        )
    )
    est = {
        r["source"]: r["est"]
        for r in store.read()
        .groupBy("source")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    whole = {
        r["source"]: r["est"]
        for r in words.groupBy("source")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("word", F.lit(12))).alias(
                "est"
            )
        )
        .collect()
    }
    assert est == whole
