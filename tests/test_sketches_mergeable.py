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


def test_histogram_sketch_merge_and_quantile(spark):
    from delta_lake_pyspark_scd2_spark.operators.sketches import (
        histogram_build,
        histogram_merge,
        histogram_quantile,
    )
    from pyspark.sql import functions as F

    vals = list(range(100)) + [1000] * 5 + [-3, None]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    full = {r["bucket"]: r["cnt"] for r in histogram_build(df, F.col("v")).collect()}
    # invalid bin holds the negative AND the null, never dropped
    assert full[-1] == 2
    assert sum(full.values()) == len(vals)
    # bucket b covers [2^b - 1, 2^(b+1) - 2]: v=0 -> bucket 0; v=1,2 -> 1
    assert full[0] == 1 and full[1] == 2
    # merge of any split == sketch of the union (exact)
    h1 = histogram_build(df.filter("v IS NULL OR v % 2 = 0"), F.col("v"))
    h2 = histogram_build(df.filter("v IS NOT NULL AND v % 2 <> 0"), F.col("v"))
    merged = {r["bucket"]: r["cnt"] for r in histogram_merge(h1, h2).collect()}
    assert merged == full
    # median of 0..99 + outliers falls in the bucket containing ~50
    q = histogram_quantile(histogram_build(df.filter("v >= 0"), F.col("v")), 0.5).collect()[0]
    assert q["lo"] <= 50 <= q["hi"]


def test_histogram_drift_excludes_invalid_bin(spark):
    """Consistent garbage-row semantics across the sketch's consumers
    (round-5 ADVICE): drift, like histogram_quantile, excludes the
    invalid bin (bucket -1, NULL/negative inputs) — it measures the
    valid-value distribution's shape, so adding NULL rows to one group
    must not change any group's L1 distance or counted n."""
    from pyspark.sql import functions as F

    from delta_lake_pyspark_scd2_spark.functions.caching import (
        release_tracked,
    )
    from delta_lake_pyspark_scd2_spark.operators.sketches import (
        histogram_drift,
    )

    base = [("a", v) for v in range(20)] + [("b", v * 7) for v in range(20)]
    clean = spark.createDataFrame(base, "g string, v long")
    dirty = clean.union(
        spark.createDataFrame(
            [("a", None), ("a", -5), ("b", None)], "g string, v long"
        )
    )
    want = {
        r["g"]: (r["n"], r["l1_distance"])
        for r in histogram_drift(clean, F.col("v"), "g").collect()
    }
    release_tracked()
    got = {
        r["g"]: (r["n"], r["l1_distance"])
        for r in histogram_drift(dirty, F.col("v"), "g").collect()
    }
    release_tracked()
    assert got == want
