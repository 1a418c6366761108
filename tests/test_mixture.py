"""Domain-mixture resampling (operators/mixture.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.operators import mixture


def _corpus(spark, sizes: dict[str, int]):
    rows, i = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mixture_proportions_and_capacity(spark):
    # scarcest domain relative to its share bounds the output:
    # shares 0.5/0.5, b has only 100 -> N = 200, keep all of b,
    # about half of a (hash-thresholded, so approximately)
    df = _corpus(spark, {"a": 1000, "b": 100})
    out = mixture.sample_to_mixture(df, {"a": 1.0, "b": 1.0})
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert got["b"] == 100  # never downsampled below its own size
    assert 60 <= got["a"] <= 140  # ~100 expected, hash-binomial spread


def test_unweighted_domains_dropped(spark):
    df = _corpus(spark, {"a": 50, "junk": 50})
    out = mixture.sample_to_mixture(df, {"a": 1.0})
    assert out.filter(F.col("source") == "junk").count() == 0
    assert out.count() == 50  # single domain: capacity = its full size


def test_deterministic_and_monotone(spark):
    df = _corpus(spark, {"a": 400, "b": 400})
    big = mixture.sample_to_mixture(df, {"a": 1.0, "b": 1.0})
    again = mixture.sample_to_mixture(df, {"a": 1.0, "b": 1.0})
    assert sorted(r["doc_id"] for r in big.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    # shrinking a's share keeps a subset of a's previously-kept rows
    small = mixture.sample_to_mixture(df, {"a": 1.0, "b": 3.0})
    a_big = {r["doc_id"] for r in big.filter("source = 'a'").collect()}
    a_small = {r["doc_id"] for r in small.filter("source = 'a'").collect()}
    assert a_small <= a_big
