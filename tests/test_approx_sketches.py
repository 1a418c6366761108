"""Error-bound pins for the sketch-based corpus summaries.

Two variants: the REGISTERED `approx_sketches` (engine-portable
md5-HLL + exact rank-rule quantiles — value-hash oracled, so these
tests pin the ERROR of the estimate, not its value) and the built-in
`approx_sketches_builtin` (Spark HLL++ / percentile_approx —
implementation-defined register layouts, no SQL oracle possible, so
error bounds are the only correctness statement available).
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.operators import text
from delta_lake_pyspark_scd2_spark.plans import REGISTRY
from delta_lake_pyspark_scd2_spark.plans.llm_ops import approx_sketches_builtin

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def result(spark):
    rows = REGISTRY["approx_sketches"].builder(spark, SF).collect()
    return {r["source"]: r for r in rows}


@pytest.fixture(scope="module")
def result_builtin(spark):
    return {r["source"]: r for r in approx_sketches_builtin(spark, SF).collect()}


@pytest.fixture(scope="module")
def exact_vocab(spark):
    from delta_lake_pyspark_scd2_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    return {
        r["source"]: r["v"]
        for r in docs.select(
            "source",
            F.explode(
                F.split(text.normalize_text(F.col("text")), " ")
            ).alias("word"),
        )
        .filter(F.col("word") != "")
        .groupBy("source")
        .agg(F.countDistinct("word").alias("v"))
        .collect()
    }


@pytest.fixture(scope="module")
def toks_by_source(spark):
    from delta_lake_pyspark_scd2_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    per_doc = docs.select(
        "source",
        F.size(F.split(text.normalize_text(F.col("text")), " ")).alias("n"),
    ).collect()
    by_src: dict[str, list[int]] = {}
    for r in per_doc:
        by_src.setdefault(r["source"], []).append(r["n"])
    return {k: sorted(v) for k, v in by_src.items()}


def test_md5_hll_distinct_within_rsd(result, exact_vocab):
    """m=256 registers -> one-sigma rsd ~ 1.04/sqrt(256) ~ 6.5%; 3x
    leaves room without being vacuous (the draw is deterministic, so
    this is a fixed property of the corpus, not flaky)."""
    for src, r in result.items():
        assert abs(r["approx_vocab"] - exact_vocab[src]) <= max(
            2, 0.195 * exact_vocab[src]
        ), (src, r["approx_vocab"], exact_vocab[src])


def test_exact_quantiles_are_rank_rule_order_stats(result, toks_by_source):
    """The registered quantiles follow the explicit rank rule: smallest
    value whose cumulative count reaches ceil(q*n) — actual order
    statistics, exactly reproducible in any engine."""
    for src, r in result.items():
        vals = toks_by_source[src]
        n = len(vals)
        for q, col in ((0.5, "p50_toks"), (0.9, "p90_toks"), (0.99, "p99_toks")):
            target = math.ceil(q * n)
            assert r[col] == vals[target - 1], (src, col)
        assert r["p50_toks"] <= r["p90_toks"] <= r["p99_toks"]


def test_hll_merge_equals_whole(spark):
    """Mergeability: per-shard md5-HLL registers merged by register-max
    estimate EXACTLY what the whole-corpus sketch estimates."""
    from delta_lake_pyspark_scd2_spark.operators.sketches import (
        hll_build,
        hll_estimate,
        hll_merge,
    )
    from delta_lake_pyspark_scd2_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    words = docs.select(
        "source",
        (F.col("doc_id") % 4).alias("__part"),
        F.explode(
            F.split(text.normalize_text(F.col("text")), " ")
        ).alias("word"),
    ).filter(F.col("word") != "")
    shards = [
        hll_build(words.filter(F.col("__part") == i), F.col("word"), ["source"])
        for i in range(4)
    ]
    merged = hll_estimate(hll_merge(*shards), ["source"]).collect()
    whole = hll_estimate(
        hll_build(words, F.col("word"), ["source"]), ["source"]
    ).collect()
    assert {(r["source"], r["approx_distinct"]) for r in merged} == {
        (r["source"], r["approx_distinct"]) for r in whole
    }


def test_hll_small_range_linear_counting(spark):
    """A tiny distinct set lands in the linear-counting branch and is
    near-exact there."""
    from delta_lake_pyspark_scd2_spark.operators.sketches import (
        hll_build,
        hll_estimate,
    )

    df = spark.createDataFrame(
        [(f"item{i % 20}",) for i in range(400)], "word string"
    )
    est = hll_estimate(hll_build(df, F.col("word"))).collect()[0]
    assert abs(est["approx_distinct"] - 20) <= 2


def test_builtin_hll_distinct_within_rsd(result_builtin, exact_vocab, spark):
    """Spark built-in HLL++ at rsd=0.02 — 5x one sigma. NOTE: the
    builtin variant counts the empty token for empty docs (legacy
    behavior); compare against its own exact count."""
    from delta_lake_pyspark_scd2_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    exact = {
        r["source"]: r["v"]
        for r in docs.select(
            "source",
            F.explode(
                F.split(text.normalize_text(F.col("text")), " ")
            ).alias("word"),
        )
        .groupBy("source")
        .agg(F.countDistinct("word").alias("v"))
        .collect()
    }
    for src, r in result_builtin.items():
        assert abs(r["approx_vocab"] - exact[src]) <= max(2, 0.10 * exact[src]), src


def test_builtin_quantiles_bracket_exact_order_stats(
    result_builtin, toks_by_source
):
    for src, r in result_builtin.items():
        vals = toks_by_source[src]
        assert vals[0] <= r["p50_toks"] <= vals[-1]
        assert r["p50_toks"] <= r["p90_toks"] <= r["p99_toks"]
        # with accuracy 10k >> n, approx_percentile is EXACT: it must
        # return an actual order statistic at the right rank
        k = int(0.5 * len(vals))
        assert r["p50_toks"] in (vals[max(k - 1, 0)], vals[k])


def test_deterministic_across_runs(spark):
    a = sorted(map(str, REGISTRY["approx_sketches"].builder(spark, SF).collect()))
    b = sorted(map(str, REGISTRY["approx_sketches"].builder(spark, SF).collect()))
    assert a == b
