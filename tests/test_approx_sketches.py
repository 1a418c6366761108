"""Error-bound pins for the approx_sketches registry query: sketch
outputs are implementation-defined (no SQL oracle possible), so
correctness is 'within the sketch's stated error of the exact answer'.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.operators import text
from delta_lake_pyspark_scd2_spark.plans import REGISTRY

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def result(spark):
    rows = REGISTRY["approx_sketches"].builder(spark, SF).collect()
    return {r["source"]: r for r in rows}


def test_hll_distinct_within_rsd(spark, result):
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
    for src, r in result.items():
        # rsd=0.02 is one sigma; 5x leaves room without being vacuous
        assert abs(r["approx_vocab"] - exact[src]) <= max(2, 0.10 * exact[src]), src


def test_quantiles_bracket_exact_order_stats(spark, result):
    from delta_lake_pyspark_scd2_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    per_doc = (
        docs.select(
            "source",
            F.size(F.split(text.normalize_text(F.col("text")), " ")).alias("n"),
        )
        .collect()
    )
    by_src: dict[str, list[int]] = {}
    for r in per_doc:
        by_src.setdefault(r["source"], []).append(r["n"])
    for src, r in result.items():
        vals = sorted(by_src[src])
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
