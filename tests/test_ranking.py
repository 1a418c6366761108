"""distributed_total_rank / ntile_from_rank / percent_rank_from_rank
must agree with Spark's own global analytic window on every input —
the global window is the executable spec; the bucketed plan is the
scale path (see operators/ranking.py docstring)."""

from __future__ import annotations

import pathlib
import re

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.operators.ranking import (
    distributed_total_rank,
    ntile_from_rank,
    percent_rank_from_rank,
)

PKG = pathlib.Path(__file__).resolve().parents[1] / "delta_lake_pyspark_scd2_spark"


def _spec_frame(spark, rows):
    return spark.createDataFrame(rows, "k int, v double")


def _compare(df, k: int, descending: bool = True):
    order = [
        F.col("v").desc() if descending else F.col("v").asc(),
        F.col("k").asc(),
    ]
    w = Window.orderBy(*order)
    want = {
        r["k"]: (r["t"], r["pr"])
        for r in df.select(
            "k",
            F.ntile(k).over(w).alias("t"),
            F.percent_rank().over(w).cast("double").alias("pr"),
        ).collect()
    }
    ranked = distributed_total_rank(
        df, "v", ["k"], descending=descending, n_buckets=8
    )
    got = {
        r["k"]: (r["t"], r["pr"])
        for r in ranked.select(
            "k",
            ntile_from_rank(F.col("__rank"), F.col("__n"), k).alias("t"),
            percent_rank_from_rank(F.col("__rank"), F.col("__n")).alias("pr"),
        ).collect()
    }
    assert got == want


def test_matches_global_window_with_ties(spark):
    rows = [(i, float(v)) for i, v in enumerate(
        [5, 3, 3, 3, 9, 1, 7, 7, 2, 8, 8, 8, 8, 0, 4, 6, 6, 10, 2, 5]
    )]
    df = _spec_frame(spark, rows)
    for k in (1, 2, 3, 4, 7):
        _compare(df, k)


def test_matches_global_window_ascending(spark):
    rows = [(i, float((i * 37) % 11)) for i in range(30)]
    _compare(_spec_frame(spark, rows), 4, descending=False)


def test_n_smaller_than_k_gives_rank_as_tile(spark):
    df = _spec_frame(spark, [(1, 2.0), (2, 9.0), (3, 5.0)])
    _compare(df, 7)  # q = 0 path: every row its own tile


def test_single_row_percent_rank_is_zero(spark):
    df = _spec_frame(spark, [(1, 2.0)])
    _compare(df, 4)


def test_rank_is_dense_and_unique(spark):
    df = _spec_frame(spark, [(i, float(i % 5)) for i in range(40)])
    ranks = [
        r["__rank"]
        for r in distributed_total_rank(df, "v", ["k"], n_buckets=4).collect()
    ]
    assert sorted(ranks) == list(range(1, 41))


def test_requires_tiebreak():
    with pytest.raises(ValueError):
        distributed_total_rank(None, "v", [])


def test_no_unpartitioned_sort_windows_in_source():
    """A `Window.orderBy` with no partitionBy is a single-task global
    sort — banned on scale paths. Only documented bounded-input sites
    (a `global-window-ok` comment within the 4 preceding lines, stating
    WHY the input is bounded) may use one."""
    pat = re.compile(r"Window\s*\.\s*orderBy\(")
    offenders = []
    for sub in ("plans", "operators", "functions", "sources",
                "pipeline", "streaming"):
        for py in sorted((PKG / sub).glob("*.py")):
            lines = py.read_text().splitlines()
            for i, line in enumerate(lines):
                if pat.search(line):
                    ctx = "\n".join(lines[max(0, i - 4): i + 1])
                    if "global-window-ok" not in ctx:
                        offenders.append(f"{py.relative_to(PKG)}:{i + 1}")
    assert offenders == [], (
        f"unpartitioned sort windows without a bounded-input "
        f"justification: {offenders}"
    )
