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


def test_quantile_normalize_identical_distributions_fixed_point(spark):
    """Groups that already share the global distribution map onto
    (approximately) themselves; extremes map exactly."""
    from delta_lake_pyspark_scd2_spark.operators.ranking import quantile_normalize

    rows = [
        {"id": g * 100 + i, "g": f"g{g}", "v": float(i)}
        for g in range(2)
        for i in range(10)
    ]
    out = quantile_normalize(
        spark.createDataFrame(rows), "g", "v", ["id"]
    ).collect()
    got = {(r.g, r.v): r.q_value for r in out}
    # both groups span the same values; min maps to global min (0.0 at
    # p=0) and max to global max (9.0 at p=1)
    for g in ("g0", "g1"):
        assert got[(g, 0.0)] == 0.0
        assert got[(g, 9.0)] == 9.0


def test_quantile_normalize_rescales_shifted_group(spark):
    """A group scored on a shifted scale lands on the global ladder at
    the same percentile positions."""
    from delta_lake_pyspark_scd2_spark.operators.ranking import quantile_normalize

    rows = [{"id": i, "g": "lo", "v": float(i)} for i in range(5)] + [
        {"id": 10 + i, "g": "hi", "v": 1000.0 + i} for i in range(5)
    ]
    out = quantile_normalize(spark.createDataFrame(rows), "g", "v", ["id"])
    got = {r.id: r.q_value for r in out.collect()}
    # within-group percentiles 0,.25,.5,.75,1 -> global positions
    # floor(p*9)+1 = 1,3,5,7,10 over the sorted union
    ladder = [0.0, 1.0, 2.0, 3.0, 4.0, 1000.0, 1001.0, 1002.0, 1003.0, 1004.0]
    expect = [ladder[0], ladder[2], ladder[4], ladder[6], ladder[9]]
    assert [got[i] for i in range(5)] == expect
    assert [got[10 + i] for i in range(5)] == expect


def test_quantile_normalize_singleton_group_maps_to_median(spark):
    from delta_lake_pyspark_scd2_spark.operators.ranking import quantile_normalize

    rows = [{"id": i, "g": "big", "v": float(i)} for i in range(9)] + [
        {"id": 99, "g": "solo", "v": 42.0}
    ]
    out = quantile_normalize(spark.createDataFrame(rows), "g", "v", ["id"])
    got = {r.id: r.q_value for r in out.collect()}
    # singleton percentile defined as 0.5 -> pos floor(.5*9)+1 = 5 of
    # the 10-row global ladder [0..8, 42]
    assert got[99] == 4.0


def test_quantile_normalize_is_monotone_within_group_random(spark):
    """Property: within every group the mapping value -> q_value is
    non-decreasing, q_values are drawn from the global value set, and
    row count is preserved (hash-join lookup loses nothing)."""
    import random

    from delta_lake_pyspark_scd2_spark.operators.ranking import quantile_normalize

    rng = random.Random(7)
    rows = [
        {"id": i, "g": f"g{rng.randint(0, 3)}", "v": float(rng.randint(0, 50))}
        for i in range(200)
    ]
    df = spark.createDataFrame(rows)
    out = quantile_normalize(df, "g", "v", ["id"]).collect()
    assert len(out) == len(rows)
    all_values = {r["v"] for r in rows}
    by_g: dict[str, list] = {}
    for r in out:
        assert r.q_value in all_values
        by_g.setdefault(r.g, []).append((r.v, r.id, r.q_value))
    for seq in by_g.values():
        seq.sort()
        qs = [q for _, _, q in seq]
        assert qs == sorted(qs), "q_value must be monotone in (v, id)"


# ---------------------------------------------------------------------------
# bradley_terry
# ---------------------------------------------------------------------------


def _duels(spark, rows):
    return spark.createDataFrame(rows, "winner string, loser string")


def test_bradley_terry_orders_by_strength(spark):
    from delta_lake_pyspark_scd2_spark.operators.ranking import bradley_terry

    # A dominates B, B dominates C; no A-C duels — the model must
    # still rank A > B > C through the shared opponent.
    rows = [("A", "B")] * 4 + [("B", "A")] + [("B", "C")] * 4 + [("C", "B")]
    got = {r["item"]: r for r in bradley_terry(_duels(spark, rows), iters=8).collect()}
    assert got["A"]["rating"] > got["B"]["rating"] > got["C"]["rating"]
    assert got["A"]["wins"] == 4 and got["A"]["n_duels"] == 5
    assert got["B"]["wins"] == 5 and got["B"]["n_duels"] == 10


def test_bradley_terry_zero_win_item_rates_zero(spark):
    from delta_lake_pyspark_scd2_spark.operators.ranking import bradley_terry

    rows = [("A", "B"), ("A", "B"), ("B", "C"), ("A", "C")]
    got = {r["item"]: r["rating"] for r in bradley_terry(_duels(spark, rows), iters=5).collect()}
    assert got["C"] == 0.0
    assert got["A"] > got["B"] > 0.0


def test_bradley_terry_balanced_duels_rate_equal(spark):
    from delta_lake_pyspark_scd2_spark.operators.ranking import bradley_terry

    # perfectly balanced round-robin: every rating is the mean (1.0)
    rows = [("A", "B"), ("B", "A"), ("B", "C"), ("C", "B"), ("A", "C"), ("C", "A")]
    ratings = [r["rating"] for r in bradley_terry(_duels(spark, rows), iters=5).collect()]
    assert ratings == [1.0, 1.0, 1.0]


def test_bradley_terry_ratings_mean_is_one(spark):
    from delta_lake_pyspark_scd2_spark.operators.ranking import bradley_terry

    rows = [("A", "B")] * 3 + [("B", "C")] * 2 + [("C", "A"), ("A", "C")]
    ratings = [r["rating"] for r in bradley_terry(_duels(spark, rows), iters=6).collect()]
    assert abs(sum(ratings) / len(ratings) - 1.0) < 1e-5
