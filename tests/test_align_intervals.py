"""align_intervals (temporal interval-overlap join) vs a naive
overlap-join twin, including gapped chains, zero-length intervals,
simultaneous boundaries, and all three join modes.

The operator is the join-free sweep line (one shuffle, O(|L|+|R|) per
key); the twin here is the textbook equi-join + overlap residual. For
contiguous-or-gapped non-overlapping inputs the two must agree row for
row (sweep segments == pairwise version overlaps, because every sweep
boundary ends the enclosing overlap).
"""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.operators import scd2

T0 = dt.datetime(2024, 1, 1)


def _ts(h: float) -> dt.datetime:
    return T0 + dt.timedelta(hours=h)


def _chain(rng: random.Random, key: int, side: str, n: int):
    """Random non-overlapping interval chain with gaps and one
    zero-length interval thrown in."""
    rows = []
    t = rng.randint(0, 5)
    for i in range(n):
        dur = rng.choice([0, 1, 2, 3])  # 0 => empty interval, ignored
        rows.append(
            {
                "k": key,
                "valid_from": _ts(t),
                "valid_to": _ts(t + dur),
                f"{side}_tag": f"{side}{key}_{i}",
            }
        )
        t += dur + rng.choice([0, 0, 1, 4])  # 0 => contiguous handover
    return rows


def _naive(left, right, how):
    cond = (
        (left.k == right.k2)
        & (left.valid_from < right.valid_to2)
        & (right.valid_from2 < left.valid_to)
        & (left.valid_from < left.valid_to)
        & (right.valid_from2 < right.valid_to2)
    )
    j = left.join(right, cond, "inner").select(
        "k",
        F.greatest("valid_from", "valid_from2").alias("seg_from"),
        F.least("valid_to", "valid_to2").alias("seg_to"),
        "l_tag",
        "r_tag",
    )
    return j


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_inner_matches_naive_overlap_join(spark, seed):
    rng = random.Random(seed)
    lrows, rrows = [], []
    for key in range(12):
        lrows += _chain(rng, key, "l", rng.randint(0, 6))
        rrows += _chain(rng, key, "r", rng.randint(0, 6))
    if not lrows or not rrows:
        pytest.skip("degenerate draw")
    left = spark.createDataFrame(lrows)
    right = spark.createDataFrame(rrows)
    got = (
        scd2.align_intervals(
            left, right, "k", left_cols=["l_tag"], right_cols=["r_tag"]
        )
        .orderBy("k", "seg_from", "l_tag", "r_tag")
        .collect()
    )
    want = (
        _naive(
            left,
            right.select(
                F.col("k").alias("k2"),
                F.col("valid_from").alias("valid_from2"),
                F.col("valid_to").alias("valid_to2"),
                "r_tag",
            ),
            "inner",
        )
        .orderBy("k", "seg_from", "l_tag", "r_tag")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_left_and_full_modes_cover_unmatched_segments(spark):
    left = spark.createDataFrame(
        [
            {"k": 1, "valid_from": _ts(0), "valid_to": _ts(4), "l_tag": "a"},
            {"k": 1, "valid_from": _ts(6), "valid_to": _ts(8), "l_tag": "b"},
        ]
    )
    right = spark.createDataFrame(
        [{"k": 1, "valid_from": _ts(2), "valid_to": _ts(7), "r_tag": "x"}]
    )
    inner = scd2.align_intervals(
        left, right, "k", left_cols=["l_tag"], right_cols=["r_tag"]
    ).collect()
    assert sorted((r.seg_from, r.seg_to, r.l_tag, r.r_tag) for r in inner) == [
        (_ts(2), _ts(4), "a", "x"),
        (_ts(6), _ts(7), "b", "x"),
    ]
    lefty = scd2.align_intervals(
        left, right, "k", left_cols=["l_tag"], right_cols=["r_tag"], how="left"
    ).collect()
    # left mode adds the segments where only the left side is active
    assert sorted((r.seg_from, r.seg_to, r.l_tag, r.r_tag) for r in lefty) == [
        (_ts(0), _ts(2), "a", None),
        (_ts(2), _ts(4), "a", "x"),
        (_ts(6), _ts(7), "b", "x"),
        (_ts(7), _ts(8), "b", None),
    ]
    full = scd2.align_intervals(
        left, right, "k", left_cols=["l_tag"], right_cols=["r_tag"], how="full"
    ).collect()
    # full adds the right-only gap segment [4,6)
    assert sorted(
        (r.seg_from, r.seg_to, r.l_tag, r.r_tag) for r in full
    ) == [
        (_ts(0), _ts(2), "a", None),
        (_ts(2), _ts(4), "a", "x"),
        (_ts(4), _ts(6), None, "x"),
        (_ts(6), _ts(7), "b", "x"),
        (_ts(7), _ts(8), "b", None),
    ]


def test_contiguous_handover_has_no_phantom_gap(spark):
    # l: [0,2)[2,4) contiguous; r: [0,4): exactly two segments, no
    # empty segment or dropout at the t=2 handover instant.
    left = spark.createDataFrame(
        [
            {"k": 1, "valid_from": _ts(0), "valid_to": _ts(2), "l_tag": "v1"},
            {"k": 1, "valid_from": _ts(2), "valid_to": _ts(4), "l_tag": "v2"},
        ]
    )
    right = spark.createDataFrame(
        [{"k": 1, "valid_from": _ts(0), "valid_to": _ts(4), "r_tag": "x"}]
    )
    rows = scd2.align_intervals(
        left, right, "k", left_cols=["l_tag"], right_cols=["r_tag"]
    ).collect()
    assert sorted((r.seg_from, r.seg_to, r.l_tag) for r in rows) == [
        (_ts(0), _ts(2), "v1"),
        (_ts(2), _ts(4), "v2"),
    ]


def test_rejects_unknown_mode(spark):
    df = spark.createDataFrame(
        [{"k": 1, "valid_from": _ts(0), "valid_to": _ts(1), "l_tag": "a"}]
    )
    with pytest.raises(ValueError):
        scd2.align_intervals(df, df, "k", left_cols=[], right_cols=[], how="outer")
