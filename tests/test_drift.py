"""Unigram KL drift: Spark result must match a from-scratch Python
computation of KL(slice ‖ corpus), and an identically-distributed
slice must score ~0."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from delta_lake_pyspark_scd2_spark.operators.text import unigram_kl_drift

DOCS = [
    ("a", "the cat sat on the mat"),
    ("a", "the dog sat on the log"),
    ("b", "quantum flux capacitor overload"),
    ("b", "the flux returns to the grid"),
]


def _naive_kl(docs):
    per: dict[str, Counter] = {}
    overall: Counter = Counter()
    for g, t in docs:
        ws = [w for w in t.split(" ") if w]
        per.setdefault(g, Counter()).update(ws)
        overall.update(ws)
    n_total = sum(overall.values())
    out = {}
    for g, c in per.items():
        n_g = sum(c.values())
        kl = sum(
            round(
                (n / n_g) * math.log(n * n_total / (n_g * overall[w])), 9
            )
            for w, n in c.items()
        )
        out[g] = (n_g, round(kl, 6))
    return out


def test_kl_matches_naive_reference(spark):
    df = spark.createDataFrame(DOCS, "source STRING, text STRING")
    got = {
        r["source"]: (r["n_tokens"], r["kl_divergence"])
        for r in unigram_kl_drift(df, "source").collect()
    }
    want = _naive_kl(DOCS)
    assert set(got) == set(want)
    for g in want:
        assert got[g][0] == want[g][0]
        assert got[g][1] == pytest.approx(want[g][1], abs=2e-6)
    # the off-distribution slice drifts more than the on-distribution one
    assert got["b"][1] > got["a"][1] > 0


def test_kl_zero_for_identical_distribution(spark):
    # two slices with the SAME word distribution: each KL term is
    # ln(1) = 0, so both slices score exactly 0.
    docs = [("x", "alpha beta gamma"), ("y", "alpha beta gamma")]
    df = spark.createDataFrame(docs, "source STRING, text STRING")
    rows = unigram_kl_drift(df, "source").collect()
    assert {r["source"] for r in rows} == {"x", "y"}
    assert all(r["kl_divergence"] == 0.0 for r in rows)
