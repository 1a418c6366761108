"""Weighted A-ES sampling and hard-negative mining vs naive in-memory
references (the oracles pin cross-engine equality; these pin the
semantics against an independent reimplementation)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.operators.mixture import weighted_sample
from delta_lake_pyspark_scd2_spark.operators.similarity import (
    hard_negatives_topk,
)


def _u(doc_id: int, salt: str = "ws") -> float:
    h = int(hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:8], 16)
    return (h + 0.5) / float(1 << 32)


def test_weighted_sample_matches_naive_aes(spark):
    rows = [(i, (i * 37) % 100 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [
        r["doc_id"]
        for r in weighted_sample(df, F.col("w"), k=20).collect()
    ]
    keyed = sorted(
        rows,
        key=lambda r: (-round(r[1] / -math.log(_u(r[0])), 6), r[0]),
    )
    assert got == [doc_id for doc_id, _ in keyed[:20]]


def test_weighted_sample_heavier_weight_wins_ties_in_u(spark):
    # same id -> same u; scaling every weight x10 must keep the sample
    rows = [(i, (i % 7) + 1) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    a = {r["doc_id"] for r in weighted_sample(df, F.col("w"), k=15).collect()}
    b = {
        r["doc_id"]
        for r in weighted_sample(
            df, F.col("w") * 10, k=15
        ).collect()
    }
    assert a == b  # A-ES keys are scale-equivariant in the weight


def test_hard_negatives_all_differ_and_match_numpy(spark):
    rng = np.random.default_rng(13)
    vecs = rng.normal(size=(60, 8))
    labels = [i % 3 for i in range(60)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], labels[i]) for i in range(60)],
        "vec_id long, embedding array<double>, label int",
    )
    out = hard_negatives_topk(df, df.filter(F.col("vec_id") < 4), k=5).collect()
    assert all(r["negative_label"] != labels[r["query_id"]] for r in out)
    norms = np.linalg.norm(vecs, axis=1)
    for qid in range(4):
        sims = [
            (
                round(float(vecs[qid] @ vecs[j]) / (norms[qid] * norms[j]), 6),
                j,
            )
            for j in range(60)
            if labels[j] != labels[qid]
        ]
        want = [j for s, j in sorted(sims, key=lambda t: (-t[0], t[1]))[:5]]
        got = [
            r["negative_id"]
            for r in sorted(
                (r for r in out if r["query_id"] == qid),
                key=lambda r: r["rank"],
            )
        ]
        assert got == want
