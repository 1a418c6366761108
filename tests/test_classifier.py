"""Distributed logistic regression: learns a separable task to high
accuracy, loss decreases monotonically, and the corpus quality filter
beats the random baseline."""

from __future__ import annotations

import pyspark.sql.functions as F

from delta_lake_pyspark_scd2_spark.operators.classifier import (
    predict,
    quality_filter_scores,
    train_logreg,
)


def test_learns_separable_task(spark):
    """y = 1 iff x[0] > 0 — linearly separable; GD must find it."""
    rows = [
        ([float(i % 7 - 3), float((i * 13) % 5 - 2)], 1 if i % 7 - 3 > 0 else 0)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["embedding", "label"])
    model = train_logreg(df, dim=2, iters=40, lr=1.0)
    # loss strictly decreases through training
    assert all(a >= b for a, b in zip(model["loss"], model["loss"][1:]))
    assert model["loss"][-1] < model["loss"][0] / 3
    scored = predict(df, model)
    acc = scored.agg(
        F.avg(((F.col("score") > 0.5).cast("int") == F.col("label")).cast("double"))
    ).collect()[0][0]
    assert acc > 0.95
    # the learned separator weights dimension 0, not the noise dim
    assert abs(model["weights"][0]) > abs(model["weights"][1])


def test_quality_filter_beats_baseline(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = quality_filter_scores(docs, dim=32, iters=12)
    row = out.agg(
        F.avg((F.col("pred") == F.col("label")).cast("double")).alias("acc"),
        F.avg("label").alias("pos_rate"),
    ).collect()[0]
    majority = max(row["pos_rate"], 1 - row["pos_rate"])
    assert row["acc"] > majority + 0.1  # genuinely learned, not majority-vote
