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


def test_sampled_training_agrees_with_full(spark, sf_dir):
    """The 100 TB shape: train on a deterministic hash-sample, score
    everything. The sampled model must (a) score EVERY document, (b)
    agree with the full-corpus model on the vast majority of
    predictions, and (c) still beat the majority baseline."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    full = quality_filter_scores(docs, dim=32, iters=12)
    sampled = quality_filter_scores(docs, dim=32, iters=12, sample_frac=0.5)
    n = docs.count()
    assert sampled.count() == n  # scores everything, not just the sample
    both = full.select("doc_id", F.col("pred").alias("pf")).join(
        sampled.select("doc_id", "label", F.col("pred").alias("ps")), "doc_id"
    )
    row = both.agg(
        F.avg((F.col("pf") == F.col("ps")).cast("double")).alias("agree"),
        F.avg((F.col("ps") == F.col("label")).cast("double")).alias("acc"),
        F.avg("label").alias("pos_rate"),
    ).collect()[0]
    assert row["agree"] > 0.85
    majority = max(row["pos_rate"], 1 - row["pos_rate"])
    assert row["acc"] > majority + 0.1


def test_sample_predicate_is_deterministic_and_proportional(spark):
    from delta_lake_pyspark_scd2_spark.operators.classifier import (
        sample_predicate,
    )

    df = spark.range(4000).withColumnRenamed("id", "doc_id")
    a = df.filter(sample_predicate("doc_id", 0.25))
    n = a.count()
    assert abs(n / 4000 - 0.25) < 0.05
    # same rows every time, independent of partitioning
    b = df.repartition(7).filter(sample_predicate("doc_id", 0.25))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_auc_known_values_and_ties(spark):
    """auc() against hand-computable cases: perfect separation = 1.0,
    perfect inversion = 0.0, all-tied = 0.5, a mixed-tie case computed
    by the textbook tie-averaged Mann-Whitney formula, and a
    single-class frame = NULL (undefined, not 0)."""
    from delta_lake_pyspark_scd2_spark.operators.classifier import auc

    def run(scores, labels):
        df = spark.createDataFrame(
            [(i, float(s), l) for i, (s, l) in enumerate(zip(scores, labels))],
            "doc_id long, score double, label int",
        )
        return auc(df).collect()[0]

    r = run([0.1, 0.2, 0.8, 0.9], [0, 0, 1, 1])
    assert (r["n_pos"], r["n_neg"], r["auc"]) == (2, 2, 1.0)
    assert run([0.1, 0.2, 0.8, 0.9], [1, 1, 0, 0])["auc"] == 0.0
    assert run([0.5, 0.5, 0.5, 0.5], [0, 1, 0, 1])["auc"] == 0.5
    # ties [1,1,2,2] labels [0,1,0,1]: avg ranks 1.5,1.5,3.5,3.5 ->
    # AUC = (5 - 2*3/2) / (2*2) = 0.5
    assert run([1, 1, 2, 2], [0, 1, 0, 1])["auc"] == 0.5
    # mixed: scores 1..6, pos = {2,5,6}: R+ = 2+5+6 = 13 ->
    # (13 - 6) / 9 = 0.777778
    assert run([1, 2, 3, 4, 5, 6], [0, 1, 0, 0, 1, 1])["auc"] == 0.777778
    assert run([0.1, 0.9], [1, 1])["auc"] is None


def test_round_half_up_matches_engine_tie_breaking():
    """Driver-side chained literals must round ties AWAY FROM ZERO like
    Spark F.round / DuckDB round — not Python's half-to-even (round-9
    advice: a .5 tie in a weight update would corrupt all later
    iterations' literals)."""
    from delta_lake_pyspark_scd2_spark.operators.classifier import (
        _round_half_up,
    )

    assert _round_half_up(0.0000005, 6) == 0.000001   # builtin gives 0.0
    assert _round_half_up(-0.0000005, 6) == -0.000001
    assert _round_half_up(0.1234565, 6) == 0.123457
    assert _round_half_up(2.5, 0) == 3.0              # builtin gives 2.0
    assert _round_half_up(0.123456449, 6) == 0.123456
