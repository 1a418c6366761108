"""Eval-set decontamination (operators/decontam.py).

Covers: exact 13-gram contamination detection, the short-text
whole-text fallback, survivors keeping all columns, and the plan pin
that the eval n-gram set rides a broadcast (never a shuffled join).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.operators import decontam

_EVAL = [
    (100, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"),
    (101, "short eval text"),
]
_W13 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"


def _docs(spark):
    rows = [
        # shares the full eval 13-gram, embedded mid-text
        (1, "prefix words " + _W13 + " suffix words", "a"),
        # shares only a 12-gram prefix of it -> clean at n=13
        (2, " ".join(_W13.split()[:12]) + " DIFFERENT tail", "b"),
        # exact copy of the short eval text (whole-text fallback)
        (3, "short eval text", "c"),
        # totally unrelated
        (4, "the quick brown fox jumps over the lazy dog again and again", "d"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, src string")


def _eval_df(spark):
    return spark.createDataFrame(_EVAL, "doc_id long, text string")


def test_contamination_flags_and_counts(spark):
    out = {
        r["doc_id"]: (r["shared_grams"], r["contaminated"])
        for r in decontam.contamination(_docs(spark), _eval_df(spark)).collect()
    }
    assert out[1] == (1, True)
    assert out[2] == (0, False)
    assert out[3][1] is True  # whole-short-text match
    assert out[4] == (0, False)


def test_decontaminate_keeps_clean_rows_with_all_columns(spark):
    surv = decontam.decontaminate(_docs(spark), _eval_df(spark))
    assert set(surv.columns) == {"doc_id", "text", "src"}
    assert sorted(r["doc_id"] for r in surv.collect()) == [2, 4]


def test_short_doc_against_long_eval_is_clean(spark):
    # a doc shorter than n words only matches if its WHOLE text is an
    # eval gram — a substring of an eval doc's text is not enough
    docs = spark.createDataFrame(
        [(9, "alpha beta gamma")], "doc_id long, text string"
    )
    out = decontam.contamination(docs, _eval_df(spark)).collect()
    assert out[0]["contaminated"] is False


def test_eval_side_is_broadcast(spark):
    plan = (
        decontam.decontaminate(_docs(spark), _eval_df(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_doc_sharing_gram_with_itself_not_contaminated(spark):
    # internal repetition inside a training doc must not flag it
    docs = spark.createDataFrame(
        [(5, ("repeat me " * 20).strip(), "a")], "doc_id long, text string, src string"
    )
    out = decontam.contamination(docs, _eval_df(spark)).collect()
    assert out[0]["contaminated"] is False
