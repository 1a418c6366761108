"""Repetition-filter metrics (operators/text.py repetition_features)."""

from __future__ import annotations

import pytest

from delta_lake_pyspark_scd2_spark.operators import text


def _feat(spark, s: str):
    df = spark.createDataFrame([(1, s)], "doc_id long, text string")
    return text.repetition_features(df).collect()[0]


def test_no_repetition(spark):
    r = _feat(spark, "one two three four five")
    assert r["n_words"] == 5
    assert r["dup_word_frac"] == 0.0
    assert r["top_bigram_share"] == 0.25  # every bigram occurs once, 4 bigrams
    assert r["dup_3gram_char_frac"] == 0.0


def test_fully_repeated(spark):
    r = _feat(spark, "spam spam spam spam")
    assert r["dup_word_frac"] == 0.75  # 4 words, 1 distinct
    assert r["top_bigram_share"] == 1.0  # all 3 bigrams identical
    assert r["dup_3gram_char_frac"] == 1.0  # both trigrams identical


def test_partial_trigram_dup_char_fraction(spark):
    # "a b c a b c x": trigrams = [abc, bca, cab, abc, bcx] -> "a b c"
    # appears twice (2*5=10 chars dup) of total 5*5=25 gram chars
    r = _feat(spark, "a b c a b c x")
    assert r["dup_3gram_char_frac"] == pytest.approx(10 / 25)


def test_degenerate_docs_report_zeros(spark):
    for s in ("", "solo", "two words"):
        r = _feat(spark, s)
        assert r["top_bigram_share"] in (0.0, 1.0)  # "two words": 1 bigram
        assert r["dup_3gram_char_frac"] == 0.0
        assert r["dup_word_frac"] == 0.0


def test_whitespace_normalized_before_counting(spark):
    a = _feat(spark, "Spam  SPAM   spam")
    assert a["n_words"] == 3
    assert a["dup_word_frac"] == pytest.approx(2 / 3)


def test_pack_sequences_invariants(spark):
    # packing invariants: bins fill in order, offsets consistent with
    # running token totals, no doc split across bins
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate([100, 400, 300, 50, 512, 20])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = (
        text.pack_sequences(df, seq_len=512, n_groups=1)
        .orderBy("doc_id")
        .collect()
    )
    # single group: exclusive prefix sums drive bins deterministically
    run = 0
    for r in out:
        assert r["bin_ix"] == run // 512
        assert r["start_offset"] == run % 512
        run += r["n_toks"]
    # determinism across partitionings
    again = (
        text.pack_sequences(df.repartition(5), seq_len=512, n_groups=1)
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in again] == [tuple(r) for r in out]
