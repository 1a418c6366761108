"""BPE tokenizer: hand-checkable training, round-trip decode, Zipf
compression on the corpus, and determinism across runs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from delta_lake_pyspark_scd2_spark.operators import bpe


def test_train_bpe_golden_merges(spark):
    """Sennrich's classic example shape: 'low' x5, 'lower' x2,
    'newest' x6, 'widest' x3 — the first merges must pick the
    highest-frequency pairs ('e','s') then ('es','t</w>')."""
    words = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    df = spark.createDataFrame([(0, " ".join(words))], ["doc_id", "text"])
    merges = bpe.train_bpe(df, num_merges=4)
    # e+s occurs 9x (newest 6 + widest 3) — always first
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t</w>")
    # after est</w>: 'n e w est</w>' / 'w i d est</w>' / 'l o w</w>' / 'l o w e r</w>'
    # l+o occurs 7x (low 5 + lower 2) — next
    assert merges[2] == ("l", "o")


def test_encode_matches_merges_and_decodes(spark):
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    df = spark.createDataFrame([(0, " ".join(words))], ["doc_id", "text"])
    merges = bpe.train_bpe(df, num_merges=10)
    out = bpe.bpe_encode(df, merges).collect()[0]
    assert out["n_bpe_tokens"] == len(out["bpe_tokens"])
    # decoding restores the normalized text exactly
    assert bpe.decode_tokens(out["bpe_tokens"]) == " ".join(words)
    # trained merges compress below character count
    n_chars = sum(len(w) for w in words)
    assert out["n_bpe_tokens"] < n_chars


def test_bpe_corpus_compression_and_determinism(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m1 = bpe.train_bpe(docs, num_merges=50)
    m2 = bpe.train_bpe(docs, num_merges=50)
    assert m1 == m2  # deterministic training
    enc = bpe.bpe_encode(docs, m1)
    row = enc.selectExpr(
        "sum(n_bpe_tokens) AS bpe",
        "sum(length(text)) AS chars",
        "sum(size(split(trim(text), '\\\\s+'))) AS words",
    ).collect()[0]
    # subword count sits between word count and char count
    assert row["words"] < row["bpe"] < row["chars"]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        min_size=1,
        max_size=20,
    )
)
def test_bpe_roundtrip_property(spark, words):
    """Any corpus round-trips: decode(encode(text)) == normalized text."""
    text = " ".join(words)
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    merges = bpe.train_bpe(df, num_merges=20)
    out = bpe.bpe_encode(df, merges).collect()[0]
    assert bpe.decode_tokens(out["bpe_tokens"]) == text


def test_distributed_merge_rounds_match_driver_training(spark):
    """The distributed pair-count/argmax/replace rounds must select
    exactly the merges the driver-side train_bpe loop selects —
    including on runs, where greedy non-overlapping application
    matters ('aaaa' contributes (a,a) twice but merges once)."""
    from delta_lake_pyspark_scd2_spark.operators import bpe

    texts = [
        ("the cat the cat aaaa",),
        ("aaaa aaab the hat",),
        ("cat hat bat the the",),
    ]
    df = spark.createDataFrame(texts, "text string")
    want = bpe.train_bpe(df, num_merges=4)
    got = [
        (r["left_sym"], r["right_sym"])
        for r in bpe.distributed_merge_rounds(df, rounds=4)
        .orderBy("round")
        .collect()
    ]
    assert got == want


def test_distributed_merge_rounds_counts_are_weighted(spark):
    from delta_lake_pyspark_scd2_spark.operators import bpe

    # "ab" x3, "cd" x1 -> round 1 must pick (a, b</w>) with count 3
    df = spark.createDataFrame(
        [("ab ab",), ("ab cd",)], "text string"
    )
    rows = bpe.distributed_merge_rounds(df, rounds=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["left_sym"], r["right_sym"], r["pair_count"]) == ("a", "b</w>", 3)
