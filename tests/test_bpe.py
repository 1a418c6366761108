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


def _rank_order_replace_encode(
    word: str, merges: list[tuple[str, str]]
) -> list[str]:
    """The oracle's encode semantics (plans/llm_ops.bpe_encode_bounded):
    apply each merge once, in rank order, as a greedy left-to-right
    non-overlapping replace on the SEP-wrapped symbol string."""
    sym = bpe._word_symbols(word)
    if not sym:
        return []
    rep = bpe.SEP + (bpe.SEP + bpe.SEP).join(sym) + bpe.SEP
    for l, r in merges:
        rep = rep.replace(
            bpe.SEP + l + bpe.SEP + bpe.SEP + r + bpe.SEP,
            bpe.SEP + l + r + bpe.SEP,
        )
    return rep.strip(bpe.SEP).split(bpe.SEP + bpe.SEP)


@given(
    st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=12),
        min_size=1,
        max_size=30,
    ),
    st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=10), max_size=10
    ),
)
@settings(max_examples=200, deadline=None)
def test_encode_word_equals_rank_order_replace_chain(corpus, probe_words):
    """The theorem bpe_encode_bounded's oracle rests on: because a
    merge learned at rank r can never CREATE an occurrence of a pair
    learned at rank < r, _encode_word's iterated lowest-rank-first
    loop equals one rank-ordered pass of greedy non-overlapping
    replace-alls. Fuzzed over random corpora (merge rules learned from
    the corpus, so they have the valid-training-sequence structure the
    theorem requires) and random probe words, in- and out-of-corpus."""
    vocab: dict[tuple[str, ...], int] = {}
    for w in corpus:
        sym = bpe._word_symbols(w)
        vocab[sym] = vocab.get(sym, 0) + 1
    # driver-side trainer, inlined: same selection rule as train_bpe
    merges: list[tuple[str, str]] = []
    for _ in range(8):
        pairs: dict[tuple[str, str], int] = {}
        for sym, cnt in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        pair, best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best < 2:
            break
        merges.append(pair)
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, cnt in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
                    out.append(pair[0] + pair[1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + cnt
        vocab = new_vocab
    ranks = {p: i for i, p in enumerate(merges)}
    for w in list(corpus) + list(probe_words):
        assert bpe._encode_word(w, ranks) == _rank_order_replace_encode(
            w, merges
        ), (w, merges)
