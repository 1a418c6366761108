"""Byte-pair-encoding tokenizer: corpus-trained merges, distributed
apply — the real-tokenizer upgrade over the whitespace/BPE-ish-regex
token counts in :mod:`operators.text`.

Scale design (how this runs over 100 TB):

* **Training reads the corpus once.** BPE training never needs the
  corpus — only the word-frequency table (Sennrich et al. 2016). One
  ``explode → groupBy word`` shuffle with map-side partial counts
  compresses 100 TB of text to ≤ ``max_words`` rows (top-K by count,
  deterministic ``(count desc, word)`` tie-break), which is driver-safe
  by construction and logged when the cap truncates.
* **The merge loop is driver-side on the compressed dict** — standard
  practice (it is O(vocab · merges), independent of corpus size).
* **Apply is a narrow Arrow-batched map.** The merges table ships to
  executors inside the UDF closure (broadcast-sized: ``num_merges``
  pairs); each Arrow batch keeps a word→tokens memo, so the greedy
  merge loop runs once per DISTINCT word per batch — Zipf makes that
  a small fraction of token volume. No shuffle, no driver involvement.

Non-goals: byte-level fallback and special tokens (this is the
word-boundary variant with an end-of-word marker, enough to measure
real subword token counts and fertility).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_lake_pyspark_scd2_spark.operators.text import normalize_text

#: End-of-word marker appended to each word's final symbol before
#: merging (Sennrich-style), so "low" ≠ prefix-of-"lower" at the merge
#: table level and decoding is unambiguous.
EOW = "</w>"


def word_frequencies(
    df: DataFrame, text_col: str = "text", *, max_words: int = 100_000
) -> list[tuple[str, int]]:
    """Corpus word-frequency table, deterministically capped at
    ``max_words`` rows by (count desc, word asc)."""
    counts = (
        df.select(
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias(
                "word"
            )
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(max_words)
        .collect()
    )
    return [(r["word"], int(r["cnt"])) for r in counts]


def _word_symbols(word: str) -> tuple[str, ...]:
    if not word:
        return ()
    chars = list(word)
    chars[-1] = chars[-1] + EOW
    return tuple(chars)


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    *,
    num_merges: int = 200,
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merge rules from the corpus. Deterministic:
    ties in pair frequency break lexicographically."""
    freqs = word_frequencies(df, text_col, max_words=max_words)
    vocab: dict[tuple[str, ...], int] = {}
    for word, cnt in freqs:
        sym = _word_symbols(word)
        if sym:
            vocab[sym] = vocab.get(sym, 0) + cnt

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, cnt in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        # highest count, ties broken by lexicographically smallest pair
        pair, best_cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best_cnt < 2:
            break  # nothing repeats; further merges are noise
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, cnt in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == pair[0] and sym[i + 1] == pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + cnt
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(_word_symbols(word))
    while len(sym) > 1:
        ranked = [
            (ranks.get((a, b)), i)
            for i, (a, b) in enumerate(zip(sym, sym[1:]))
        ]
        ranked = [(r, i) for r, i in ranked if r is not None]
        if not ranked:
            break
        _, i = min(ranked)
        sym[i : i + 2] = [sym[i] + sym[i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Append ``bpe_tokens`` (array<string>) and ``n_bpe_tokens`` via an
    Arrow-batched map with per-batch word memoization."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("bpe_tokens", T.ArrayType(T.StringType())),
            T.StructField("n_bpe_tokens", T.IntegerType()),
        ]
    )

    def _apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        memo: dict[str, list[str]] = {}
        # Java regex \s (training side, operators.text.normalize_text)
        # is ASCII-only; Python \s is Unicode-aware. Use the literal
        # ASCII class so a non-breaking space tokenizes IDENTICALLY in
        # training and encoding (else merges learned over 'a\xa0b'
        # never apply at encode time).
        ws = re.compile(r"[ \t\n\x0b\f\r]+")

        def enc(text: str):
            if text is None:
                return [], 0
            norm = ws.sub(" ", text.lower()).strip(" \t\n\x0b\f\r")
            toks: list[str] = []
            for w in norm.split(" "):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = _encode_word(w, ranks)
                    memo[w] = got
                toks.extend(got)
            return toks, len(toks)

        for pdf in batches:
            encoded = [enc(t) for t in pdf[text_col]]
            pdf = pdf.copy()
            pdf["bpe_tokens"] = [e[0] for e in encoded]
            pdf["n_bpe_tokens"] = pd.array(
                [e[1] for e in encoded], dtype="int32"
            )
            yield pdf

    return df.mapInPandas(_apply, schema=out_schema)


def decode_tokens(tokens: list[str]) -> str:
    """Inverse of encoding for round-trip checks: concatenate and split
    on the end-of-word marker."""
    return " ".join(w for w in "".join(tokens).split(EOW) if w != "")


#: Symbol separator for the distributed merge representation (unit
#: separator — cannot appear in normalized text).
SEP = "\x1f"


def distributed_merge_rounds(
    df: DataFrame, text_col: str = "text", *, rounds: int = 3
) -> DataFrame:
    """The first ``rounds`` BPE merge selections computed
    DISTRIBUTEDLY — pair counting never leaves the cluster, unlike
    :func:`train_bpe` whose merge loop runs driver-side on the
    compressed word-frequency dict. This is the scale path for the
    opening merges (where the pair table is vocabulary-sized but the
    word dict may exceed the driver) and, because every step is
    deterministic integer arithmetic, the one part of BPE training
    that can be value-hash oracled end to end (the driver-side loop is
    rows-only by design).

    Representation: each word's symbol sequence is a single string
    with every symbol wrapped in SEP (``\\x1f a \\x1f\\x1f b</w> \\x1f``)
    — applying a merge is then ONE literal ``replace`` of
    ``SEP l SEP SEP r SEP`` with ``SEP lr SEP``, whose left-to-right
    non-overlapping scan IS greedy BPE application, including runs
    (the shared separator between wrapped symbols makes consecutive
    matches adjacent, not overlapping), while the wrapping makes a
    pair pattern unable to match inside multi-char symbols.

    Per round: one adjacent-pair explode + map-side-combined count
    (shuffle keyed on the pair, volume ≤ distinct adjacent pairs), a
    distributed top-1 (TakeOrdered: count desc, then (left, right)
    asc), one literal-replace map stage. Driver state = one merge rule
    per round. Returns ``(round, left_sym, right_sym, pair_count)``.
    """
    spark = df.sparkSession
    words = (
        df.select(
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias(
                "word"
            )
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rep = F.concat(
        F.lit(SEP),
        F.array_join(F.expr("regexp_extract_all(word, '.', 0)"), SEP + SEP),
        F.lit(EOW + SEP),
    )
    state = words.select("cnt", rep.alias("rep"))
    out: list[tuple[int, str, str, int]] = []
    for t in range(1, rounds + 1):
        state = state.localCheckpoint(eager=False)
        syms = F.split(F.btrim(F.col("rep"), F.lit(SEP)), SEP + SEP)
        pairs = (
            state.withColumn("__syms", syms)
            .filter(F.size("__syms") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.arrays_zip(
                        F.slice("__syms", 1, F.size("__syms") - 1),
                        F.slice("__syms", 2, F.size("__syms") - 1),
                    )
                ).alias("__p"),
            )
            .select(
                "cnt",
                F.col("__p")["0"].alias("l"),
                F.col("__p")["1"].alias("r"),
            )
        )
        top_rows = (
            pairs.groupBy("l", "r")
            .agg(F.sum("cnt").alias("s"))
            .orderBy(F.col("s").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top_rows:  # nothing left to merge
            break
        top = top_rows[0]
        out.append((t, top["l"], top["r"], int(top["s"])))
        state = state.withColumn(
            "rep",
            F.replace(
                F.col("rep"),
                F.lit(SEP + top["l"] + SEP + SEP + top["r"] + SEP),
                F.lit(SEP + top["l"] + top["r"] + SEP),
            ),
        )
    return spark.createDataFrame(
        out, "round int, left_sym string, right_sym string, pair_count long"
    )
