"""Property tests: the distributed span-dedup operators vs a naive
single-process reference implementation on random tiny corpora.

The naive model is deliberately O(docs² · tokens) — dict-of-span-counts
plus per-token coverage loops — so any divergence localizes a bug in
the relational formulation (window hashing, keep-first ordering,
coverage masking), not in the model.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from delta_lake_pyspark_scd2_spark.operators.dedup import (
    duplicate_spans,
    remove_duplicate_spans,
)

# Small vocab forces frequent genuine span collisions.
_word = st.sampled_from(["a", "b", "c", "d"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)

K = 3


def _windows(tokens: list[str]) -> list[tuple[int, str]]:
    return [
        (i + 1, " ".join(tokens[i : i + K]))
        for i in range(len(tokens) - K + 1)
    ]


def _naive(corpus: list[str]):
    """Reference: span counts, per-doc dup stats, keep-first removal."""
    toks = {i: (d.split(" ") if d else [""]) for i, d in enumerate(corpus)}
    counts: dict[str, int] = {}
    for i, t in toks.items():
        if len(t) < K:
            continue
        for _, w in _windows(t):
            counts[w] = counts.get(w, 0) + 1

    stats = {}  # doc -> (n_windows, n_dup_windows)
    for i, t in toks.items():
        if len(t) < K:
            continue
        wins = _windows(t)
        stats[i] = (len(wins), sum(1 for _, w in wins if counts[w] >= 2))

    # keep-first: global (doc, pos) order per span
    first: dict[str, tuple[int, int]] = {}
    for i in sorted(toks):
        for p, w in _windows(toks[i]) if len(toks[i]) >= K else []:
            if counts[w] >= 2 and w not in first:
                first[w] = (i, p)
    cleaned = {}
    for i, t in toks.items():
        removed_starts = [
            p
            for p, w in (_windows(t) if len(t) >= K else [])
            if counts[w] >= 2 and first[w] != (i, p)
        ]
        keep = [
            tok
            for j, tok in enumerate(t, start=1)
            if not any(p <= j <= p + K - 1 for p in removed_starts)
        ]
        cleaned[i] = (len(t), len(t) - len(keep), " ".join(keep))
    return stats, cleaned


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus=_corpus)
def test_span_ops_match_naive_model(spark, corpus):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(corpus)], ["doc_id", "text"]
    )
    want_stats, want_clean = _naive(corpus)

    got_stats = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
        for r in duplicate_spans(df, window=K).collect()
    }
    assert got_stats == want_stats

    got_clean = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in remove_duplicate_spans(df, window=K).collect()
    }
    assert got_clean == want_clean
