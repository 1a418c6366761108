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


def test_cluster_safe_split_never_leaks_and_hits_shares(spark):
    """The structural guarantee: every near-dup cluster lands WHOLE in
    one split (zero cross-split near-dup pairs — the leakage the audit
    measures on doc-level splits), and the split shares approximate
    the 80/10/10 weights."""
    from delta_lake_pyspark_scd2_spark.operators import dedup, graph
    from delta_lake_pyspark_scd2_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    pairs = dedup.ngram_jaccard_pairs_prefix(docs, threshold=0.8).select(
        "id_a", "id_b"
    )
    out = graph.cluster_safe_split(docs, pairs).collect()
    split_of = {r["doc_id"]: r["split"] for r in out}
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())  # whole clusters
    # no near-dup pair straddles a boundary
    for p in pairs.collect():
        assert split_of[p["id_a"]] == split_of[p["id_b"]]
    n = len(out)
    shares = {
        s: sum(1 for v in split_of.values() if v == s) / n
        for s in ("train", "val", "test")
    }
    assert 0.7 < shares["train"] < 0.9
    assert 0.05 < shares["val"] < 0.16 and 0.05 < shares["test"] < 0.16
    # deterministic: a second run assigns identically
    again = {
        r["doc_id"]: r["split"]
        for r in graph.cluster_safe_split(docs, pairs).collect()
    }
    assert again == split_of


def test_embed_diversity_identity_matches_bruteforce_pairs(spark):
    """The O(n*d) aggregate-vector identity equals the O(n^2) mean of
    pairwise cosines (up to the float-rounding contract)."""
    import itertools
    import math
    import random

    from delta_lake_pyspark_scd2_spark.plans.registry import REGISTRY

    rng = random.Random(7)
    rows = []
    for vid in range(40):
        label = vid % 3
        vec = [rng.uniform(-1, 1) + (0.5 if label == 0 else 0.0) for _ in range(8)]
        rows.append((vid, vec, label))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/embeddings.parquet")
        out = {
            r["label"]: (r["n"], r["mean_pairwise_cos"])
            for r in REGISTRY["embed_diversity"].builder(spark, d).collect()
        }
    # brute force in python over float32-rounded inputs (parquet stores
    # float32; read back what spark saw)
    by_label: dict[int, list[list[float]]] = {}
    for vid, vec, label in rows:
        import struct

        v32 = [struct.unpack("f", struct.pack("f", x))[0] for x in vec]
        n = math.sqrt(sum(x * x for x in v32))
        by_label.setdefault(label, []).append([x / n for x in v32])
    for label, vecs in by_label.items():
        pair_cos = [
            sum(a * b for a, b in zip(u, v))
            for u, v in itertools.combinations(vecs, 2)
        ]
        want = sum(pair_cos) * 2 / (len(vecs) * (len(vecs) - 1))
        n_got, got = out[label]
        assert n_got == len(vecs)
        assert abs(got - want) < 1e-4, (label, got, want)
