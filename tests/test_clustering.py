"""Distributed spherical k-means vs a naive in-memory Lloyd's.

The registry oracle already value-hash-checks the operator against an
unrolled SQL Lloyd's at sf0.01/sf0.1; these tests pin the semantics on
hand-built corpora where the expected geometry is obvious, including
the empty-cluster keep-previous rule the SQL unroll depends on.
"""

from __future__ import annotations

import numpy as np
import pytest

from delta_lake_pyspark_scd2_spark.operators import clustering


def _naive_spherical_kmeans(vecs: np.ndarray, k: int, iters: int):
    """Reference Lloyd's with the operator's exact determinism contract:
    seed = k lowest-id rows, 6-dp-rounded cosine, ties to lower
    centroid id, 6-dp-rounded means, empty clusters keep centroids."""
    cents = {i: vecs[i].astype(float) for i in range(k)}

    def assign(cents):
        out = {}
        for vid, v in enumerate(vecs):
            best = None
            for cid in sorted(cents):
                c = cents[cid]
                sim = round(
                    float(v @ c) / (np.linalg.norm(v) * np.linalg.norm(c)), 6
                )
                if best is None or sim > best[0]:
                    best = (sim, cid)
            out[vid] = best[1]
        return out

    for _ in range(iters):
        a = assign(cents)
        for cid in list(cents):
            members = [vecs[vid] for vid, c in a.items() if c == cid]
            if members:
                cents[cid] = np.round(np.mean(members, axis=0), 6)
    return assign(cents)


def _to_df(spark, vecs: np.ndarray):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_matches_naive_lloyd(spark):
    rng = np.random.default_rng(7)
    # 3 well-separated direction cones, 40 points each
    base = rng.normal(size=(3, 6))
    vecs = np.vstack(
        [base[i] * 5 + rng.normal(size=(40, 6)) * 0.3 for i in range(3)]
    )
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in clustering.kmeans_cluster(
            _to_df(spark, vecs), k=3, iters=2, dim=6
        ).collect()
    }
    want = _naive_spherical_kmeans(vecs, k=3, iters=2)
    assert got == want


def test_kmeans_recovers_separated_cones(spark):
    rng = np.random.default_rng(11)
    dirs = np.eye(4)  # orthogonal cones: cosine separates them exactly
    labels = np.repeat(np.arange(4), 25)
    vecs = dirs[labels] * 10 + rng.normal(size=(100, 4)) * 0.2
    rows = clustering.kmeans_cluster(
        _to_df(spark, vecs), k=4, iters=3, dim=4
    ).collect()
    got = {r["vec_id"]: r["cluster_id"] for r in rows}
    # every true cone maps to exactly one cluster id and vice versa
    by_label = {}
    for vid, lab in enumerate(labels):
        by_label.setdefault(int(lab), set()).add(got[vid])
    assert all(len(cids) == 1 for cids in by_label.values())
    assert len({next(iter(c)) for c in by_label.values()}) == 4


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # two far duplicate-direction groups + k=3: the third seed (a group-1
    # member) loses all points after round 1, so its centroid must stay
    # put rather than vanish (the oracle's coalesce branch).
    vecs = np.array(
        [[10.0, 0.0], [10.0, 0.1], [9.9, 0.2]] + [[0.0, 10.0]] * 5
    )
    cents = clustering.kmeans_fit(
        _to_df(spark, vecs), k=3, iters=2, dim=2
    ).collect()
    assert len(cents) == 3
    got_ids = sorted(r["vec_id"] for r in cents)
    assert got_ids == [0, 1, 2]
    want = _naive_spherical_kmeans(vecs, k=3, iters=2)
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in clustering.kmeans_cluster(
            _to_df(spark, vecs), k=3, iters=2, dim=2
        ).collect()
    }
    assert got == want


def test_kmeans_driver_state_is_model_sized(spark):
    """kmeans_fit must never collect() anything but k-row frames."""
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(60, 5))
    df = _to_df(spark, vecs)
    cls = type(df)  # the concrete (classic) DataFrame, not the ABC
    orig = cls.collect
    sizes = []

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    cls.collect = spy
    try:
        clustering.kmeans_fit(df, k=4, iters=2, dim=5)
    finally:
        cls.collect = orig
    assert sizes and max(sizes) <= 4


# ---------------------------------------------------------------------------
# kcenter_select
# ---------------------------------------------------------------------------


def _cone(rng, base, n):
    return base[None, :] + rng.normal(scale=0.02, size=(n, base.size))


def test_kcenter_picks_one_per_separated_cone(spark):
    rng = np.random.default_rng(7)
    a = _cone(rng, np.array([10.0, 0.0, 0.0]), 10)
    b = _cone(rng, np.array([0.0, 10.0, 0.0]), 10)
    c = _cone(rng, np.array([0.0, 0.0, 10.0]), 10)
    df = _to_df(spark, np.vstack([a, b, c]))
    got = clustering.kcenter_select(df, k=3).collect()
    groups = {r["vec_id"] // 10 for r in got}
    assert groups == {0, 1, 2}, "each cone must contribute one center"


def test_kcenter_seed_order_and_monotone_coverage(spark):
    rng = np.random.default_rng(11)
    df = _to_df(spark, rng.normal(size=(40, 6)))
    got = sorted(
        clustering.kcenter_select(df, k=6).collect(),
        key=lambda r: r["sel_order"],
    )
    assert [r["sel_order"] for r in got] == list(range(1, 7))
    assert got[0]["vec_id"] == 0 and got[0]["coverage_sim"] is None
    assert len({r["vec_id"] for r in got}) == 6
    sims = [r["coverage_sim"] for r in got[1:]]
    assert sims == sorted(sims), "coverage_sim must be non-decreasing"


def test_kcenter_k_exceeding_corpus_returns_all(spark):
    rng = np.random.default_rng(13)
    df = _to_df(spark, rng.normal(size=(4, 3)))
    got = clustering.kcenter_select(df, k=9)
    assert got.count() == 4


def test_kcenter_driver_state_is_model_sized(spark):
    """Every collect() is a single row (seed / argmin picks)."""
    rng = np.random.default_rng(17)
    df = _to_df(spark, rng.normal(size=(30, 4)))
    cls = type(df)
    orig = cls.collect
    sizes = []

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    cls.collect = spy
    try:
        clustering.kcenter_select(df, k=5)
    finally:
        cls.collect = orig
    assert sizes and max(sizes) <= 1


def test_kcenter_oversampled_quality_and_determinism(spark):
    """k-means|| style approximate k-center: deterministic across runs
    (hash draws, no rand()), returns exactly k centers, and its
    corpus-level covering radius stays within 2x the exact greedy's
    (the greedy itself 2-approximates OPT, so approx <= 4x OPT here —
    the documented trade for dropping k sequential scans to a constant
    number of rounds)."""
    rng = np.random.default_rng(23)
    df = _to_df(spark, rng.normal(size=(60, 6)))

    approx = clustering.kcenter_select_oversampled(
        df, k=6, rounds=3, oversample=3.0
    )
    rows = approx.collect()
    assert len(rows) == 6
    assert len({r["vec_id"] for r in rows}) == 6

    again = clustering.kcenter_select_oversampled(
        df, k=6, rounds=3, oversample=3.0
    ).collect()
    assert {(r["sel_order"], r["vec_id"]) for r in again} == {
        (r["sel_order"], r["vec_id"]) for r in rows
    }

    exact = clustering.kcenter_select(df, k=6)
    r_exact = clustering.kcenter_coverage(
        df, exact.join(df, "vec_id").select("vec_id", "embedding")
    ).collect()[0]
    r_approx = clustering.kcenter_coverage(
        df, approx.join(df, "vec_id").select("vec_id", "embedding")
    ).collect()[0]
    assert r_exact["n_centers"] == 6 and r_approx["n_centers"] == 6
    assert r_approx["covering_radius"] <= 2.0 * r_exact["covering_radius"]


def test_kcenter_oversampled_separated_cones(spark):
    """On well-separated cones the oversampled variant still covers
    every cone (radius quality, not just determinism)."""
    rng = np.random.default_rng(29)
    a = _cone(rng, np.array([10.0, 0.0, 0.0]), 10)
    b = _cone(rng, np.array([0.0, 10.0, 0.0]), 10)
    c = _cone(rng, np.array([0.0, 0.0, 10.0]), 10)
    df = _to_df(spark, np.vstack([a, b, c]))
    got = clustering.kcenter_select_oversampled(
        df, k=3, rounds=4, oversample=4.0
    ).collect()
    groups = {r["vec_id"] // 10 for r in got}
    assert groups == {0, 1, 2}


def test_kcenter_empty_corpus_raises_clear_error(spark):
    import pyspark.sql.types as T

    empty = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    with pytest.raises(ValueError, match="empty corpus"):
        clustering.kcenter_select(empty, k=2)
    with pytest.raises(ValueError, match="empty corpus"):
        clustering.kcenter_select_oversampled(empty, k=2)
