"""Domain-mixture resampling (operators/mixture.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.operators import mixture


def _corpus(spark, sizes: dict[str, int]):
    rows, i = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mixture_proportions_and_capacity(spark):
    # scarcest domain relative to its share bounds the output:
    # shares 0.5/0.5, b has only 100 -> N = 200, keep all of b,
    # about half of a (hash-thresholded, so approximately)
    df = _corpus(spark, {"a": 1000, "b": 100})
    out = mixture.sample_to_mixture(df, {"a": 1.0, "b": 1.0})
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert got["b"] == 100  # never downsampled below its own size
    assert 60 <= got["a"] <= 140  # ~100 expected, hash-binomial spread


def test_unweighted_domains_dropped(spark):
    df = _corpus(spark, {"a": 50, "junk": 50})
    out = mixture.sample_to_mixture(df, {"a": 1.0})
    assert out.filter(F.col("source") == "junk").count() == 0
    assert out.count() == 50  # single domain: capacity = its full size


def test_deterministic_and_monotone(spark):
    df = _corpus(spark, {"a": 400, "b": 400})
    big = mixture.sample_to_mixture(df, {"a": 1.0, "b": 1.0})
    again = mixture.sample_to_mixture(df, {"a": 1.0, "b": 1.0})
    assert sorted(r["doc_id"] for r in big.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    # shrinking a's share keeps a subset of a's previously-kept rows
    small = mixture.sample_to_mixture(df, {"a": 1.0, "b": 3.0})
    a_big = {r["doc_id"] for r in big.filter("source = 'a'").collect()}
    a_small = {r["doc_id"] for r in small.filter("source = 'a'").collect()}
    assert a_small <= a_big


def test_temperature_flattens_toward_uniform(spark):
    """alpha<1 up-weights rare domains: the rare domain is kept whole
    while the dominant one is cut, and a smaller alpha cuts the
    dominant domain HARDER (closer to uniform)."""
    df = _corpus(spark, {"big": 900, "rare": 100})
    kept_07 = {
        r["source"]: r["n"]
        for r in mixture.sample_to_temperature(df, alpha=0.7)
        .groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert kept_07["rare"] == 100  # rare domain binds: kept whole
    assert kept_07["big"] < 900    # dominant domain downsampled
    kept_03 = {
        r["source"]: r["n"]
        for r in mixture.sample_to_temperature(df, alpha=0.3)
        .groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert kept_03["big"] < kept_07["big"]  # lower temperature, flatter
    # alpha=1 is the natural mixture: nothing dropped
    assert mixture.sample_to_temperature(df, alpha=1.0).count() == 1000


def test_temperature_shares_match_formula(spark):
    import math

    df = _corpus(spark, {"big": 800, "rare": 200})
    alpha = 0.5
    out = mixture.sample_to_temperature(df, alpha=alpha)
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    pb = 800**alpha / (800**alpha + 200**alpha)
    pr = 1 - pb
    # capacity bound: rare domain (200 rows at share pr) limits N
    n_target = 200 / pr
    # rare kept whole; big kept ~ pb * N (hash-binomial spread)
    assert got["rare"] == 200
    expected_big = pb * n_target
    assert abs(got["big"] - expected_big) < 4 * math.sqrt(expected_big)


def test_temperature_rejects_bad_alpha(spark):
    import pytest

    df = _corpus(spark, {"a": 10})
    with pytest.raises(ValueError, match="alpha"):
        mixture.sample_to_temperature(df, alpha=0.0)
    with pytest.raises(ValueError, match="alpha"):
        mixture.sample_to_temperature(df, alpha=1.5)


# ---------------------------------------------------------------------------
# quality_filter_per_group: the windowless scale path vs the exact twin
# (round-5 VERDICT #2)
# ---------------------------------------------------------------------------


def _gate_corpus(spark):
    from delta_lake_pyspark_scd2_spark.sources.tables import load_table

    return load_table(spark, "/root/testdata/sf0.001", "documents")


def test_quality_gate_scale_path_has_no_group_sort_window(spark):
    """The default path must contain NO per-group sort window (the
    dominant language of a 100 TB corpus would land in one task):
    aggregate + broadcast-join + filter only."""
    docs = _gate_corpus(spark)
    out = mixture.quality_filter_per_group(
        docs, F.col("n_chars"), keep_frac=0.5, group_col="lang"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    out.collect()
    final = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in final, final


def test_quality_gate_exact_twin_is_subset_of_scale_path(spark):
    """Rank-kept (exact=True, percent_rank <= f) is always a subset of
    threshold-kept (scale path): the threshold form only adds rows
    TIED with the per-group discrete quantile value. Pin both the
    subset relation and that every surplus row sits exactly on its
    group's threshold."""
    docs = _gate_corpus(spark)
    kw = dict(keep_frac=0.5, group_col="lang")
    approx = mixture.quality_filter_per_group(docs, F.col("n_chars"), **kw)
    exact = mixture.quality_filter_per_group(
        docs, F.col("n_chars"), exact=True, **kw
    )
    a = {r["doc_id"]: (r["lang"], r["n_chars"]) for r in approx.collect()}
    e = {r["doc_id"]: (r["lang"], r["n_chars"]) for r in exact.collect()}
    assert set(e) <= set(a)
    # per-group minimum kept score on the scale path == the threshold;
    # surplus rows (approx-kept, rank-dropped) must all tie with it
    thr = {}
    for lang, n_chars in a.values():
        thr[lang] = min(thr.get(lang, n_chars), n_chars)
    surplus = {d: v for d, v in a.items() if d not in e}
    for doc_id, (lang, n_chars) in surplus.items():
        assert n_chars == thr[lang], (doc_id, lang, n_chars, thr[lang])
    # and the surplus is boundary-sized, not a semantic drift
    assert len(surplus) <= max(10, len(a) // 10), (len(surplus), len(a))


def test_cap_per_group_binds_only_over_budget_groups(spark):
    from delta_lake_pyspark_scd2_spark.operators import mixture
    from pyspark.sql import functions as F

    rows = [
        {"id": i, "g": ("big" if i < 60 else "small"), "score": float(i)}
        for i in range(100)
    ]
    df = spark.createDataFrame(rows)
    out = mixture.cap_per_group(
        df, "g", 0.5, [F.col("score").desc(), F.col("id").asc()], rank_col="rk"
    )
    got = out.groupBy("g").count().collect()
    by_g = {r.g: r["count"] for r in got}
    # big (60) trimmed to floor(0.5*100)=50, small (40) untouched
    assert by_g == {"big": 50, "small": 40}
    # trimmed group keeps the TOP scores
    kept_big = {r.id for r in out.filter(F.col("g") == "big").collect()}
    assert kept_big == set(range(10, 60))


def test_cap_per_group_rejects_bad_args(spark):
    import pytest as _pytest

    from delta_lake_pyspark_scd2_spark.operators import mixture

    df = spark.range(3).withColumn("g", F.lit("a"))
    with _pytest.raises(ValueError):
        mixture.cap_per_group(df, "g", 0.0, [F.col("id")])
    with _pytest.raises(ValueError):
        mixture.cap_per_group(df, "g", 0.5, [])


def test_cap_per_group_budget_invariant_random(spark):
    """Property: every group keeps exactly min(n_g, floor(share * N))
    rows, and the kept set is the ordering prefix."""
    import random

    rng = random.Random(11)
    rows = [
        {"id": i, "g": f"g{rng.randint(0, 4)}", "s": float(rng.random())}
        for i in range(300)
    ]
    df = spark.createDataFrame(rows)
    share = 0.15
    out = mixture.cap_per_group(
        df, "g", share, [F.col("s").desc(), F.col("id").asc()]
    ).collect()
    from collections import Counter

    n_g = Counter(r["g"] for r in rows)
    budget = int(share * len(rows))
    kept = Counter(r.g for r in out)
    for g, n in n_g.items():
        assert kept.get(g, 0) == min(n, budget), (g, n, budget)
    # prefix property: kept rows of a trimmed group are the top-s ones
    trimmed = [g for g, n in n_g.items() if n > budget]
    for g in trimmed:
        want = {
            r["id"]
            for r in sorted(
                (r for r in rows if r["g"] == g),
                key=lambda r: (-r["s"], r["id"]),
            )[:budget]
        }
        got = {r.id for r in out if r.g == g}
        assert got == want


def test_loss_reweight_upweights_high_loss_group(spark):
    from delta_lake_pyspark_scd2_spark.operators.mixture import loss_reweight

    rows = [(i, "easy", 1.0) for i in range(30)] + [
        (100 + i, "hard", 3.0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, nll double")
    got = {r["source"]: r for r in loss_reweight(df, "source", "nll").collect()}
    assert abs(sum(r["weight"] for r in got.values()) - 1.0) < 1e-3
    # hard domain: above-share mass; easy: below-share
    assert got["hard"]["weight"] > got["hard"]["base_share"]
    assert got["easy"]["weight"] < got["easy"]["base_share"]
    assert got["hard"]["excess_nll"] > 0 > got["easy"]["excess_nll"]


def test_loss_reweight_high_temperature_recovers_base_shares(spark):
    from delta_lake_pyspark_scd2_spark.operators.mixture import loss_reweight

    rows = [(i, "a", 1.0) for i in range(20)] + [
        (50 + i, "b", 2.0) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, nll double")
    got = {r["source"]: r for r in loss_reweight(
        df, "source", "nll", temperature=1e6
    ).collect()}
    for s in ("a", "b"):
        assert abs(got[s]["weight"] - got[s]["base_share"]) < 1e-3
