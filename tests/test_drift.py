"""Unigram KL drift: Spark result must match a from-scratch Python
computation of KL(slice ‖ corpus), and an identically-distributed
slice must score ~0."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from delta_lake_pyspark_scd2_spark.operators.text import unigram_kl_drift

DOCS = [
    ("a", "the cat sat on the mat"),
    ("a", "the dog sat on the log"),
    ("b", "quantum flux capacitor overload"),
    ("b", "the flux returns to the grid"),
]


def _naive_kl(docs):
    per: dict[str, Counter] = {}
    overall: Counter = Counter()
    for g, t in docs:
        ws = [w for w in t.split(" ") if w]
        per.setdefault(g, Counter()).update(ws)
        overall.update(ws)
    n_total = sum(overall.values())
    out = {}
    for g, c in per.items():
        n_g = sum(c.values())
        kl = sum(
            round(
                (n / n_g) * math.log(n * n_total / (n_g * overall[w])), 9
            )
            for w, n in c.items()
        )
        out[g] = (n_g, round(kl, 6))
    return out


def test_kl_matches_naive_reference(spark):
    df = spark.createDataFrame(DOCS, "source STRING, text STRING")
    got = {
        r["source"]: (r["n_tokens"], r["kl_divergence"])
        for r in unigram_kl_drift(df, "source").collect()
    }
    want = _naive_kl(DOCS)
    assert set(got) == set(want)
    for g in want:
        assert got[g][0] == want[g][0]
        assert got[g][1] == pytest.approx(want[g][1], abs=2e-6)
    # the off-distribution slice drifts more than the on-distribution one
    assert got["b"][1] > got["a"][1] > 0


def test_kl_zero_for_identical_distribution(spark):
    # two slices with the SAME word distribution: each KL term is
    # ln(1) = 0, so both slices score exactly 0.
    docs = [("x", "alpha beta gamma"), ("y", "alpha beta gamma")]
    df = spark.createDataFrame(docs, "source STRING, text STRING")
    rows = unigram_kl_drift(df, "source").collect()
    assert {r["source"] for r in rows} == {"x", "y"}
    assert all(r["kl_divergence"] == 0.0 for r in rows)


def test_daily_anomaly_flags_spike_and_handles_zero_variance(spark):
    from datetime import datetime

    from delta_lake_pyspark_scd2_spark.operators.timeseries import (
        daily_volume_anomaly,
    )

    rows = []
    # 'click': 10/day for 9 days, then a 100-event spike day
    for d in range(1, 10):
        rows += [(datetime(2024, 1, d, 12), "click")] * 10
    rows += [(datetime(2024, 1, 10, 12), "click")] * 100
    # 'flat': exactly 5/day — zero variance, z must be NULL, not crash
    for d in range(1, 4):
        rows += [(datetime(2024, 1, d, 12), "flat")] * 5
    df = spark.createDataFrame(rows, "ts TIMESTAMP, event_type STRING")
    out = daily_volume_anomaly(df, "event_type")
    click = {r["day"].day: r for r in out.filter("event_type='click'").collect()}
    assert click[10]["is_anomaly"] and click[10]["z"] > 2
    assert not any(click[d]["is_anomaly"] for d in range(1, 10))
    # the spike drags the mean up, so normal days sit below it
    assert all(click[d]["z"] < 0 for d in range(1, 10))
    flat = out.filter("event_type='flat'").collect()
    assert all(r["z"] is None and r["is_anomaly"] is False for r in flat)


def test_daily_anomaly_zscore_matches_naive(spark):
    import math
    from datetime import datetime

    from delta_lake_pyspark_scd2_spark.operators.timeseries import (
        daily_volume_anomaly,
    )

    counts = [7, 9, 13, 8, 11, 6, 14]
    rows = []
    for d, c in enumerate(counts, start=1):
        rows += [(datetime(2024, 2, d, 6), "e")] * c
    df = spark.createDataFrame(rows, "ts TIMESTAMP, event_type STRING")
    got = {
        r["day"].day: r["z"]
        for r in daily_volume_anomaly(df, "event_type").collect()
    }
    k, s1, s2 = len(counts), sum(counts), sum(c * c for c in counts)
    var = (k * s2 - s1 * s1) / (k * (k - 1))
    for d, c in enumerate(counts, start=1):
        want = round((c - s1 / k) / math.sqrt(var), 6)
        assert got[d] == want


def test_drift_stream_matches_batch_kl(spark, tmp_path):
    """After N micro-batches the stream-maintained count table must
    yield the EXACT batch KL report over the union of all documents
    (same tokenization, same float contract), and the per-batch hook
    must see the report evolve."""
    import json as _json

    from delta_lake_pyspark_scd2_spark.streaming import (
        drift_monitor_stream,
    )

    batches = [
        [("a", "the cat sat on the mat"), ("b", "quantum flux overload")],
        [("a", "the dog sat on the log"), ("b", "the flux returns")],
        [("a", "the cat naps again")],
    ]
    src = tmp_path / "src"
    src.mkdir()
    seen: list[tuple[int, dict]] = []

    def hook(batch_no, rows):
        seen.append(
            (batch_no, {r["source"]: r["kl_divergence"] for r in rows})
        )

    did = 0
    for i, rows in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for g, t in rows:
                f.write(
                    _json.dumps({"doc_id": did, "text": t, "source": g})
                    + "\n"
                )
                did += 1
        drift_monitor_stream(
            spark,
            str(src),
            str(tmp_path / "counts"),
            str(tmp_path / "ckpt"),
            on_batch=hook,
        )
    all_docs = [(g, t) for b in batches for g, t in b]
    df = spark.createDataFrame(all_docs, "source STRING, text STRING")
    want = {
        r["source"]: (r["n_tokens"], r["kl_divergence"])
        for r in unigram_kl_drift(df, "source").collect()
    }
    final = seen[-1][1]
    assert {g: final[g] for g in want} == {
        g: kl for g, (_, kl) in want.items()
    }
    assert len(seen) == 3  # one report per non-empty micro-batch


def test_dsir_scores_match_naive_and_rank_target_like_docs_first(spark):
    import math
    from collections import Counter

    from delta_lake_pyspark_scd2_spark.operators.mixture import (
        dsir_importance_scores,
    )

    corpus = [
        (0, "statute clause hereby liability", "legal"),
        (1, "statute clause amendment court", "legal"),
        (2, "banana smoothie recipe blender", "web"),
        (3, "court hereby clause statute", "web"),   # reads legal
        (4, "blender banana snack recipe", "web"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_importance_scores(
            df, df.filter("source = 'legal'")
        ).collect()
    }

    # naive reference with the operator's exact contract
    cw: Counter = Counter()
    tw: Counter = Counter()
    for _, t, s in corpus:
        ws = t.split(" ")
        cw.update(ws)
        if s == "legal":
            tw.update(ws)
    n_c, v, n_t = sum(cw.values()), len(cw), sum(tw.values())
    llr = {
        w: round(
            math.log((tw.get(w, 0) + 1) * (n_c + v) / ((c + 1) * (n_t + v))),
            9,
        )
        for w, c in cw.items()
    }
    for did, t, _ in corpus:
        ws = t.split(" ")
        want = round(sum(llr[w] for w in ws) / len(ws), 6)
        assert got[did] == pytest.approx(want, abs=2e-6), did

    # the web doc written in legal vocabulary outranks true web docs
    assert got[3] > got[2] and got[3] > got[4]
    assert min(got[0], got[1]) > max(got[2], got[4])


def test_dsir_empty_target_and_empty_doc_are_explicit(spark):
    from pyspark.sql import functions as F

    from delta_lake_pyspark_scd2_spark.operators.mixture import (
        dsir_importance_scores,
    )

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, ""), (2, "gamma")],
        "doc_id long, text string",
    )
    # empty target -> uniform smoothed model: scores defined (not NULL)
    out = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_importance_scores(
            docs, docs.filter(F.lit(False))
        ).collect()
    }
    assert set(out) == {0, 1, 2}  # full coverage incl. the empty doc
    assert out[0] is not None and out[2] is not None
    assert out[1] is None  # zero-token doc: explicitly unrankable


def test_robust_outliers_survive_corrupt_burst(spark):
    """The 50%-breakdown property that motivates MAD over stddev: a
    burst of corrupt values inflates the stddev enough to hide itself
    from the z-score gate, but median/MAD still flag every burst row."""
    from delta_lake_pyspark_scd2_spark.operators.timeseries import (
        robust_value_outliers,
    )

    normal = [(i, "a", 100.0 + (i % 7) * 0.1) for i in range(40)]
    burst = [(100 + i, "a", 10_000.0 + i) for i in range(8)]
    df = spark.createDataFrame(
        normal + burst, "event_id long, event_type string, value double"
    )
    got = robust_value_outliers(df, "event_type", "value", ["event_id"])
    flagged = {r["event_id"] for r in got.collect()}
    assert flagged == {100 + i for i in range(8)}
    # classic z-score at the same data: stddev ~ 3.4k, burst z ~ 2.4 —
    # below the typical 3-sigma gate; MAD flags what stddev hides.
    import statistics

    vals = [v for _, _, v in normal + burst]
    mu, sd = statistics.mean(vals), statistics.pstdev(vals)
    assert max(abs(v - mu) / sd for v in vals) < 3.0


def test_robust_outliers_zero_mad_group_excluded(spark):
    from delta_lake_pyspark_scd2_spark.operators.timeseries import (
        robust_value_outliers,
    )

    rows = [(i, "const", 5.0) for i in range(10)] + [(99, "const", 1e9)]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    # over half the group is identical -> MAD = 0 -> no finite score;
    # the group is excluded rather than spuriously flagged
    assert robust_value_outliers(df, "event_type", "value").count() == 0
