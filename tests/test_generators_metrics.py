"""Tests: synthetic generators (determinism, update-mix semantics) and
the run-metrics sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.pipeline import (
    append_run_metrics,
    read_run_metrics,
)
from delta_lake_pyspark_scd2_spark.sources import generators as G


def test_generator_deterministic_and_uniform(spark):
    a = G.synthetic_events(spark, 2000, n_keys=50, seed=7)
    b = G.synthetic_events(spark, 2000, n_keys=50, seed=7)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # repartitioning must not change the data (reference's rand(seed) fails this)
    c = G.synthetic_events(spark, 2000, n_keys=50, seed=7).repartition(7)
    assert a.exceptAll(c).count() == 0
    keys = a.select("user_id").distinct().count()
    assert keys == 50  # every key hit at 40 rows/key expectation
    types = {r.event_type for r in a.select("event_type").distinct().collect()}
    assert types == set(G.DEFAULT_EVENT_TYPES)


def test_evolve_batch_update_mix(spark):
    base = G.synthetic_events(spark, 2000, n_keys=50, seed=7)
    nxt = G.evolve_batch(base, pct_new=50.0, seed=43, n_keys=50)
    joined = base.alias("b").join(
        nxt.withColumn("event_id", F.col("event_id") - 1_000_000_000).alias("n"),
        on="event_id",
    )
    new_keys = joined.filter(F.col("n.user_id") >= 50)
    updated = joined.filter(F.col("n.user_id") < 50)
    frac_new = new_keys.count() / 2000
    assert 0.4 < frac_new < 0.6  # ~pct_new
    # updated rows keep their key but change the tracked value
    assert updated.filter(F.col("n.user_id") != F.col("b.user_id")).count() == 0
    assert updated.filter(F.col("n.value") == F.col("b.value")).count() == 0


def test_run_metrics_roundtrip(spark, tmp_path):
    p = str(tmp_path / "metrics")
    append_run_metrics(spark, {"batch_id": "b1", "n_inserted": 10}, p)
    append_run_metrics(spark, {"batch_id": "b2", "n_inserted": 3}, p)
    rows = {r.batch_id: r.n_inserted for r in read_run_metrics(spark, p).collect()}
    assert rows == {"b1": "10", "b2": "3"}
