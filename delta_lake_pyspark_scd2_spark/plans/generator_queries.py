"""Synthetic-generator queries (reference S12-S14 / J6 / W4 capability,
re-expressed shuffle-free — sources/generators.py).

The generators are pure integer arithmetic over ``spark.range``, so the
DuckDB oracle replays the exact formulas over ``range(n)`` — proving
determinism and engine-independence, which the reference's seeded
``rand()`` generation cannot (Spark ``rand(seed)`` is partitioning-
dependent, and un-replayable outside Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from delta_lake_pyspark_scd2_spark.plans.registry import register
from delta_lake_pyspark_scd2_spark.sources import generators as G

N_GEN = 5000
SEED = 42
N_KEYS = 1000
SPAN = 30 * 86400
TYPES = G.DEFAULT_EVENT_TYPES


def _mix_sql(expr: str, salt: int, modulus: int) -> str:
    """DuckDB replica of generators._mix — same constants via
    generators._mix_constants (single source of truth)."""
    a, b = G._mix_constants(salt, modulus)
    return f"(({expr} % {modulus}) * {a} + {b}) % {modulus}"


def _mix2_sql(expr: str, salt: int, modulus: int) -> str:
    """DuckDB replica of generators._mix2 (prime-decorrelated mix)."""
    return _mix_sql(
        _mix_sql(expr, salt, G.DECORRELATE_P), salt + 1000, modulus
    )


@register(
    "gen_events",
    oracle=f"""
    SELECT id AS event_id,
           TIMESTAMP '2024-01-01 00:00:00'
             + ({_mix_sql('id', SEED, SPAN)}) * INTERVAL 1 SECOND AS ts,
           {_mix_sql('id', SEED + 1, N_KEYS)} AS user_id,
           (ARRAY[{", ".join(repr(t) for t in TYPES)}])
             [CAST({_mix2_sql('id', SEED + 2, len(TYPES))} AS INT) + 1]
             AS event_type,
           ({_mix2_sql('id', SEED + 3, 100000)}) / 100.0 AS value
    FROM range(0, {N_GEN}) t(id)
    """,
    doc="Deterministic distributed event generator (S14 range source + "
    "arithmetic attributes; no rand(), no shuffle) — DuckDB replays the "
    "formulas exactly.",
)
def gen_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.synthetic_events(
        spark, N_GEN, n_keys=N_KEYS, seed=SEED, span_seconds=SPAN
    ).select("event_id", "ts", "user_id", "event_type", "value")


@register(
    "gen_update_mix",
    oracle=f"""
    WITH base AS (
      SELECT id AS event_id,
             TIMESTAMP '2024-01-01 00:00:00'
               + ({_mix_sql('id', SEED, SPAN)}) * INTERVAL 1 SECOND AS ts,
             {_mix_sql('id', SEED + 1, N_KEYS)} AS user_id,
             ({_mix2_sql('id', SEED + 3, 100000)}) / 100.0 AS value
      FROM range(0, {N_GEN}) t(id)
    )
    SELECT event_id + 1000000000 AS event_id,
           ts + 86400 * INTERVAL 1 SECOND AS ts,
           CASE WHEN {_mix_sql('event_id', 43, 10000)} < 5000
                THEN {N_KEYS} + {_mix_sql('event_id', 44, N_KEYS)}
                ELSE user_id END AS user_id,
           CASE WHEN {_mix_sql('event_id', 43, 10000)} < 5000
                THEN value ELSE ROUND(value + 1.0, 2) END AS value
    FROM base
    """,
    doc="Next-day update batch: --pct_new new-vs-updated key mix "
    "(generate_header_datasets.py:147-187) without the reference's "
    "global ORDER BY rand() zip-join (J6/W4 single-partition hazard) — "
    "the split derives from the row id, zero shuffles.",
)
def gen_update_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = G.synthetic_events(
        spark, N_GEN, n_keys=N_KEYS, seed=SEED, span_seconds=SPAN
    )
    return G.evolve_batch(base, pct_new=50.0, seed=43, n_keys=N_KEYS).select(
        "event_id", "ts", "user_id", "value"
    )
