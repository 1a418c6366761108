"""Distributed synthetic batch generators.

Re-derives the reference's data-generation capability
(``src/utils/generate_header_datasets.py``: seeded batches, ``--pct_new``
mix of new vs updated keys; ``src/utils/header_event_time_creation.py``:
random event times) with two scale fixes SURVEY.md §2.5 flags:

  * no global ``row_number() OVER (ORDER BY rand())`` window (reference
    W4/J6 — a single-partition bottleneck at any real size): attributes
    derive from the row id by pure integer arithmetic, so generation is
    embarrassingly parallel over ``spark.range`` (S14);
  * fully deterministic — same arguments ⇒ bit-identical output on any
    partitioning/cluster (the reference seeds ``rand()`` which is only
    stable per partitioning). Mix constants are odd multipliers (Weyl
    sequences), giving uniform-enough attribute spreads for benchmarks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Odd 64-bit mixing constants (splitmix64 / Weyl increments).
_MIX_A = 0x9E3779B97F4A7C15
_MIX_B = 0xBF58476D1CE4E5B9

DEFAULT_EVENT_TYPES = ("click", "view", "purchase", "signup")


def _mix_constants(salt: int, modulus: int) -> tuple[int, int]:
    """(a, b) for the affine map ``(id % m) * a + b mod m``. ``a`` is
    forced coprime with ``m`` so the map is a bijection on residues —
    every key/bucket value is reachable. Single source of truth for the
    Spark expression and the DuckDB oracle replica."""
    import math

    a = (_MIX_A + 2 * salt + 1) % modulus
    while a < 2 or math.gcd(a, modulus) != 1:
        a += 1
    b = (_MIX_B + salt) % modulus
    return a, b


def _mix(col, salt: int, modulus: int) -> F.Column:
    """Deterministic pseudo-uniform value in [0, modulus) from a row id.

    Arithmetic stays in Spark's signed-64 range: the 64-bit constants
    are reduced mod ``modulus`` first (distribution mod m unchanged).
    """
    a, b = _mix_constants(salt, modulus)
    return (col % F.lit(modulus) * F.lit(a) + F.lit(b)) % F.lit(modulus)


#: Prime ≫ any key count used; stage-1 modulus of :func:`_mix2`.
DECORRELATE_P = 999_983


def _mix2(col, salt: int, modulus: int) -> F.Column:
    """Two-stage mix: affine mod a large prime, then affine mod the
    target. A single-stage ``_mix`` is affine in ``id``, so the events
    of one key (ids spaced ``n_keys`` apart) hit a fixed stride in the
    target ring — and when ``n_keys`` shares a factor with ``modulus``
    (e.g. 100k keys vs the 100000 value ring, or any multiple of the
    5 event types) the stride is ZERO: every event of the key gets the
    SAME attribute, silently collapsing SCD2 version counts. Routing
    through a prime first makes the stride non-degenerate for every
    key count below the prime."""
    return _mix(_mix(col, salt, DECORRELATE_P), salt + 1000, modulus)


def synthetic_events(
    spark: SparkSession,
    n_rows: int,
    *,
    n_keys: int = 1000,
    start: str = "2024-01-01 00:00:00",
    span_seconds: int = 30 * 86400,
    seed: int = 42,
    event_types: Sequence[str] = DEFAULT_EVENT_TYPES,
) -> DataFrame:
    """Synthetic event batch in the driver ``events`` schema
    (event_id, ts, user_id, event_type, value, props).

    ``spark.range`` source (reference S14) → per-row arithmetic; scales
    linearly with executors, no shuffle at all.
    """
    ids = spark.range(0, n_rows)  # S14: distributed id source
    types = F.array(*[F.lit(t) for t in event_types])
    return ids.select(
        F.col("id").alias("event_id"),
        (
            F.lit(start).cast("timestamp")
            + F.make_interval(secs=_mix(F.col("id"), seed, span_seconds))
        ).alias("ts"),
        _mix(F.col("id"), seed + 1, n_keys).alias("user_id"),
        F.element_at(types, (_mix2(F.col("id"), seed + 2, len(event_types)) + 1).cast("int")).alias(
            "event_type"
        ),
        (_mix2(F.col("id"), seed + 3, 100000) / 100.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    )


def evolve_batch(
    batch: DataFrame,
    *,
    pct_new: float = 50.0,
    key_col: str = "user_id",
    id_col: str = "event_id",
    ts_col: str = "ts",
    value_col: str = "value",
    ts_shift_seconds: int = 86400,
    seed: int = 43,
    n_keys: int = 1000,
) -> DataFrame:
    """Next-day batch: ``pct_new`` % of rows get *new* keys (beyond the
    base key space), the rest keep their key with changed tracked
    values — the reference's ``--pct_new`` update-mix
    (``generate_header_datasets.py:147-187``), minus its zip-join on a
    global random row_number (J6/W4): the new/updated split and the new
    key assignment both derive from the row id, so the transform is
    narrow (zero shuffles).
    """
    is_new = _mix(F.col(id_col), seed, 10000) < F.lit(int(pct_new * 100))
    new_key = F.lit(n_keys) + _mix(F.col(id_col), seed + 1, n_keys)
    return (
        batch.withColumn(
            key_col, F.when(is_new, new_key).otherwise(F.col(key_col))
        )
        .withColumn(
            value_col,
            F.when(is_new, F.col(value_col)).otherwise(
                F.round(F.col(value_col) + 1.0, 2)
            ),
        )
        .withColumn(ts_col, F.col(ts_col) + F.make_interval(secs=F.lit(ts_shift_seconds)))
        .withColumn(id_col, F.col(id_col) + F.lit(1_000_000_000))
    )


def write_csv_batch(df: DataFrame, path: str, *, sep: str = "|") -> None:
    """Pipe-delimited CSV batch sink (reference S12,
    ``generate_header_datasets.py:143,186``)."""
    df.write.mode("overwrite").option("header", True).option("sep", sep).csv(path)
