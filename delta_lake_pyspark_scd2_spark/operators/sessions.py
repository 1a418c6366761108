"""Gap-based sessionization.

Not in the reference (its model is batch SCD2), but the canonical
custom *stateful* operator a large-scale event pipeline needs, and the
showcase for the two ways to express one semantics Spark-first:

  * :func:`sessionize` — batch: two windows over the key
    (gap-flag via ``lag``, session index via running ``sum``) — one
    shuffle, pure built-ins, SQL-expressible (oracle-checkable).
  * ``streaming.stream_jobs.sessionize_stream`` — streaming: the same
    semantics as an ``applyInPandasWithState`` operator with event-time
    timeouts (state = open session per key, bounded by the watermark).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str] | str,
    ts_col: str,
    *,
    gap_seconds: int = 1800,
    value_col: str | None = None,
) -> DataFrame:
    """Assign events to sessions: a new session starts when the gap to
    the key's previous event exceeds ``gap_seconds``.

    Returns one row per session: key cols + ``session_start`` /
    ``session_end`` / ``n_events`` (+ ``sum_value`` when ``value_col``).

    Plan: ONE hash shuffle on the key feeds both windows (same
    partitioning) and the final group-by re-uses the session key —
    Catalyst plans a single exchange. Skewed keys (bot traffic) are the
    hazard at scale; AQE skew handling or per-key date pre-bucketing
    bounds it.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    prev = F.lag(ts_col).over(w)
    # exact µs arithmetic (unix_micros ↔ DuckDB epoch_us) — second-level
    # casts truncate differently across engines
    new_session = (
        prev.isNull()
        | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)
           > gap_seconds * 1_000_000)
    ).cast("int")
    sess = df.withColumn(
        "__session_idx",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 6).alias("sum_value"))
    return sess.groupBy(*keys, "__session_idx").agg(*aggs).drop("__session_idx")
