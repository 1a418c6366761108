"""Hypertable-style time-series operators: time-bucket rollup with
gap-filling (TimescaleDB's ``time_bucket_gapfill`` + ``locf`` /
``interpolate``, re-expressed as Spark relational composition).

Scale design:

* The rollup is ONE hash aggregation on (group, bucket) — map-side
  combined, the only corpus-sized shuffle.
* The dense bucket spine is ``sequence()`` × distinct groups — its
  cardinality is ``groups × buckets`` (output-sized, not input-sized),
  generated with a narrow explode, never materialized on the driver.
* Gap filling is window work over the SPINE (output-sized): LOCF is a
  single ``last_value(ignoreNulls)`` pass; linear interpolation takes
  the previous/next known points from two mirrored window passes and
  blends them arithmetically. All built-in expressions, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_bucket_gapfill(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: list[str],
    *,
    bucket: str = "hour",
    fill: str = "locf",
) -> DataFrame:
    """Bucket ``ts_col`` to ``bucket`` granularity, sum ``value_col``
    per (group, bucket), then densify the bucket spine over the
    table's [min, max] range and fill the gaps.

    ``fill``: ``"none"`` (NULL gaps), ``"zero"``, ``"locf"``
    (last observation carried forward), or ``"linear"``
    (interpolate between neighboring observations; leading/trailing
    gaps stay NULL, like TimescaleDB's ``interpolate``).

    Output: group_cols + ``bucket_ts`` + ``value`` (rounded to 6 dp for
    engine-stable comparison) + ``filled`` (1 where synthesized).
    """
    if fill not in ("none", "zero", "locf", "linear"):
        raise ValueError(f"unknown fill mode {fill!r}")
    b = F.date_trunc(bucket, F.col(ts_col))
    agg = (
        df.select(*group_cols, b.alias("bucket_ts"), F.col(value_col))
        .groupBy(*group_cols, "bucket_ts")
        .agg(F.round(F.sum(value_col), 6).alias("__v"))
    )
    # dense spine: [min, max] bucket range (one tiny agg) × groups
    lo, hi = df.select(
        F.min(b).alias("lo"), F.max(b).alias("hi")
    ).collect()[0]
    step = F.expr(f"interval 1 {bucket}")
    spine = (
        df.select(*group_cols)
        .distinct()
        .select(
            *group_cols,
            F.explode(
                F.sequence(F.lit(lo).cast("timestamp"), F.lit(hi).cast("timestamp"), step)
            ).alias("bucket_ts"),
        )
    )
    dense = spine.join(agg, [*group_cols, "bucket_ts"], "left").withColumn(
        "filled", F.col("__v").isNull().cast("int")
    )
    if fill == "none":
        out = dense.withColumn("value", F.col("__v"))
    elif fill == "zero":
        out = dense.withColumn("value", F.coalesce(F.col("__v"), F.lit(0.0)))
    elif fill == "locf":
        w = (
            Window.partitionBy(*group_cols)
            .orderBy("bucket_ts")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = dense.withColumn(
            "value", F.last("__v", ignorenulls=True).over(w)
        )
    else:  # linear
        wb = (
            Window.partitionBy(*group_cols)
            .orderBy("bucket_ts")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wf = (
            Window.partitionBy(*group_cols)
            .orderBy("bucket_ts")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        ts_s = F.unix_timestamp("bucket_ts")
        known_ts = F.when(F.col("__v").isNotNull(), ts_s)
        prev_v = F.last("__v", ignorenulls=True).over(wb)
        prev_t = F.last(known_ts, ignorenulls=True).over(wb)
        next_v = F.first("__v", ignorenulls=True).over(wf)
        next_t = F.first(known_ts, ignorenulls=True).over(wf)
        interp = prev_v + (next_v - prev_v) * (
            (ts_s - prev_t) / (next_t - prev_t)
        )
        out = dense.withColumn(
            "value",
            F.round(
                F.when(F.col("__v").isNotNull(), F.col("__v"))
                .when(
                    prev_v.isNotNull() & next_v.isNotNull() & (next_t != prev_t),
                    interp,
                )
                .otherwise(F.lit(None).cast("double")),
                6,
            ),
        )
    return out.select(*group_cols, "bucket_ts", "value", "filled")


def daily_volume_anomaly(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    *,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Daily-volume anomaly detection: z-score every (group, day)
    count against that group's own daily distribution — the ingest
    monitor that flags a collapsed crawler or a duplicate-feed day
    before the slice trains.

    Output: ``(group_col, day, n, z, is_anomaly)`` for every observed
    day; ``is_anomaly`` = |z| ≥ ``z_threshold``; ``z`` is NULL (and
    the flag false) for a group whose counts never vary.

    Plan shape: one map-side-combined (group, day) count — the only
    input-sized work — then the z-scores are window passes over the
    DAILY table (groups × days rows, output-sized).

    Cross-engine float contract: the window SUMS (``Σn``, ``Σn²``) are
    exact longs, and the variance numerator ``k·Σn² − (Σn)²`` is then
    computed in DOUBLE with the identical operation order on both
    engines — long multiplication would silently wrap past 2^63
    (Spark non-ANSI) while DuckDB's HUGEINT would not, diverging
    exactly at scale. Bound: ``Σn²`` itself stays an exact long up to
    ~1.6e8 events/day/group over a year; past that, pre-bucket to
    hours before calling this. (Built-in ``stddev_samp`` would
    instead accumulate doubles in engine-specific order.)

    The numerator is additionally clamped at 0 before the NULL-if-zero
    guard: at volumes where ``(Σn)²`` dwarfs the true variance,
    catastrophic cancellation in double can round the difference
    slightly NEGATIVE — unguarded, sqrt gives NaN and Spark's
    NaN-sorts-greatest comparison would flag every day of the
    steadiest feed as anomalous. Clamp → 0 → NULL z: "variance below
    measurable at this precision", reported as no signal, never a
    false alarm.
    """
    daily = events.groupBy(
        F.col(group_col), F.to_date(F.col(ts_col)).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy(group_col)
    k = F.count(F.lit(1)).over(w)
    s1 = F.sum("n").over(w)
    s2 = F.sum(F.col("n") * F.col("n")).over(w)
    mean = s1.cast("double") / k
    var = F.nullif(
        F.greatest(
            k.cast("double") * s2.cast("double")
            - s1.cast("double") * s1.cast("double"),
            F.lit(0.0),
        ),
        F.lit(0.0),
    ) / (k * (k - 1))
    z = F.round((F.col("n") - mean) / F.sqrt(var), 6)
    return daily.select(
        group_col,
        "day",
        "n",
        z.alias("z"),
        F.coalesce(
            F.abs(z) >= F.lit(z_threshold), F.lit(False)
        ).alias("is_anomaly"),
    )


def ohlc_resample(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: list[str],
    *,
    bucket: str = "hour",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """OHLC downsampling: per (group, bucket), the opening (first by
    time), high, low, closing (last by time) value plus row count and
    mean — the candlestick/metrics-rollup primitive.

    ONE hash aggregation, no window: open/close ride min/max over a
    ``(ts, tiebreaks..., value)`` struct (lexicographic struct ordering
    = argmin/argmax by time with a deterministic tiebreak), so the plan
    is a map-side-combined groupBy — the same shuffle shape as a plain
    rollup, immune to the per-group-window sort a naive first()/last()
    formulation would pay. ``tiebreak_cols`` make equal-timestamp rows
    deterministic (pass the event id).
    """
    tbs = tiebreak_cols or []
    pick = F.struct(
        F.col(ts_col).alias("t"),
        *[F.col(c).alias(f"tb{i}") for i, c in enumerate(tbs)],
        F.col(value_col).alias("v"),
    )
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    return (
        df.groupBy(*group_cols, b)
        .agg(
            F.min(pick).alias("__first"),
            F.max(pick).alias("__last"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.count(F.lit(1)).alias("n_rows"),
            F.avg(value_col).alias("mean_value"),
        )
        .select(
            *group_cols,
            "bucket_ts",
            F.col("__first.v").alias("open"),
            "high",
            "low",
            F.col("__last.v").alias("close"),
            "n_rows",
            "mean_value",
        )
    )


def robust_value_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_cols: list[str] | None = None,
    *,
    threshold: float = 3.5,
) -> DataFrame:
    """Robust per-group outlier detection via the modified z-score
    (Iglewicz & Hoaglin 1993): ``mz = 0.6745 * (x - median) / MAD``,
    flagging ``|mz| > threshold`` (3.5 is their recommendation). Unlike
    the mean/stddev z-score (:func:`daily_volume_anomaly`), median and
    MAD have a 50% breakdown point — a burst of corrupt values cannot
    drag the gate open around itself, which is exactly the failure
    mode value-distribution monitors exist to catch.

    Two exact-median passes, both as plain grouped aggregations
    (Spark's ``percentile`` is the exact sort-based form, matching
    DuckDB's ``quantile_cont`` double for double): group medians join
    back (broadcast — one row per group), then MAD = median of
    absolute deviations the same way. Groups with ``MAD = 0`` (over
    half the values identical) yield no finite score and are excluded
    rather than flagged (the standard convention).

    Returns only the flagged rows: ``id_cols + [group_col, value_col,
    mz]``, rounded to 6 dp under the shared oracle contract.
    """
    ids = list(id_cols or [])
    med = df.groupBy(group_col).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("__med")
    )
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "__adev", F.abs(F.col(value_col) - F.col("__med"))
    )
    mad = dev.groupBy(group_col).agg(
        F.percentile(F.col("__adev"), F.lit(0.5)).alias("__mad")
    )
    mz = F.round(
        F.lit(0.6745)
        * (F.col(value_col) - F.col("__med"))
        / F.col("__mad"),
        6,
    )
    return (
        dev.join(F.broadcast(mad), group_col)
        .filter(F.col("__mad") > 0)
        .withColumn("mz", mz)
        .filter(F.abs(F.col("mz")) > threshold)
        .select(*ids, group_col, value_col, "mz")
    )
