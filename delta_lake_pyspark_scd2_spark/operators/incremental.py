"""Incremental aggregate maintenance driven by the change data feed.

The consumer that makes a CDF worth having: a downstream aggregate
(materialized view) kept current by applying only the delta between
table versions, never recomputing from the base. The algebra is the
standard self-maintainable-view one: COUNT and SUM are abelian-group
aggregates, so `insert`/`update_postimage` rows contribute +value and
`delete`/`update_preimage` rows contribute -value; grouping the signed
contributions gives a per-group delta that merges into the aggregate
with one key-equi upsert (groups whose count reaches zero are deleted
in the same commit).

Scale story: ``table_changes`` reads only files that differ between
the versions (manifest diff), the signed aggregation is one map-side
combinable shuffle over just those changed rows, and the upsert
rewrites only the aggregate partitions holding changed groups. Cost ∝
change volume — a 100 TB base table with a 10 GB daily delta refreshes
its rollups at 10 GB cost.

Exactness: integral measures refresh bit-exactly (the property test's
contract). Floating-point measures drift by reassociation, as in any
incremental system — keep money in longs/decimals. Measure columns
are assumed non-null (the usual fact-table contract): SQL's
null-skipping SUM is not a group under +/- without a per-measure
non-null count, so coalesce measures at ingest instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.sources.vtable import VersionedParquetTable


def aggregate_of(
    base_df: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n",
) -> DataFrame:
    """The from-scratch form of the maintained aggregate — used to
    materialize it initially and as the property-test ground truth."""
    return base_df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(count_col),
        *[F.sum(c).alias(c) for c in sum_cols],
    )


def incremental_agg_refresh(
    base: VersionedParquetTable,
    agg: VersionedParquetTable,
    key_cols: Sequence[str],
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    since_version: int,
    count_col: str = "n",
) -> dict:
    """Fold every base-table change after ``since_version`` into the
    aggregate table. Returns the upsert metrics plus the base version
    the aggregate is now current to (pass it as the next call's
    ``since_version``)."""
    now_version = base.latest_version()
    changes = base.table_changes(list(key_cols), since_version, now_version)
    out = apply_change_rows(
        agg, changes, group_cols, sum_cols, count_col=count_col
    )
    out["refreshed_to_version"] = now_version
    return out


def signed_deltas(
    changes: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """Per-group signed contribution of a batch of CDF rows
    (``_change_type`` column): +1 for insert/update_postimage, −1 for
    delete/update_preimage. One map-side-combinable aggregation over
    just the changed rows."""
    gcols = list(group_cols)
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        changes.withColumn("_sign", sign)
        .groupBy(*gcols)
        .agg(
            F.sum("_sign").alias("_dn"),
            *[
                F.sum(F.col(c) * F.col("_sign")).alias(f"_d_{c}")
                for c in sum_cols
            ],
        )
    )


def apply_change_rows(
    agg: VersionedParquetTable,
    changes: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    *,
    count_col: str = "n",
    txn: "tuple[str, int] | None" = None,
) -> dict:
    """Merge one batch of CDF rows into the aggregate table: signed
    fold → one key-equi upsert (count-zero groups deleted in the same
    commit). ``txn`` rides through to :meth:`upsert` so a foreachBatch
    caller gets exactly-once replays."""
    gcols = list(group_cols)
    deltas = signed_deltas(changes, gcols, sum_cols)
    cur = agg.read()
    merged = deltas.join(cur, on=gcols, how="left").select(
        *gcols,
        (F.coalesce(F.col(count_col), F.lit(0)) + F.col("_dn")).alias(count_col),
        *[
            (
                F.coalesce(F.col(c), F.lit(0))
                + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
            ).alias(c)
            for c in sum_cols
        ],
    )
    ups = merged.filter(F.col(count_col) > 0)
    dels = merged.filter(F.col(count_col) <= 0).select(*gcols)
    return agg.upsert(
        ups, gcols, deletes=dels, operation="AGG_REFRESH", txn=txn
    )
