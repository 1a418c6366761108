"""Bucketed tables: co-located, shuffle-free repeated joins.

The 100 TB lever the one-shot queries can't use: if two fact tables
are written bucketed (and sorted) by their join key into the same
number of buckets, every later equi-join or aggregation on that key
reads co-partitioned files and skips the exchange — the dominant cost
of a large fact-fact join. (The residual per-bucket sort is local:
Spark 3+ ignores write-time ``sortBy`` ordering at read unless
``spark.sql.legacy.bucketedTableScan.outputOrdering`` is set, because
multi-file buckets can't guarantee it; the shuffle elision is the
material win.) One write-time shuffle is amortized over every downstream join;
this is Spark's native answer to the pre-partitioned-layout designs
in the warehouse literature.

Local note: bucketing needs catalog tables (``saveAsTable``) — the
in-memory/derby catalog works; tables are written as EXTERNAL with an
explicit path so nothing lands in a hidden warehouse dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_col: str,
    num_buckets: int = 8,
    *,
    sort: bool = True,
) -> None:
    """Write ``df`` as an external bucketed (and optionally
    bucket-sorted) parquet table registered as ``name``.

    ``num_buckets`` must match across tables meant to join co-located;
    size it so one bucket of the LARGEST table fits an executor core's
    working set (at 100 TB: thousands of buckets, not 8).
    """
    # One file per bucket: Spark only elides the join-side Sort when a
    # sorted bucket is a single file (multiple writer tasks would each
    # leave a per-task file, and a multi-file bucket loses the sorted
    # guarantee at read time). Also the small-files fix.
    df = df.repartition(num_buckets, bucket_col)
    w = df.write.mode("overwrite").option("path", os.path.abspath(path)).bucketBy(
        num_buckets, bucket_col
    )
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(name)


def bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed catalog table (bucket metadata only survives a
    catalog read — ``spark.read.parquet`` on the same path would lose
    the layout and reintroduce the shuffle)."""
    return spark.table(name)
